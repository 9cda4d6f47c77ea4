"""HyperLogLog cardinality sketch + plain highlighter."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from siem_on_amazon_opensearch_service_ray.stages.sketches import (
    HyperLogLog, hll_cardinality)


def test_hll_accuracy_small_and_large():
    h = HyperLogLog(p=14)
    h.add(np.array([f"v{i}" for i in range(100)], dtype=object))
    assert abs(h.estimate() - 100) / 100 < 0.02
    h2 = HyperLogLog(p=14)
    h2.add(np.arange(50_000))
    assert abs(h2.estimate() - 50_000) / 50_000 < 0.03


def test_hll_duplicates_do_not_inflate():
    h = HyperLogLog(p=12)
    vals = np.array([f"k{i % 500}" for i in range(20_000)], dtype=object)
    h.add(vals)
    assert abs(h.estimate() - 500) / 500 < 0.05


def test_hll_merge_equals_union():
    a, b, u = HyperLogLog(p=12), HyperLogLog(p=12), HyperLogLog(p=12)
    xs = np.arange(0, 3000)
    ys = np.arange(1500, 6000)
    a.add(xs)
    b.add(ys)
    u.add(np.arange(0, 6000))
    a.merge(b)
    assert np.array_equal(a.registers, u.registers)
    assert a.estimate() == u.estimate()
    with pytest.raises(ValueError):
        a.merge(HyperLogLog(p=11))


def test_hll_roundtrip_bytes():
    h = HyperLogLog(p=10)
    h.add(np.arange(1000))
    h2 = HyperLogLog.from_bytes(h.to_bytes(), 10)
    assert h2.estimate() == h.estimate()


def test_hll_cardinality_dataset(ray_session):
    import ray.data as rd
    n = 40_000
    t = pa.table({"user": pa.array([f"u{i % 7321}" for i in range(n)])})
    ds = rd.from_arrow(t).repartition(8)
    est = hll_cardinality(ds, "user", p=14)
    assert abs(est - 7321) / 7321 < 0.03


def test_highlight(ray_session, tmp_path):
    from siem_on_amazon_opensearch_service_ray.pipelines.search import highlight
    texts = [
        "alpha beta gamma spark join delta spark epsilon",
        "no match here at all",
        "JOIN at the start and sparkly is not spark",
        "x " * 200 + "spark join " + "y " * 200,
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()), "content": texts})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)

    out = highlight([src], [0, 1, 2, 3], "spark join", fragment_size=40)
    assert 1 not in out                     # no-match doc omitted
    assert "<em>spark</em> <em>join</em>" in out[0]
    # case-insensitive; 'sparkly' must NOT match the 'spark' token
    assert out[2].startswith("<em>JOIN</em>")
    assert "<em>sparkly</em>" not in out[2]
    # window centers on the dense region of a long doc
    assert "<em>spark</em> <em>join</em>" in out[3]
    assert len(out[3]) <= 40 + 4 * len("<em></em>")
    # zero-hit query / empty ids
    assert highlight([src], [], "spark") == {}
    assert highlight([src], [0], "zzznope") == {}


def test_tdigest_rank_accuracy():
    from siem_on_amazon_opensearch_service_ray.stages.sketches import TDigest
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(100, 15, 30_000),
                           rng.lognormal(3, 1, 20_000)])
    td = TDigest(delta=200)
    td.add(vals)
    assert td.count == vals.size
    s = np.sort(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        est = td.quantile(q)
        # t-digest guarantee is on RANK error, tighter at the tails
        rank = np.searchsorted(s, est) / s.size
        tol = 0.005 if 0.1 <= q <= 0.9 else 0.002
        assert abs(rank - q) < tol, (q, est, rank)


def test_tdigest_merge_matches_whole():
    from siem_on_amazon_opensearch_service_ray.stages.sketches import TDigest
    rng = np.random.default_rng(4)
    vals = rng.exponential(10, 50_000)
    parts = np.array_split(vals, 7)
    merged = TDigest()
    for p in parts:
        t = TDigest()
        t.add(p)
        merged.merge(t)
    s = np.sort(vals)
    assert merged.count == vals.size
    for q in (0.05, 0.5, 0.95, 0.99):
        rank = np.searchsorted(s, merged.quantile(q)) / s.size
        assert abs(rank - q) < 0.01, q
    # centroid budget stays O(delta)
    assert merged.means.size <= 2 * 200
    with pytest.raises(ValueError):
        merged.merge(TDigest(delta=100))
    with pytest.raises(ValueError):
        TDigest().quantile(0.5)


def test_tdigest_roundtrip_and_small():
    from siem_on_amazon_opensearch_service_ray.stages.sketches import TDigest
    td = TDigest()
    td.add(np.array([5.0]))
    assert td.quantile(0.0) == td.quantile(1.0) == 5.0
    td2 = TDigest.from_arrays(*td.to_arrays())
    assert td2.quantile(0.5) == 5.0
    # exact on tiny inputs (every value its own centroid)
    td3 = TDigest()
    td3.add(np.arange(10, dtype=float))
    assert td3.quantile(0.0) == 0.0 and td3.quantile(1.0) == 9.0
