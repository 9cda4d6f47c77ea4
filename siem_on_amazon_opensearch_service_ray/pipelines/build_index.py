"""Inverted-index build: the engine's flagship pipeline.

Replaces the reference's Lambda -> OpenSearch ``_bulk`` indexing hop
(reference: source/lambda/es_loader/index.py:320-397) with a from-scratch
Ray-Data-native build (BASELINE.json north_rule):

  corpus parquet (repo, path, commit, lang, content)
    │ ray.data.read_parquet
    ▼
  PASS A  docstore: prepare_docs (doc_id + content_sha256, map_batches)
          -> drop content -> groupby(doc-range) -> canonical sort +
          exact dedup (first-wins on min content_sha256; reference
          parity: AOSS docid_set, index.py:332-336) -> one parquet per
          doc range, atomic + manifested
    ▼
  PASS B  postings: tokenize (actor pool, code-aware analyzer)
          -> flatten (part, salt, field, term, doc_id, tf, norm) rows
          -> SHUFFLE groupby(part, salt)  [the groupby-term exchange]
          -> encode segments: canonical (field, term, doc_id) sort,
             delta-varint 128-blocks + skip/block-max metadata
          -> parts/part-PPPP/seg-SS.parquet, atomic + manifested
    ▼
  PASS C  keyword filter postings (lang/repo) from the docstore
    ▼
  PASS D  stats reduce (N from docstore, avgdl per field from segment
          total_tf sums) -> INDEX_MANIFEST.json (lineage + metrics)

Scale notes (100 TB / multi-node):
- only PASS B moves token-granular data; the shuffle payload is
  (int, int, str, str, int64, int32, uint8) rows — content never enters
  a shuffle (PASS A drops it before its groupby).
- ``num_partitions`` is fixed in config, independent of cluster size,
  so N-node and 4N-node builds produce byte-identical shards (SURVEY.md
  §4 "deterministic shards under varying parallelism").
- hot terms (``def`` in code) are salted: a sampling pre-pass estimates
  df, and terms above ``hot_df_threshold`` are split into
  ``doc_id % n_salts`` sub-segments that encode in parallel and are
  merged (sorted, score-identical) at read time — SURVEY.md §7.4/§7.5.3.
- every segment write is atomic (tmp + rename) and guarded by a
  manifest keyed on the input fingerprint: a resumed build skips
  already-finalized segments (reference parity: the batch CLI's
  finish-log checkpoint, index.py:710-742).
"""

from __future__ import annotations

import json
import os
import time
import zlib
from collections import Counter
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Sum

from ..analysis import ANALYZERS
from ..norms import encode_norm
from ..postings import encode_postings
from ..stages.docprep import add_ids_and_sha, compute_doc_ids

FORMAT_VERSION = 1


@dataclass(frozen=True)
class IndexConfig:
    num_partitions: int = 8          # P: fixed, cluster-size independent
    fields: tuple = (("content", "content", "code"), ("path", "path", "path"))
    keyword_fields: tuple = ("lang", "repo")
    id_cols: tuple = ("repo", "path", "commit")
    doc_id_col: str | None = None    # explicit int64 id column (else hash of id_cols)
    sha_col: str = "content"         # column whose sha256 is the e2e invariant
    tokenize_batch_size: int = 256   # content rows can be MBs
    tokenize_concurrency: int | None = None
    # hot-term salting
    salting: bool = True
    sample_mod: int = 64             # deterministic sample: doc_id % mod == 0
    hot_df_threshold: int = 20_000   # estimated df above which a term is salted
    salt_unit: int = 20_000          # one extra salt per this many estimated postings
    max_salts: int = 8

    def fingerprint_dict(self) -> dict:
        return asdict(self)


def _term_part(field: str, term: str, p: int) -> int:
    return zlib.crc32(f"{field}\x1f{term}".encode()) % p


def tokenize_concurrency(cfg: "IndexConfig") -> int:
    """Actor-pool size for tokenize stages: leave headroom for the read
    and shuffle stages so the pipeline doesn't serialize (ray_guide:
    a pool that reserves every CPU starves the other stages)."""
    if cfg.tokenize_concurrency:
        return cfg.tokenize_concurrency
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus - 2)


def _atomic_write_table(tbl: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)


def _atomic_write_json(obj: dict, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, sort_keys=True)
    os.replace(tmp, path)


def input_fingerprint(source, cfg: IndexConfig) -> str:
    """sha-stable fingerprint of (input files + build config) — the
    lineage key every per-partition manifest carries."""
    import hashlib
    h = hashlib.sha256()
    h.update(json.dumps(cfg.fingerprint_dict(), sort_keys=True).encode())
    h.update(str(FORMAT_VERSION).encode())
    if isinstance(source, (list, tuple)):
        for p in sorted(source):
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}".encode())
    elif isinstance(source, str):
        for root, _, files in os.walk(source):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    p = os.path.join(root, fn)
                    h.update(f"{p}:{os.stat(p).st_size}".encode())
    else:  # in-memory Dataset (tests): no stable file identity
        h.update(b"ephemeral")
    return h.hexdigest()[:16]


def _read_source(source) -> rd.Dataset:
    if isinstance(source, rd.Dataset):
        return source
    if isinstance(source, str):
        paths = sorted(
            os.path.join(root, fn)
            for root, _, files in os.walk(source) for fn in files
            if fn.endswith(".parquet"))
        return rd.read_parquet(paths)
    return rd.read_parquet(list(source))


# ---------------------------------------------------------------------------
# hot-term estimation (sampling pre-pass)


class _SampleDf:
    """Per-batch partial df over a deterministic doc_id-hash sample.
    Emits (field, term, df_partial) only for terms seen >= 2 times in
    the batch sample — rare terms can never reach the hot threshold, so
    the partial-aggregate stream stays small (SURVEY.md §4 skew row)."""

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids = compute_doc_ids(batch, cfg.id_cols, cfg.doc_id_col)
        keep = np.nonzero(ids % cfg.sample_mod == 0)[0]
        counts: Counter = Counter()
        for fname, col, analyzer in cfg.fields:
            an = ANALYZERS[analyzer]
            texts = batch.column(col).take(pa.array(keep)).to_pylist()
            for text in texts:
                for t in set(an(text)):
                    counts[(fname, t)] += 1
        items = [(f, t, c) for (f, t), c in counts.items() if c >= 2]
        return pa.table({
            "field": pa.array([x[0] for x in items], pa.string()),
            "term": pa.array([x[1] for x in items], pa.string()),
            "df_partial": pa.array([x[2] for x in items], pa.int64()),
        })


def estimate_hot_terms(source, cfg: IndexConfig) -> dict[str, int]:
    """-> {"field\\x1fterm": n_salts} for estimated-hot terms."""
    ds = _read_source(source)
    partials = ds.map_batches(_SampleDf, fn_constructor_kwargs={"cfg": cfg},
                              batch_format="pyarrow",
                              batch_size=cfg.tokenize_batch_size,
                              concurrency=tokenize_concurrency(cfg))
    agg = partials.groupby(["field", "term"]).aggregate(
        Sum("df_partial", alias_name="df_sample"))
    hot: dict[str, int] = {}
    for b in agg.iter_batches(batch_format="pyarrow"):
        fields = b.column("field").to_pylist()
        terms = b.column("term").to_pylist()
        dfs = b.column("df_sample").to_numpy(zero_copy_only=False)
        est = dfs * cfg.sample_mod
        for f, t, e in zip(fields, terms, est):
            if e >= cfg.hot_df_threshold:
                n_salts = int(min(cfg.max_salts, max(2, -(-int(e) // cfg.salt_unit))))
                hot[f"{f}\x1f{t}"] = n_salts
    return hot


# ---------------------------------------------------------------------------
# PASS A — docstore


def _write_docstore_group(group: pa.Table, index_dir: str, fp: str) -> pa.Table:
    dpart = int(group.column("dpart")[0].as_py())
    os.makedirs(os.path.join(index_dir, "docstore"), exist_ok=True)
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)
    out = os.path.join(index_dir, "docstore", f"part-{dpart:04d}.parquet")
    man = os.path.join(index_dir, "manifest", f"docstore-{dpart:04d}.json")
    if os.path.exists(man):
        with open(man) as f:
            m = json.load(f)
        if m.get("fingerprint") == fp:
            return pa.table({"dpart": [dpart], "rows": [m["rows"]],
                             "skipped": [True]})
    # canonical order + exact first-wins dedup (min sha as tiebreak)
    idx = pa.compute.sort_indices(group, sort_keys=[("doc_id", "ascending"),
                                                    ("content_sha256", "ascending")])
    group = group.take(idx)
    ids = group.column("doc_id").to_numpy(zero_copy_only=False)
    _, first = np.unique(ids, return_index=True)
    group = group.take(np.sort(first)).drop_columns(["dpart"])
    _atomic_write_table(group, out)
    sha_xor = 0
    for s in group.column("content_sha256").to_pylist():
        sha_xor ^= int(s[:16], 16)
    _atomic_write_json({"fingerprint": fp, "rows": group.num_rows,
                        "sha_xor_hi64": sha_xor, "path": out}, man)
    return pa.table({"dpart": [dpart], "rows": [group.num_rows], "skipped": [False]})


def build_docstore(source, index_dir: str, cfg: IndexConfig, fp: str) -> int:
    ds = _read_source(source)
    p = cfg.num_partitions

    text_cols = {col for _, col, _ in cfg.fields}

    def prep(batch: pa.Table) -> pa.Table:
        batch = add_ids_and_sha(batch, cfg.id_cols, cfg.sha_col, cfg.doc_id_col)
        keep = [c for c in batch.column_names if c not in text_cols]
        batch = batch.select(keep)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "dpart", pa.array((ids % p).astype(np.int32), pa.int32()))

    rows = (ds.map_batches(prep, batch_format="pyarrow",
                           batch_size=cfg.tokenize_batch_size)
              .groupby("dpart")
              .map_groups(lambda g: _write_docstore_group(g, index_dir, fp),
                          batch_format="pyarrow"))
    total = 0
    for b in rows.iter_batches(batch_format="pyarrow"):
        total += int(np.sum(b.column("rows").to_numpy(zero_copy_only=False)))
    return total


# ---------------------------------------------------------------------------
# PASS B — postings


class TokenizeFlatten:
    """Actor-pool stage: analyzers compiled once per actor; per batch,
    tokenize every configured field and flatten to posting rows.
    Mirrors the reference LogParser per-record pipeline position
    (reference: siem/__init__.py:519-574) but columnar + code-aware."""

    def __init__(self, cfg: IndexConfig, hot: dict[str, int]):
        self.cfg = cfg
        self.hot = hot
        self.analyzers = {f: ANALYZERS[a] for f, _, a in cfg.fields}
        self._route_cache: dict[tuple, tuple] = {}

    def _route(self, fname: str, term: str) -> tuple[int, int]:
        key = (fname, term)
        r = self._route_cache.get(key)
        if r is None:
            part = _term_part(fname, term, self.cfg.num_partitions)
            n_salts = self.hot.get(f"{fname}\x1f{term}", 1)
            r = (part, n_salts)
            if len(self._route_cache) < 2_000_000:
                self._route_cache[key] = r
        return r

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ids = compute_doc_ids(batch, cfg.id_cols, cfg.doc_id_col)
        parts: list[int] = []
        salts: list[int] = []
        fields: list[str] = []
        terms: list[str] = []
        doc_ids: list[int] = []
        tfs: list[int] = []
        norms: list[int] = []
        for fname, col, _ in cfg.fields:
            an = self.analyzers[fname]
            texts = batch.column(col).to_pylist()
            for i, text in enumerate(texts):
                tf = Counter(an(text))
                if not tf:
                    continue
                dl = sum(tf.values())
                norm = int(encode_norm(np.array([dl]))[0])
                did = int(ids[i])
                for term, cnt in tf.items():
                    part, n_salts = self._route(fname, term)
                    parts.append(part)
                    salts.append(did % n_salts if n_salts > 1 else 0)
                    fields.append(fname)
                    terms.append(term)
                    doc_ids.append(did)
                    tfs.append(cnt)
                    norms.append(norm)
        return pa.table({
            "part": pa.array(parts, pa.int32()),
            "salt": pa.array(salts, pa.int32()),
            "field": pa.array(fields, pa.string()),
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "tf": pa.array(tfs, pa.int32()),
            "norm": pa.array(norms, pa.int32()),
        })


def _encode_segment(group: pa.Table, index_dir: str, fp: str) -> pa.Table:
    part = int(group.column("part")[0].as_py())
    salt = int(group.column("salt")[0].as_py())
    part_dir = os.path.join(index_dir, "parts", f"part-{part:04d}")
    os.makedirs(part_dir, exist_ok=True)
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)
    out = os.path.join(part_dir, f"seg-{salt:02d}.parquet")
    man = os.path.join(index_dir, "manifest", f"seg-{part:04d}-{salt:02d}.json")
    if os.path.exists(man):
        with open(man) as f:
            m = json.load(f)
        if m.get("fingerprint") == fp:
            return pa.table({"part": [part], "salt": [salt],
                             "n_terms": [m["n_terms"]],
                             "n_postings": [m["n_postings"]],
                             "bytes": [m["bytes"]], "skipped": [True]})
    t0 = time.monotonic()
    idx = pa.compute.sort_indices(group, sort_keys=[
        ("field", "ascending"), ("term", "ascending"), ("doc_id", "ascending")])
    group = group.take(idx)
    f_arr = np.asarray(group.column("field").to_pylist(), dtype=object)
    t_arr = np.asarray(group.column("term").to_pylist(), dtype=object)
    d_arr = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    tf_arr = group.column("tf").to_numpy(zero_copy_only=False).astype(np.uint32)
    nm_arr = group.column("norm").to_numpy(zero_copy_only=False).astype(np.uint8)
    # term boundaries over the canonically sorted run
    keys = np.array([f + "\x1f" + t for f, t in zip(f_arr, t_arr)], dtype=object)
    boundary = np.ones(len(keys), dtype=bool)
    boundary[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(boundary)
    ends = np.append(starts[1:], len(keys))
    o_field, o_term, o_df, o_ttf = [], [], [], []
    o_docs, o_tfs, o_norms, o_skip = [], [], [], []
    n_postings = 0
    for s, e in zip(starts, ends):
        dids = d_arr[s:e]
        tfs = tf_arr[s:e]
        nms = nm_arr[s:e]
        # duplicate (term, doc) rows can only come from duplicate input
        # rows with identical content (same doc_id) — keep first
        uniq, first = np.unique(dids, return_index=True)
        if uniq.size != dids.size:
            dids, tfs, nms = uniq, tfs[np.sort(first)], nms[np.sort(first)]
        docs_b, tfs_b, norms_b, skip_b = encode_postings(dids, tfs, nms)
        o_field.append(f_arr[s])
        o_term.append(t_arr[s])
        o_df.append(int(dids.size))
        o_ttf.append(int(tfs.sum()))
        o_docs.append(docs_b)
        o_tfs.append(tfs_b)
        o_norms.append(norms_b)
        o_skip.append(skip_b)
        n_postings += int(dids.size)
    seg = pa.table({
        "field": pa.array(o_field, pa.string()),
        "term": pa.array(o_term, pa.string()),
        "df": pa.array(o_df, pa.int64()),
        "total_tf": pa.array(o_ttf, pa.int64()),
        "docs": pa.array(o_docs, pa.large_binary()),
        "tfs": pa.array(o_tfs, pa.large_binary()),
        "norms": pa.array(o_norms, pa.large_binary()),
        "skip": pa.array(o_skip, pa.large_binary()),
    })
    _atomic_write_table(seg, out)
    nbytes = os.stat(out).st_size
    _atomic_write_json({
        "fingerprint": fp, "part": part, "salt": salt,
        "n_terms": len(o_field), "n_postings": n_postings, "bytes": nbytes,
        "encode_sec": round(time.monotonic() - t0, 3), "path": out,
    }, man)
    return pa.table({"part": [part], "salt": [salt], "n_terms": [len(o_field)],
                     "n_postings": [n_postings], "bytes": [nbytes],
                     "skipped": [False]})


def build_postings(source, index_dir: str, cfg: IndexConfig, fp: str,
                   hot: dict[str, int]) -> dict:
    ds = _read_source(source)
    flat = ds.map_batches(TokenizeFlatten,
                          fn_constructor_kwargs={"cfg": cfg, "hot": hot},
                          batch_format="pyarrow",
                          batch_size=cfg.tokenize_batch_size,
                          concurrency=tokenize_concurrency(cfg))
    res = flat.groupby(["part", "salt"]).map_groups(
        lambda g: _encode_segment(g, index_dir, fp), batch_format="pyarrow")
    metrics = {"n_segments": 0, "n_terms": 0, "n_postings": 0, "bytes": 0,
               "skipped_segments": 0}
    for b in res.iter_batches(batch_format="pyarrow"):
        metrics["n_segments"] += b.num_rows
        metrics["n_terms"] += int(np.sum(b.column("n_terms").to_numpy(zero_copy_only=False)))
        metrics["n_postings"] += int(np.sum(b.column("n_postings").to_numpy(zero_copy_only=False)))
        metrics["bytes"] += int(np.sum(b.column("bytes").to_numpy(zero_copy_only=False)))
        metrics["skipped_segments"] += int(np.sum(b.column("skipped").to_numpy(zero_copy_only=False)))
    return metrics


# ---------------------------------------------------------------------------
# PASS C — keyword filter postings (from the docstore, content untouched)


def build_filters(index_dir: str, cfg: IndexConfig) -> None:
    store_dir = os.path.join(index_dir, "docstore")
    files = sorted(os.path.join(store_dir, f) for f in os.listdir(store_dir)
                   if f.endswith(".parquet"))
    for fname in cfg.keyword_fields:
        ds = rd.read_parquet(files, columns=["doc_id", fname])

        def enc(group: pa.Table, fname=fname) -> pa.Table:
            val = group.column(fname)[0].as_py()
            ids = np.sort(group.column("doc_id").to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
            ids = np.unique(ids)
            return pa.table({
                "value": pa.array([val], pa.string()),
                "df": pa.array([int(ids.size)], pa.int64()),
                "docs": pa.array([ids.astype("<u8").tobytes()], pa.large_binary()),
            })

        out_tbl = pa.concat_tables(
            [b for b in ds.groupby(fname).map_groups(enc, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")])
        idx = pa.compute.sort_indices(out_tbl, sort_keys=[("value", "ascending")])
        _atomic_write_table(out_tbl.take(idx),
                            os.path.join(index_dir, f"filter-{fname}.parquet"))


# ---------------------------------------------------------------------------
# PASS D — stats + manifest


def finalize(index_dir: str, cfg: IndexConfig, fp: str, n_docs: int,
             pass_metrics: dict, wall_sec: float) -> dict:
    total_tf: dict[str, int] = {f: 0 for f, _, _ in cfg.fields}
    parts_dir = os.path.join(index_dir, "parts")
    for part in sorted(os.listdir(parts_dir)):
        pd_ = os.path.join(parts_dir, part)
        for seg in sorted(os.listdir(pd_)):
            if not seg.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(pd_, seg), columns=["field", "total_tf"])
            fl = t.column("field").to_pylist()
            tt = t.column("total_tf").to_numpy(zero_copy_only=False)
            for f, v in zip(fl, tt):
                total_tf[f] = total_tf.get(f, 0) + int(v)
    stats = {
        "n_docs": n_docs,
        "avgdl": {f: (total_tf[f] / n_docs if n_docs else 0.0) for f in total_tf},
        "total_tf": total_tf,
    }
    manifest = {
        "format_version": FORMAT_VERSION,
        "fingerprint": fp,
        "config": cfg.fingerprint_dict(),
        "stats": stats,
        "metrics": dict(pass_metrics, build_wall_sec=round(wall_sec, 3)),
    }
    _atomic_write_json(manifest, os.path.join(index_dir, "INDEX_MANIFEST.json"))
    return manifest


def build_index(source, index_dir: str, cfg: IndexConfig | None = None,
                resume: bool = True) -> dict:
    """Full build. Returns the index manifest dict."""
    cfg = cfg or IndexConfig()
    t0 = time.monotonic()
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)
    os.makedirs(os.path.join(index_dir, "parts"), exist_ok=True)
    fp = input_fingerprint(source, cfg)
    man_path = os.path.join(index_dir, "INDEX_MANIFEST.json")
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            m = json.load(f)
        if m.get("fingerprint") == fp:
            return m
    if not resume:
        # invalidate stale segment manifests so every group re-encodes
        mdir = os.path.join(index_dir, "manifest")
        for f in os.listdir(mdir):
            os.unlink(os.path.join(mdir, f))
    hot = estimate_hot_terms(source, cfg) if cfg.salting else {}
    n_docs = build_docstore(source, index_dir, cfg, fp)
    metrics = build_postings(source, index_dir, cfg, fp, hot)
    build_filters(index_dir, cfg)
    metrics["hot_terms"] = len(hot)
    return finalize(index_dir, cfg, fp, n_docs, metrics,
                    time.monotonic() - t0)
