"""Similarity search over embedding columns: brute-force cosine top-k
(baseline) and an LSH-bucketed variant (scale path).

Baseline: the query matrix is broadcast once (``ray.put``); every
batch does one numpy matmul against it; per-batch partial top-k rows
flow to a tiny global ``sort + limit`` — the classic
scatter-gather ANN layout (no shuffle of the embedding table).

Scale path: random-hyperplane LSH buckets (map_batches adds a bucket
id; queries probe only matching buckets), trading recall for a
pruned scan — bucket signature length configurable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow list<float> / fixed_size_list<float> column -> (n, dim)
    float32 matrix via the flattened values buffer (no per-row Python
    lists). Assumes equal-length rows (embedding columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float32)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)  # slice-aware
        return np.asarray(flat, dtype=np.float32).reshape(n, dim)
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        if flat.size % n:
            return np.asarray(col.to_pylist(), dtype=np.float32)  # ragged fallback
        return np.asarray(flat, dtype=np.float32).reshape(n, flat.size // n)
    return np.asarray(col.to_pylist(), dtype=np.float32)


class BruteForceCosine:
    """map_batches actor: per batch, cosine of every row against the
    broadcast query matrix; emits (row id, query idx, cosine) for the
    per-batch top ``k`` per query (partial top-k pushdown)."""

    def __init__(self, query_ref, id_col: str, vec_col: str, k: int):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = np.asarray(q, dtype=np.float32)
        qn = np.linalg.norm(self.q, axis=1, keepdims=True)
        self.qn = np.where(qn == 0, 1, qn)
        self.id_col, self.vec_col, self.k = id_col, vec_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _as_matrix(batch.column(self.vec_col))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms = np.where(norms == 0, 1, norms)
        sims = (m / norms) @ (self.q / self.qn).T          # (rows, n_queries)
        out_id, out_q, out_cos = [], [], []
        kk = min(self.k, sims.shape[0])
        if kk == 0:  # empty block (e.g. upstream filter) — argpartition(-1) raises
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "query_idx": pa.array([], pa.int32()),
                "cosine": pa.array([], pa.float64()),
            })
        for qi in range(sims.shape[1]):
            top = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            out_id.extend(int(i) for i in ids[top])
            out_q.extend([qi] * kk)
            out_cos.extend(float(s) for s in sims[top, qi])
        return pa.table({
            "vec_id": pa.array(out_id, pa.int64()),
            "query_idx": pa.array(out_q, pa.int32()),
            "cosine": pa.array(out_cos, pa.float64()),
        })


def knn_cosine(ds: rd.Dataset, queries: np.ndarray, id_col: str = "vec_id",
               vec_col: str = "embedding", k: int = 10,
               concurrency: int = 4) -> rd.Dataset:
    """Exact top-k via scatter-gather: per-batch partial top-k, global
    sort + limit per query (ties: cosine desc, vec_id asc)."""
    q_ref = ray.put(np.asarray(queries, dtype=np.float32))
    partial = ds.map_batches(BruteForceCosine,
                             fn_constructor_kwargs=dict(
                                 query_ref=q_ref, id_col=id_col,
                                 vec_col=vec_col, k=k),
                             batch_format="pyarrow", concurrency=concurrency)
    import pandas as pd

    def topk_per_query(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        return g

    return partial.groupby("query_idx").map_groups(topk_per_query,
                                                   batch_format="pandas")


class LshBucketStage:
    """Scale path: random-hyperplane signature as a bucket id column —
    co-bucketed vectors are ANN candidates; queries probe only their
    own bucket (and optionally neighboring signatures)."""

    def __init__(self, planes_ref, vec_col: str = "embedding",
                 out_col: str = "lsh_bucket"):
        p = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = np.asarray(p, dtype=np.float32)   # (n_bits, dim)
        self.vec_col, self.out_col = vec_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(self.vec_col))
        bits = (m @ self.planes.T) > 0                     # (rows, n_bits)
        weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
        buckets = (bits.astype(np.int64) * weights).sum(axis=1)
        return batch.append_column(self.out_col, pa.array(buckets, pa.int64()))


def lsh_planes(dim: int, n_bits: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).astype(np.float32)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse centroids + probed-cell search


def train_ivf_centroids(ds: rd.Dataset, vec_col: str = "embedding",
                        n_cells: int = 16, n_iter: int = 5,
                        sample_rows: int = 4096, seed: int = 13
                        ) -> np.ndarray:
    """Deterministic coarse quantizer: k-means (Lloyd) over a bounded
    driver-side sample — the centroid set is tiny (n_cells x dim) and
    broadcasts; the FULL dataset is never pulled to the driver.  At
    100 TB the sample stays O(sample_rows) via limit()."""
    sample = pa.concat_tables(
        ds.limit(sample_rows).iter_batches(batch_format="pyarrow"))
    x = _as_matrix(sample.column(vec_col)).astype(np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1, norms)
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(x.shape[0], size=min(n_cells, x.shape[0]),
                         replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(x @ cents.T, axis=1)      # cosine on unit vectors
        for c in range(cents.shape[0]):
            members = x[assign == c]
            if members.shape[0]:
                mu = members.mean(axis=0)
                n = np.linalg.norm(mu)
                cents[c] = mu / (n or 1)
    return cents.astype(np.float32)


class IvfAssignStage:
    """map_batches stage: nearest-centroid cell id per vector — the
    IVF partitioning column.  Writing the dataset partitioned by
    ``ivf_cell`` gives the probed-read layout: a query scans only its
    top ``n_probe`` cells' partitions."""

    def __init__(self, centroids_ref, vec_col: str = "embedding",
                 out_col: str = "ivf_cell"):
        c = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) \
            else centroids_ref
        self.cents = np.asarray(c, dtype=np.float32)
        self.vec_col, self.out_col = vec_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(self.vec_col))
        if m.shape[0] == 0:
            return batch.append_column(self.out_col,
                                       pa.array([], pa.int32()))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.where(norms == 0, 1, norms)
        cells = np.argmax(mn @ self.cents.T, axis=1).astype(np.int32)
        return batch.append_column(self.out_col, pa.array(cells, pa.int32()))


def ivf_topk(ds: rd.Dataset, query: np.ndarray, centroids: np.ndarray,
             k: int = 10, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", concurrency: int = 4) -> rd.Dataset:
    """IVF probe search: score ONLY vectors whose cell is among the
    query's ``n_probe`` nearest centroids (filter inside map_batches —
    no shuffle), then exact per-batch partial top-k + tiny global
    sort.  Recall grows with n_probe; n_probe == n_cells is exact
    (brute force).  Returns Dataset[(vec_id, cosine)] of <= k rows."""
    q = np.asarray(query, dtype=np.float32).reshape(-1)
    qn = np.linalg.norm(q)
    qu = q / (qn or 1)
    cents = np.asarray(centroids, dtype=np.float32)
    probe = set(np.argsort(-(cents @ qu))[:n_probe].tolist())
    cents_ref = ray.put(cents) if ray.is_initialized() else cents
    q_ref = ray.put(qu) if ray.is_initialized() else qu

    class ProbeScore:
        def __init__(self, cents_ref, q_ref, probe, id_col, vec_col, k):
            self.cents = np.asarray(
                ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef)
                else cents_ref, np.float32)
            self.q = np.asarray(
                ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef)
                else q_ref, np.float32)
            self.probe = np.array(sorted(probe), dtype=np.int64)
            self.id_col, self.vec_col, self.k = id_col, vec_col, k

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({"vec_id": pa.array([], pa.int64()),
                              "cosine": pa.array([], pa.float64())})
            m = _as_matrix(batch.column(self.vec_col))
            if m.shape[0] == 0:
                return empty
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            mn = m / np.where(norms == 0, 1, norms)
            cells = np.argmax(mn @ self.cents.T, axis=1)
            keep = np.isin(cells, self.probe)
            if not keep.any():
                return empty
            ids = batch.column(self.id_col).to_numpy(
                zero_copy_only=False)[keep]
            sims = (mn[keep].astype(np.float64) @
                    self.q.astype(np.float64))
            kk = min(self.k, sims.size)
            top = np.argpartition(-sims, kk - 1)[:kk]
            return pa.table({
                "vec_id": pa.array(ids[top].astype(np.int64), pa.int64()),
                "cosine": pa.array(sims[top], pa.float64()),
            })

    partial = ds.map_batches(
        ProbeScore,
        fn_constructor_kwargs=dict(cents_ref=cents_ref, q_ref=q_ref,
                                   probe=probe, id_col=id_col,
                                   vec_col=vec_col, k=k),
        batch_format="pyarrow", concurrency=concurrency)
    return partial.sort(["cosine", "vec_id"],
                        descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# PQ (product quantization) ANN: the memory-compressed scale path —
# each vector stored as m uint8 codes (m bytes) instead of dim float32
# (dim*4 bytes); queries scan codes with an ADC lookup table.  At
# 100 TB this is the difference between vectors fitting in cluster RAM
# or not; compose with IVF (encode per cell) for the classic IVF-PQ.


def train_pq_codebooks(ds: rd.Dataset, vec_col: str = "embedding",
                       m: int = 4, n_codes: int = 16, n_iter: int = 5,
                       sample_rows: int = 4096, seed: int = 17
                       ) -> np.ndarray:
    """Deterministic per-subspace Lloyd over a bounded driver-side
    sample (the same sampling contract as ``train_ivf_centroids``:
    codebooks are tiny — (m, n_codes, dim/m) — and broadcast; the full
    dataset never reaches the driver).  Vectors are unit-normalized
    first so ADC inner products approximate cosine.  ``dim`` must be
    divisible by ``m``."""
    sample = pa.concat_tables(
        ds.limit(sample_rows).iter_batches(batch_format="pyarrow"))
    x = _as_matrix(sample.column(vec_col)).astype(np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1, norms)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        cents = xs[rng.choice(xs.shape[0],
                              size=min(n_codes, xs.shape[0]),
                              replace=False)]
        if cents.shape[0] < n_codes:           # tiny-sample degenerate
            reps = -(-n_codes // cents.shape[0])
            cents = np.tile(cents, (reps, 1))[:n_codes]
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = xs[assign == c]
                if members.shape[0]:
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books.astype(np.float32)


class PqEncodeStage:
    """map_batches stage: append ``pq_code`` — m uint8 codes packed as
    an m-byte binary per vector (the compressed representation you
    would persist instead of the float vectors)."""

    def __init__(self, books_ref, vec_col: str = "embedding",
                 out_col: str = "pq_code"):
        b = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) \
            else books_ref
        self.books = np.asarray(b, dtype=np.float32)   # (m, K, dsub)
        self.vec_col, self.out_col = vec_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mx = _as_matrix(batch.column(self.vec_col))
        m, _K, dsub = self.books.shape
        if mx.shape[0] == 0:
            return batch.append_column(self.out_col,
                                       pa.array([], pa.binary()))
        norms = np.linalg.norm(mx, axis=1, keepdims=True)
        xn = mx / np.where(norms == 0, 1, norms)
        codes = np.empty((xn.shape[0], m), dtype=np.uint8)
        for j in range(m):
            xs = xn[:, j * dsub:(j + 1) * dsub]
            d2 = ((xs[:, None, :].astype(np.float64)
                   - self.books[j][None, :, :].astype(np.float64)) ** 2
                  ).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        # pack all rows in one buffer copy (FixedSizeBinary(m)) —
        # no per-row Python in the encode hot path
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(m), codes.shape[0],
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return batch.append_column(self.out_col, arr)


def pq_topk(ds: rd.Dataset, query: np.ndarray, books: np.ndarray,
            k: int = 10, id_col: str = "vec_id",
            code_col: str = "pq_code", concurrency: int = 4,
            probe_cells: set[int] | None = None,
            cell_col: str = "ivf_cell") -> rd.Dataset:
    """ADC (asymmetric distance computation) top-k over PQ codes: ONE
    (m, K) lookup table per query — LUT[j, c] = <q_sub_j, book[j][c]>
    — then each row's approximate cosine is a sum of m table lookups,
    fully vectorized (no float vectors are read).  Per-batch partial
    top-k + tiny global sort, the brute-force/IVF shape.

    ``probe_cells`` turns this into IVF-PQ: rows whose ``cell_col``
    (an `IvfAssignStage` column) is outside the probed set are skipped
    before any lookup — the classic compressed probed-cell scan."""
    q = np.asarray(query, dtype=np.float64).reshape(-1)
    qn = np.linalg.norm(q)
    qu = q / (qn or 1)
    b = np.asarray(books, dtype=np.float64)            # (m, K, dsub)
    m, _K, dsub = b.shape
    lut = np.einsum("mkd,md->mk", b,
                    qu.reshape(m, dsub))               # (m, K)
    lut_ref = ray.put(lut) if ray.is_initialized() else lut

    class AdcScore:
        def __init__(self, lut_ref, id_col, code_col, k, probe,
                     cell_col):
            lt = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) \
                else lut_ref
            self.lut = np.asarray(lt, np.float64)
            self.id_col, self.code_col, self.k = id_col, code_col, k
            self.probe = (np.array(sorted(probe), dtype=np.int64)
                          if probe is not None else None)
            self.cell_col = cell_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            empty = pa.table({"vec_id": pa.array([], pa.int64()),
                              "adc": pa.array([], pa.float64())})
            if self.probe is not None:
                cells = batch.column(self.cell_col).to_numpy(
                    zero_copy_only=False)
                batch = batch.filter(
                    pa.array(np.isin(cells, self.probe)))
            n = batch.num_rows
            if n == 0:
                return empty
            m = self.lut.shape[0]
            col = batch.column(self.code_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if pa.types.is_fixed_size_binary(col.type):
                # zero-copy view straight off the Arrow buffer
                raw = np.frombuffer(col.buffers()[1], np.uint8)
                codes = raw[col.offset * m:
                            (col.offset + n) * m].reshape(n, m)
            else:
                codes = np.frombuffer(b"".join(col.to_pylist()),
                                      np.uint8).reshape(n, m)
            scores = self.lut[np.arange(m)[None, :], codes].sum(axis=1)
            ids = batch.column(self.id_col).to_numpy(
                zero_copy_only=False)
            kk = min(self.k, n)
            top = np.argpartition(-scores, kk - 1)[:kk]
            return pa.table({
                "vec_id": pa.array(ids[top].astype(np.int64),
                                   pa.int64()),
                "adc": pa.array(scores[top], pa.float64()),
            })

    partial = ds.map_batches(
        AdcScore,
        fn_constructor_kwargs=dict(lut_ref=lut_ref, id_col=id_col,
                                   code_col=code_col, k=k,
                                   probe=probe_cells, cell_col=cell_col),
        batch_format="pyarrow", concurrency=concurrency)
    return partial.sort(["adc", "vec_id"],
                        descending=[True, False]).limit(k)
