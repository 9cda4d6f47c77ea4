"""Streaming cardinality sketches.

``Searcher.cardinality_aggregation`` is exact but needs the keyword
filter postings; for arbitrary (un-indexed) columns at 100-TB scale
the engine uses HyperLogLog (Flajolet et al. 2007): each Ray Data
block folds its values into a 2^p-register sketch inside
``map_batches``, and the tiny per-block registers merge at the driver
with an elementwise max — the only data that ever leaves a worker is
``2^p`` bytes per block.  This mirrors the reference's OpenSearch
``cardinality`` aggregation, which is HLL++ per shard merged at the
coordinator (reference: dashboard panels over unique source IPs).

Hashing is ``pandas.util.hash_array`` (SipHash-based, deterministic
across processes with the default key) — vectorized, collision-safe
64-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class HyperLogLog:
    """Dense HLL with the classic bias/small-range corrections.

    Standard error ~= 1.04/sqrt(2^p); p=14 (16 KiB) gives ~0.8%.
    """

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    @staticmethod
    def _bitlen(x: np.ndarray) -> np.ndarray:
        """Vectorized bit_length for uint arrays < 2^32 (frexp on
        float64 is exact below 2^53)."""
        _, e = np.frexp(x.astype(np.float64))
        return e.astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        """Fold 64-bit hashes into the registers (vectorized)."""
        h = h.astype(np.uint64, copy=False)
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = (h << np.uint64(self.p)).astype(np.uint64)  # payload, top-aligned
        hi = (w >> np.uint64(32)).astype(np.uint64)
        lo = (w & np.uint64(0xFFFFFFFF)).astype(np.uint64)
        lz = np.where(hi > 0, 32 - self._bitlen(hi), 64 - self._bitlen(lo))
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        # per-index max (np.maximum.at handles duplicate indices)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        arr = np.asarray(values)
        self.add_hashes(pd.util.hash_array(arr).astype(np.uint64))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge sketches with different p")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        e = alpha * m * m / float(
            np.sum(np.exp2(-self.registers.astype(np.float64))))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * float(np.log(m / zeros))
        return e

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, p: int) -> "HyperLogLog":
        return cls(p, np.frombuffer(blob, dtype=np.uint8).copy())


def hll_cardinality(ds, column: str, p: int = 14) -> float:
    """Approximate distinct count of ``column`` over a Dataset.

    One sketch per block (map_batches, Arrow in / one-row Arrow out),
    registers merged at the driver — the shuffle-free cardinality path
    for columns without keyword filter postings.  take_all() here pulls
    only the per-block register rows (2^p bytes each), never data."""

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add(batch.column(column).to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([hll.to_bytes()], pa.large_binary())})

    out = HyperLogLog(p)
    for row in ds.select_columns([column]) \
                 .map_batches(partial, batch_format="pyarrow").take_all():
        out.merge(HyperLogLog.from_bytes(row["regs"], p))
    return out.estimate()


class TDigest:
    """Merging t-digest (Dunning & Ertl) for mergeable quantiles.

    Centroids cluster by the k-scale index k(q) = delta*(asin(2q-1)/pi
    + 1/2): accuracy concentrates at the tails, memory is O(delta),
    and two digests merge by concatenation + one recompress — the
    distributed-percentiles partial the reference gets from
    OpenSearch's percentiles agg (t-digest per shard, merged at the
    coordinator).  ``stats_aggregation(quantile_method='tdigest')``
    swaps this in for the exact path when raw matched values are too
    big to gather.

    Deterministic for a fixed partitioning/merge order (compression
    re-sorts by mean); different partitionings yield slightly
    different — equally accurate — centroids, like any t-digest.
    """

    def __init__(self, delta: int = 200,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = int(delta)
        self.means = means if means is not None else np.zeros(0)
        self.weights = weights if weights is not None else np.zeros(0)

    def _kfun(self, q: np.ndarray) -> np.ndarray:
        return self.delta * (np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)
                             / np.pi + 0.5)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        if means.size == 0:
            self.means = means
            self.weights = weights
            return
        order = np.argsort(means, kind="stable")
        m, w = means[order], weights[order]
        total = float(w.sum())
        q_left = (np.cumsum(w) - w) / total
        idx = np.floor(self._kfun(q_left)).astype(np.int64)
        # group consecutive-equal k-indices (values sorted by mean, so
        # equal indices are adjacent)
        uniq, start = np.unique(idx, return_index=True)
        bounds = np.append(start, m.size)
        gm = np.add.reduceat(m * w, bounds[:-1])
        gw = np.add.reduceat(w, bounds[:-1])
        self.means = gm / gw
        self.weights = gw

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        if v.size == 0:
            return
        self._compress(np.concatenate([self.means, v]),
                       np.concatenate([self.weights,
                                       np.ones(v.size)]))

    def merge(self, other: "TDigest") -> "TDigest":
        if other.delta != self.delta:
            raise ValueError("cannot merge digests with different delta")
        self._compress(np.concatenate([self.means, other.means]),
                       np.concatenate([self.weights, other.weights]))
        return self

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            raise ValueError("empty digest")
        if self.means.size == 1:
            return float(self.means[0])
        w = self.weights
        total = float(w.sum())
        # centroid midpoints in cumulative-weight space
        mid = (np.cumsum(w) - w / 2.0) / total
        t = min(max(q, 0.0), 1.0)
        if t <= mid[0]:
            return float(self.means[0])
        if t >= mid[-1]:
            return float(self.means[-1])
        j = int(np.searchsorted(mid, t, side="right"))
        frac = (t - mid[j - 1]) / (mid[j] - mid[j - 1])
        return float(self.means[j - 1]
                     + frac * (self.means[j] - self.means[j - 1]))

    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        return self.means, self.weights

    @classmethod
    def from_arrays(cls, means, weights, delta: int = 200) -> "TDigest":
        return cls(delta, np.asarray(means, dtype=np.float64),
                   np.asarray(weights, dtype=np.float64))
