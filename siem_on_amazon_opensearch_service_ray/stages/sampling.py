"""Deterministic mixture sampling: per-source up/down-sampling with
fractional epochs — the mixture-weighting step of a pretraining data
pipeline (cf. The Pile / LLaMA per-source epoch weights).

A rate is an integer percentage per key value: 60 keeps a
deterministic 60% of the source, 100 keeps all of it, 250 emits two
full copies plus a deterministic 50% third (the ``epoch`` output
column numbers the copies 0..n-1), 0 drops the source.  Selection is
``doc_id % 100 < rate % 100`` — no RNG, so reruns, resumes, and the
SQL oracle all agree exactly, and the decision is a pure function of
the row (no shuffle, no state; the rate table rides in the actor
constructor — it is a handful of entries, not a broadcast-sized
side).

Hash the id into the modulus (``hash_mod``) when sequential ids
correlate with content (e.g. time-ordered crawls): plain ``id % 100``
would then sample a biased slice.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Stateless 64-bit mixer (splitmix64) for id decorrelation."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def sample_batch(batch: pa.Table, rates: dict[str, int], key_col: str,
                 id_col: str, default: int, hash_mod: bool) -> pa.Table:
    """Expand each row into ``rate//100`` full copies plus a
    deterministic fractional one, tagged with an ``epoch`` column."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
               .astype(np.int64)
    keys = batch.column(key_col).to_pylist()
    rr = np.array([rates.get(k, default) for k in keys], dtype=np.int64)
    sel = (_splitmix64(ids) % np.uint64(100)).astype(np.int64) \
        if hash_mod else ids % 100
    copies = rr // 100 + (sel < rr % 100)
    total = int(copies.sum())
    idx = np.repeat(np.arange(len(ids)), copies)
    starts = np.repeat(np.cumsum(copies) - copies, copies)
    epoch = np.arange(total) - starts
    out = batch.take(pa.array(idx))
    return out.append_column("epoch", pa.array(epoch, pa.int64()))


def mixture_sample(ds: rd.Dataset, rates: dict[str, int],
                   key_col: str = "lang", id_col: str = "doc_id",
                   default: int = 100, hash_mod: bool = False
                   ) -> rd.Dataset:
    # task-mode map_batches: the rate table is a handful of entries
    # in the task closure; no actor pool to reserve CPUs or churn
    if any(r < 0 for r in rates.values()) or default < 0:
        raise ValueError("rates must be non-negative percentages")
    rates = dict(rates)

    def fn(batch: pa.Table) -> pa.Table:
        return sample_batch(batch, rates, key_col, id_col, default,
                            hash_mod)

    return ds.map_batches(fn, batch_format="pyarrow")
