"""End-to-end pre-training curation chain, composed as ONE lazy
Dataset (each stage streams; the only shuffles are the exact-dedup
hash groupby and the duplicated-n-gram census partials):

  exact dedup (content hash, min-id survivor)
    -> quality/repetition gate (Gopher-style integer-ratio signals:
       token count, top-bigram fraction, duplicated-trigram fraction)
    -> cross-doc duplicated-n-gram exposure over the SURVIVOR set
       (Lee et al. 2022 exact-substring dedup restated over fixed
       token n-grams), docs above the coverage threshold dropped.

Thresholds are integers (ppm / counts) so a DuckDB oracle can restate
the whole chain exactly (`pipelines/queries.py curate_docs`).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from . import dedup as dedup_ops
from .textops import RepetitionSignals


def curate(ds: rd.Dataset, text_col: str = "text",
           id_col: str = "doc_id", min_tokens: int = 20,
           max_top2_e6: int = 90_000, max_dup3_e6: int = 200_000,
           dup_cover_num: int = 1, dup_cover_den: int = 5,
           n: int = 5) -> rd.Dataset:
    """Run the chain; returns the survivor Dataset with the signal
    columns appended (``n_tokens``, ``top2_e6``, ``dup3_e6``,
    ``dupline_e6``, ``n_pos``, ``n_dup_pos``).  A doc survives iff
    it is its content group's min-id row, ``n_tokens >= min_tokens``,
    ``top2_e6 < max_top2_e6``, ``dup3_e6 < max_dup3_e6``, and its
    duplicated-n-gram position coverage is strictly below
    ``dup_cover_num / dup_cover_den``."""
    ds = dedup_ops.exact_dedup(ds, text_col=text_col)
    ds = ds.map_batches(RepetitionSignals(text_col=text_col),
                        batch_format="pyarrow")

    def gate(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.greater_equal(batch.column("n_tokens"),
                                     min_tokens),
                    pc.less(batch.column("top2_e6"), max_top2_e6)),
            pc.less(batch.column("dup3_e6"), max_dup3_e6))
        return batch.filter(keep)

    ds = ds.map_batches(gate, batch_format="pyarrow")
    ds = dedup_ops.dup_ngram_positions(ds, text_col, id_col,
                                       n=n, min_docs=2)

    def cover(batch: pa.Table) -> pa.Table:
        # n_dup_pos / n_pos < num / den  <=>  n_dup_pos*den < n_pos*num
        keep = pc.less(
            pc.multiply(batch.column("n_dup_pos"),
                        pa.scalar(dup_cover_den, pa.int64())),
            pc.multiply(batch.column("n_pos"),
                        pa.scalar(dup_cover_num, pa.int64())))
        return batch.filter(keep)

    return ds.map_batches(cover, batch_format="pyarrow")
