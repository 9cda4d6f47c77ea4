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


def duplicated_line_census(ds: rd.Dataset, text_col: str = "text",
                           min_docs: int = 2) -> rd.Dataset:
    """Cross-document duplicated LINE census — the discovery half of
    boilerplate stripping (license headers, generated-file banners,
    copy-pasted footers: the lines a code-corpus curation pass removes
    before training).  Same additive-partial shape as the n-gram
    census: per block, one row per distinct line with the number of
    block-local docs containing it; ``groupby(line).sum`` is exact
    because each doc lives in exactly one block row.  Returns
    Dataset[(line, n_docs)] filtered to ``n_docs >= min_docs``."""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        nd: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            for line in set((t or "").split("\n")):
                nd[line] += 1
        lines = sorted(nd)
        return pa.table({
            "line": pa.array(lines, pa.string()),
            "n_docs": pa.array([nd[x] for x in lines], pa.int64()),
        })

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("line")
             .aggregate(Sum("n_docs", alias_name="n_docs")))
    return out.filter(expr=f"n_docs >= {int(min_docs)}")


def strip_boilerplate_lines(ds: rd.Dataset, text_col: str = "text",
                            min_docs: int = 2,
                            out_col: str = "cleaned") -> rd.Dataset:
    """Remove every line that appears in >= ``min_docs`` distinct docs
    (exact boilerplate strip): census -> broadcast the surviving
    duplicated-line set once -> stream the corpus through a task-mode
    map that rebuilds each doc from its kept lines (original order,
    ``\\n``-joined).  Appends ``out_col`` plus ``n_lines`` /
    ``n_removed``.  At 100 TB the broadcast set becomes a hash/bloom
    filter or a hash-partitioned (line_hash, doc, position) join —
    same trade-off as the n-gram variant, documented there."""
    import ray

    dup = duplicated_line_census(ds, text_col, min_docs)
    dup_set = frozenset(
        r["line"] for r in dup.select_columns(["line"]).take_all())
    ref = ray.put(dup_set)

    def strip(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        cleaned, n_lines, n_removed = [], [], []
        for t in batch.column(text_col).to_pylist():
            lines = (t or "").split("\n")
            kept = [x for x in lines if x not in s]
            cleaned.append("\n".join(kept))
            n_lines.append(len(lines))
            n_removed.append(len(lines) - len(kept))
        return (batch
                .append_column(out_col, pa.array(cleaned, pa.string()))
                .append_column("n_lines", pa.array(n_lines, pa.int64()))
                .append_column("n_removed",
                               pa.array(n_removed, pa.int64())))

    return ds.map_batches(strip, batch_format="pyarrow")
