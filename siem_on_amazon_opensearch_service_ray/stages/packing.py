"""Sequence packing: greedy bin-packing of documents into fixed
token-budget training sequences (the step between tokenized corpus and
batched pretraining samples; cf. T5 / GPT-NeoX packed pretraining).

Ray-Data shape: packing is embarrassingly block-local — global
optimality buys only a fraction of a percent of fill at corpus scale,
so each ``map_batches`` block packs its own docs with first-fit
decreasing and emits one row per packed sequence.  No shuffle, no
driver state; sequence ids are deterministic (min doc_id in the
sequence), so reruns are stable given stable blocks.  Docs longer
than the budget become single-doc sequences flagged ``oversize`` —
the downstream tokenizer/truncation owns how to split them (this
stage never silently drops tokens).

Scale note: fill ratio depends only on doc-length distribution per
block, not block membership, so blocks of >= a few hundred docs pack
within ~1% of a global FFD; the stage is O(n log n) per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .textops import TOKEN_RE


def pack_block(doc_ids: np.ndarray, n_tokens: np.ndarray,
               budget: int) -> list[tuple[list[int], int]]:
    """First-fit-decreasing over one block: returns [(doc_ids,
    total_tokens)] per packed sequence.  Deterministic: ties in the
    length sort break by doc_id."""
    order = np.lexsort((doc_ids, -n_tokens))
    seqs: list[tuple[list[int], int]] = []
    # simple FFD; bins scanned in creation order (first fit)
    for j in order:
        t = int(n_tokens[j])
        d = int(doc_ids[j])
        if t >= budget:
            seqs.append(([d], t))
            continue
        for i, (ids, tot) in enumerate(seqs):
            if tot + t <= budget:
                ids.append(d)
                seqs[i] = (ids, tot + t)
                break
        else:
            seqs.append(([d], t))
    return seqs


def pack_batch(batch: pa.Table, budget: int, text_col: str,
               id_col: str, token_col: str | None) -> pa.Table:
    """Token-count (word regex by default, or a precomputed
    ``token_col``) then block-local FFD packing.  Output: one row per
    packed sequence — seq_id (min doc id), doc_ids (list), n_docs,
    n_tokens, fill_e4, oversize."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    if token_col is not None:
        toks = batch.column(token_col) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        toks = np.array(
            [len(TOKEN_RE.findall((t or "").lower()))
             for t in batch.column(text_col).to_pylist()],
            dtype=np.int64)
    seqs = pack_block(ids.astype(np.int64), toks, budget)
    return pa.table({
        "seq_id": pa.array([min(s[0]) for s in seqs], pa.int64()),
        "doc_ids": pa.array([sorted(s[0]) for s in seqs],
                            pa.list_(pa.int64())),
        "n_docs": pa.array([len(s[0]) for s in seqs], pa.int64()),
        "n_tokens": pa.array([s[1] for s in seqs], pa.int64()),
        "fill_e4": pa.array(
            [min(s[1], budget) * 10000 // budget for s in seqs],
            pa.int64()),
        "oversize": pa.array(
            [int(s[1] > budget) for s in seqs], pa.int64()),
    })


def pack_sequences(ds: rd.Dataset, budget: int, text_col: str = "text",
                   id_col: str = "doc_id", token_col: str | None = None
                   ) -> rd.Dataset:
    # task-mode map_batches (no actor pool): packing is stateless per
    # block, and task mode reserves no CPUs and churns no actors
    if budget <= 0:
        raise ValueError("budget must be positive")

    def fn(batch: pa.Table) -> pa.Table:
        return pack_batch(batch, budget, text_col, id_col, token_col)

    return ds.map_batches(fn, batch_format="pyarrow")
