"""Document preparation: stable doc id + content hash invariant.

Mirrors the reference's doc-id assignment (reference:
siem/__init__.py:603-615,683-706 — configured id field when present,
else MD5 of the raw message) with a stronger, content-addressed scheme
required by BASELINE.json: ``doc_id`` is either an explicit int64 id
column or a stable 63-bit integer derived from sha256 of the configured
key columns, and ``content_sha256`` is carried through the pipeline as
the per-row end-to-end invariant.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _doc_id_from_key(parts: tuple[str, ...]) -> int:
    h = hashlib.sha256("\x00".join(parts).encode()).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def compute_doc_ids(batch: pa.Table, id_cols: tuple[str, ...],
                    doc_id_col: str | None = None) -> np.ndarray:
    """Explicit id column (reference: configured ``doc_id`` field,
    aws.ini:136-151) or hash of the key columns (reference: md5 path)."""
    if doc_id_col is not None:
        return batch.column(doc_id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    cols = [batch.column(c).to_pylist() for c in id_cols]
    return np.fromiter((_doc_id_from_key(tuple(map(str, row)))
                        for row in zip(*cols)),
                       dtype=np.int64, count=batch.num_rows)


def content_shas(batch: pa.Table, sha_col: str) -> list[str]:
    return [hashlib.sha256(v.as_py().encode()).hexdigest()
            for v in batch.column(sha_col)]


def add_ids_and_sha(batch: pa.Table, id_cols: tuple[str, ...],
                    sha_col: str, doc_id_col: str | None = None) -> pa.Table:
    """map_batches(batch_format='pyarrow'): add ``doc_id`` (int64) and
    ``content_sha256`` (string)."""
    ids = compute_doc_ids(batch, id_cols, doc_id_col)
    out = batch
    if doc_id_col != "doc_id":
        out = out.append_column("doc_id", pa.array(ids, pa.int64()))
    return out.append_column("content_sha256",
                             pa.array(content_shas(batch, sha_col), pa.string()))


def prepare_docs(batch: pa.Table) -> pa.Table:
    """Corpus-schema specialization (repo, path, commit, lang, content)."""
    return add_ids_and_sha(batch, ("repo", "path", "commit"), "content")


def doc_ids_for(repo: list, path: list, commit: list) -> np.ndarray:
    return np.fromiter(
        (_doc_id_from_key((r, p, c)) for r, p, c in zip(repo, path, commit)),
        dtype=np.int64, count=len(repo))


def dedup_batch_first_wins(batch: pa.Table, key: str = "doc_id") -> pa.Table:
    """Within-batch exact dedup, first-wins in canonical (key) order.
    Cross-batch dedup is the pipeline-level groupby(key) — see
    pipelines.build_index (reference parity: the AOSS docid_set,
    index.py:332-336, and OpenSearch _id upsert semantics)."""
    keys = batch.column(key).to_numpy(zero_copy_only=False)
    _, first_idx = np.unique(keys, return_index=True)
    return batch.take(np.sort(first_idx))
