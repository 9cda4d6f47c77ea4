"""Docstore access: fetch document metadata by id.

The docstore is range-partitioned by ``doc_id % P`` (one parquet per
range — pipelines.build_index PASS B sentinel groups), so a fetch
reads only the partitions its ids map to, with a parquet ``IN``
filter pushed to the read.  This is the engine's ``_source`` fetch
(the reference delegates it to OpenSearch's doc values / stored
fields)."""

from __future__ import annotations

import json
import os

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pyarrow as pa


def fetch_docs(index_dir: str, doc_ids: list[int]) -> pa.Table:
    from .shard import load_tombstones
    with open(os.path.join(index_dir, "INDEX_MANIFEST.json")) as f:
        p = int(json.load(f)["config"]["num_partitions"])
    tombs = load_tombstones(index_dir)
    if tombs.size:
        import numpy as _np
        doc_ids = [d for d in doc_ids
                   if not _np.isin(_np.uint64(d), tombs)]
    by_part: dict[int, list[int]] = {}
    for d in doc_ids:
        by_part.setdefault(d % p, []).append(d)
    store = os.path.join(index_dir, "docstore")
    names = sorted(os.listdir(store)) if os.path.isdir(store) else []
    tables = []
    for part, ids in sorted(by_part.items()):
        prefix = f"part-{part:04d}"
        # base file plus any extend_index generation files for the part
        for fn in names:
            if (fn.endswith(".parquet") and fn.startswith(prefix)
                    and fn[len(prefix)] in ".-"):
                t = pq.read_table(os.path.join(store, fn),
                                  filters=[("doc_id", "in", ids)])
                tables.append(t)
    if not tables:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    out = pa.concat_tables(tables)
    return out.take(pc.sort_indices(out.column("doc_id")))
