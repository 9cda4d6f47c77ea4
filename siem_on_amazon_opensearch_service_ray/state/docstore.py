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
    with open(os.path.join(index_dir, "INDEX_MANIFEST.json")) as f:
        p = int(json.load(f)["config"]["num_partitions"])
    by_part: dict[int, list[int]] = {}
    for d in doc_ids:
        by_part.setdefault(d % p, []).append(d)
    tables = []
    for part, ids in sorted(by_part.items()):
        path = os.path.join(index_dir, "docstore", f"part-{part:04d}.parquet")
        if not os.path.exists(path):
            continue
        t = pq.read_table(path, filters=[("doc_id", "in", ids)])
        tables.append(t)
    if not tables:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    out = pa.concat_tables(tables)
    return out.take(pc.sort_indices(out.column("doc_id")))
