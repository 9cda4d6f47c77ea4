"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25
WAND query set over the sf0.001 documents corpus); ``queries()`` /
``oracle_sql()`` expose the operator registry checked against DuckDB
at sf0.01 (see siem_on_amazon_opensearch_service_ray/pipelines/queries.py).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` happens here or in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents in the
    scale-default DOC-partitioned layout (every shard a complete
    mini-index; per-shard scoring with global df — search() auto-routes),
    run a representative query set through the searcher, return the
    hits as a DataFrame (query, rank, doc_id, score_e4)."""
    import pandas as pd

    from siem_on_amazon_opensearch_service_ray.pipelines.queries import (
        _doc_sharded_index)
    from siem_on_amazon_opensearch_service_ray.state.searcher import Searcher

    idx = _doc_sharded_index(SF0001)
    searcher = Searcher(idx, use_actors=True)
    try:
        rows = []
        for q in ["spark join", "window", "hash merge sort", "customer",
                  "vector batch"]:
            for rank, (score, doc_id) in enumerate(
                    searcher.search(q, field="content", k=10, method="wand")):
                rows.append((q, rank, doc_id, round(score * 10000)))
    finally:
        searcher.close()
    return pd.DataFrame(rows, columns=["query", "rank", "doc_id", "score_e4"])


def queries() -> dict[str, Callable[[str], Any]]:
    from siem_on_amazon_opensearch_service_ray.pipelines import queries as q
    return q.queries()


def oracle_sql() -> dict[str, str]:
    from siem_on_amazon_opensearch_service_ray.pipelines import queries as q
    return q.oracle_sql()
