"""CLI: the engine's local batch entry point (reference parity:
``python index.py -b bucket -l list`` local backfill,
reference index.py:756-795 — embarrassingly parallel over files with
file-granularity retry; here Ray Data supplies the parallelism and the
per-partition manifests supply the resume).

Usage:
  python -m siem_on_amazon_opensearch_service_ray build  <corpus_dir> <index_dir> [--partitions P] [--no-salting] [--no-resume]
  python -m siem_on_amazon_opensearch_service_ray search <index_dir> <query> [--k K] [--mode or|and] [--field F] [--fetch]
  python -m siem_on_amazon_opensearch_service_ray stats  <index_dir>
  python -m siem_on_amazon_opensearch_service_ray extend  <corpus_dir> <index_dir>
  python -m siem_on_amazon_opensearch_service_ray compact <index_dir>
  python -m siem_on_amazon_opensearch_service_ray delete  <index_dir> <doc_id> [...]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="siem_on_amazon_opensearch_service_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("corpus_dir")
    b.add_argument("index_dir")
    b.add_argument("--partitions", type=int, default=16)
    b.add_argument("--no-salting", action="store_true")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--num-cpus", type=int, default=None)

    s = sub.add_parser("search")
    s.add_argument("index_dir")
    s.add_argument("query")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--mode", default="or", choices=["or", "and"])
    s.add_argument("--field", default="content")
    s.add_argument("--fetch", action="store_true",
                   help="fetch docstore metadata for the hits")
    s.add_argument("--num-cpus", type=int, default=None)

    st = sub.add_parser("stats")
    st.add_argument("index_dir")

    e = sub.add_parser("extend")
    e.add_argument("corpus_dir")
    e.add_argument("index_dir")
    e.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser("compact")
    c.add_argument("index_dir")
    c.add_argument("--num-cpus", type=int, default=None)

    d = sub.add_parser("delete")
    d.add_argument("index_dir")
    d.add_argument("doc_ids", nargs="+", type=int)

    args = ap.parse_args(argv)

    if args.cmd == "stats":
        from .state.stats import build_summary
        print(json.dumps(build_summary(args.index_dir), indent=2))
        return 0

    if args.cmd == "delete":
        from .pipelines.build_index import delete_docs
        n = delete_docs(args.index_dir, args.doc_ids)
        print(json.dumps({"tombstones": n}))
        return 0

    import ray
    if not ray.is_initialized():
        kw = {"num_cpus": args.num_cpus} if args.num_cpus else {}
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR", **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "build":
            from .pipelines.build_index import IndexConfig, build_index
            cfg = IndexConfig(num_partitions=args.partitions,
                              salting=not args.no_salting)
            man = build_index(args.corpus_dir, args.index_dir, cfg,
                              resume=not args.no_resume)
            print(json.dumps({"n_docs": man["stats"]["n_docs"],
                              "metrics": man["metrics"],
                              "fingerprint": man["fingerprint"]}, indent=2))
        elif args.cmd == "extend":
            from .pipelines.build_index import extend_index
            man = extend_index(args.corpus_dir, args.index_dir)
            print(json.dumps({"n_docs": man["stats"]["n_docs"],
                              "generations": list(man.get("generations", {}))},
                             indent=2))
        elif args.cmd == "compact":
            from .pipelines.build_index import compact_index
            man = compact_index(args.index_dir)
            print(json.dumps({"n_docs": man["stats"]["n_docs"],
                              "fingerprint": man["fingerprint"]}, indent=2))
        elif args.cmd == "search":
            from .state.searcher import Searcher
            searcher = Searcher(args.index_dir, use_actors=True)
            try:
                hits = searcher.search(args.query, field=args.field,
                                       k=args.k, mode=args.mode)
                out = [{"rank": i, "doc_id": d, "score": round(sc, 4)}
                       for i, (sc, d) in enumerate(hits)]
                if args.fetch and hits:
                    from .state.docstore import fetch_docs
                    meta = fetch_docs(args.index_dir,
                                      [d for _, d in hits]).to_pylist()
                    by_id = {m["doc_id"]: m for m in meta}
                    for o in out:
                        o["doc"] = {k: v for k, v in
                                    by_id.get(o["doc_id"], {}).items()
                                    if k != "doc_id"}
                print(json.dumps(out, indent=2))
            finally:
                searcher.close()
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
