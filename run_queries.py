#!/usr/bin/env python
"""CLI: query a built index — interactive REPL or batch mode.

    python run_queries.py --index DIR                       # REPL
    python run_queries.py --index DIR --query "cat dog" --mode disjunctive
    python run_queries.py --index DIR --queries q.parquet --out results.parquet
        [--snippets bm25 --corpus DIR] [--concurrency 4]

Batch mode runs the queries Dataset through the QueryScorer actor pool
(lexicon + doctable load once per actor — replaces the reference's 158 s
per-process startup, hw3/HW 3.docx §Result).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", help="single query string")
    ap.add_argument("--queries", help="parquet with query_id,query,mode,k")
    ap.add_argument("--mode", default="disjunctive",
                    choices=["disjunctive", "disjunctive_pruned", "conjunctive"])
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--out", help="output parquet for batch results")
    ap.add_argument("--snippets", choices=["linear", "prefix", "bm25", "vector", "keyword", "weight"])
    ap.add_argument("--corpus", help="corpus parquet dir (needed for --snippets)")
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--sharded", action="store_true",
                    help="serve a partition_by='doc' index via scatter-gather shard actors")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            # sandbox runs local; on a real cluster pass WSE_RAY_ADDRESS=auto
            # (ray job submit sets up the cluster connection)
            address=os.environ.get("WSE_RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from wse_ray.query.scorer import QueryScorer, SearchEngine

    if args.queries:  # batch: actor-pool map_batches over the query table
        import ray.data

        qds = ray.data.read_parquet(args.queries)
        res = qds.map_batches(
            QueryScorer,
            fn_constructor_args=(args.index,),
            concurrency=args.concurrency,
            batch_format="pandas",
            batch_size=64,
        )
        if args.out:
            res.write_parquet(args.out)
            print(f"wrote results to {args.out}")
        else:
            print(res.to_pandas().to_string(index=False))
    else:
        if args.sharded:
            from wse_ray.query.sharded import ShardedSearchEngine

            engine = ShardedSearchEngine(args.index)
            engine.url_of = lambda d: ""  # urls live in the shard workers
        else:
            engine = SearchEngine(args.index)

        def answer(q: str) -> None:
            res = engine.search(q, args.mode, args.k)
            import pandas as pd

            df = pd.DataFrame(
                [
                    {"rank": i + 1, "docID": d, "score": round(s, 4),
                     "url": engine.url_of(d)}
                    for i, (d, s) in enumerate(res)
                ]
            )
            if args.snippets and args.corpus:
                from wse_ray.query.snippets_stage import attach_snippets
                from wse_ray.sources.corpus import read_corpus

                df["query"] = q
                df = attach_snippets(
                    df, engine, read_corpus(args.corpus, columns=["text"]),
                    algo=args.snippets,
                )
            print(df.to_string(index=False) if len(df) else "(no results)")

        if args.query:
            answer(args.query)
        else:
            print("wse_ray search — type a query, 'exit' to quit")
            while True:
                try:
                    q = input("query>> ").strip()
                except EOFError:
                    break
                if q in ("exit", "quit", ""):
                    if q == "exit" or q == "quit":
                        break
                    continue
                answer(q)
    ray.shutdown()


if __name__ == "__main__":
    main()
