#!/usr/bin/env python
"""CLI: build a partitioned inverted index from a web-page parquet corpus.

    python build_index.py --corpus DIR --out DIR [--partitions 32]
        [--from-html] [--tokenizer trec|simple] [--num-cpus N]

    # ingest a new crawl batch into an EXISTING index (wse_ray/index/extend.py):
    python build_index.py --corpus NEW_DIR --out DIR --extend
        [--refresh-bounds]

Designed for ``ray job submit`` on a cluster (out dir must be shared
storage); runs standalone locally.  Resumable: re-running skips completed
phases and partitions; an interrupted --extend resumes when re-run with
the same corpus.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True, help="parquet file/dir of web pages")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--heavy-threshold", type=int, default=None)
    ap.add_argument("--heavy-subparts", type=int, default=4)
    ap.add_argument("--from-html", action="store_true",
                    help="re-extract text from the html column")
    ap.add_argument("--tokenizer", choices=["trec", "simple"], default="trec")
    ap.add_argument("--extend", action="store_true",
                    help="ingest --corpus as a new generation of the "
                         "existing index at --out instead of building")
    ap.add_argument("--refresh-bounds", action="store_true",
                    help="after a doc-layout extension: re-encode all "
                         "partitions so MaxScore pruning is exact again")
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

    from wse_ray.config import BuildConfig
    from wse_ray.index.build import build_index

    if args.extend:
        from wse_ray.index.extend import extend_index, refresh_bounds

        manifest = extend_index(args.out, args.corpus)
        if args.refresh_bounds:
            refresh_bounds(args.out)
        print(json.dumps(manifest, indent=1))
        ray.shutdown()
        return

    manifest = build_index(
        args.corpus,
        args.out,
        BuildConfig(
            num_partitions=args.partitions,
            heavy_df_threshold=args.heavy_threshold,
            heavy_subparts=args.heavy_subparts,
            tokenizer_mode=args.tokenizer,
        ),
        from_html=args.from_html,
    )
    print(json.dumps(manifest, indent=1))
    ray.shutdown()


if __name__ == "__main__":
    main()
