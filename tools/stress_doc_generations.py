"""Doc-layout shard fragmentation vs consolidation (round-5 follow-on).

Repeated doc-layout extensions add one small shard group per generation;
the sharded engine then fans every query out to more actors.  This tool
measures that tax and the `consolidate_generations` fix: build a base,
extend GENS times with small deltas, measure scatter-gather p50/p95,
consolidate, measure again (same window).

    PYTHONPATH=. python tools/stress_doc_generations.py [--base N] [--delta N] [--gens N]
"""
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 200_000
DELTA = 5_000
GENS = 8
for i, a in enumerate(sys.argv):
    if a == "--base":
        BASE = int(sys.argv[i + 1])
    if a == "--delta":
        DELTA = int(sys.argv[i + 1])
    if a == "--gens":
        GENS = int(sys.argv[i + 1])
ROOT = "/dev/shm/wse_stress_doc_gens"


def main():
    import ray
    from ray.data import DataContext

    from wse_ray.config import BuildConfig
    from wse_ray.fixtures import make_queries, write_corpus_parquet
    from wse_ray.index.build import build_index
    from wse_ray.index.extend import consolidate_generations, extend_index
    from wse_ray.query.sharded import ShardedSearchEngine

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    shutil.rmtree(ROOT, ignore_errors=True)
    corpus = os.path.join(ROOT, "corpus")
    n_files = (BASE + DELTA * GENS) // DELTA
    paths = write_corpus_parquet(corpus, BASE + DELTA * GENS, n_files=n_files)
    base_files = BASE // DELTA
    idx = os.path.join(ROOT, "idx")
    t0 = time.perf_counter()
    build_index(
        paths[:base_files], idx,
        BuildConfig(num_partitions=8, partition_by="doc"),
    )
    out = {"base_docs": BASE, "delta_docs_per_gen": DELTA, "gens": GENS,
           "base_build_sec": round(time.perf_counter() - t0, 1)}
    for i in range(base_files, base_files + GENS):
        extend_index(idx, [paths[i]])

    def lat():
        eng = ShardedSearchEngine(idx)
        eng.search("warmup", "disjunctive", 10)
        qs = make_queries()
        times = []
        for _ in range(3):
            for q in qs:
                t0 = time.perf_counter()
                eng.search(q["query"], q["mode"], q["k"])
                times.append(time.perf_counter() - t0)
        a = np.asarray(times) * 1000.0
        return {
            "p50_ms": round(float(np.percentile(a, 50)), 2),
            "p95_ms": round(float(np.percentile(a, 95)), 2),
            "shards": len(eng.doc_ranges),
        }

    out["fragmented"] = lat()
    print(json.dumps(out), flush=True)
    t0 = time.perf_counter()
    m = consolidate_generations(idx)
    out["consolidate_sec"] = round(time.perf_counter() - t0, 1)
    out["merged_parts"] = len(m["extensions"][0]["parts"])
    out["consolidated"] = lat()
    print(json.dumps(out), flush=True)
    shutil.rmtree(ROOT, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
