"""Query latency vs extension-generation count (VERDICT r4 #4).

Term-layout extensions are O(delta) because each generation appends new
partition segments; the price is one extra (seek + decode) per queried
term per generation.  This tool measures that price: build a base index,
extend it GENS times, snapshot BM25 query p50/p95 at generation counts
1, 2, 4, 8, ..., then run ``consolidate_generations`` and measure again
— the numbers behind the ``max_generations`` auto-compaction knob
(BASELINE.md table).

    PYTHONPATH=. python tools/stress_generations.py [--base N] [--delta N] [--gens N]
"""
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 400_000
DELTA = 5_000
GENS = 16
for i, a in enumerate(sys.argv):
    if a == "--base":
        BASE = int(sys.argv[i + 1])
    if a == "--delta":
        DELTA = int(sys.argv[i + 1])
    if a == "--gens":
        GENS = int(sys.argv[i + 1])
ROOT = "/dev/shm/wse_stress_gens"
SNAP_AT = {1, 2, 4, 8, 16, 32}


def _latency(idx: str, reps: int = 3) -> dict:
    from wse_ray.fixtures import make_queries
    from wse_ray.query.scorer import SearchEngine

    eng = SearchEngine(idx)
    qs = make_queries()
    times = []
    for _ in range(reps):
        for q in qs:
            t0 = time.perf_counter()
            eng.search(q["query"], q["mode"], q["k"])
            times.append(time.perf_counter() - t0)
    a = np.asarray(times) * 1000.0
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p95_ms": round(float(np.percentile(a, 95)), 2),
    }


def main():
    import ray
    from ray.data import DataContext

    from wse_ray.config import BuildConfig
    from wse_ray.fixtures import write_corpus_parquet
    from wse_ray.index.build import build_index
    from wse_ray.index.extend import consolidate_generations, extend_index

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    corpus = os.path.join(ROOT, f"corpus_{BASE}_{DELTA}_{GENS}")
    if not os.path.exists(corpus + "/_DONE"):
        shutil.rmtree(corpus, ignore_errors=True)
        # file size == DELTA so each generation ingests exactly one file
        write_corpus_parquet(
            corpus, BASE + DELTA * GENS, n_files=(BASE + DELTA * GENS) // DELTA
        )
        open(corpus + "/_DONE", "w").write("ok")
    files = sorted(
        os.path.join(corpus, p)
        for p in os.listdir(corpus)
        if p.endswith(".parquet")
    )
    # base = first files summing to ~BASE docs; each remaining slice = 1 gen
    import pyarrow.parquet as pq

    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    acc, base_n = 0, 0
    for base_n, c in enumerate(counts):
        if acc >= BASE:
            break
        acc += c
    base_files, rest = files[:base_n], files[base_n:]
    per_gen = max(1, len(rest) // GENS)

    idx = os.path.join(ROOT, "idx")
    shutil.rmtree(idx, ignore_errors=True)
    cfg = BuildConfig(num_partitions=32)
    t0 = time.perf_counter()
    build_index(base_files, idx, cfg)
    out = {
        "base_docs": acc, "delta_docs_per_gen": DELTA, "gens": GENS,
        "base_build_sec": round(time.perf_counter() - t0, 1),
        "latency_by_generations": {"0": _latency(idx)},
    }
    print(json.dumps(out), flush=True)

    g = 0
    for i in range(0, len(rest), per_gen):
        batch = rest[i:i + per_gen]
        if not batch:
            break
        g += 1
        t0 = time.perf_counter()
        extend_index(idx, batch)
        if g in SNAP_AT or g == GENS:
            out["latency_by_generations"][str(g)] = dict(
                _latency(idx), extend_sec=round(time.perf_counter() - t0, 1)
            )
            print(json.dumps(out), flush=True)
        if g >= GENS:
            break

    # drift control: re-measure the fragmented state right before
    # consolidating, so fragmented-vs-consolidated is same-window
    out["latency_final_fragmented"] = _latency(idx)
    t0 = time.perf_counter()
    manifest = consolidate_generations(idx)
    out["consolidate_sec"] = round(time.perf_counter() - t0, 1)
    out["generations_after_consolidate"] = len(manifest["extensions"])
    out["latency_after_consolidate"] = _latency(idx)
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
