"""Incremental-extension stress: extend cost must be O(delta), not O(corpus).

Builds a doc-layout index over BASE synthetic docs, extends it with a 10%
DELTA batch, and compares against a from-scratch rebuild of BASE+DELTA:

* wall time: extend ~ cost of building just the delta (ratio reported);
* correctness: stats identical, sample disjunctive/conjunctive results
  identical between the extended and the rebuilt index.

    PYTHONPATH=. python tools/stress_extend.py [--base N] [--delta M]
"""
import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 800_000
DELTA = 80_000
LAYOUT = "doc"
for i, a in enumerate(sys.argv):
    if a == "--base":
        BASE = int(sys.argv[i + 1])
    if a == "--delta":
        DELTA = int(sys.argv[i + 1])
    if a == "--layout":
        LAYOUT = sys.argv[i + 1]

ROOT = "/dev/shm/wse_stress_extend"
PER_FILE = 25_000


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))


def _write_slice(spec: pa.Table) -> pa.Table:
    """One file of the deterministic corpus: doc i's text is a pure
    function of i, so base/delta/full enumerations agree byte-for-byte."""
    lo = int(spec["lo"][0].as_py())
    hi = int(spec["hi"][0].as_py())
    path = spec["path"][0].as_py()
    ids = np.arange(lo, hi, dtype=np.uint64)
    with np.errstate(over="ignore"):
        cell = ids[:, None] * np.uint64(0x9E3779B97F4A7C15) + np.arange(
            40, dtype=np.uint64
        )[None, :]
    toks = _mix64(cell) % np.uint64(49999)
    texts = [" ".join(map(str, row)) for row in toks]
    urls = [f"doc://stress/{i}" for i in range(lo, hi)]
    pq.write_table(
        pa.table({"url": pa.array(urls), "text": pa.array(texts)}),
        path,
        compression="zstd",
    )
    return pa.table({"n": pa.array([hi - lo], pa.int64())})


def write_corpus(out_dir: str, lo: int, hi: int, prefix: str) -> list[str]:
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    specs, paths = [], []
    for k, a in enumerate(range(lo, hi, PER_FILE)):
        b = min(a + PER_FILE, hi)
        p = os.path.join(out_dir, f"corpus-{prefix}{k:05d}.parquet")
        specs.append({"lo": a, "hi": b, "path": p})
        paths.append(p)
    ray.data.from_items(specs).map_batches(
        _write_slice, batch_size=1, batch_format="pyarrow"
    ).to_pandas()
    return paths


def main():
    import ray

    from wse_ray.config import BuildConfig
    from wse_ray.index.build import build_index
    from wse_ray.index.extend import extend_index
    from wse_ray.query.scorer import SearchEngine

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    shutil.rmtree(ROOT, ignore_errors=True)

    base_files = write_corpus(os.path.join(ROOT, "corpus"), 0, BASE, "0")
    delta_files = write_corpus(os.path.join(ROOT, "corpus"), BASE, BASE + DELTA, "1")
    P = max(8, BASE // 100_000)
    cfg = BuildConfig(num_partitions=P, partition_by=LAYOUT)

    t0 = time.perf_counter()
    build_index(base_files + delta_files, os.path.join(ROOT, "full"), cfg)
    t_full = time.perf_counter() - t0

    t0 = time.perf_counter()
    build_index(base_files, os.path.join(ROOT, "inc"), cfg)
    t_base = time.perf_counter() - t0

    t0 = time.perf_counter()
    extend_index(os.path.join(ROOT, "inc"), delta_files)
    t_ext = time.perf_counter() - t0

    e_full = SearchEngine(os.path.join(ROOT, "full"))
    e_inc = SearchEngine(os.path.join(ROOT, "inc"))
    assert e_inc.stats == e_full.stats, (e_inc.stats, e_full.stats)
    rng = np.random.default_rng(7)
    n_q = 0
    for _ in range(20):
        q = " ".join(str(int(x)) for x in rng.integers(0, 49999, size=3))
        for mode in ("disjunctive", "conjunctive"):
            assert e_inc.search(q, mode, 10) == e_full.search(q, mode, 10), (q, mode)
            n_q += 1

    out = {
        "layout": LAYOUT,
        "base_docs": BASE,
        "delta_docs": DELTA,
        "partitions": P,
        "t_full_build_s": round(t_full, 2),
        "t_base_build_s": round(t_base, 2),
        "t_extend_s": round(t_ext, 2),
        "extend_vs_full_ratio": round(t_ext / t_full, 3),
        "delta_fraction": round(DELTA / (BASE + DELTA), 3),
        "queries_verified_identical": n_q,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
