"""As-of join skew stress (VERDICT r4 #2): one key holds 50% of a
2M-row event stream.

Measures three paths on identical input:
  1. default asof_join (key-hash partitions — the hot key's whole history
     lands in ONE task; the documented per-key bound),
  2. bucketed asof_join (``bucket_us`` time-range sub-partitioning with
     boundary replication — no single task holds the hot key's history),
  3. single-process ``pandas.merge_asof`` as the row-exact reference.
Asserts both distributed paths equal the reference ROW-EXACTLY, and
reports the max exchange-partition row count for each to show the skew
actually spread.

    PYTHONPATH=. python tools/stress_asof_skew.py [--rows N]
"""
import glob
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 2_000_000  # total (left + right)
KEYS = 50_000
for i, a in enumerate(sys.argv):
    if a == "--rows":
        ROWS = int(sys.argv[i + 1])
SCRATCH = "/dev/shm/wse_stress_asof"
PARTS = 64
BUCKET_US = 3_600_000_000  # 1-hour ranges


def gen():
    rng = np.random.default_rng(42)
    n = ROWS // 2
    # globally unique timestamps (documented tie caveat) over 30 days
    ts = (rng.permutation(ROWS).astype(np.int64) + 1) * (
        30 * 86_400_000_000 // (ROWS + 2)
    )
    lk = rng.integers(1, KEYS, n).astype(np.int64)
    rk = rng.integers(1, KEYS, n).astype(np.int64)
    lk[rng.random(n) < 0.5] = 0  # ONE key takes half of every side
    rk[rng.random(n) < 0.5] = 0
    left = pd.DataFrame(
        {"k": lk, "t": pd.to_datetime(ts[:n], unit="us"),
         "lv": np.arange(n, dtype=np.int64)}
    )
    right = pd.DataFrame(
        {"k": rk, "t": pd.to_datetime(ts[n:], unit="us"),
         "rv": np.arange(n, dtype=np.int64)}
    )
    return left, right


def max_part_rows(xdir: str) -> int:
    worst = 0
    for d in glob.glob(os.path.join(xdir, "jpart=*")):
        rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(d, "*.parquet"))
        )
        worst = max(worst, rows)
    return worst


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main():
    import ray
    import ray.data
    from ray.data import DataContext

    from wse_ray.functions.joins import asof_join

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    left, right = gen()
    n = len(left)
    lds = ray.data.from_pandas(left).repartition(32)
    rds = ray.data.from_pandas(right).repartition(32)

    t0 = time.perf_counter()
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k",
        direction="backward",
    ).sort_values("lv").reset_index(drop=True)
    ref_sec = time.perf_counter() - t0

    out = {"rows_per_side": n, "keys": KEYS, "hot_key_share": 0.5,
           "parts": PARTS, "bucket_us": BUCKET_US,
           "pandas_reference_sec": round(ref_sec, 1)}

    results = {}
    for tag, kwargs in [
        ("default", {}),
        ("bucketed", {"bucket_us": BUCKET_US}),
    ]:
        scr = os.path.join(SCRATCH, tag)
        shutil.rmtree(scr, ignore_errors=True)
        os.makedirs(scr)
        t0 = time.perf_counter()
        got = asof_join(
            lds, rds, by="k", on="t", num_parts=PARTS, scratch_dir=scr,
            **kwargs,
        ).to_pandas()
        sec = time.perf_counter() - t0
        worst = max_part_rows(os.path.join(scr, "left"))
        g = got.sort_values("lv").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            g[list(want.columns)], want, check_dtype=False
        )
        results[tag] = {
            "sec": round(sec, 1),
            "left_rows_per_sec": round(n / sec),
            "max_left_partition_rows": worst,
            "row_exact_vs_merge_asof": True,
            "rss_gb_peak": rss_gb(),
        }
        out[tag] = results[tag]
        shutil.rmtree(scr, ignore_errors=True)
        print(json.dumps(out), flush=True)

    out["hot_key_spread"] = round(
        results["default"]["max_left_partition_rows"]
        / max(1, results["bucketed"]["max_left_partition_rows"]),
        1,
    )
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
