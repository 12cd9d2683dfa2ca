"""Big-big partitioned-join stress: fact ⋈ dim at millions of rows with a
planted hot key, on tmpfs.

Fact table: FACT_ROWS rows, key uniform over DIM_ROWS distinct keys EXCEPT
a planted hot key owning HOT_FRAC of all fact rows (the realistic skew
case: one viral entity).  Dim table: DIM_ROWS rows, unique keys, plus
SALT-relevant hot rows.  Runs the join twice — unsalted and with the hot
key salted — and reports wall time, joined-row throughput, and driver
peak RSS (must stay flat: the joined rows stream through a partial
aggregate, never materializing).

    PYTHONPATH=. python tools/stress_join.py [--fact N] [--dim N]
"""
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACT_ROWS = 8_000_000
DIM_ROWS = 1_000_000
for i, a in enumerate(sys.argv):
    if a == "--fact":
        FACT_ROWS = int(sys.argv[i + 1])
    if a == "--dim":
        DIM_ROWS = int(sys.argv[i + 1])
HOT_KEY = 42
HOT_FRAC = 0.10  # 10% of fact rows carry the hot key
SCRATCH = "/dev/shm/wse_stress_join"


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))


def gen_fact(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    h = _mix64(ids.astype(np.uint64))
    key = (h % np.uint64(DIM_ROWS)).astype(np.int64)
    hot = (h % np.uint64(1000)) < np.uint64(int(HOT_FRAC * 1000))
    key[hot] = HOT_KEY
    val = (h % np.uint64(10_000)).astype(np.float64) / 100.0
    return pa.table(
        {"k": pa.array(key), "amount": pa.array(val)}
    )


def gen_dim(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    grp = (ids % 5).astype(np.int64)
    return pa.table({"dk": pa.array(ids), "grp": pa.array(grp)})


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def run_join(fact_dir, dim_dir, hot_keys, auto_split=True):
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Count, Sum

    from wse_ray.functions.joins import partitioned_join

    fact = ray.data.read_parquet(fact_dir)
    dim = ray.data.read_parquet(dim_dir)
    scratch = os.path.join(SCRATCH, "jscr")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    t0 = time.perf_counter()
    joined = partitioned_join(
        fact, dim, on="k", right_on="dk", how="inner", num_parts=64,
        scratch_dir=scratch, hot_keys=hot_keys, salt=16,
        auto_split=auto_split,
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"grp": t["grp"], "amount": t["amount"]})

    agg = (
        joined.map_batches(prep, batch_format="pyarrow")
        .groupby("grp")
        .aggregate(Sum("amount", alias_name="total"), Count(alias_name="n"))
        .to_pandas()
    )
    sec = time.perf_counter() - t0
    shutil.rmtree(scratch, ignore_errors=True)
    n_joined = int(agg["n"].sum())
    return {
        "sec": round(sec, 1),
        "joined_rows": n_joined,
        "joined_rows_per_sec": round(n_joined / sec),
        "groups": len(agg),
        "rss_gb_peak": rss_gb(),
    }


def main():
    import ray
    import ray.data
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    fact_dir = os.path.join(SCRATCH, f"fact_{FACT_ROWS}")
    dim_dir = os.path.join(SCRATCH, f"dim_{DIM_ROWS}")
    if not os.path.exists(fact_dir + "/_DONE"):
        shutil.rmtree(fact_dir, ignore_errors=True)
        ray.data.range(FACT_ROWS, override_num_blocks=64).map_batches(
            gen_fact, batch_format="pyarrow"
        ).write_parquet(fact_dir, compression="zstd")
        open(fact_dir + "/_DONE", "w").write("ok")
    if not os.path.exists(dim_dir + "/_DONE"):
        shutil.rmtree(dim_dir, ignore_errors=True)
        ray.data.range(DIM_ROWS, override_num_blocks=16).map_batches(
            gen_dim, batch_format="pyarrow"
        ).write_parquet(dim_dir, compression="zstd")
        open(dim_dir + "/_DONE", "w").write("ok")

    out = {"fact_rows": FACT_ROWS, "dim_rows": DIM_ROWS,
           "hot_frac": HOT_FRAC, "rss_gb_before": rss_gb()}
    out["no_skew_handling"] = run_join(
        fact_dir, dim_dir, hot_keys=None, auto_split=False
    )
    print(json.dumps(out), flush=True)
    # the default path: skew detected from exchange file sizes, hot
    # partition striped at join time — no caller knob
    out["auto_split"] = run_join(fact_dir, dim_dir, hot_keys=None)
    assert out["auto_split"]["joined_rows"] == out["no_skew_handling"]["joined_rows"]
    print(json.dumps(out), flush=True)
    out["salted_hot_key"] = run_join(fact_dir, dim_dir, hot_keys=[HOT_KEY])
    assert out["salted_hot_key"]["joined_rows"] == out["no_skew_handling"]["joined_rows"]
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
