"""2M-event stress for the window/sessionization family.

Round 5 moved the family off Ray Data's in-memory sort-based groupby
(per-group pandas frames) onto the storage-exchange pattern the rest of
the engine uses: hash-partition by user to hive parquet
(``functions.exchange.partition_apply``), one PARTITION-WIDE vectorized
kernel task per partition (``functions/windows.py``).  This tool times
BOTH paths on the same synthetic 2M-event table, cross-checks their
outputs exactly (full-table equality for per-row session assignment;
stage-count equality for the funnel; rollup equality vs a pandas
reference), and reports rows/sec + driver peak RSS.

Synthetic events: EVENTS rows over USERS users, deterministic splitmix
timestamps within a 30-day window, a type column for the funnel chain.

    PYTHONPATH=. python tools/stress_windows_2m.py [--events N] [--users N]
"""
import json
import os
import resource
import shutil
import sys
import tempfile
import time
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVENTS = 2_000_000
USERS = 100_000
for i, a in enumerate(sys.argv):
    if a == "--events":
        EVENTS = int(sys.argv[i + 1])
    if a == "--users":
        USERS = int(sys.argv[i + 1])
CORPUS = f"/dev/shm/wse_stress_events_{EVENTS}"
SCRATCH = "/dev/shm/wse_stress_winx"
GAP_US = 30 * 60 * 1_000_000  # 30-min session gap
TYPES = np.array(["view", "click", "purchase", "error"])
FUNNEL = ["view", "click", "purchase"]
PARTS = 64


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    h = _mix64(ids.astype(np.uint64))
    user = (h % np.uint64(USERS)).astype(np.int64)
    t0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * 86_400 * 1_000_000
    ts = t0 + (_mix64(h) % np.uint64(span)).astype(np.int64)
    # independent mix for the type: user = h % USERS and a plain h % 4 are
    # correlated (USERS ≡ 0 mod 4 -> one type per user, no funnels)
    etype = TYPES[(_mix64(h ^ np.uint64(0xABCDEF)) % np.uint64(4)).astype(np.int64)]
    return pa.table(
        {
            "event_id": pa.array(ids),
            "user_id": pa.array(user),
            "ts": pa.array(ts.view("datetime64[us]")),
            "event_type": pa.array(etype),
        }
    )


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def main():
    import ray
    import ray.data
    from ray.data import DataContext

    from wse_ray.functions.exchange import partition_apply
    from wse_ray.functions.windows import (
        funnel_stage_kernel,
        session_assign_kernel,
        sessionize_rollup_kernel,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    if not os.path.exists(CORPUS + "/_DONE"):
        shutil.rmtree(CORPUS, ignore_errors=True)
        ray.data.range(EVENTS, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow"
        ).write_parquet(CORPUS, compression="zstd")
        open(CORPUS + "/_DONE", "w").write("ok")

    out = {"events": EVENTS, "users": USERS, "parts": PARTS,
           "rss_gb_before": rss_gb()}

    def events_ds():
        return ray.data.read_parquet(CORPUS)

    def timed(fn):
        t0 = time.perf_counter()
        r = fn()
        return r, time.perf_counter() - t0

    def fresh_scratch(tag):
        d = os.path.join(SCRATCH, tag)
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        return d

    # --- session assignment ------------------------------------------------
    # OLD: Ray in-memory groupby + per-group pandas frames
    def assign_old(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0) * 1e6
        sess = (gaps > GAP_US).cumsum()
        return pd.DataFrame(
            {"event_id": g["event_id"], "user_id": g["user_id"],
             "session_idx": sess.astype(np.int64)}
        )

    old_df, old_sec = timed(
        lambda: events_ds()
        .groupby("user_id")
        .map_groups(assign_old, batch_format="pandas")
        .to_pandas()
    )
    assert len(old_df) == EVENTS
    out["session_assignments_old_groupby"] = {
        "sec": round(old_sec, 1), "rows_per_sec": round(EVENTS / old_sec),
        "rss_gb_peak": rss_gb(),
    }

    # NEW: storage exchange + partition-wide kernel
    kern = partial(session_assign_kernel, key_col="user_id", ts_col="ts",
                   id_col="event_id", gap_us=GAP_US)
    scr = fresh_scratch("assign")
    new_df, new_sec = timed(
        lambda: partition_apply(
            events_ds(), "user_id", kern, num_parts=PARTS, scratch_dir=scr
        ).to_pandas()
    )
    shutil.rmtree(scr, ignore_errors=True)
    assert len(new_df) == EVENTS
    out["session_assignments_exchange"] = {
        "sec": round(new_sec, 1), "rows_per_sec": round(EVENTS / new_sec),
        "rss_gb_peak": rss_gb(),
        "speedup_vs_old": round(old_sec / new_sec, 2),
    }
    # FULL-table equality old vs new
    a = old_df.sort_values("event_id").reset_index(drop=True)
    b = new_df.sort_values("event_id").reset_index(drop=True).astype(a.dtypes)
    pd.testing.assert_frame_equal(a, b[a.columns])
    del a, b, old_df, new_df
    print(json.dumps(out), flush=True)

    # --- per-user rollup (sessionize) --------------------------------------
    rkern = partial(sessionize_rollup_kernel, key_col="user_id", ts_col="ts",
                    id_col="event_id", gap_us=GAP_US)
    scr = fresh_scratch("rollup")
    roll, roll_sec = timed(
        lambda: partition_apply(
            events_ds(), "user_id", rkern, num_parts=PARTS, scratch_dir=scr
        ).to_pandas()
    )
    shutil.rmtree(scr, ignore_errors=True)
    out["sessionize_exchange"] = {
        "sec": round(roll_sec, 1), "rows_per_sec": round(EVENTS / roll_sec),
        "users": len(roll), "rss_gb_peak": rss_gb(),
    }
    # reference: exact pandas rollup over the full table
    full = pd.read_parquet(CORPUS)
    f = full.sort_values(["user_id", "ts", "event_id"])
    gaps = (f["ts"].diff().dt.total_seconds() * 1e6 > GAP_US) & (
        f["user_id"].diff() == 0
    )
    ref = (
        f.assign(new_sess=gaps)
        .groupby("user_id")
        .agg(n_events=("ts", "size"), n_sessions=("new_sess", "sum"))
        .reset_index()
    )
    ref["n_sessions"] = ref["n_sessions"].astype(np.int64) + 1
    got = roll.sort_values("user_id").reset_index(drop=True).astype(
        {"user_id": np.int64, "n_events": np.int64, "n_sessions": np.int64}
    )
    pd.testing.assert_frame_equal(got, ref.astype(got.dtypes)[got.columns])
    print(json.dumps(out), flush=True)

    # --- strict view->click->purchase funnel -------------------------------
    def chain_old(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        stage = 0
        for t in g["event_type"]:
            if stage == 0 and t == "view":
                stage = 1
            elif stage == 1 and t == "click":
                stage = 2
            elif stage == 2 and t == "purchase":
                stage = 3
                break
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "stage": [stage]})

    old_stages, old_fsec = timed(
        lambda: events_ds()
        .groupby("user_id")
        .map_groups(chain_old, batch_format="pandas")
        .to_pandas()
    )
    old_counts = [int((old_stages["stage"] >= s).sum()) for s in (1, 2, 3)]
    out["funnel_old_groupby"] = {
        "sec": round(old_fsec, 1), "rows_per_sec": round(EVENTS / old_fsec),
        "stage_counts": old_counts, "rss_gb_peak": rss_gb(),
    }

    fkern = partial(funnel_stage_kernel, key_col="user_id", ts_col="ts",
                    type_col="event_type", stages=FUNNEL)
    scr = fresh_scratch("funnel")
    fun, new_fsec = timed(
        lambda: partition_apply(
            events_ds(), "user_id", fkern, num_parts=PARTS, scratch_dir=scr
        ).to_pandas()
    )
    shutil.rmtree(scr, ignore_errors=True)
    new_counts = (
        fun.groupby("stage")["n_users_p"].sum().sort_index().tolist()
    )
    out["funnel_exchange"] = {
        "sec": round(new_fsec, 1), "rows_per_sec": round(EVENTS / new_fsec),
        "stage_counts": new_counts, "rss_gb_peak": rss_gb(),
        "speedup_vs_old": round(old_fsec / new_fsec, 2),
    }
    assert new_counts == old_counts, (new_counts, old_counts)
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
