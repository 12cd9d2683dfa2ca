"""sliding_window_explode (wse_ray/functions/windows.py): coverage
invariants and parity with a brute-force per-row reference."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from wse_ray.functions.windows import sliding_window_explode

SIZE, HOP = 3_600_000_000, 900_000_000  # 1h / 15min


def _batch(ts_us):
    return pa.table(
        {
            "ts": pa.array(np.asarray(ts_us, np.int64).astype("datetime64[us]")),
            "v": pa.array(np.arange(len(ts_us), dtype=np.int64)),
        }
    )


def test_each_row_in_exactly_size_over_hop_windows():
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 10**12, 500)
    out = sliding_window_explode(_batch(ts), "ts", SIZE, HOP)
    assert len(out) == 500 * 4
    ws = out["window_start"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    t = out["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    assert (ws % HOP == 0).all()
    assert ((t >= ws) & (t < ws + SIZE)).all()  # every window covers its row
    # per original row: 4 DISTINCT window starts
    df = pd.DataFrame({"v": out["v"].to_numpy(zero_copy_only=False), "ws": ws})
    assert (df.groupby("v")["ws"].nunique() == 4).all()


def test_matches_bruteforce_reference():
    ts = np.array([0, 1, HOP - 1, HOP, SIZE, SIZE + 123456], np.int64)
    out = sliding_window_explode(_batch(ts), "ts", SIZE, HOP)
    got = set(
        zip(
            out["v"].to_numpy(zero_copy_only=False).tolist(),
            out["window_start"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64).tolist(),
        )
    )
    want = set()
    for i, t in enumerate(ts):
        ws = t // HOP * HOP
        while ws > t - SIZE:
            want.add((i, ws))
            ws -= HOP
    assert got == want


def test_hop_must_divide_size():
    with pytest.raises(ValueError):
        sliding_window_explode(_batch([0]), "ts", SIZE, 1_000_000_007)


def test_funnel_partial_and_misordered(ray_session, tmp_path):
    """Users stopping at every stage, plus a click BEFORE the first view
    (must not count) and a purchase before the click (must not count)."""
    import duckdb
    import pandas as pd

    from wse_ray.pipelines.relational import q_funnel
    from wse_ray.pipelines.oracles import sql_funnel

    T = pd.Timestamp
    rows = [
        # u1 completes in order
        (1, T("2024-01-01 10:00"), 1, "view"),
        (2, T("2024-01-01 10:05"), 1, "click"),
        (3, T("2024-01-01 10:10"), 1, "purchase"),
        # u2: click before view -> stops at stage 1
        (4, T("2024-01-01 09:00"), 2, "click"),
        (5, T("2024-01-01 10:00"), 2, "view"),
        # u3: purchase before click -> stops at stage 2
        (6, T("2024-01-01 10:00"), 3, "view"),
        (7, T("2024-01-01 10:30"), 3, "purchase"),
        (8, T("2024-01-01 11:00"), 3, "click"),
        # u4: view only
        (9, T("2024-01-01 10:00"), 4, "view"),
        # u5: no view at all -> never enters
        (10, T("2024-01-01 10:00"), 5, "purchase"),
        # u6: second view earlier than click; chain anchors on EARLIEST view
        (11, T("2024-01-01 10:00"), 6, "view"),
        (12, T("2024-01-01 09:00"), 6, "view"),
        (13, T("2024-01-01 09:30"), 6, "click"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["value"] = 0.0
    df["props"] = ""
    p = str(tmp_path)
    df.to_parquet(p + "/events.parquet", index=False)

    got = q_funnel(p)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{p}/events.parquet'")
    want = con.sql(sql_funnel()).df()
    assert list(got["n_users"]) == list(want["n_users"])
    # stage counts: views u1,u2,u3,u4,u6 = 5; clicks-after-view u1,u3,u6 = 3;
    # purchases-after-click u1 = 1
    assert list(got["n_users"]) == [5, 3, 1]
