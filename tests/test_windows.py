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


# --------------------------------------------------------------------------
# r5 partition-wide kernels (storage-exchange path) vs pandas references
# --------------------------------------------------------------------------

GAP = 30 * 60 * 1_000_000


def _events(n=3000, users=37, seed=11):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 5 * 86_400_000_000, n)
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(rng.integers(0, users, n).astype(np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "event_type": pa.array(
                np.array(["view", "click", "purchase", "error"])[
                    rng.integers(0, 4, n)
                ]
            ),
        }
    )


def test_session_assign_kernel_matches_pandas():
    from wse_ray.functions.windows import session_assign_kernel

    t = _events()
    got = (
        session_assign_kernel(t, "user_id", "ts", "event_id", GAP)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()

    def assign(g):
        g = g.sort_values(["ts", "event_id"])
        gaps = (g["ts"].diff() > pd.Timedelta(minutes=30)).cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "user_id": g["user_id"].to_numpy(np.int64),
                "session_idx": gaps.to_numpy(np.int64),
            }
        )

    want = (
        df.groupby("user_id", group_keys=False)[df.columns]
        .apply(assign)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_sessionize_rollup_kernel_matches_pandas():
    from wse_ray.functions.windows import sessionize_rollup_kernel

    t = _events(seed=13)
    got = (
        sessionize_rollup_kernel(t, "user_id", "ts", "event_id", GAP)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = t.to_pandas()

    def roll(g):
        g = g.sort_values(["ts", "event_id"])
        return pd.Series(
            {
                "n_events": len(g),
                "n_sessions": int(1 + (g["ts"].diff() > pd.Timedelta(minutes=30)).sum()),
            }
        )

    want = (
        df.groupby("user_id").apply(roll, include_groups=False).reset_index()
    ).astype({"user_id": np.int64, "n_events": np.int64, "n_sessions": np.int64})
    pd.testing.assert_frame_equal(got, want[got.columns])


def test_funnel_stage_kernel_matches_loop_reference():
    from wse_ray.functions.windows import funnel_stage_kernel

    stages = ["view", "click", "purchase"]
    t = _events(seed=17)
    got = funnel_stage_kernel(t, "user_id", "ts", "event_type", stages)
    df = t.to_pandas()

    def chain(g):
        stage, cutoff = 0, pd.Timestamp.min
        for ev in stages:
            ts = g.loc[(g["event_type"] == ev) & (g["ts"] > cutoff), "ts"]
            if ts.empty:
                break
            stage += 1
            cutoff = ts.min()
        return stage
    per_user = df.groupby("user_id").apply(chain, include_groups=False)
    want = [int((per_user >= s).sum()) for s in (1, 2, 3)]
    assert got["n_users_p"].to_pylist() == want


def test_kernels_empty_partition_schema_stable():
    from wse_ray.functions.windows import (
        funnel_stage_kernel,
        session_assign_kernel,
        sessionize_rollup_kernel,
    )

    empty = _events().slice(0, 0)
    a = session_assign_kernel(empty, "user_id", "ts", "event_id", GAP)
    b = sessionize_rollup_kernel(empty, "user_id", "ts", "event_id", GAP)
    c = funnel_stage_kernel(empty, "user_id", "ts", "event_type", ["view", "click"])
    assert a.num_rows == 0 and a.column_names == ["event_id", "user_id", "session_idx"]
    assert b.num_rows == 0 and b.column_names == ["user_id", "n_events", "n_sessions"]
    assert c.num_rows == 2 and c["n_users_p"].to_pylist() == [0, 0]


def test_hop_partials_explode_equals_raw_explode_aggregate():
    """The decomposable shortcut (hop partials -> explode partials) must
    equal the raw explode -> groupby aggregate, exactly."""
    from wse_ray.functions.windows import explode_hops_to_windows, hop_partials

    rng = np.random.default_rng(23)
    n = 4000
    t = pa.table(
        {
            "ts": pa.array(
                rng.integers(0, 3 * 86_400_000_000, n).astype("datetime64[us]")
            ),
            "event_type": pa.array(
                np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
            ),
            "value": pa.array(rng.normal(size=n)),
        }
    )
    part = hop_partials(t, "ts", ["event_type"], "value", HOP)
    got = (
        explode_hops_to_windows(part, SIZE, HOP)
        .to_pandas()
        .groupby(["event_type", "window_start"], as_index=False)
        .agg(n=("n_p", "sum"), s=("sum_p", "sum"))
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    raw = sliding_window_explode(t, "ts", SIZE, HOP).to_pandas()
    want = (
        raw.groupby(["event_type", "window_start"], as_index=False)
        .agg(n=("value", "size"), s=("value", "sum"))
        .sort_values(["event_type", "window_start"])
        .reset_index(drop=True)
    )
    want["n"] = want["n"].astype(got["n"].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_partition_apply_resume_skips_exchange(ray_session, tmp_path):
    """Same scratch_dir -> the exchange is skipped (files untouched) and
    the result is identical; a crashed stage dir without _SUCCESS is
    rebuilt."""
    import glob
    import os

    import ray.data

    from wse_ray.functions.exchange import partition_apply

    t = _events(n=500, users=11, seed=3)

    def count_kernel(part):
        return pa.table({"n": pa.array([part.num_rows], pa.int64())})

    scratch = str(tmp_path / "pa")
    os.makedirs(scratch)
    r1 = partition_apply(
        ray.data.from_arrow(t), "user_id", count_kernel, num_parts=4,
        scratch_dir=scratch,
    ).to_pandas()
    assert int(r1["n"].sum()) == 500
    files = sorted(glob.glob(scratch + "/exchange/jpart=*/*.parquet"))
    assert files and os.path.exists(scratch + "/exchange/_SUCCESS")
    mt = [os.path.getmtime(f) for f in files]
    r2 = partition_apply(
        ray.data.from_arrow(t), "user_id", count_kernel, num_parts=4,
        scratch_dir=scratch,
    ).to_pandas()
    assert int(r2["n"].sum()) == 500
    assert [
        os.path.getmtime(f)
        for f in sorted(glob.glob(scratch + "/exchange/jpart=*/*.parquet"))
    ] == mt
    # crashed partial exchange (no _SUCCESS) must be wiped and rebuilt
    os.remove(scratch + "/exchange/_SUCCESS")
    with open(scratch + "/exchange/jpart=0/garbage.parquet", "w") as f:
        f.write("junk")
    r3 = partition_apply(
        ray.data.from_arrow(t), "user_id", count_kernel, num_parts=4,
        scratch_dir=scratch,
    ).to_pandas()
    assert int(r3["n"].sum()) == 500


def test_session_kernels_hypothesis_match_pandas():
    """Property sweep: rollup and per-row assignment kernels vs pandas
    references over randomized (key, ts, id) triples, including heavy
    timestamp ties and single-event users."""
    from hypothesis import given, settings, strategies as st

    from wse_ray.functions.windows import (
        session_assign_kernel,
        sessionize_rollup_kernel,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 4), st.integers(0, 6)),
            min_size=1, max_size=60,
        )
    )
    def check(rows):
        gap_us = 2 * 1_000_000  # 2-second gap on second-granular data
        t = pa.table(
            {
                "event_id": pa.array(
                    np.arange(len(rows), dtype=np.int64)
                ),
                "user_id": pa.array(
                    np.array([k for k, _ in rows], dtype=np.int64)
                ),
                "ts": pa.array(
                    (np.array([s for _, s in rows], dtype=np.int64) * 1_000_000)
                    .astype("datetime64[us]")
                ),
            }
        )
        df = t.to_pandas()

        def assign(g):
            g = g.sort_values(["ts", "event_id"])
            gaps = (g["ts"].diff() > pd.Timedelta(seconds=2)).cumsum()
            return pd.DataFrame(
                {
                    "event_id": g["event_id"].to_numpy(np.int64),
                    "user_id": g["user_id"].to_numpy(np.int64),
                    "session_idx": gaps.to_numpy(np.int64),
                }
            )

        want = (
            df.groupby("user_id", group_keys=False)[df.columns]
            .apply(assign)
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got = (
            session_assign_kernel(t, "user_id", "ts", "event_id", gap_us)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want[got.columns])

        roll = (
            sessionize_rollup_kernel(t, "user_id", "ts", "event_id", gap_us)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        wr = (
            want.groupby("user_id")
            .agg(
                n_events=("event_id", "size"),
                n_sessions=("session_idx", lambda s: int(s.max()) + 1),
            )
            .reset_index()
            .astype({"user_id": np.int64, "n_events": np.int64, "n_sessions": np.int64})
        )
        pd.testing.assert_frame_equal(roll, wr[roll.columns])

    check()
