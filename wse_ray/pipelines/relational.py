"""Relational demo pipelines over the TPC-H-ish testdata tables.

These prove the general Dataset idioms (grouped aggregates with map-side
pre-aggregation, broadcast hash joins, tumbling windows, grouped top-k,
sessionization) that the engine's own stages are built from.  Each returns
column-name/type-exact results against a DuckDB oracle.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import scratch_base


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped grouped aggregate with vectorized Arrow pre-compute."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-01"))))
        disc = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = out[c].round(4)
    out["count_order"] = out["count_order"].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """customer⋈orders revenue per nation — broadcast hash join of the
    dimension side (ray.put once, probed per batch; no shuffle).

    Join-strategy envelope: broadcast is right ONLY while the build side
    fits comfortably in every worker's heap (nation always does; customer
    does at bench scale but NOT at TPC-H-100TB).  When it outgrows that,
    use ``functions.joins.partitioned_join`` (the big-big storage-shuffled
    hash join — see ``q_join_priority_revenue`` for it joining the two
    largest tables); no driver or broadcast state there."""
    import ray
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    # broadcast the dimension as two sorted arrays; the probe is a
    # vectorized binary search, not a per-row dict lookup
    ref = ray.put(
        (
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64),
        )
    )

    def attach_nation(t: pa.Table) -> pa.Table:
        ck, nk_arr = ray.get(ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(np.searchsorted(ck, keys), len(ck) - 1)
        # membership check: an o_custkey absent from customer must fail
        # loudly (FK violation), not silently map to a neighboring key
        missing = ck[idx] != keys
        if missing.any():
            raise KeyError(
                f"orders.o_custkey values missing from customer: "
                f"{np.unique(keys[missing])[:5].tolist()}..."
            )
        nk = nk_arr[idx]
        return pa.table(
            {
                "n_nationkey": pa.array(nk, pa.int64()),
                "o_totalprice": t["o_totalprice"],
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    agg = (
        orders.map_batches(attach_nation, batch_format="pyarrow")
        .groupby("n_nationkey")
        .aggregate(Sum("o_totalprice", alias_name="revenue"))
        .to_pandas()
    )
    out = agg.merge(
        nation.rename(columns={"n_nationkey": "n_nationkey", "n_name": "nation"}),
        on="n_nationkey",
    )[["nation", "revenue"]]
    out["revenue"] = out["revenue"].round(4)
    return out.sort_values("nation").reset_index(drop=True)


def q_join_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Revenue per order priority via a BIG-BIG join of the two largest
    tables (lineitem ⋈ orders on orderkey) through
    ``functions.joins.partitioned_join`` — both sides hash-partition by
    key to storage, one Arrow hash join per partition, and the joined rows
    stream straight into a map-side partial aggregate (never materialized
    in full).  This is the join shape that survives when neither side is
    broadcast-small."""
    import tempfile

    from ray.data.aggregate import Count, Sum

    from ..functions.joins import partitioned_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    with tempfile.TemporaryDirectory(prefix="pjoin_rev_", dir=scratch_base()) as scratch:
        joined = partitioned_join(
            li, orders, on="l_orderkey", right_on="o_orderkey",
            how="inner", num_parts=16, scratch_dir=scratch,
        )

        def prep(t: pa.Table) -> pa.Table:
            rev = pc.multiply(
                t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
            )
            return pa.table({"o_orderpriority": t["o_orderpriority"], "rev": rev})

        out = (
            joined.map_batches(prep, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("rev", alias_name="revenue"), Count(alias_name="n_items"))
            .to_pandas()
        )
    out["revenue"] = out["revenue"].round(4)
    out["n_items"] = out["n_items"].astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_events_asof_purchase(sf_dir: str) -> pd.DataFrame:
    """As-of join: each click event picks up the same user's most recent
    prior-or-simultaneous purchase (ts and value), via
    ``functions.joins.asof_join`` — both sides hash-partition by user to
    storage, one vectorized ``merge_asof`` per partition.  Clicks by users
    with no earlier purchase keep nulls (ASOF LEFT semantics)."""
    import tempfile

    from ..functions.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def clicks(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        return t.select(["event_id", "user_id", "ts"])

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "last_purchase_ts": t["ts"],
                "last_purchase_value": t["value"],
            }
        )

    left = ev.map_batches(clicks, batch_format="pyarrow")
    right = ev.map_batches(purchases, batch_format="pyarrow")
    with tempfile.TemporaryDirectory(prefix="asof_ev_", dir=scratch_base()) as scratch:
        out = asof_join(
            left, right, by="user_id", on="ts", num_parts=16,
            scratch_dir=scratch,
        ).to_pandas()
    out["last_purchase_value"] = out["last_purchase_value"].round(4)
    out = out[["event_id", "user_id", "ts", "last_purchase_ts", "last_purchase_value"]]
    return out.sort_values("event_id").reset_index(drop=True)


def q_events_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type.  Map-side combiner shape
    (r5): each batch collapses to per-(type, window) partial (sum, count)
    rows via Arrow's hash aggregate (``functions.windows.window_partials``)
    BEFORE the shuffle, so the all-to-all moves partial rows — bounded by
    window×type cardinality per batch — never raw events."""
    from ray.data.aggregate import Sum

    from ..functions.windows import window_partials

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def win_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        bucket = ts.astype("int64") // 3_600_000_000 * 3_600_000_000
        t = pa.table(
            {
                "event_type": t["event_type"],
                "window_start": pa.array(bucket.astype("datetime64[us]")),
                "value": t["value"],
            }
        )
        return window_partials(t, ["event_type", "window_start"], "value")

    out = (
        ds.map_batches(win_partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_p", alias_name="n_events"), Sum("sum_p", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out["n_events"] = out["n_events"].astype(np.int64)
    out = out[["event_type", "window_start", "n_events", "sum_value"]]
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def q_click_error_pairs(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: every (click, error) pair of the same user
    with the error inside [click_ts, click_ts + 5 min], via
    ``functions.joins.range_join`` — (key, time-bucket) co-partitioned
    equi-join superset + exact vectorized interval filter, never a
    per-key cross product."""
    import tempfile

    from ..functions.joins import range_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def typed(t: pa.Table, kind: str) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], kind))
        return t.select(["event_id", "user_id", "ts"])

    clicks = ev.map_batches(lambda t: typed(t, "click"), batch_format="pyarrow")
    errors = ev.map_batches(lambda t: typed(t, "error"), batch_format="pyarrow")
    with tempfile.TemporaryDirectory(prefix="rjoin_ev_", dir=scratch_base()) as scratch:
        out = range_join(
            clicks, errors, by="user_id", on="ts",
            lower_us=0, upper_us=300_000_000, num_parts=16,
            scratch_dir=scratch,
        ).to_pandas()
    out = out.rename(columns={"event_id": "click_id", "event_id_r": "error_id"})
    out = out[["click_id", "user_id", "error_id"]].astype(
        {"click_id": np.int64, "user_id": np.int64, "error_id": np.int64}
    )
    return out.sort_values(["click_id", "error_id"]).reset_index(drop=True)


def q_events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding-window aggregate: 1-hour windows hopping every 15 minutes
    (each event counted in 4 overlapping windows).  Decomposable-aggregate
    shape (r5): each batch pre-aggregates per (type, HOP bucket) with
    Arrow's hash aggregate, the S/H=4× explode replicates hop PARTIALS
    (not raw rows) to their covering windows, and the shuffle combines
    partials — raw events are never exploded or shuffled
    (``functions.windows.hop_partials`` + ``explode_hops_to_windows``;
    the raw-row ``sliding_window_explode`` remains for non-decomposable
    aggregates)."""
    from functools import partial as _partial

    from ray.data.aggregate import Sum

    from ..functions.windows import explode_hops_to_windows, hop_partials

    SIZE_US, HOP_US = 3_600_000_000, 900_000_000
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = (
        ds.map_batches(
            _partial(
                hop_partials, ts_col="ts", keys=["event_type"],
                value_col="value", hop_us=HOP_US,
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            _partial(explode_hops_to_windows, size_us=SIZE_US, hop_us=HOP_US),
            batch_format="pyarrow",
        )
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n_p", alias_name="n_events"), Sum("sum_p", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    out["n_events"] = out["n_events"].astype(np.int64)
    out = out[["event_type", "window_start", "n_events", "sum_value"]]
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def q_top_users(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k: 10 highest total-value users (rank on rounded sums)."""
    from ray.data.aggregate import Count, Sum

    agg = (
        _read(sf_dir, "events", ["user_id", "value"])
        .groupby("user_id")
        .aggregate(Sum("value", alias_name="total_value"), Count(alias_name="n_events"))
        .to_pandas()
    )
    agg["total_value"] = agg["total_value"].round(4)
    agg = agg.sort_values(["total_value", "user_id"], ascending=[False, True]).head(10)
    agg["rank"] = np.arange(1, len(agg) + 1)
    return agg[["rank", "user_id", "total_value", "n_events"]].astype(
        {"rank": np.int64, "user_id": np.int64, "n_events": np.int64}
    ).reset_index(drop=True)


_GAP_US = 30 * 60 * 1_000_000  # 30-min inactivity gap
_SESSION_PARTS = 16


def q_sessionize(sf_dir: str) -> pd.DataFrame:
    """Per-user sessionization (30-min inactivity gap) — the stateful-
    stream pattern in batch form.  Storage-exchange shape (r5): events
    hash-partition by user to hive parquet
    (``functions.exchange.partition_apply``), then ONE task per partition
    runs a partition-WIDE lexsort + gap-cumsum kernel
    (``windows.sessionize_rollup_kernel``) — no per-group pandas frames,
    no in-memory all-to-all.  Per-key bound: one user's (thin) event rows
    must fit a worker; raise num_parts first."""
    import tempfile

    from functools import partial as _partial

    from ..functions.exchange import partition_apply
    from ..functions.windows import sessionize_rollup_kernel

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    kern = _partial(
        sessionize_rollup_kernel, key_col="user_id", ts_col="ts",
        id_col="event_id", gap_us=_GAP_US,
    )
    with tempfile.TemporaryDirectory(prefix="sess_roll_", dir=scratch_base()) as scratch:
        out = partition_apply(
            ds, "user_id", kern, num_parts=_SESSION_PARTS, scratch_dir=scratch
        ).to_pandas()
    return out.astype(
        {"user_id": np.int64, "n_events": np.int64, "n_sessions": np.int64}
    ).sort_values("user_id").reset_index(drop=True)


def q_session_assignments(sf_dir: str) -> pd.DataFrame:
    """Event-level sessionization: each event gets its user's session
    ordinal (0-based; a new session opens after >30 min inactivity).  The
    distributed window-function pattern, storage-exchange shape (r5):
    partition by user hash to storage, one partition-wide
    ``windows.session_assign_kernel`` task per partition (global gap
    cumsum minus per-key base — per-row output with no per-group
    frames)."""
    import tempfile

    from functools import partial as _partial

    from ..functions.exchange import partition_apply
    from ..functions.windows import session_assign_kernel

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    kern = _partial(
        session_assign_kernel, key_col="user_id", ts_col="ts",
        id_col="event_id", gap_us=_GAP_US,
    )
    with tempfile.TemporaryDirectory(prefix="sess_assign_", dir=scratch_base()) as scratch:
        out = partition_apply(
            ds, "user_id", kern, num_parts=_SESSION_PARTS, scratch_dir=scratch
        ).to_pandas()
    return out.astype(
        {"event_id": np.int64, "user_id": np.int64, "session_idx": np.int64}
    ).sort_values("event_id").reset_index(drop=True)


_DISTINCT_BUCKETS = 32


def q_distinct_users_daily(sf_dir: str) -> pd.DataFrame:
    """Exact distinct count per day, fully distributed (storage-exchange
    shape, r5):

    1. per-batch unique (day, user) pairs (map-side pre-aggregation — raw
       rows never shuffle);
    2. pairs hash-partition by USER through the storage exchange
       (``functions.exchange.partition_apply``): each partition holds
       ~1/K of the distinct users for EVERY day, so partition size stays
       bounded at any scale (a per-day partition would not);
    3. one partition-wide kernel per partition
       (``windows.distinct_pairs_daily_kernel``): exact per-day nunique
       over partition-disjoint users -> tiny (day, count) partials whose
       final per-day sum is days x K rows on the driver.
    """
    import tempfile

    from functools import partial as _partial

    from ..functions.exchange import partition_apply
    from ..functions.windows import distinct_pairs_daily_kernel

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def pair_partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.unique(
            np.stack([ts.astype("int64"), uid], axis=1), axis=0
        )
        return pa.table(
            {
                "day": pa.array(pairs[:, 0].astype("datetime64[D]").astype("datetime64[us]")),
                "user_id": pa.array(pairs[:, 1]),
            }
        )

    kern = _partial(distinct_pairs_daily_kernel, key_col="user_id")
    with tempfile.TemporaryDirectory(prefix="distinct_daily_", dir=scratch_base()) as scratch:
        partials = partition_apply(
            ds.map_batches(pair_partial, batch_format="pyarrow"),
            "user_id",
            kern,
            num_parts=_DISTINCT_BUCKETS,
            scratch_dir=scratch,
        ).to_pandas()  # tiny: days x partitions rows
    out = partials.groupby("day", as_index=False).agg(n_users=("n_users_p", "sum"))
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


_FUNNEL = ["view", "click", "purchase"]


def q_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered-sequence funnel: users reaching each stage of
    view -> click -> purchase, where stage k+1 must happen STRICTLY after
    the user's earliest qualifying stage-k event (the classic strict
    funnel chain).  Storage-exchange shape (r5): only the three event
    types are exchanged, partitioned by user hash; each partition runs
    ``windows.funnel_stage_kernel`` — the per-user chain vectorized
    ACROSS users (per stage, one masked ``np.minimum.at`` scatter into a
    per-key cutoff array; no per-user Python loop) — and returns one
    3-row partial; users are partition-disjoint so partials sum exactly."""
    import tempfile

    from functools import partial as _partial

    from ..functions.exchange import partition_apply
    from ..functions.windows import funnel_stage_kernel

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"], value_set=pa.array(_FUNNEL)))

    kern = _partial(
        funnel_stage_kernel, key_col="user_id", ts_col="ts",
        type_col="event_type", stages=_FUNNEL,
    )
    with tempfile.TemporaryDirectory(prefix="funnel_", dir=scratch_base()) as scratch:
        partials = partition_apply(
            ds.map_batches(keep, batch_format="pyarrow"),
            "user_id",
            kern,
            num_parts=_SESSION_PARTS,
            scratch_dir=scratch,
        ).to_pandas()
    out = partials.groupby("stage", as_index=False).agg(n_users=("n_users_p", "sum"))
    out["event_type"] = _FUNNEL
    out = out[["stage", "event_type", "n_users"]].astype(
        {"stage": np.int64, "n_users": np.int64}
    )
    return out.sort_values("stage").reset_index(drop=True)


def q_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Distributed per-key quantiles without a global sort: fixed-precision
    histogram sketch (``wse_ray.functions.sketches.histogram_quantiles``).
    The shuffle carries only (key, price-bin) partial counts — bounded by
    value cardinality, not row count — and the quantile is read off the
    cumulative histogram.  Exact ``quantile_disc`` over cent-discretized
    prices."""
    from wse_ray.functions.sketches import histogram_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
    out = histogram_quantiles(
        ds, "l_extendedprice", "l_returnflag", qs=[0.25, 0.5, 0.75, 0.95], decimals=2
    )
    out = out.rename(columns={"quantile": "price_q"})
    out["q"] = out["q"].astype(np.float64)
    out["price_q"] = out["price_q"].astype(np.float64)
    return out.sort_values(["l_returnflag", "q"]).reset_index(drop=True)


def q_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join: customers with no orders — broadcast the order-customer
    key SET (a Bloom filter at 10^12 scale) and filter inside map_batches;
    no shuffle."""
    import ray

    okeys = (
        _read(sf_dir, "orders", ["o_custkey"])
        .to_pandas()["o_custkey"]
        .unique()
    )
    ref = ray.put(np.sort(okeys.astype(np.int64)))

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, ck)
        pos_c = np.minimum(pos, len(keys) - 1)
        has = keys[pos_c] == ck
        return t.filter(pa.array(~has))

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(anti, batch_format="pyarrow")
        .to_pandas()
    )
    if "c_custkey" not in out.columns:  # every customer had orders
        out = pd.DataFrame(
            {"c_custkey": pd.Series(dtype=np.int64), "c_name": pd.Series(dtype=str)}
        )
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    return out.sort_values("c_custkey").reset_index(drop=True)
