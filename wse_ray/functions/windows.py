"""Window / sessionization kernels for event streams, batch form.

A tumbling window is a plain ``groupby(floor(ts/size))`` —
``pipelines/relational.q_events_window``.  A SLIDING window of size S
hopping by H < S places each event in exactly ``S/H`` overlapping
windows; the batch-native expression is an EXPLODE (replicate once per
covering window, tagging ``window_start``) followed by a grouped
aggregate.  When the aggregate is decomposable (sum/count), aggregate
per HOP bucket first and explode the hop PARTIALS instead of the raw
rows (``hop_partials`` + ``explode_hops_to_windows``) — the explode and
the downstream shuffle then see per-(type, hop) partial rows, bounded by
value cardinality, not event count.

Sessionization and funnels need all of one key's rows in one place; the
r5 shape is the storage exchange (``functions.exchange.partition_apply``
partitioned by user hash) with the PARTITION-WIDE vectorized kernels
below — one numpy sort + segment arithmetic over the whole partition,
never per-group pandas frames.  Per-key bound: one key's events must fit
a worker's heap (thin rows — raise ``num_parts`` first).

No reference counterpart (the reference has no streaming/window
operators); this is a training-data/analytics addition.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _i64_us(col) -> np.ndarray:
    """timestamp column -> int64 microseconds (vectorized, no Python rows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return (
        col.cast(pa.timestamp("us"))
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )


def sliding_window_explode(
    batch: pa.Table, ts_col: str, size_us: int, hop_us: int
) -> pa.Table:
    """map_batches fn: replicate each row to its covering windows with a
    ``window_start`` (timestamp[us]) column appended.

    Windows are aligned to epoch multiples of ``hop_us``; an event at t is
    in windows starting at ``(floor(t/H) - k) * H`` for k in 0..S/H-1
    (every one satisfies ws <= t < ws+S when H divides S).
    """
    if size_us % hop_us:
        raise ValueError("hop must divide size")
    reps = size_us // hop_us
    n = len(batch)
    ts = (
        batch[ts_col]
        .combine_chunks()
        .cast(pa.timestamp("us"))
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
    base = ts // hop_us * hop_us
    k = np.tile(np.arange(reps, dtype=np.int64), n)
    ws = np.repeat(base, reps) - k * hop_us
    out = batch.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), reps)))
    return out.append_column(
        "window_start", pa.array(ws.astype("datetime64[us]"), pa.timestamp("us"))
    )


# --------------------------------------------------------------------------
# partition-wide sessionization kernels (used via exchange.partition_apply)
# --------------------------------------------------------------------------


def session_sort(t: pa.Table, key_col: str, ts_col: str, id_col: str):
    """Common prologue: one lexsort of the whole partition by
    (key, ts, id).  Returns (order, key_sorted, ts_sorted_us,
    new_key_mask) where ``new_key_mask[i]`` is True when sorted row i
    starts a new key's segment (always True at i=0)."""
    key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = _i64_us(t[ts_col])
    rid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((rid, ts, key))
    k, s = key[order], ts[order]
    new_key = np.concatenate(([True], k[1:] != k[:-1]))
    return order, k, s, new_key


def sessionize_rollup_kernel(
    t: pa.Table, key_col: str, ts_col: str, id_col: str, gap_us: int
) -> pa.Table:
    """Per-key rollup (key, n_events, n_sessions) over one partition —
    vectorized: sort, gap flags, segment sums via cumsum differences."""
    if t.num_rows == 0:
        return pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_sessions": pa.array([], pa.int64()),
            }
        )
    order, k, s, new_key = session_sort(t, key_col, ts_col, id_col)
    gap = np.concatenate(([False], (s[1:] - s[:-1]) > gap_us)) & ~new_key
    starts = np.flatnonzero(new_key)
    ends = np.concatenate((starts[1:], [len(k)]))
    csum = np.concatenate(([0], np.cumsum(gap)))
    n_sessions = 1 + (csum[ends] - csum[starts])
    return pa.table(
        {
            key_col: pa.array(k[starts], pa.int64()),
            "n_events": pa.array(ends - starts, pa.int64()),
            "n_sessions": pa.array(n_sessions, pa.int64()),
        }
    )


def session_assign_kernel(
    t: pa.Table, key_col: str, ts_col: str, id_col: str, gap_us: int
) -> pa.Table:
    """Per-ROW session ordinal (0-based within key) over one partition —
    the distributed window-function shape: within-key cumsum of gap flags,
    computed as global cumsum minus the key's start value (no per-group
    frames)."""
    if t.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "session_idx": pa.array([], pa.int64()),
            }
        )
    order, k, s, new_key = session_sort(t, key_col, ts_col, id_col)
    gap = np.concatenate(([False], (s[1:] - s[:-1]) > gap_us)) & ~new_key
    csum = np.cumsum(gap)
    starts = np.flatnonzero(new_key)
    seg_len = np.diff(np.concatenate((starts, [len(k)])))
    base = np.repeat(csum[starts], seg_len)
    rid = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    return pa.table(
        {
            id_col: pa.array(rid, pa.int64()),
            key_col: pa.array(k, pa.int64()),
            "session_idx": pa.array(csum - base, pa.int64()),
        }
    )


def funnel_stage_kernel(
    t: pa.Table, key_col: str, ts_col: str, type_col: str, stages: list[str]
) -> pa.Table:
    """Strict-funnel partial over one partition: for each key, stage k+1
    must occur STRICTLY after the key's earliest qualifying stage-k event.
    Vectorized ACROSS keys: per stage, a masked ``np.minimum.at`` scatter
    of candidate timestamps into a per-key cutoff array — no per-key
    Python loop.  Emits one (stage, n_users_p) partial row per stage;
    keys are partition-disjoint, so partials sum exactly."""
    n_stages = len(stages)
    if t.num_rows == 0:
        return pa.table(
            {
                "stage": pa.array(range(1, n_stages + 1), pa.int64()),
                "n_users_p": pa.array([0] * n_stages, pa.int64()),
            }
        )
    key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = _i64_us(t[ts_col])
    et = t[type_col]
    et = et.combine_chunks() if isinstance(et, pa.ChunkedArray) else et
    code = pc.index_in(et, value_set=pa.array(stages)).to_numpy(
        zero_copy_only=False
    )
    _, uidx = np.unique(key, return_inverse=True)
    n_users = int(uidx.max()) + 1
    sentinel = np.iinfo(np.int64).max
    counts = []
    cutoff = np.full(n_users, -sentinel, dtype=np.int64)  # stage 0: no bound
    for s in range(n_stages):
        m = code == s
        qual = m & (ts > cutoff[uidx])
        nxt = np.full(n_users, sentinel, dtype=np.int64)
        np.minimum.at(nxt, uidx[qual], ts[qual])
        counts.append(int((nxt < sentinel).sum()))
        cutoff = nxt  # keys that missed this stage hold +inf -> never pass
    return pa.table(
        {
            "stage": pa.array(range(1, n_stages + 1), pa.int64()),
            "n_users_p": pa.array(counts, pa.int64()),
        }
    )


def distinct_pairs_daily_kernel(t: pa.Table, key_col: str) -> pa.Table:
    """Exact per-day distinct-key partial over one partition of
    (day, key) pairs: keys are partition-disjoint, so per-day nunique
    partials sum exactly across partitions."""
    if t.num_rows == 0:
        return pa.table(
            {
                "day": pa.array([], pa.timestamp("us")),
                "n_users_p": pa.array([], pa.int64()),
            }
        )
    day = _i64_us(t["day"])
    key = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
    pairs = np.unique(np.stack([day, key], axis=1), axis=0)
    days, counts = np.unique(pairs[:, 0], return_counts=True)
    return pa.table(
        {
            "day": pa.array(days.astype("datetime64[us]"), pa.timestamp("us")),
            "n_users_p": pa.array(counts, pa.int64()),
        }
    )


# --------------------------------------------------------------------------
# map-side combiners for windowed sum/count aggregates
# --------------------------------------------------------------------------


def window_partials(
    t: pa.Table, keys: list[str], value_col: str
) -> pa.Table:
    """Per-batch combiner: collapse a raw-event batch to per-(keys) partial
    (sum, count) rows with Arrow's C++ hash aggregate.  The downstream
    shuffle then moves partial rows — bounded by local key cardinality —
    instead of every event."""
    g = t.group_by(keys).aggregate([(value_col, "sum"), (value_col, "count")])
    # select by the aggregate's generated names, not position (output
    # column order differs across pyarrow versions)
    g = g.select(keys + [f"{value_col}_sum", f"{value_col}_count"])
    return g.rename_columns(keys + ["sum_p", "n_p"])


def hop_partials(
    batch: pa.Table, ts_col: str, keys: list[str], value_col: str, hop_us: int
) -> pa.Table:
    """Sliding-window map-side combiner, stage 1: aggregate each batch per
    (keys, hop bucket).  Raw rows never explode."""
    ts = _i64_us(batch[ts_col])
    hop = ts // hop_us * hop_us
    t = pa.table(
        {
            **{k: batch[k] for k in keys},
            "hop_start": pa.array(hop, pa.int64()),
            value_col: batch[value_col],
        }
    )
    return window_partials(t, keys + ["hop_start"], value_col)


def explode_hops_to_windows(
    t: pa.Table, size_us: int, hop_us: int
) -> pa.Table:
    """Sliding-window stage 2: replicate each hop PARTIAL to its S/H
    covering windows (vectorized take-gather) — the S/H× blowup applies to
    partial rows only."""
    if size_us % hop_us:
        raise ValueError("hop must divide size")
    reps = size_us // hop_us
    n = len(t)
    hop = t["hop_start"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = np.tile(np.arange(reps, dtype=np.int64), n)
    ws = np.repeat(hop, reps) - k * hop_us
    out = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), reps)))
    out = out.drop_columns(["hop_start"])
    return out.append_column(
        "window_start", pa.array(ws.astype("datetime64[us]"), pa.timestamp("us"))
    )
