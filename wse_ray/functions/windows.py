"""Sliding (hopping) window assignment for event streams, batch form.

A tumbling window is a plain ``groupby(floor(ts/size))`` —
``pipelines/relational.q_events_window``.  A SLIDING window of size S
hopping by H < S places each event in exactly ``S/H`` overlapping
windows; the batch-native expression is an EXPLODE (replicate each row
once per covering window, tagging ``window_start``) followed by an
ordinary grouped aggregate.  The explode is a pure vectorized
``Table.take`` + arithmetic (zero-copy gather, no Python rows), and the
downstream groupby sees ``S/H``× rows — the honest cost of overlapping
windows at any scale; pre-aggregate per (hop-bucket) first when the
aggregate is decomposable and ``S/H`` is large (sum/count over hops, then
a rolling combine — not needed at the current gate's S/H = 4).

No reference counterpart (the reference has no streaming/window
operators); this is a training-data/analytics addition.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


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
