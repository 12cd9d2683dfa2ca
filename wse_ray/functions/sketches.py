"""Distributed quantiles by fixed-precision histogram aggregation.

An exact distributed quantile normally needs a sort or multi-pass
selection; discretizing the value to a fixed decimal precision first
makes the histogram EXACT over the discretized values (not an
approximation of them): per-batch (key, bin) counts are a bounded-
cardinality partial aggregate — at any corpus size the shuffle carries
at most ``keys x distinct-bins`` rows, and the quantile is read off the
cumulative counts on the driver.  This is the bounded-state sketch shape
(cf. histogram/t-digest sketches); with ``decimals`` high enough for the
value's native precision the result is simply exact.

Quantile rule: DuckDB ``quantile_disc`` semantics — the sorted value at
0-based index ``ceil(q*n) - 1`` (verified empirically; equals the first
value whose cumulative count reaches ``ceil(q*n)``).
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def histogram_quantiles(
    ds,
    value_col: str,
    key_col: str,
    qs: list[float],
    decimals: int = 2,
) -> pd.DataFrame:
    """Per-key ``quantile_disc`` of ``floor(value * 10^decimals) /
    10^decimals`` — floor-discretization rather than rounding because
    ``floor`` after an IEEE multiply is bit-identical across engines
    (round-half rules differ between numpy and SQL).

    Returns one row per (key, q): ``(key_col, q, quantile)``.
    """
    from ray.data.aggregate import Sum

    scale = 10**decimals

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table(
            {key_col: t[key_col], value_col: t[value_col]}
        ).to_pandas()
        bins = np.floor(
            df[value_col].to_numpy(np.float64) * scale
        ).astype(np.int64)
        g = (
            pd.DataFrame({key_col: df[key_col], "bin": bins})
            .groupby([key_col, "bin"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # keys x bins rows — bounded by value cardinality
    )
    rows = []
    for key, g in hist.groupby(key_col, sort=True):
        g = g.sort_values("bin")
        cum = g["cnt"].cumsum().to_numpy(np.int64)
        n = int(cum[-1])
        vals = g["bin"].to_numpy(np.int64)
        for q in qs:
            target = max(1, math.ceil(q * n))
            idx = int(np.searchsorted(cum, target))
            rows.append((key, q, vals[idx] / scale))
    return pd.DataFrame(rows, columns=[key_col, "q", "quantile"])
