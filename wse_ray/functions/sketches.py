"""Distributed exact quantiles by coarse-histogram refinement.

An exact distributed quantile normally needs a global sort.  Instead:
discretize the value to a fixed decimal precision (``floor(v * 10^d)`` —
floor after an IEEE multiply is bit-identical across engines, so the
result is EXACTLY DuckDB's ``quantile_disc`` over the discretized
values), then

- **pass 1** aggregates a COARSE histogram: per-batch ``(key, bin >>
  shift)`` counts (``np.unique`` over a composite key — at most
  ``keys x coarse_bins`` rows per batch regardless of row count), summed
  by one small groupby;
- the **driver** walks each key's cumulative coarse counts to find, for
  every q, the coarse bin containing rank ``ceil(q*n)`` and the count of
  values below it;
- **pass 2** re-reads the input but keeps ONLY rows whose coarse bin is
  a target (a broadcast set lookup — typically ``1/coarse_bins`` of the
  data), aggregates their exact bins, and reads the answer off the
  refined cumulative counts.

Driver/shuffle state is ``keys x coarse_bins`` + the target bins'
distinct values — never the full value distribution.  Shuffle-wise both
passes move bounded partial-count rows, not data rows.

Quantile rule: DuckDB ``quantile_disc`` — the sorted value at 0-based
index ``ceil(q*n) - 1``.

Assumes ``key_col`` is a grouping dimension (low cardinality) and the
value range spans a sane number of coarse bins at the given shift
(``range * 10^decimals / 2^shift``); both are the normal shape for
"quantiles by category" and are documented knobs, not hidden limits.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _bin_counts(keys: np.ndarray, bins: np.ndarray) -> pd.DataFrame:
    """Vectorized (key, bin) -> count over one batch via composite unique."""
    kcodes, kuniq = pd.factorize(keys)
    comp = kcodes.astype(np.int64) * (bins.max() - bins.min() + 1) + (
        bins - bins.min()
    )
    uc, counts = np.unique(comp, return_counts=True)
    span = bins.max() - bins.min() + 1
    return pd.DataFrame(
        {
            "key": kuniq.take(uc // span),
            "bin": (uc % span) + bins.min(),
            "cnt": counts.astype(np.int64),
        }
    )


def histogram_quantiles(
    ds,
    value_col: str,
    key_col: str,
    qs: list[float],
    decimals: int = 2,
    shift: int = 16,
) -> pd.DataFrame:
    """Per-key ``quantile_disc`` of ``floor(value * 10^decimals) /
    10^decimals``.  Returns one row per (key, q): ``(key_col, q,
    quantile)``.  Exact — the coarse pass only narrows where the second
    pass looks."""
    import ray
    from ray.data.aggregate import Sum

    scale = 10**decimals

    def to_bins(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        keys = t[key_col].to_numpy(zero_copy_only=False)
        bins = np.floor(
            t[value_col].to_numpy(zero_copy_only=False).astype(np.float64) * scale
        ).astype(np.int64)
        return keys, bins

    def _empty(t: pa.Table, bin_name: str) -> pa.Table:
        return pa.table(
            {key_col: t[key_col].slice(0, 0),
             bin_name: pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )

    def coarse_partial(t: pa.Table) -> pa.Table:
        keys, bins = to_bins(t)
        if len(keys) == 0:
            return _empty(t, "cbin")
        g = _bin_counts(keys, bins >> shift)
        return pa.table(
            {key_col: pa.array(g["key"]), "cbin": pa.array(g["bin"].to_numpy()),
             "cnt": pa.array(g["cnt"].to_numpy())}
        )

    coarse = (
        ds.map_batches(coarse_partial, batch_format="pyarrow")
        .groupby([key_col, "cbin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # keys x coarse_bins rows
    )

    # driver: locate the target coarse bin + below-count per (key, q)
    targets: dict[object, set[int]] = {}
    plan = []  # (key, q, rank_within_target_cbin_prefix, target_cbin, below)
    for key, g in coarse.groupby(key_col, sort=True):
        g = g.sort_values("cbin")
        cum = g["cnt"].cumsum().to_numpy(np.int64)
        cbins = g["cbin"].to_numpy(np.int64)
        n = int(cum[-1])
        for q in qs:
            r = max(1, math.ceil(q * n))
            i = int(np.searchsorted(cum, r))
            below = int(cum[i - 1]) if i > 0 else 0
            targets.setdefault(key, set()).add(int(cbins[i]))
            plan.append((key, q, r, int(cbins[i]), below))

    ref = ray.put({k: frozenset(v) for k, v in targets.items()})

    def refine_partial(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        keys, bins = to_bins(t)
        if len(keys) == 0:
            return _empty(t, "bin")
        cb = bins >> shift
        # vectorized per key (key_col is a low-cardinality dimension)
        mask = np.zeros(len(keys), dtype=bool)
        for k, cbs in want.items():
            mask |= (keys == k) & np.isin(cb, np.fromiter(cbs, dtype=np.int64))
        if not mask.any():
            return _empty(t, "bin")
        g = _bin_counts(keys[mask], bins[mask])
        return pa.table(
            {key_col: pa.array(g["key"]), "bin": pa.array(g["bin"].to_numpy()),
             "cnt": pa.array(g["cnt"].to_numpy())}
        )

    fine = (
        ds.map_batches(refine_partial, batch_format="pyarrow")
        .groupby([key_col, "bin"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # only target coarse bins' distinct values
    )

    rows = []
    for key, q, r, cbin, below in plan:
        g = fine[(fine[key_col] == key) & ((fine["bin"].to_numpy() >> shift) == cbin)]
        g = g.sort_values("bin")
        cum = below + g["cnt"].cumsum().to_numpy(np.int64)
        idx = int(np.searchsorted(cum, r))
        rows.append((key, q, int(g["bin"].to_numpy()[idx]) / scale))
    return pd.DataFrame(rows, columns=[key_col, "q", "quantile"])


# ---------------------------------------------------------------------------
# HyperLogLog approximate count-distinct
# ---------------------------------------------------------------------------

def _bitlen_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (6-step binary search —
    no float rounding, unlike log2 on ints > 2^53)."""
    x = x.copy()
    bl = np.zeros(len(x), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        big = (x >> np.uint64(shift)) != 0
        bl[big] += shift
        x[big] >>= np.uint64(shift)
    bl[x != 0] += 1
    return bl


def hll_registers(keys: np.ndarray, hashes: np.ndarray, uniq_keys: np.ndarray,
                  p: int = 12) -> np.ndarray:
    """(len(uniq_keys), 2^p) uint8 register matrix for one batch.  Standard
    HLL (Flajolet et al.): top p hash bits pick the register, the rank is
    leading-zeros-plus-one of the remaining q = 64-p bits."""
    q = 64 - p
    m = 1 << p
    idx = (hashes >> np.uint64(q)).astype(np.int64)
    w = hashes & np.uint64((1 << q) - 1)
    rank = (q - _bitlen_u64(w) + 1).astype(np.uint8)
    krow = np.searchsorted(uniq_keys, keys)
    regs = np.zeros((len(uniq_keys), m), dtype=np.uint8)
    np.maximum.at(regs, (krow, idx), rank)
    return regs


def hll_estimate(regs: np.ndarray, p: int = 12) -> np.ndarray:
    """Bias-corrected cardinality estimates, one per register row (with the
    small-range linear-counting switch)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)), axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lc, est)


def hll_distinct_daily(ds, p: int = 12):
    """Approximate distinct user_id per day over the events table —
    bounded-state alternative to the exact bucketed count: each batch
    contributes one (day, 2^p-byte register row) partial, merge is
    elementwise max (associative + commutative + idempotent, so the result
    is independent of partitioning, retries, and merge order), and
    driver/shuffle state is days x 2^p bytes TOTAL regardless of row
    count.  Returns a pandas DataFrame (day, n_users_approx)."""
    from .joins import _mix64

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        days = ts.astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mix64(uid.astype(np.uint64))
        uniq = np.unique(days)
        regs = hll_registers(days, h, uniq, p)
        return pa.table(
            {
                "day": pa.array(uniq),
                "regs": pa.array(list(regs), pa.list_(pa.uint8())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged: dict[int, np.ndarray] = {}
    for day, regs in zip(parts["day"], parts["regs"]):
        r = np.asarray(regs, dtype=np.uint8)
        if day in merged:
            np.maximum(merged[day], r, out=merged[day])
        else:
            merged[day] = r.copy()
    days = sorted(merged)
    est = hll_estimate(np.stack([merged[d] for d in days]), p)
    return pd.DataFrame(
        {
            "day": np.array(days, dtype="datetime64[D]").astype("datetime64[us]"),
            "n_users_approx": np.round(est).astype(np.int64),
        }
    )
