"""Deterministic sampling / quota operators for training-data curation.

Both operators are built for the 100 TB shape:

- ``hash_sample`` is a stateless ``map_batches`` filter — no shuffle, no
  RNG state, rerun-stable (the keep/drop decision is a pure function of
  content, so a resumed run samples identically).
- ``cap_per_key`` bounds the shuffle at ``keys x k`` rows by taking the
  per-key top-k INSIDE each map task first (combiner), so the final
  groupby never sees more than ``k`` candidates per key per input block.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _md5_prefix4(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest()[:4] for t in texts]


def hash_sample(ds, keep_of_65536: int, text_col: str = "text"):
    """Keep rows whose md5(text) 16-bit hex prefix < ``keep_of_65536``
    (e.g. 8192 -> a deterministic ~12.5% sample).  Content-keyed, so exact
    duplicates sample together — the property curation pipelines want
    (a dup either survives with all its copies or not at all).

    SQL parity: ``WHERE substr(md5(text), 1, 4) < '<hex4>'``.
    """
    thresh = format(keep_of_65536, "04x")

    def keep(t: pa.Table) -> pa.Table:
        pref = _md5_prefix4(t[text_col].to_pylist())
        return t.filter(pa.array([p < thresh for p in pref]))

    return ds.map_batches(keep, batch_format="pyarrow")


def source_counts(ds, key_col: str = "source") -> pd.DataFrame:
    """(key, n) per source — map-side value_counts partials summed on the
    driver (source-cardinality-sized, never row-sized; no shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        vc = pd.Series(t[key_col].to_pylist()).value_counts()
        return pa.table(
            {key_col: pa.array(vc.index.astype(str)), "n": pa.array(vc.to_numpy())}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return parts.groupby(key_col, as_index=False)["n"].sum()


def rebalance_sources(
    ds, total: int, key_col: str = "source", text_col: str = "text",
    weights: dict[str, float] | None = None,
):
    """Mixture rebalancing: downsample each source toward a target of
    ``total * w_s`` docs (uniform weights by default) with the same
    content-hash threshold rule as ``hash_sample`` — deterministic,
    rerun-stable, and dup-coherent per source.

    Two passes: a source-cardinality-sized count (broadcast via ``ray.put``,
    read once per task), then a stateless filter — no shuffle of data rows.
    Sources already at/below target keep everything.  With an explicit
    ``weights`` dict, sources absent from it get weight 0 and are DROPPED
    (the mixture definition is the dict).  SQL parity: threshold hex =
    printf('%04x', floor(65536 * least(1.0, target/n))).
    """
    import ray

    counts = source_counts(ds, key_col)
    nsrc = len(counts)
    th: dict[str, str | None] = {}
    for _, row in counts.iterrows():
        # default path divides total/nsrc FIRST (same op order as the SQL
        # oracle, so the float threshold is bit-identical)
        target = (
            total * weights.get(row[key_col], 0.0) if weights else total / nsrc
        )
        rate = min(1.0, target / row["n"])
        # None = keep-all (avoids the 5-hex-char '10000' string-compare trap)
        th[row[key_col]] = None if rate >= 1.0 else format(int(65536 * rate), "04x")
    tref = ray.put(th)

    def keep(t: pa.Table) -> pa.Table:
        thr = ray.get(tref)
        keys = t[key_col].to_pylist()
        pref = _md5_prefix4(t[text_col].to_pylist())
        mask = [
            thr.get(s) is None or p < thr[s] for s, p in zip(keys, pref)
        ]
        out = t.filter(pa.array(mask))
        return out.select(["doc_id", key_col])

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(
    ds, k: int, weight_col: str, id_col: str = "doc_id", salt: str = "ws"
):
    """Deterministic weighted sample WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row gets the key ``ln(u)/w`` with ``u`` a uniform
    derived from ``md5(id:salt)`` and ``w`` its weight; the k LARGEST keys
    are the sample, each row drawn with probability proportional to its
    weight.

    Scale shape: a distributed ARGMAX, not a shuffle — every batch emits
    only its local top-k partial (like ``ann.brute_topk``) and the driver
    merges batches x k tiny rows; content-keyed u makes the draw
    rerun/resume-stable, and epoch N = salt N redraws for free.

    SQL parity: ``u = (CAST('0x' || substr(md5(id || ':salt'), 1, 8) AS
    UBIGINT) + 0.5) / 2^32``, ``row_number() OVER (ORDER BY
    round(ln(u)/w, 9) DESC, id)``.  The key is QUANTIZED to 9 dp before
    ranking because DuckDB's ``ln`` drifts from numpy's by 1 ulp on some
    inputs (measured), which would flip near-tied ranks; ties created by
    the quantization break by id on both sides.  Non-positive weights are
    clamped to 1e-300 (key -> huge negative: effectively never drawn); the
    SQL oracle mirrors the clamp with ``greatest(w, 1e-300)``.
    """

    def local_topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u32 = np.array(
            [
                int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8], 16)
                for i in ids
            ],
            dtype=np.float64,
        )
        lnkey = np.round(
            np.log((u32 + 0.5) / 4294967296.0) / np.maximum(w, 1e-300), 9
        )
        take = np.lexsort((ids, -lnkey))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[take], pa.int64()),
                "weight": pa.array(w[take], pa.float64()),
                "lnkey": pa.array(lnkey[take], pa.float64()),
            }
        )

    partials = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(
        ["lnkey", id_col], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", id_col, "weight", "lnkey"]]


def training_shuffle(ds, seed: int, id_col: str = "doc_id"):
    """Deterministic global training-order shuffle: every row gets the key
    ``md5(id:seed)`` and the dataset is range-partition SORTED by it — a
    seeded permutation that is identical across reruns/resumes (unlike
    ``random_shuffle``).  This is the one operator where an all-to-all
    exchange is the point: a global order permutation cannot be computed
    partition-locally.  Consume as a stream (``iter_batches`` /
    ``write_parquet``) — rank is implicit in the output order.  Epoch N =
    seed N: re-keying re-shuffles without re-reading anything else."""

    def key(t: pa.Table) -> pa.Table:
        ks = [
            hashlib.md5(f"{i}:{seed}".encode()).hexdigest()
            for i in t[id_col].to_pylist()
        ]
        return t.append_column("shuffle_key", pa.array(ks))

    return ds.map_batches(key, batch_format="pyarrow").sort("shuffle_key")


def cap_per_key(ds, key_col: str, order_col: str, k: int):
    """At most ``k`` rows per key, keeping the smallest ``order_col``
    values (ties impossible for unique ids) — the per-domain document cap.

    Map-side combiner: each batch emits only its local per-key top-k, so
    the shuffle carries <= k rows per key per block regardless of skew;
    the reduce re-applies the same top-k per key.  Returns
    ``(order_col, key_col)`` rows.
    """

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df[[order_col, key_col]]
            .sort_values(order_col)
            .groupby(key_col, sort=False)
            .head(k)
        )
        return out.reset_index(drop=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col).head(k).reset_index(drop=True)

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .groupby(key_col)
        .map_groups(final_topk, batch_format="pandas")
    )
