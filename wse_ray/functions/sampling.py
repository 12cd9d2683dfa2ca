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
