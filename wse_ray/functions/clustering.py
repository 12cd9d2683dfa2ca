"""Distributed k-means (Lloyd's) over an embedding column — the clustering
primitive behind semantic dedup, domain discovery, and diversity-balanced
sampling in training-data pipelines.

Shape per iteration: centroids broadcast ONCE via ``ray.put`` (read by
every task, never re-shipped per batch); each batch computes its local
assignment with one BLAS matmul and returns a single k x d partial-sum row
(one-hot.T @ X) plus counts and an inertia partial — so the driver reduce
is O(num_batches x k x d) no matter how many vectors stream through, and
nothing corpus-sized is ever materialized.  Iteration count is fixed (no
data-dependent convergence test) to keep the result deterministic.

At 100 TB with large k (say 64k x 1024 dims) the per-batch partial is
~256 MB, and the right move is to reduce partials with a (cluster-shard)
``groupby`` tree instead of the driver — the map side here is unchanged;
only the reduce would swap.  Determinism: embeddings are quantized to
dyadic rationals (20 fractional bits) before summation, so every partial
sum is EXACT in float64 (no rounding -> independent of block boundaries
and summation order) while |sum of a cluster's coordinates| < 2^33.
Caveat: the argmin itself runs over unquantized BLAS distances, so a
vector genuinely near-equidistant between two centroids could still flip
under a different batch shape — the quantization removes the systematic
reduce-order drift, not distance ties (measure-zero for continuous
embeddings; absent in the gated/test data).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _stack


def _init_centroids(ds, k: int, vec_col: str, id_col: str) -> np.ndarray:
    """Deterministic init: the vectors of the k smallest ids (per-batch
    k-smallest partials, then one driver pick — no shuffle)."""

    def local_k(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        take = np.argsort(ids, kind="stable")[:k]
        return pa.table({id_col: pa.array(ids[take]), vec_col: t[vec_col].take(take)})

    parts = ds.map_batches(local_k, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(id_col).head(k)
    return np.stack(parts[vec_col].to_numpy()).astype(np.float64)


def _assign_partial(cref):
    """Partial-sum stage as a plain task closure: ``ray.get`` on a local
    object-store ref is zero-copy and cached per worker process, and a task
    pool avoids paying actor-pool spin-up on EVERY Lloyd's iteration (a new
    map_batches stage per iteration; measured ~1 s/iter of pure actor
    startup at small scale)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _stack(t["embedding"])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        assign = np.argmin(d2, axis=1)
        onehot = np.zeros((len(X), C.shape[0]))
        onehot[np.arange(len(X)), assign] = 1.0
        # dyadic quantization (2^-20) -> partial sums are exact in float64,
        # so the reduce is independent of block boundaries / sum order
        Xq = np.round(X * 1048576.0) / 1048576.0
        sums = onehot.T @ Xq  # (k, d)
        counts = onehot.sum(0)
        inertia = float(d2[np.arange(len(X)), assign].sum())
        return pa.table(
            {
                "sums": pa.array([sums.ravel()], pa.list_(pa.float64())),
                "counts": pa.array([counts], pa.list_(pa.float64())),
                "inertia": pa.array([inertia]),
            }
        )

    return partial


def kmeans_fit(
    ds, k: int = 10, iters: int = 10, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, list[float]]:
    """(final centroids (k, d), per-iteration inertia) after ``iters``
    Lloyd's steps from the deterministic min-id init."""
    import ray

    C = _init_centroids(ds, k, vec_col, id_col)
    d = C.shape[1]
    history: list[float] = []
    for _ in range(iters):
        cref = ray.put(C)
        parts = ds.map_batches(
            _assign_partial(cref), batch_format="pyarrow"
        ).to_pandas()
        sums = np.stack(parts["sums"].to_numpy()).sum(0).reshape(k, d)
        counts = np.stack(parts["counts"].to_numpy()).sum(0)
        history.append(float(parts["inertia"].sum()))
        nonempty = counts > 0
        C = np.where(nonempty[:, None], sums / np.maximum(counts, 1.0)[:, None], C)
    return C, history


def centroid_cosine(ds, id_col: str = "vec_id"):
    """Semantic-outlier signal: cosine of every embedding to the GLOBAL
    mean vector — low scores flag off-distribution rows for curation
    review.  Pass 1 reduces per-batch (sum-vector, count) partials (one
    d-sized row per batch) to the mean on the driver; pass 2 broadcasts
    the mean and scores statelessly.  Returns (id, cos_centroid, 6 dp)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        X = _stack(t["embedding"])
        return pa.table(
            {
                "s": pa.array([X.sum(0)], pa.list_(pa.float64())),
                "n": pa.array([len(X)]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    mean = np.stack(parts["s"].to_numpy()).sum(0) / parts["n"].sum()
    mref = ray.put(mean)

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(mref)
        X = _stack(t["embedding"])
        cos = (X @ m) / (np.linalg.norm(X, axis=1) * np.linalg.norm(m))
        return pa.table(
            {
                id_col: t[id_col],
                "cos_centroid": pa.array(np.round(cos, 6)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id"):
    """(id, cluster) assignment under fixed centroids — stateless stream."""
    import ray

    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _stack(t["embedding"])
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(np.argmin(d2, axis=1).astype(np.int64)),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
