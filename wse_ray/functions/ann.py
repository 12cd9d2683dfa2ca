"""Similarity search over an embedding column (list<float>).

* ``brute_topk`` — exact cosine top-k: the query matrix is broadcast once
  (ray.put), every batch computes a matmul and emits its LOCAL top-k per
  query; the driver merges the tiny partials.  This is the scalable exact
  baseline: shuffle volume is (batches x queries x k), not the corpus.
* ``build_ivf_index`` / ``ivf_search_index`` — IVF with partition pruning:
  deterministic numpy k-means on a sample builds the centroid table, each
  vector is written under its nearest cell's ``cell=K/`` parquet partition,
  and a search reads ONLY the union of its queries' ``nprobe`` cells —
  probe I/O is ~nprobe/n_clusters of the corpus, not a full scan.
  ``ivf_topk`` wraps build+search for one-shot use.
* ``build_lsh_index`` / ``lsh_search_index`` — single-table multi-probe
  random-hyperplane LSH: the data-independent sibling of IVF (no training
  sample, one stateless map builds the index), one stored copy of the
  corpus, recall tuned at query time by probing the nprobe cheapest
  sign-flip buckets.  ``lsh_topk`` wraps build+search.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import scratch_base


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def cosine_matrix_duckdb(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """float64 cosine matrix that agrees with DuckDB's
    ``list_cosine_similarity`` after 6-dp rounding.

    Fast path: one BLAS matmul + norm outer product.  BLAS pairwise
    summation can differ from DuckDB's sequential accumulation by ~1 ulp,
    which flips the 6th decimal when a value sits on a rounding boundary —
    so entries within 1e-8 of a boundary are recomputed with DuckDB's exact
    arithmetic (sequential sums, dot/(sqrt(sa)*sqrt(sb))), verified
    bit-identical against DuckDB 1.0.
    """
    na = np.maximum(np.sqrt((A * A).sum(1)), 1e-12)
    nb = np.maximum(np.sqrt((B * B).sum(1)), 1e-12)
    sims = (A @ B.T) / (na[:, None] * nb[None, :])
    r = sims * 1e6
    near = np.abs(r - np.floor(r) - 0.5) < 1e-2
    for i, j in zip(*np.nonzero(near)):
        sd = sa = sb = 0.0
        for x, y in zip(A[i], B[j]):
            sd += x * y
            sa += x * x
            sb += y * y
        sims[i, j] = sd / (np.sqrt(sa) * np.sqrt(sb))
    return sims


def _stack(batch_col) -> np.ndarray:
    """(n, d) float64 from an Arrow list<float> column — buffer-level
    flatten + reshape when rows are uniform width (zero per-row Python
    objects; `flatten()` respects slice offsets), object-array fallback
    otherwise (e.g. pandas-object input)."""
    if isinstance(batch_col, pa.ChunkedArray):
        batch_col = batch_col.combine_chunks()
    if isinstance(batch_col, pa.Array) and (
        pa.types.is_list(batch_col.type)
        or pa.types.is_large_list(batch_col.type)
        or pa.types.is_fixed_size_list(batch_col.type)
    ):
        if pa.types.is_fixed_size_list(batch_col.type):
            uniform = True
        else:
            w = np.diff(batch_col.offsets.to_numpy())
            uniform = len(w) == 0 or bool((w == w[0]).all())
        if uniform and len(batch_col):
            flat = batch_col.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64).reshape(len(batch_col), -1)
    return np.stack(batch_col.to_numpy(zero_copy_only=False)).astype(np.float64)


class _BatchTopK:
    def __init__(self, query_ref, k: int):
        self.query_ref = query_ref
        self.k = k
        self._q = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._q is None:
            self._q = ray.get(self.query_ref)
        q_ids, q_mat = self._q
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _stack(batch["embedding"])
        sims = cosine_matrix_duckdb(q_mat, mat)  # (n_queries, batch)
        r, c = _rowwise_topk(sims, ids, self.k)
        return pa.table(
            {
                "query_id": pa.array(q_ids[r].astype(np.int64), pa.int64()),
                "vec_id": pa.array(ids[c], pa.int64()),
                "cosine": pa.array(sims[r, c], pa.float64()),
            }
        )


def _rowwise_topk(m: np.ndarray, dst_ids: np.ndarray, k: int):
    """Row-wise top-k selection under the FINAL rank order — 6-dp ROUNDED
    value desc, dst id asc — so ties at the k boundary keep exactly the
    candidates the final merge would rank first.  (An argpartition on the
    unrounded values keeps an arbitrary tied subset: with > k duplicates
    the local cut could drop the tie-break winners, making results depend
    on the block/batch split and diverge from the SQL oracles.)
    Returns (row_indices, col_indices) of the selected finite entries."""
    rows, cols = m.shape
    kk = min(k, cols)
    if kk <= 0 or rows == 0:
        z = np.zeros(0, np.int64)
        return z, z.copy()
    flat = m.ravel()
    order = np.lexsort(
        (
            np.tile(dst_ids.astype(np.int64), rows),
            -np.round(flat, 6),
            np.repeat(np.arange(rows), cols),
        )
    )
    sel = order[(np.arange(rows * cols) % cols) < kk]
    sel = sel[np.isfinite(flat[sel])]
    return sel // cols, sel % cols


def _merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Merge per-batch partial top-k; rank by (rounded cosine desc, vec_id)."""
    partials = partials.copy()
    partials["cosine"] = partials["cosine"].round(6)
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    out = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return out[["query_id", "rank", "vec_id", "cosine"]]


def brute_topk(ds, query_ids: list[int], k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k of each query vector against the full dataset.

    ``query_ids`` select query vectors from the dataset itself (self-join
    style, so the oracle SQL can reproduce it exactly).
    """
    import ray

    qsel = ds.map_batches(
        lambda t: t.filter(
            pa.array(
                np.isin(
                    t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    np.array(query_ids),
                )
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    qsel = qsel.sort_values("vec_id")
    q_ids = qsel["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(qsel["embedding"].to_numpy()).astype(np.float64)
    ref = ray.put((q_ids, q_mat))
    partials = ds.map_batches(_BatchTopK(ref, k), batch_format="pyarrow").to_pandas()
    return _merge_topk(partials, k)


# --------------------------------------------------------------------------
# IVF
# --------------------------------------------------------------------------


def _kmeans(mat: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    centers = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ centers.T, axis=1)
        for c in range(len(centers)):
            members = mat[assign == c]
            if len(members):
                centers[c] = _normalize(members.mean(axis=0, keepdims=True))[0]
    return centers


class _AssignIVFCell:
    """map_batches: append ``cell`` = nearest-centroid index (the partition
    key of the stored index)."""

    def __init__(self, centers_ref):
        self.centers_ref = centers_ref
        self._centers = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._centers is None:
            self._centers = ray.get(self.centers_ref)
        mat = _normalize(_stack(batch["embedding"]))
        assign = np.argmax(mat @ self._centers.T, axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(assign, pa.int64()))


def build_ivf_index(
    ds,
    out_dir: str,
    n_clusters: int = 16,
    sample_rows: int = 2000,
) -> np.ndarray:
    """Write an IVF index: vectors hive-partitioned by their nearest-centroid
    cell (``cell=K/`` parquet) + the centroid matrix.

    The cluster assignment IS the partition key, so a query probing
    ``nprobe`` cells reads only those partitions from storage — at 10^12
    vectors a probe touches nprobe/n_clusters of the corpus instead of
    scanning and mask-filtering every batch.  Returns the centroids.
    """
    import ray

    import json
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, "_SUCCESS")
    cpath = os.path.join(out_dir, "centroids.npy")
    # the marker records the BUILD PARAMS: a persistent index built with a
    # different layout must be rebuilt, not silently reused
    params = {"n_clusters": n_clusters, "sample_rows": sample_rows}
    if os.path.exists(done):
        with open(done) as f:
            try:
                stamped = json.load(f)
            except json.JSONDecodeError:  # pre-params marker: force rebuild
                stamped = None
        if stamped == params:
            return np.load(cpath)
    # no valid marker: a partially-written cells/ dir from a crashed build
    # would DUPLICATE vectors if appended to -- always start clean
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    sample = ds.limit(sample_rows).to_pandas()
    centers = _kmeans(
        _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64)),
        n_clusters,
    )
    ds.map_batches(
        _AssignIVFCell(ray.put(centers)), batch_format="pyarrow"
    ).write_parquet(os.path.join(out_dir, "cells"), partition_cols=["cell"], compression="zstd")
    np.save(cpath, centers)
    with open(done, "w") as f:
        json.dump(params, f)
    return centers


def _probe_cell_task(
    spec: pa.Table, index_dir: str, qref, k: int, part_col: str = "cell"
) -> pa.Table:
    """One probed partition (IVF cell / LSH bucket) -> partial top-k for
    the queries probing it."""
    import pyarrow.parquet as pq

    import ray

    cell = int(spec[part_col][0].as_py())
    q_ids, q_mat, probe = ray.get(qref)
    t = pq.read_table(
        os.path.join(index_dir, part_col + "s", f"{part_col}={cell}"),
        columns=["vec_id", "embedding"],
    )
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_stack(t["embedding"]))
    probing = np.array([qi for qi in range(len(q_ids)) if cell in probe[qi]], np.int64)
    if len(probing) and len(ids):
        sims = q_mat[probing] @ mat.T  # (probing queries, cell)
        r, c = _rowwise_topk(sims, ids, k)
        out_q = q_ids[probing[r]].astype(np.int64).tolist()
        out_v = ids[c].tolist()
        out_s = sims[r, c].tolist()
    else:
        out_q, out_v, out_s = [], [], []
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        }
    )


def ivf_search_index(
    index_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Partition-pruned IVF search over a ``build_ivf_index`` directory:
    reads ONLY the union of the queries' nprobe cells."""
    import glob as _glob

    import ray
    import ray.data

    centers = np.load(os.path.join(index_dir, "centroids.npy"))
    q_mat = _normalize(np.asarray(q_mat, dtype=np.float64))
    probe = np.argsort(-(q_mat @ centers.T), axis=1)[:, :nprobe]
    existing = {
        int(os.path.basename(d).split("=")[1])
        for d in _glob.glob(os.path.join(index_dir, "cells", "cell=*"))
    }
    needed = sorted(set(probe.ravel().tolist()) & existing)
    if not needed:
        return _merge_topk(
            pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []}), k
        )
    qref = ray.put((np.asarray(q_ids, dtype=np.int64), q_mat, [set(p) for p in probe]))
    partials = (
        ray.data.from_items([{"cell": c} for c in needed])
        .map_batches(
            partial(_probe_cell_task, index_dir=index_dir, qref=qref, k=k),
            batch_size=1,
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return _merge_topk(partials, k)


def ivf_topk(
    ds,
    query_ids: list[int],
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2000,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """Approximate cosine top-k: probe only the nprobe nearest IVF cells.

    Builds (or reuses, when ``index_dir`` is given) a cell-partitioned IVF
    index and searches it with partition pruning — the probe reads
    ~nprobe/n_clusters of the stored vectors, never the full corpus.
    """
    import shutil
    import tempfile

    qsel = ds.map_batches(
        lambda t: t.filter(
            pa.array(
                np.isin(
                    t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    np.array(query_ids),
                )
            )
        ),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    q_ids = qsel["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(qsel["embedding"].to_numpy()).astype(np.float64)
    owns = index_dir is None
    idx = index_dir or tempfile.mkdtemp(prefix="ivf_index_", dir=scratch_base())
    try:
        build_ivf_index(ds, idx, n_clusters=n_clusters, sample_rows=sample_rows)
        return ivf_search_index(idx, q_ids, q_mat, k=k, nprobe=nprobe)
    finally:
        if owns:
            shutil.rmtree(idx, ignore_errors=True)


# --------------------------------------------------------------------------
# exact k-NN join (k-nearest-neighbor graph)
# --------------------------------------------------------------------------


def _read_rows(path: str, lo: int, n: int) -> pa.Table:
    """Rows [lo, lo+n) of a parquet file, reading ONLY the row groups that
    intersect the range — a block-pair task touches two blocks' worth of
    bytes, not the whole file (single-row-group files degrade to a full
    read, which is what they cost anyway)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    groups, acc, first_start = [], 0, 0
    for g in range(pf.metadata.num_row_groups):
        rows = pf.metadata.row_group(g).num_rows
        if acc + rows > lo and acc < lo + n:
            if not groups:
                first_start = acc
            groups.append(g)
        acc += rows
    if not groups:
        return pf.schema_arrow.empty_table()
    t = pf.read_row_groups(groups, columns=["vec_id", "embedding"])
    return t.slice(lo - first_start, n)


def _knn_block_pair_task(
    spec: pa.Table, path: str, k: int, block_rows: int
) -> pa.Table:
    """One (block_i, block_j) pair -> per-vector local top-k partials for
    BOTH blocks (the diagonal pair excludes self-matches).  Each partial
    row carries ``blk`` = its vector's SOURCE block index, the static
    ownership key the storage-shuffled reduce partitions by."""
    import pyarrow.parquet as pq

    bi = int(spec["i"][0].as_py())
    bj = int(spec["j"][0].as_py())
    ta = _read_rows(path, bi * block_rows, block_rows)
    tb = ta if bi == bj else _read_rows(path, bj * block_rows, block_rows)
    ida = ta["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    idb = tb["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    A, B = _stack(ta["embedding"]), _stack(tb["embedding"])
    sims = cosine_matrix_duckdb(A, B)
    if bi == bj:
        np.fill_diagonal(sims, -np.inf)
    out_q, out_v, out_s, out_b = [], [], [], []

    def _topk_rows(src_ids, dst_ids, m, src_blk):
        r, c = _rowwise_topk(m, dst_ids, k)
        out_q.extend(src_ids[r].tolist())
        out_v.extend(dst_ids[c].tolist())
        out_s.extend(m[r, c].tolist())
        out_b.extend([src_blk] * len(r))

    _topk_rows(ida, idb, sims, bi)
    if bi != bj:
        _topk_rows(idb, ida, sims.T, bj)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
            "blk": pa.array(out_b, pa.int64()),
        }
    )


def _knn_reduce_block_task(
    spec: pa.Table, scratch: str, k: int
) -> pa.Table:
    """One source block's partials (from ALL its pairs) -> final top-k per
    vector, fully vectorized (one lexsort, no per-vector frames)."""
    import pyarrow.parquet as pq

    b = int(spec["blk"][0].as_py())
    t = pq.read_table(os.path.join(scratch, f"blk={b}"))
    q = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = np.round(t["cosine"].to_numpy(zero_copy_only=False), 6)
    order = np.lexsort((v, -s, q))  # (vec asc, rounded cosine desc, nbr asc)
    q, v, s = q[order], v[order], s[order]
    first = np.concatenate(([True], q[1:] != q[:-1]))
    rank = np.arange(len(q)) - np.repeat(
        np.flatnonzero(first), np.diff(np.concatenate((np.flatnonzero(first), [len(q)])))
    ) + 1
    keep = rank <= k
    return pa.table(
        {
            "vec_id": pa.array(q[keep], pa.int64()),
            "rank": pa.array(rank[keep].astype(np.int64), pa.int64()),
            "nbr_id": pa.array(v[keep], pa.int64()),
            "cosine": pa.array(s[keep], pa.float64()),
        }
    )


def knn_join(
    path: str, k: int = 5, block_rows: int = 256, scratch_dir: str | None = None
) -> pd.DataFrame:
    """EXACT k-nearest-neighbor graph over an embedding parquet: for every
    vector, its top-k neighbors by cosine (self excluded; ties broken by
    neighbor id on 6-dp rounded cosine, matching the SQL oracle).

    Scale shape: a block-nested-loop join — the corpus splits into B
    row-range blocks and each of the B(B+1)/2 block PAIRS is one task
    computing a (block x block) matmul and emitting only its per-vector
    local top-k.  Nothing is broadcast and no task holds more than two
    blocks; the quadratic total work is inherent to an exact kNN graph
    (the approximate escape hatches are the IVF/LSH indexes above —
    probe the same machinery per vector instead of all pairs).

    Reduce: by default the N x B x k partial rows merge on the driver
    (fine up to millions of partials).  With ``scratch_dir`` the merge is
    a STORAGE SHUFFLE instead — a vector's partials are statically owned
    by its source block, so pair tasks hive-partition partials by ``blk``
    and one reduce task per block computes its vectors' final top-k with
    a single lexsort; the driver only ever holds the N x k result
    (tests pin reduce-path equality).
    """
    import pyarrow.parquet as pq

    import ray
    import ray.data

    n = pq.ParquetFile(path).metadata.num_rows
    nb = max(1, (n + block_rows - 1) // block_rows)
    specs = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]
    pair_fn = partial(
        _knn_block_pair_task, path=path, k=k, block_rows=block_rows
    )
    if scratch_dir is None:
        partials = (
            ray.data.from_items(specs)
            .map_batches(pair_fn, batch_size=1, batch_format="pyarrow")
            .to_pandas()
        )
        out = _merge_topk(partials.drop(columns=["blk"]), k)
        return out.rename(columns={"query_id": "vec_id", "vec_id": "nbr_id"})[
            ["vec_id", "rank", "nbr_id", "cosine"]
        ].reset_index(drop=True)

    import glob as _glob
    import shutil

    shutil.rmtree(scratch_dir, ignore_errors=True)
    ray.data.from_items(specs).map_batches(
        pair_fn, batch_size=1, batch_format="pyarrow"
    ).write_parquet(scratch_dir, partition_cols=["blk"], compression="zstd")
    rspecs = [
        {"blk": int(os.path.basename(d).split("=")[1])}
        for d in sorted(_glob.glob(os.path.join(scratch_dir, "blk=*")))
    ]
    out = (
        ray.data.from_items(rspecs)
        .map_batches(
            partial(_knn_reduce_block_task, scratch=scratch_dir, k=k),
            batch_size=1,
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return out.sort_values(["vec_id", "rank"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# LSH (random hyperplanes, single-table multi-probe)
# --------------------------------------------------------------------------
#
# The scale path the prompt calls "an IVF or LSH-bucketed variant", as the
# data-independent sibling of IVF: no training pass (no k-means sample), so
# the index build is one stateless map over the corpus — nothing to fit,
# nothing to drift when the corpus grows.  Single-table MULTI-PROBE
# (Lv et al., VLDB 2007) instead of the classic L-table scheme: L tables
# store L copies of every vector (L x storage at 100 TB), whereas one table
# + probing the nprobe buckets with the smallest sign-flip margin keeps ONE
# copy and turns recall into a pure query-time knob.


def _lsh_planes(dim: int, n_bits: int, seed: int = 13) -> np.ndarray:
    """(dim, n_bits) Gaussian hyperplane matrix, deterministic in seed."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def _lsh_bucket(proj: np.ndarray) -> np.ndarray:
    """Pack sign bits of (n, n_bits) projections into int64 bucket ids."""
    bits = (proj > 0).astype(np.int64)
    weights = (1 << np.arange(proj.shape[1], dtype=np.int64))[::-1]
    return bits @ weights


class _AssignLSHBucket:
    """map_batches: append ``bucket`` = packed sign bits of the vector's
    hyperplane projections (the partition key of the stored index)."""

    def __init__(self, planes_ref):
        self.planes_ref = planes_ref
        self._planes = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._planes is None:
            self._planes = ray.get(self.planes_ref)
        mat = _normalize(_stack(batch["embedding"]))
        bucket = _lsh_bucket(mat @ self._planes)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def build_lsh_index(
    ds,
    out_dir: str,
    n_bits: int = 8,
    seed: int = 13,
) -> np.ndarray:
    """Write an LSH index: vectors hive-partitioned by their sign-bit
    bucket (``bucket=K/`` parquet) + the hyperplane matrix.

    Like the IVF layout, the bucket IS the partition key, so a multi-probe
    query reads only its probed buckets from storage.  Unlike IVF there is
    no training sample: the planes are a seeded Gaussian draw, so the build
    is a single stateless map over the corpus.  Returns the planes.
    """
    import json
    import shutil

    import ray

    os.makedirs(out_dir, exist_ok=True)
    done = os.path.join(out_dir, "_SUCCESS")
    ppath = os.path.join(out_dir, "planes.npy")
    params = {"n_bits": n_bits, "seed": seed}
    if os.path.exists(done):
        with open(done) as f:
            try:
                stamped = json.load(f)
            except json.JSONDecodeError:
                stamped = None
        if stamped == params:
            return np.load(ppath)
    # no valid marker: a partially-written buckets/ dir from a crashed
    # build would DUPLICATE vectors if appended to -- always start clean
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    dim = len(ds.limit(1).to_pandas()["embedding"].iloc[0])
    planes = _lsh_planes(dim, n_bits, seed)
    ds.map_batches(
        _AssignLSHBucket(ray.put(planes)), batch_format="pyarrow"
    ).write_parquet(
        os.path.join(out_dir, "buckets"), partition_cols=["bucket"], compression="zstd"
    )
    np.save(ppath, planes)
    with open(done, "w") as f:
        json.dump(params, f)
    return planes


def _multiprobe_order(proj: np.ndarray) -> np.ndarray:
    """(n_queries, 2**n_bits) bucket ids ordered by probe priority.

    Multi-probe ranking: flipping bit i of the query's own bucket costs
    |proj_i| (the margin by which the vector cleared that hyperplane), a
    candidate bucket's cost is the sum over its flipped bits, and buckets
    are probed cheapest-first — the query's own bucket (cost 0) always
    leads.  n_bits is small (<= 16), so scoring all 2**n_bits buckets with
    one (2**n_bits, n_bits) mask matmul per query batch is trivial next to
    the probe I/O it prunes.
    """
    n_bits = proj.shape[1]
    all_ids = np.arange(1 << n_bits, dtype=np.int64)
    # bit matrix of every bucket id, MSB-first to match _lsh_bucket packing
    bits = (all_ids[:, None] >> np.arange(n_bits - 1, -1, -1)) & 1  # (2**n, n)
    own = (proj > 0).astype(np.float64)  # (n_queries, n_bits)
    ap = np.abs(proj)
    # cost[q,b] = sum_i |p_qi| * [bits_bi != own_qi]
    #           = sum_i |p_qi|*own_qi  +  sum_i |p_qi|*(1-2*own_qi)*bits_bi
    # i.e. a per-query base plus ONE (q,n)x(n,2**n) matmul -- no
    # (q, 2**n, n) broadcast tensor (9 MB/query at the n_bits=16 ceiling)
    base = (ap * own).sum(axis=1, keepdims=True)
    cost = base + (ap * (1.0 - 2.0 * own)) @ bits.T.astype(np.float64)
    return np.argsort(cost, axis=1, kind="stable").astype(np.int64)


def lsh_search_index(
    index_dir: str,
    q_ids: np.ndarray,
    q_mat: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
) -> pd.DataFrame:
    """Multi-probe LSH search over a ``build_lsh_index`` directory: each
    query probes its own bucket plus the nprobe-1 cheapest sign-flip
    neighbors, reading ONLY those partitions (the `_probe_cell_task`
    machinery shared with IVF)."""
    import glob as _glob

    import ray
    import ray.data

    planes = np.load(os.path.join(index_dir, "planes.npy"))
    q_mat = _normalize(np.asarray(q_mat, dtype=np.float64))
    order = _multiprobe_order(q_mat @ planes)
    probe = order[:, : min(nprobe, order.shape[1])]
    existing = {
        int(os.path.basename(d).split("=")[1])
        for d in _glob.glob(os.path.join(index_dir, "buckets", "bucket=*"))
    }
    needed = sorted(set(probe.ravel().tolist()) & existing)
    if not needed:
        return _merge_topk(
            pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []}), k
        )
    qref = ray.put((np.asarray(q_ids, dtype=np.int64), q_mat, [set(p) for p in probe]))
    partials = (
        ray.data.from_items([{"bucket": b} for b in needed])
        .map_batches(
            partial(
                _probe_cell_task,
                index_dir=index_dir,
                qref=qref,
                k=k,
                part_col="bucket",
            ),
            batch_size=1,
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    return _merge_topk(partials, k)


def lsh_topk(
    ds,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 8,
    nprobe: int = 8,
    seed: int = 13,
    index_dir: str | None = None,
) -> pd.DataFrame:
    """Approximate cosine top-k via single-table multi-probe LSH.

    Builds (or reuses, when ``index_dir`` is given) a bucket-partitioned
    LSH index and searches it with partition pruning; nprobe = 2**n_bits
    degrades gracefully to an exact scan (every bucket probed), which the
    tests use as an identity check against ``brute_topk``.
    """
    import shutil
    import tempfile

    qsel = ds.map_batches(
        lambda t: t.filter(
            pa.array(
                np.isin(
                    t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                    np.array(query_ids),
                )
            )
        ),
        batch_format="pyarrow",
    ).to_pandas().sort_values("vec_id")
    q_ids = qsel["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(qsel["embedding"].to_numpy()).astype(np.float64)
    owns = index_dir is None
    idx = index_dir or tempfile.mkdtemp(prefix="lsh_index_", dir=scratch_base())
    try:
        build_lsh_index(ds, idx, n_bits=n_bits, seed=seed)
        return lsh_search_index(idx, q_ids, q_mat, k=k, nprobe=nprobe)
    finally:
        if owns:
            shutil.rmtree(idx, ignore_errors=True)
