"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding-cosine.

Scale shapes:

* exact:     content-hash column in map_batches -> groupby(hash) ->
             keep min doc_id per group (one shuffle of (hash, doc_id) pairs,
             never the text);
* minhash:   shingle -> minhash signature per batch -> explode to
             (band_id, band_hash, doc_id) rows -> groupby band bucket ->
             candidate pairs -> exact-Jaccard verify on the (small)
             candidate set;
* simhash:   64-bit fingerprint -> 4x16-bit band blocking -> candidates ->
             Hamming verify (catches Hamming distance <= 3 or any pair
             agreeing on one band);
* embedding: cosine >= tau near-dup pairs; batch matmul against a broadcast
             matrix at test scale, LSH/IVF bucketing is the 10^12 path
             (see ann.py).
"""
from __future__ import annotations

import hashlib
import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tokenizer import tokenize_simple

_MERSENNE = (1 << 61) - 1


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def add_md5(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table({"doc_id": batch["doc_id"], "text_hash": pa.array(h, pa.string())})


def _keep_first(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [int(g["doc_id"].min())],
            "text_hash": [g["text_hash"].iloc[0]],
            "n_copies": [len(g)],
        }
    )


def exact_dedup(ds) -> "ray.data.Dataset":  # noqa: F821
    """Survivor per distinct content hash: (doc_id=min, text_hash, n_copies)."""
    hashed = ds.map_batches(add_md5, batch_format="pyarrow")
    return hashed.groupby("text_hash").map_groups(_keep_first, batch_format="pandas")


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles hashed to uint64 (deterministic).

    Tokens are hashed individually (one vectorized hash over the token
    array) and window hashes combine the k token hashes — no shingle
    STRINGS are ever built, which makes this ~4x cheaper per doc than
    joining text windows.  The shingle-hash set is 1:1 with the string
    k-shingle set (modulo 64-bit collisions), so Jaccard values match the
    string-based DuckDB oracle exactly.
    """
    toks = tokenize_simple(text.encode())
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    h = pd.util.hash_array(np.asarray(toks, dtype=object), categorize=False)
    n = len(h)
    kk = min(k, n)  # < k tokens -> one whole-sequence shingle
    c = h[: n - kk + 1].copy()
    for j in range(1, kk):
        c = (c * _SHINGLE_MIX) ^ h[j : n - kk + 1 + j]
    return c


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(sh) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*h + b) mod p, row = perm, col = shingle; min over shingles
    vals = (a[:, None] * (sh[None, :] % _MERSENNE) + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


class MinHashBands:
    """map_batches: documents -> (band_id, band_hash, doc_id) rows."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        assert num_perm % bands == 0
        self.r = num_perm // bands
        self.bands = bands
        self.k = shingle_k
        self.a, self.b = _perm_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        n = len(texts)
        # per-doc signatures: each doc's (perms x shingles) matrix is small
        # enough to stay cache-resident — a whole-batch matrix was measured
        # SLOWER (GB-sized temporaries); the loop body is numpy-dominated
        sigs = np.empty((n, len(self.a)), dtype=np.uint64)
        for i, text in enumerate(texts):
            sigs[i] = minhash_signature(shingle_hashes(text, self.k), self.a, self.b)
        # vectorized band fingerprints: polynomial mix of the r rows of each
        # band (band identity only creates CANDIDATE pairs, later verified
        # by exact Jaccard, so mix collisions are harmless)
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        out_ids = np.tile(doc_ids.astype(np.int64), self.bands)
        hashes = np.empty(self.bands * n, dtype=np.uint64)
        mul = np.uint64(0x9E3779B97F4A7C15)
        for bi in range(self.bands):
            chunk = sigs[:, bi * self.r : (bi + 1) * self.r]
            h = np.full(n, np.uint64(bi + 1), dtype=np.uint64)
            for c in range(self.r):
                h = (h ^ chunk[:, c]) * mul
            hashes[bi * n : (bi + 1) * n] = h
        return pa.table(
            {
                "band_id": pa.array(band_ids),
                "band_hash": pa.array(hashes),
                "doc_id": pa.array(out_ids),
            }
        )


def _bucket_pairs(g: pd.DataFrame, max_bucket_pairs: int | None = None) -> pd.DataFrame:
    """All (a < b) pairs of one LSH bucket.  A bucket of m docs emits
    m(m-1)/2 pairs; above ``max_bucket_pairs`` members it emits STAR pairs
    (min id -> every other) instead — an exact-dup cluster of a million
    docs must not produce 5*10^11 pairs.  Star pairs keep the cluster
    CONNECTED (dedup_clusters still groups it correctly); only the
    non-adjacent pair list is elided."""
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    if max_bucket_pairs is not None and len(ids) > max_bucket_pairs:
        return pd.DataFrame({"a": np.full(len(ids) - 1, ids[0]), "b": ids[1:]})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[ia], "b": ids[ib]})


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class _AssignBucketPart:
    """Shuffle key for the LSH bucket join: hash(band_id, band_hash) % B.
    A bucket's rows land in exactly one storage partition, so one task per
    partition sees every bucket it owns COMPLETE."""

    def __init__(self, n_parts: int):
        self.B = n_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["band_hash"].to_numpy().astype(np.uint64)
        b = batch["band_id"].to_numpy().astype(np.uint64)
        mixed = (h ^ (b * np.uint64(0x9E3779B97F4A7C15))) * np.uint64(
            0xC2B2AE3D27D4EB4F
        )
        part = (mixed % np.uint64(self.B)).astype(np.int64)
        return batch.append_column("bpart", pa.array(part, pa.int64()))


def _emit_bucket_pairs(spec: pa.Table, max_bucket_pairs: int | None = None) -> pa.Table:
    """One storage-shuffle partition -> candidate pairs (a < b), deduped
    within the partition.  Partition size is corpus/B band rows — bounded by
    choosing B, never driver-resident."""
    import pyarrow.parquet as pq

    df = pq.read_table(
        spec["src"][0].as_py(), columns=["band_id", "band_hash", "doc_id"]
    ).to_pandas()
    dup = df.duplicated(["band_id", "band_hash"], keep=False)
    frames = [
        _bucket_pairs(g, max_bucket_pairs)
        for _, g in df[dup].groupby(["band_id", "band_hash"], sort=False)
    ]
    out = (
        pd.concat(frames, ignore_index=True).drop_duplicates()
        if frames
        else pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    )
    return pa.table(
        {"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())}
    )


class _CandidateShingles:
    """Broadcast-filter + shingle stage: keep only rows whose doc_id is in
    the (small) candidate set and return their DISTINCT shingle hashes —
    the corpus streams past; each candidate doc is tokenized exactly once,
    here, not once per verified pair."""

    def __init__(self, ids_ref, shingle_k: int):
        self.ids_ref = ids_ref
        self.k = shingle_k
        self._ids = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._ids is None:
            self._ids = ray.get(self.ids_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = np.isin(ids, self._ids)
        kept = batch.select(["doc_id", "text"]).filter(pa.array(mask))
        shingles = [
            np.unique(shingle_hashes(t, self.k))
            for t in kept["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": kept["doc_id"],
                "shingles": pa.array(
                    [s.tolist() for s in shingles], pa.large_list(pa.uint64())
                ),
            }
        )


class _VerifyJaccard:
    """map_batches over candidate-pair rows: exact Jaccard on the
    precomputed shingle-hash sets (broadcast once per actor).  Sorted-array
    intersection == set Jaccard on the same hashes."""

    def __init__(self, shingles_ref, threshold: float):
        self.shingles_ref = shingles_ref
        self.threshold = threshold
        self._sh = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._sh is None:
            self._sh = ray.get(self.shingles_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            sa, sb = self._sh[a], self._sh[b]
            if len(sa) == 0 and len(sb) == 0:
                j = 1.0
            else:
                inter = len(np.intersect1d(sa, sb, assume_unique=True))
                j = inter / (len(sa) + len(sb) - inter)
            if j >= self.threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 6))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )


def minhash_dedup_pairs(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    scratch_dir: str | None = None,
    bucket_parts: int = 16,
    max_bucket_pairs: int | None = 4096,
):
    """Verified near-dup pairs (a < b, exact shingle-Jaccard >= threshold).

    ``max_bucket_pairs``: buckets larger than this emit star pairs instead
    of all pairs (see _bucket_pairs) — the giant-exact-dup-cluster safety
    valve; clusters stay connected for dedup_clusters.

    LSH recall depends on (bands, rows): P(candidate) = 1-(1-j^r)^b.

    Scale shape — nothing corpus-sized ever reaches the driver:
    1. (band_id, band_hash, doc_id) rows hash-partition by bucket to
       storage (the index build's "storage is the shuffle" pattern,
       index/build.py); a Ray groupby over millions of tiny buckets is the
       wrong tool at any scale.
    2. One task per partition emits its buckets' candidate pairs.
    3. Candidate doc texts are fetched with a broadcast-filter join
       (candidate-id set is ray.put once; the corpus streams past it) and
    4. pairs verify by exact Jaccard in a map_batches with the candidate
       texts broadcast.  Driver memory is O(candidates), not O(corpus).

    Edge semantics: two docs with ZERO shingles (token-less text) count as
    exact dups (jaccard 1.0) — they share identical all-max signatures, so
    they always co-bucket.  The SQL ground-truth oracle has no shingle rows
    for such docs and omits those pairs; the testdata contains none.
    """
    import glob as _glob
    import shutil
    import tempfile

    import ray
    import ray.data

    bands_ds = ds.map_batches(
        MinHashBands(num_perm, bands, shingle_k), batch_format="pyarrow"
    )
    owns_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="minhash_lsh_")
    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "jaccard": pd.Series(dtype=float),
        }
    )
    try:
        bands_ds.map_batches(
            _AssignBucketPart(bucket_parts), batch_format="pyarrow"
        ).write_parquet(scratch, partition_cols=["bpart"], compression="zstd")
        specs = [
            {"src": d} for d in sorted(_glob.glob(os.path.join(scratch, "bpart=*")))
        ]
        if not specs:
            return empty
        cand = (
            ray.data.from_items(specs)
            .map_batches(
                partial(_emit_bucket_pairs, max_bucket_pairs=max_bucket_pairs),
                batch_size=1,
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        # candidate set is tiny relative to the corpus (dup clusters only);
        # cross-partition duplicates (same pair from different bands) drop here
        cand = cand.drop_duplicates().reset_index(drop=True)
        if len(cand) == 0:
            return empty
        need = np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()]))
        ids_ref = ray.put(need)
        sh_df = ds.map_batches(
            _CandidateShingles(ids_ref, shingle_k), batch_format="pyarrow"
        ).to_pandas()
        shingles_ref = ray.put(
            {
                int(i): np.asarray(s, dtype=np.uint64)
                for i, s in zip(sh_df["doc_id"], sh_df["shingles"])
            }
        )
        n_blocks = max(1, min(256, len(cand) // 20000 + 1))
        verified = (
            ray.data.from_pandas(cand, override_num_blocks=n_blocks)
            .map_batches(
                _VerifyJaccard(shingles_ref, threshold),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
    finally:
        if owns_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
    if len(verified) == 0:
        return empty
    return (
        verified.sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": np.int64, "b": np.int64, "jaccard": float})
    )


# --------------------------------------------------------------------------
# exact n-gram (shingle) Jaccard dedup
# --------------------------------------------------------------------------


class _ShingleRows:
    """map_batches: documents -> (shingle_hash, doc_id) distinct rows plus a
    per-doc shingle-set size side column (needed for |A u B|)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        out_sh, out_id, out_sz = [], [], []
        for i, text in enumerate(texts):
            sh = np.unique(shingle_hashes(text, self.k))
            out_sh.append(sh)
            out_id.append(np.full(len(sh), ids[i], dtype=np.int64))
            out_sz.append(np.full(len(sh), len(sh), dtype=np.int64))
        return pa.table(
            {
                "shingle": pa.array(np.concatenate(out_sh) if out_sh else np.zeros(0, np.uint64)),
                "doc_id": pa.array(np.concatenate(out_id) if out_id else np.zeros(0, np.int64)),
                "set_size": pa.array(np.concatenate(out_sz) if out_sz else np.zeros(0, np.int64)),
            }
        )


def _shingle_copair_task(spec: pa.Table, max_shingle_df: int | None) -> pa.Table:
    """One shingle-hash partition -> partial intersection counts per doc
    pair, with each doc's GLOBAL shingle-set size carried along.  Every
    shingle lives in exactly one partition, so summing the partials across
    partitions gives the exact |A n B|."""
    import pyarrow.parquet as pq

    df = (
        pq.read_table(
            spec["src"][0].as_py(), columns=["shingle", "doc_id", "set_size"]
        )
        .to_pandas()
        .drop_duplicates(["shingle", "doc_id"])
    )
    if max_shingle_df is not None:
        # hub-shingle cap (documented recall loss): a shingle shared by m
        # docs emits m^2 join rows; skip the pathological hubs
        sizes = df.groupby("shingle")["doc_id"].transform("size")
        df = df[sizes <= max_shingle_df]
    m = df.merge(df, on="shingle")
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    inter = (
        m.groupby(
            ["doc_id_x", "doc_id_y", "set_size_x", "set_size_y"], sort=False
        )
        .size()
        .reset_index(name="inter_p")
    )
    return pa.table(
        {
            "a": pa.array(inter["doc_id_x"].to_numpy(np.int64)),
            "b": pa.array(inter["doc_id_y"].to_numpy(np.int64)),
            "ca": pa.array(inter["set_size_x"].to_numpy(np.int64)),
            "cb": pa.array(inter["set_size_y"].to_numpy(np.int64)),
            "inter_p": pa.array(inter["inter_p"].to_numpy(np.int64)),
        }
    )


def _reduce_pair_partials(spec: pa.Table, threshold: float) -> pa.Table:
    """One pair-hash partition -> its summed intersections, jaccard-filtered.
    Every (a, b) pair lives whole in one partition, so the local sum is the
    exact global |A n B|."""
    import pyarrow.parquet as pq

    df = pq.read_table(
        spec["src"][0].as_py(), columns=["a", "b", "ca", "cb", "inter_p"]
    ).to_pandas()
    g = (
        df.groupby(["a", "b", "ca", "cb"], sort=False)["inter_p"]
        .sum()
        .reset_index()
    )
    ii = g["inter_p"].to_numpy(np.int64)
    ca = g["ca"].to_numpy(np.int64)
    cb = g["cb"].to_numpy(np.int64)
    jac = ii / (ca + cb - ii)
    keep = jac >= threshold
    return pa.table(
        {
            "a": pa.array(g["a"].to_numpy(np.int64)[keep]),
            "b": pa.array(g["b"].to_numpy(np.int64)[keep]),
            "jaccard": pa.array(np.round(jac[keep], 6), pa.float64()),
        }
    )


def ngram_jaccard_pairs(
    ds,
    threshold: float = 0.8,
    shingle_k: int = 3,
    bucket_parts: int = 16,
    max_shingle_df: int | None = None,
    scratch_dir: str | None = None,
) -> pd.DataFrame:
    """EXACT shingle-Jaccard near-dup pairs (a < b, jaccard >= threshold) —
    no LSH approximation: a distributed inverted shingle index.

    1. distinct (shingle_hash, doc_id, global set size) rows hash-partition
       by shingle to storage (each shingle whole in one partition);
    2. one task per partition self-joins its shingle buckets into partial
       |A n B| counts (set sizes carried along);
    3. the pair partials hash-partition by (a, b) to storage (second
       storage shuffle — Ray's in-memory groupby measured 20x slower here)
       and one task per partition sums them and filters
       jaccard = |A n B| / (|A| + |B| - |A n B|) >= threshold — only
       QUALIFYING pairs ever reach the driver.

    Compute is O(sum bucket^2): exact by default; ``max_shingle_df`` caps
    hub shingles (with a recall loss only for pairs whose ONLY shared
    shingles are hubs — not near-dups at dedup thresholds).  Same output
    contract as minhash_dedup_pairs, so the two engines cross-check.

    Scale envelope (measured, BASELINE.md): on real web text the shingle
    df distribution is sparse and this scales with the dup mass; on
    HIGH-OVERLAP corpora (small vocab, e.g. the synthetic testdata) the
    mid-tail co-occurrence volume grows ~quadratically in N — 4 s at 5k
    docs but 243 s at 100k docs.  Beyond that regime use
    ``minhash_dedup_pairs`` (LSH prunes candidates before any pair work;
    19k docs/s at 2M docs) and keep this engine as the exact oracle for
    bounded corpora or candidate re-verification.
    """
    import glob as _glob
    import shutil
    import tempfile

    import ray
    import ray.data

    rows = ds.map_batches(_ShingleRows(shingle_k), batch_format="pyarrow")
    owns = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="ngram_shingles_")
    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "jaccard": pd.Series(dtype=float),
        }
    )
    try:

        def assign(batch: pa.Table, B=bucket_parts) -> pa.Table:
            part = (
                batch["shingle"].to_numpy().astype(np.uint64) % np.uint64(B)
            ).astype(np.int64)
            return batch.append_column("bpart", pa.array(part, pa.int64()))

        rows.map_batches(assign, batch_format="pyarrow").write_parquet(
            scratch, partition_cols=["bpart"], compression="zstd"
        )
        specs = [
            {"src": d} for d in sorted(_glob.glob(os.path.join(scratch, "bpart=*")))
        ]
        if not specs:
            return empty
        def assign_pair_part(batch: pa.Table, B=bucket_parts) -> pa.Table:
            a = batch["a"].to_numpy().astype(np.uint64)
            b = batch["b"].to_numpy().astype(np.uint64)
            mixed = (a * np.uint64(0x9E3779B97F4A7C15) ^ b) * np.uint64(
                0xC2B2AE3D27D4EB4F
            )
            return batch.append_column(
                "ppart", pa.array((mixed % np.uint64(B)).astype(np.int64), pa.int64())
            )

        pair_scratch = os.path.join(scratch, "pairs")
        (
            ray.data.from_items(specs)
            .map_batches(
                partial(_shingle_copair_task, max_shingle_df=max_shingle_df),
                batch_size=1,
                batch_format="pyarrow",
            )
            .map_batches(assign_pair_part, batch_format="pyarrow")
            .write_parquet(pair_scratch, partition_cols=["ppart"], compression="zstd")
        )
        pspecs = [
            {"src": d}
            for d in sorted(_glob.glob(os.path.join(pair_scratch, "ppart=*")))
        ]
        if not pspecs:
            return empty
        out = (
            ray.data.from_items(pspecs)
            .map_batches(
                partial(_reduce_pair_partials, threshold=threshold),
                batch_size=1,
                batch_format="pyarrow",
            )
            .to_pandas()  # qualifying pairs only (the deliverable)
        )
        if len(out) == 0:
            return empty
    finally:
        if owns:
            shutil.rmtree(scratch, ignore_errors=True)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# simhash near-dup
# --------------------------------------------------------------------------


def simhash_pairs(ds, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs by 64-bit simhash: 4x16-bit band blocking guarantees
    recall for Hamming distance <= 3; verify by actual distance."""
    from .textstats import fingerprints

    fp = ds.map_batches(fingerprints, batch_format="pyarrow").select_columns(
        ["doc_id", "simhash64"]
    )

    def bands(batch: pa.Table) -> pa.Table:
        sims = batch["simhash64"].to_numpy().astype(np.uint64)
        ids = batch["doc_id"].to_numpy()
        out_band, out_key, out_id, out_sim = [], [], [], []
        for bi in range(4):
            key = (sims >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
            out_band.extend([bi] * len(ids))
            out_key.extend(key.tolist())
            out_id.extend(ids.tolist())
            out_sim.extend(sims.tolist())
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "key": pa.array(np.array(out_key, dtype=np.uint64)),
                "doc_id": pa.array(out_id, pa.int64()),
                "simhash64": pa.array(np.array(out_sim, dtype=np.uint64)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sims = g["simhash64"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64), "hamming": pd.Series(dtype=np.int64)})
        ia, ib = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(sims[x]) ^ int(sims[y])).count("1") for x, y in zip(ia, ib)]
        )
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[ia[keep]], "b": ids[ib[keep]], "hamming": ham[keep]})

    out = (
        fp.map_batches(bands, batch_format="pyarrow")
        .groupby(["band_id", "key"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64), "hamming": pd.Series(dtype=np.int64)})
    return out.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------


class _AssignCells:
    """map_batches: replicate each vector row to its ``multi_assign``
    nearest IVF cells (cell = partition key of the pair stage).  Multi-
    assignment catches near-dup pairs that straddle a cell boundary: two
    vectors at cosine >= tau sit close in space, so they share at least one
    of their top cells with high probability."""

    def __init__(self, centers_ref, multi_assign: int):
        self.centers_ref = centers_ref
        self.m = multi_assign
        self._centers = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._centers is None:
            self._centers = ray.get(self.centers_ref)
        mat = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        m = min(self.m, len(self._centers))
        sims = mat @ self._centers.T
        top = np.argpartition(-sims, m - 1, axis=1)[:, :m]
        take = np.repeat(np.arange(len(mat)), m)
        out = batch.select(["vec_id", "embedding"]).take(pa.array(take))
        return out.append_column(
            "cell", pa.array(top.ravel().astype(np.int64), pa.int64())
        )


def _cell_pairs_task(spec: pa.Table, tau: float) -> pa.Table:
    """One IVF cell -> its internal cosine >= tau pairs (a < b).  Cell size
    is ~multi_assign * N / n_clusters vectors — bounded by cluster count."""
    import pyarrow.parquet as pq

    t = pq.read_table(spec["src"][0].as_py(), columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, first = np.unique(ids, return_index=True)
    mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False))[first].astype(
        np.float64
    )
    ids = uniq
    if len(ids) < 2:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T
    ia, ib = np.nonzero(np.triu(sims >= tau, k=1))
    return pa.table(
        {
            "a": pa.array(ids[ia], pa.int64()),
            "b": pa.array(ids[ib], pa.int64()),
            "cosine": pa.array(np.round(sims[ia, ib], 6), pa.float64()),
        }
    )


def embedding_dup_pairs(
    ds,
    tau: float = 0.95,
    n_clusters: int = 32,
    multi_assign: int = 2,
    sample_rows: int = 4000,
    scratch_dir: str | None = None,
) -> pd.DataFrame:
    """Pairs (a<b) with cosine similarity >= tau over an embedding column.

    Scale shape: vectors route to their ``multi_assign`` nearest IVF cells
    (centroids from a driver-side sample, broadcast once), the cell is the
    storage partition key, and the pair stage runs PER CELL — an all-pairs
    matmul only within each bounded cell, never against the whole corpus,
    and nothing corpus-sized on the driver.  Recall is approximate (a pair
    is found iff it shares a cell) but near-1 at near-dup thresholds; for
    an exact blocked variant over a semantic key see
    pipelines/engine_queries.q_dedup_embedding.
    """
    import glob as _glob
    import shutil
    import tempfile

    import ray
    import ray.data

    from .ann import _kmeans, _normalize

    sample = ds.limit(sample_rows).to_pandas()
    centers = _kmeans(
        _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64)),
        n_clusters,
    )
    centers_ref = ray.put(centers)
    owns_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="embdup_cells_")
    try:
        ds.map_batches(
            _AssignCells(centers_ref, multi_assign), batch_format="pyarrow"
        ).write_parquet(scratch, partition_cols=["cell"], compression="zstd")
        specs = [
            {"src": d} for d in sorted(_glob.glob(os.path.join(scratch, "cell=*")))
        ]
        if not specs:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64),
                    "cosine": pd.Series(dtype=float),
                }
            )
        out = (
            ray.data.from_items(specs)
            .map_batches(
                partial(_cell_pairs_task, tau=tau), batch_size=1, batch_format="pyarrow"
            )
            .to_pandas()
        )
    finally:
        if owns_scratch:
            shutil.rmtree(scratch, ignore_errors=True)
    return (
        out.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# dedup finisher: verified pairs -> clusters / survivors
# --------------------------------------------------------------------------


def dedup_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """Connected components over verified near-dup pairs: (doc_id, rep_id)
    where rep_id = min doc_id of the component — the survivor each doc
    should be collapsed to.  Union-find over the PAIR LIST (output-sized,
    not corpus-sized: docs with no near-dup never appear).  At extreme pair
    counts run per pair-hash partition first and stitch the (tiny) spanning
    remainder — the pair list here is already the post-verify deliverable.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # smaller id wins -> rep = min of component
    docs = sorted(set(map(int, pairs["a"])) | set(map(int, pairs["b"])))
    return pd.DataFrame(
        {
            "doc_id": pd.array(docs, dtype=np.int64),
            "rep_id": pd.array([find(d) for d in docs], dtype=np.int64),
        }
    )
