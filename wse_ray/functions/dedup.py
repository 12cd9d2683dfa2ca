"""Deduplication operators: exact, MinHash+LSH, SimHash, embedding-cosine.

Scale shapes (ray_guide.md patterns):

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


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles hashed to uint64 (deterministic)."""
    toks = [t.decode("utf-8", "replace") for t in tokenize_simple(text.encode())]
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    return pd.util.hash_array(np.asarray(shingles, dtype=object), categorize=False)


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


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[ia], "b": ids[ib]})


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(shingle_hashes(text_a, k).tolist())
    sb = set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(
    ds,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
):
    """Verified near-dup pairs (a < b, exact shingle-Jaccard >= threshold).

    LSH recall depends on (bands, rows): P(candidate) = 1-(1-j^r)^b.
    The candidate set and the verify join are both tiny relative to the
    corpus, so only (band rows) shuffle.
    """
    bands_ds = ds.map_batches(
        MinHashBands(num_perm, bands, shingle_k), batch_format="pyarrow"
    )
    # band rows are tiny (docs x bands); bucket-join on the driver.  At
    # 10^12-doc scale this becomes a hash-partitioned parquet write + one
    # pair-emitting task per bucket range (the same storage-shuffle pattern
    # as the index build) — a Ray groupby over millions of 1-row buckets is
    # the wrong tool at any scale.
    rows = bands_ds.to_pandas()
    dup_mask = rows.duplicated(["band_id", "band_hash"], keep=False)
    buckets = rows[dup_mask]
    cand_frames = [
        _bucket_pairs(g) for _, g in buckets.groupby(["band_id", "band_hash"], sort=False)
    ]
    cand = (
        pd.concat(cand_frames, ignore_index=True)
        if cand_frames
        else pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    )
    cand = cand.drop_duplicates().reset_index(drop=True) if len(cand) else cand
    if len(cand) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64), "jaccard": pd.Series(dtype=float)})
    need = set(cand["a"]) | set(cand["b"])
    texts: dict[int, str] = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        ids = batch["doc_id"].to_numpy()
        mask = np.isin(ids, np.array(sorted(need)))
        for i in np.flatnonzero(mask):
            texts[int(ids[i])] = batch["text"][int(i)].as_py()
    rows = []
    for a, b in zip(cand["a"], cand["b"]):
        j = jaccard(texts[int(a)], texts[int(b)], shingle_k)
        if j >= threshold:
            rows.append((int(a), int(b), round(j, 6)))
    rows.sort()
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"]).astype(
        {"a": np.int64, "b": np.int64, "jaccard": float}
    )


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


def embedding_dup_pairs(ds, tau: float = 0.95) -> pd.DataFrame:
    """Pairs (a<b) with cosine similarity >= tau over an embedding column.

    Test-scale: broadcast the (normalized) full matrix once with ray.put and
    matmul each batch against it.  At 10^12 scale the same stage runs per
    LSH/IVF bucket (see ann.py) so the broadcast is per-bucket.
    """
    import ray

    tbl = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = tbl["vec_id"].to_numpy(np.int64)
    mat = np.stack(tbl["embedding"].to_numpy())
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.maximum(norms, 1e-12)
    ref = ray.put((ids, mat))

    def batch_pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = np.stack(batch["embedding"].to_numpy(zero_copy_only=False))
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ all_mat.T
        rows_a, rows_b, rows_s = [], [], []
        for i, a in enumerate(bids):
            hits = np.flatnonzero(sims[i] >= tau)
            for j in hits:
                b = int(all_ids[j])
                if a < b:
                    rows_a.append(int(a))
                    rows_b.append(b)
                    rows_s.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "a": pa.array(rows_a, pa.int64()),
                "b": pa.array(rows_b, pa.int64()),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )

    out = ds.map_batches(batch_pairs, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)
