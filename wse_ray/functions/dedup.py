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
import logging
import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import scratch_base
from ..stages.vectorized_tokenize import shingle_hash_batch

_MERSENNE = (1 << 61) - 1
_LOG = logging.getLogger("wse_ray.dedup")


def _stage_done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _stage_mark(path: str) -> None:
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok\n")


def _fresh_stage(path: str) -> str:
    """Reset a stage dir for a (re)write: a crashed partial write must not
    leave fragments that a resume would read as complete."""
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    return path


def _text_col(batch: pa.Table) -> pa.Array:
    col = batch["text"]
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def add_md5(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    h = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    return pa.table({"doc_id": batch["doc_id"], "text_hash": pa.array(h, pa.string())})


def exact_dedup(ds) -> "ray.data.Dataset":  # noqa: F821
    """Survivor per distinct content hash: (doc_id=min, text_hash, n_copies).

    One shuffle of (hash, id) pairs — never the text — reduced by VECTORIZED
    ``aggregate(Min, Count)`` (a per-group pandas ``map_groups`` materialized
    millions of 1-row frames at scale)."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(add_md5, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )


def normalize_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonicalize text for near-exact dedup: unicode lowercase, collapse
    runs of whitespace to one space, strip leading/trailing spaces.
    Vectorized Arrow kernels (RE2 regex, same engine DuckDB uses, so
    ``lower`` + ``regexp_replace(.., '\\s+', ' ', 'g')`` + ``trim`` is the
    exact SQL-parity expression)."""
    import pyarrow.compute as pc

    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.utf8_lower(batch[text_col]), r"\s+", " "),
        " ",
    )
    cols = {c: batch[c] for c in batch.column_names}
    cols[text_col] = norm
    return pa.table(cols)


def normalized_dedup(ds) -> "ray.data.Dataset":  # noqa: F821
    """Exact dedup over whitespace/case-normalized text — catches the
    trivially-reformatted copies exact_dedup misses.  Same one-shuffle
    (hash, id) aggregate as exact_dedup after a stateless normalize map."""

    def hash_norm(t: pa.Table) -> pa.Table:
        return add_md5(normalize_text_batch(t))

    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(hash_norm, batch_format="pyarrow")
    return hashed.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="n_copies")
    )


# --------------------------------------------------------------------------
# minhash + LSH
# --------------------------------------------------------------------------


def _perm_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles of ONE document hashed to uint64 (deterministic) —
    scalar convenience wrapper over the batch path (shingle_hash_batch:
    content-complete FNV-1a token hashes straight from the Arrow buffers,
    windows combined with a polynomial mix; no shingle STRINGS, no
    library-pinned object-dtype hashing).  The shingle-hash set is 1:1 with
    the string k-shingle set (modulo 64-bit collisions), so Jaccard values
    match the string-based DuckDB oracle exactly."""
    flat, _off = shingle_hash_batch(
        pa.array([text.encode("utf-8")], pa.large_binary()), k
    )
    return flat


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
        n = len(doc_ids)
        # whole-batch vectorized shingling (no per-doc Python tokenize);
        # per-doc signature reduction: each doc's (perms x shingles) matrix
        # is small enough to stay cache-resident — a whole-batch matrix was
        # measured SLOWER (GB-sized temporaries)
        sh_flat, sh_off = shingle_hash_batch(_text_col(batch), self.k)
        sigs = np.empty((n, len(self.a)), dtype=np.uint64)
        for i in range(n):
            sigs[i] = minhash_signature(
                sh_flat[sh_off[i] : sh_off[i + 1]], self.a, self.b
            )
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


def _bucket_pairs(g: pd.DataFrame, max_bucket_members: int | None = None) -> pd.DataFrame:
    """All (a < b) pairs of one LSH bucket.  A bucket of m docs emits
    m(m-1)/2 pairs; above ``max_bucket_members`` MEMBERS it emits STAR
    pairs (min id -> every other) instead — an exact-dup cluster of a
    million docs must not produce 5*10^11 pairs.  Star candidate edges
    still go through downstream verification, so cluster CONNECTIVITY after
    verify is only guaranteed when every member truly matches the min-id
    doc (e.g. an exact-dup cluster); a giant bucket of merely-similar docs
    can lose true non-star pairs.  The fallback logs when it fires so a
    gate/oracle mismatch on a capped corpus is diagnosable."""
    ids = np.sort(g["doc_id"].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    if max_bucket_members is not None and len(ids) > max_bucket_members:
        _LOG.warning(
            "LSH bucket of %d members exceeds max_bucket_members=%d: "
            "emitting %d star pairs instead of %d all-pairs (recall loss "
            "possible for non-exact-dup clusters)",
            len(ids), max_bucket_members, len(ids) - 1, len(ids) * (len(ids) - 1) // 2,
        )
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


def _emit_bucket_pairs(spec: pa.Table, max_bucket_members: int | None = None) -> pa.Table:
    """One storage-shuffle partition -> candidate pairs (a < b), deduped
    within the partition.  Partition size is corpus/B band rows — bounded by
    choosing B, never driver-resident."""
    import pyarrow.parquet as pq

    df = pq.read_table(
        spec["src"][0].as_py(), columns=["band_id", "band_hash", "doc_id"]
    ).to_pandas()
    dup = df.duplicated(["band_id", "band_hash"], keep=False)
    frames = [
        _bucket_pairs(g, max_bucket_members)
        for _, g in df[dup].groupby(["band_id", "band_hash"], sort=False)
    ]
    if not frames:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "m": pa.array([], pa.int64()),
            }
        )
    # a pair emitted by several bands is KEPT AS A COUNT (m): the band-match
    # multiplicity is a free Jaccard estimator (m ~ Binomial(bands, j^r))
    # consumed by the min_band_matches prefilter downstream
    allp = pd.concat(frames, ignore_index=True)
    out = allp.groupby(["a", "b"], sort=False).size().reset_index(name="m")
    return pa.table(
        {
            "a": pa.array(out["a"].to_numpy(np.int64)),
            "b": pa.array(out["b"].to_numpy(np.int64)),
            "m": pa.array(out["m"].to_numpy(np.int64)),
        }
    )


def _assign_pair_part(batch: pa.Table, B: int) -> pa.Table:
    """Shuffle key for pair-keyed storage partitioning: hash(a, b) % B.  A
    given (a, b) pair always lands in the same partition (dedup and reduce
    are partition-local)."""
    a = batch["a"].to_numpy().astype(np.uint64)
    b = batch["b"].to_numpy().astype(np.uint64)
    mixed = (a * np.uint64(0x9E3779B97F4A7C15) ^ b) * np.uint64(0xC2B2AE3D27D4EB4F)
    return batch.append_column(
        "ppart", pa.array((mixed % np.uint64(B)).astype(np.int64), pa.int64())
    )


def _load_filtered_pairs(src: str, min_band_matches: int) -> pd.DataFrame:
    """Read ONE pair partition, sum the band-match multiplicity m per
    (a, b) across source bucket partitions (a given pair always lands whole
    in one partition), and apply the ``min_band_matches`` prefilter."""
    import pyarrow.parquet as pq

    t = pq.read_table(src, columns=["a", "b", "m"]).to_pandas()
    g = t.groupby(["a", "b"], sort=False)["m"].sum().reset_index()
    if min_band_matches > 1:
        g = g[g["m"] >= min_band_matches]
    return g


def _pair_partition_needs(spec: pa.Table, min_band_matches: int = 1) -> pa.Table:
    """One pair partition -> the DISTINCT doc_ids it needs shingles for
    (post-prefilter), tagged with the partition id — the rows of the
    doc->partition routing table (16 B/entry; the shingle content itself
    never rides along)."""
    src = spec["src"][0].as_py()
    ppart = int(os.path.basename(src.rstrip("/")).split("=", 1)[1])
    g = _load_filtered_pairs(src, min_band_matches)
    ids = np.unique(
        np.concatenate([g["a"].to_numpy(np.int64), g["b"].to_numpy(np.int64)])
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "ppart": pa.array(np.full(len(ids), ppart), pa.int64()),
        }
    )


class _CandidateShinglesToParts:
    """Semi-join + shingle + replicate stage: the corpus streams past a
    broadcast COMPACT routing table (sorted candidate doc_ids + CSR lists of
    the pair partitions needing each doc — ~16 B per (doc, partition) entry,
    NOT the shingle sets themselves).  Each candidate doc is shingled
    exactly once and its (doc_id, shingles) row is replicated to every pair
    partition that references it, so the verify stage is fully
    partition-local."""

    def __init__(self, route_ref, shingle_k: int):
        self.route_ref = route_ref
        self.k = shingle_k
        self._route = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._route is None:
            self._route = ray.get(self.route_ref)
        need_ids, csr_off, csr_parts = self._route
        if len(need_ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shingles": pa.array([], pa.large_list(pa.uint64())),
                    "ppart": pa.array([], pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(need_ids, ids)
        pos_c = np.minimum(pos, len(need_ids) - 1)
        member = need_ids[pos_c] == ids
        kept = batch.select(["doc_id", "text"]).filter(pa.array(member))
        kpos = pos_c[member]
        nk = len(kept)
        if nk == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "shingles": pa.array([], pa.large_list(pa.uint64())),
                    "ppart": pa.array([], pa.int64()),
                }
            )
        sh_flat, sh_off = shingle_hash_batch(_text_col(kept), self.k)
        # per-doc DISTINCT sorted shingle hashes as one list array
        uniq = [np.unique(sh_flat[sh_off[i] : sh_off[i + 1]]) for i in range(nk)]
        lens = np.array([len(u) for u in uniq], dtype=np.int64)
        sh_list = pa.LargeListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))), pa.int64()),
            pa.array(
                np.concatenate(uniq) if lens.sum() else np.zeros(0, np.uint64),
                pa.uint64(),
            ),
        )
        # replicate each kept row to its needed pair partitions (CSR gather)
        counts = (csr_off[kpos + 1] - csr_off[kpos]).astype(np.int64)
        total = int(counts.sum())
        row_rep = np.repeat(np.arange(nk, dtype=np.int64), counts)
        csum = np.concatenate(([0], np.cumsum(counts)[:-1]))
        gather = np.repeat(csr_off[kpos] - csum, counts) + np.arange(
            total, dtype=np.int64
        )
        take = pa.array(row_rep)
        return pa.table(
            {
                "doc_id": kept["doc_id"].take(take),
                "shingles": sh_list.take(take),
                "ppart": pa.array(csr_parts[gather], pa.int64()),
            }
        )


def _verify_partition_task(
    spec: pa.Table, threshold: float, min_band_matches: int = 1
) -> pa.Table:
    """One pair partition -> its verified (a, b, jaccard) rows.  Reads its
    OWN (prefiltered) pairs and its OWN co-shuffled shingle rows — no
    broadcast state; partition size is bounded by choosing the partition
    count.  Shingle sets stay in ONE flat Arrow-backed uint64 buffer
    addressed by (offset, length) per doc — no per-row Python list
    materialization.  Sorted-array intersection == set Jaccard."""
    import pyarrow.parquet as pq

    pairs = _load_filtered_pairs(spec["pairs"][0].as_py(), min_band_matches)
    sh_t = pq.read_table(spec["sh"][0].as_py(), columns=["doc_id", "shingles"])
    col = sh_t["shingles"].combine_chunks()
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    offs = np.asarray(col.offsets)
    ids = sh_t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    sids = ids[order]

    def row_of(doc: int) -> int:
        i = int(np.searchsorted(sids, doc))
        if i >= len(sids) or sids[i] != doc:
            raise KeyError(f"candidate doc {doc} missing from shingle partition")
        return int(order[i])

    out_a, out_b, out_j = [], [], []
    for a, b in zip(pairs["a"].to_numpy(np.int64), pairs["b"].to_numpy(np.int64)):
        ra, rb = row_of(a), row_of(b)
        sa = vals[offs[ra] : offs[ra + 1]]
        sb = vals[offs[rb] : offs[rb + 1]]
        if len(sa) == 0 and len(sb) == 0:
            j = 1.0
        else:
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
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
    max_bucket_members: int | None = 4096,
    verify_parts: int | None = None,
    min_band_matches: int = 1,
):
    """Verified near-dup pairs (a < b, exact shingle-Jaccard >= threshold).

    ``min_band_matches``: candidate prefilter on the number m of LSH bands
    that matched for a pair (m ~ Binomial(bands, j^rows), counted for free
    from pair multiplicity in the pair-keyed shuffle).  The default 1 keeps
    the classic any-band-matches LSH semantics.  On candidate-heavy corpora
    (huge moderate-Jaccard pair mass, e.g. tiny-vocab web boilerplate)
    raising it to 2-3 collapses the verify volume by orders of magnitude at
    a small, quantified recall cost at the threshold boundary: with 16x4
    LSH, P(m >= 2 | j=0.8) = 99.8%, P(m >= 2 | j=0.9) ~ 1-4e-7, while
    j~0.45 junk drops ~10x.  (Note the UNFILTERED contract already has
    P(m >= 1 | j=0.8) = 99.98% — LSH recall at the boundary was never 1.)

    ``max_bucket_members``: buckets with more MEMBERS than this emit star
    pairs instead of all pairs (see _bucket_pairs) — the
    giant-exact-dup-cluster safety valve.  Post-verify connectivity is
    guaranteed only for exact-dup clusters; the fallback logs when it fires.

    LSH recall depends on (bands, rows): P(candidate) = 1-(1-j^r)^b.

    Scale shape — nothing corpus-sized OR candidate-shingle-sized ever
    reaches the driver (every stage is the "storage is the shuffle"
    pattern from index/build.py):
    1. (band_id, band_hash, doc_id) rows hash-partition by bucket to
       storage; one task per partition emits its buckets' candidate pairs,
    2. which hash-partition by PAIR KEY to storage (``verify_parts``,
       default ``bucket_parts``).
    3. One task per pair partition lists the distinct doc_ids it needs —
       the doc->partition routing table, the only candidate-proportional
       driver state (~16 B per (doc, partition) entry; measured 180x
       smaller than the shingle-dict broadcast it replaced, BASELINE.md).
    4. The corpus streams past the broadcast routing table: each candidate
       doc is shingled once and its shingle row is REPLICATED to the pair
       partitions that need it (co-shuffled through storage).
    5. One task per pair partition verifies its pairs against its OWN
       shingle rows — partition-local state, no whole-candidate broadcast —
       and only QUALIFYING pairs return to the driver (the deliverable).

    Edge semantics: two docs with ZERO shingles (token-less text) count as
    exact dups (jaccard 1.0) — they share identical all-max signatures, so
    they always co-bucket.  The SQL ground-truth oracle has no shingle rows
    for such docs and omits those pairs; the testdata contains none.

    ``scratch_dir``, when supplied, is a per-corpus RESUME root: each
    storage stage (``bands``/``pairs``/``shingles``) carries a ``_SUCCESS``
    marker and is skipped when already complete, so a failed late stage
    reuses the earlier passes.  A ``params.json`` stamp invalidates the
    cache when layout parameters change; the CALLER owns corpus identity —
    reusing one scratch dir across different corpora returns stale pairs.
    """
    import glob as _glob
    import shutil
    import tempfile

    import ray
    import ray.data

    vparts = verify_parts or bucket_parts
    bands_ds = ds.map_batches(
        MinHashBands(num_perm, bands, shingle_k), batch_format="pyarrow"
    )
    owns_scratch = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="minhash_lsh_", dir=scratch_base())
    os.makedirs(scratch, exist_ok=True)  # explicit scratch_dir may not exist yet
    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "jaccard": pd.Series(dtype=float),
        }
    )
    # stage-level resume: when the caller supplies a scratch dir, each
    # completed storage stage (bands / pairs / shingles) is marked and
    # SKIPPED on rerun — a failed 100 TB verify must not redo the band
    # pass.  params.json guards against resuming under changed layout
    # params (the CALLER owns corpus identity: one scratch per corpus).
    import json as _json

    params = {
        "num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
        "bucket_parts": bucket_parts, "verify_parts": vparts,
        "max_bucket_members": max_bucket_members,
        "min_band_matches": min_band_matches,
    }
    try:
        pfile = os.path.join(scratch, "params.json")
        stale = False
        if os.path.exists(pfile):
            with open(pfile) as f:
                try:
                    stale = _json.load(f) != params
                except _json.JSONDecodeError:
                    stale = True
        if stale:
            for sub in ("bands", "pairs", "shingles"):
                shutil.rmtree(os.path.join(scratch, sub), ignore_errors=True)
        with open(pfile, "w") as f:
            _json.dump(params, f)
        bands_dir = os.path.join(scratch, "bands")
        if not _stage_done(bands_dir):
            _fresh_stage(bands_dir)
            bands_ds.map_batches(
                _AssignBucketPart(bucket_parts), batch_format="pyarrow"
            ).write_parquet(bands_dir, partition_cols=["bpart"], compression="zstd")
            _stage_mark(bands_dir)
        specs = [
            {"src": d} for d in sorted(_glob.glob(os.path.join(bands_dir, "bpart=*")))
        ]
        if not specs:
            return empty
        pair_scratch = os.path.join(scratch, "pairs")
        if not _stage_done(pair_scratch):
            _fresh_stage(pair_scratch)
            (
                ray.data.from_items(specs)
                .map_batches(
                    partial(_emit_bucket_pairs, max_bucket_members=max_bucket_members),
                    batch_size=1,
                    batch_format="pyarrow",
                )
                .map_batches(
                    partial(_assign_pair_part, B=vparts), batch_format="pyarrow"
                )
                .write_parquet(pair_scratch, partition_cols=["ppart"], compression="zstd")
            )
            _stage_mark(pair_scratch)
        pdirs = sorted(_glob.glob(os.path.join(pair_scratch, "ppart=*")))
        if not pdirs:
            return empty
        needs = (
            ray.data.from_items([{"src": d} for d in pdirs])
            .map_batches(
                partial(_pair_partition_needs, min_band_matches=min_band_matches),
                batch_size=1,
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        if len(needs) == 0:
            return empty
        needs = needs.sort_values(["doc_id", "ppart"])
        sh_scratch = os.path.join(scratch, "shingles")
        if not _stage_done(sh_scratch):
            _fresh_stage(sh_scratch)
            # compact CSR routing table: doc_id -> pair partitions needing it
            nid = needs["doc_id"].to_numpy(np.int64)
            need_ids, starts = np.unique(nid, return_index=True)
            csr_off = np.concatenate((starts, [len(nid)])).astype(np.int64)
            route_ref = ray.put(
                (need_ids, csr_off, needs["ppart"].to_numpy(np.int64))
            )
            ds.map_batches(
                _CandidateShinglesToParts(route_ref, shingle_k),
                batch_format="pyarrow",
            ).write_parquet(sh_scratch, partition_cols=["ppart"], compression="zstd")
            _stage_mark(sh_scratch)
        # only partitions with surviving (post-prefilter) pairs have shingle
        # rows; the rest have nothing to verify
        live = set(int(p) for p in needs["ppart"].unique())
        vspecs = [
            {"pairs": d, "sh": os.path.join(sh_scratch, os.path.basename(d))}
            for d in pdirs
            if int(os.path.basename(d).split("=", 1)[1]) in live
        ]
        if not vspecs:
            return empty
        verified = (
            ray.data.from_items(vspecs)
            .map_batches(
                partial(
                    _verify_partition_task,
                    threshold=threshold,
                    min_band_matches=min_band_matches,
                ),
                batch_size=1,
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
        n = len(ids)
        sh_flat, sh_off = shingle_hash_batch(_text_col(batch), self.k)
        out_sh, out_id, out_sz = [], [], []
        for i in range(n):
            sh = np.unique(sh_flat[sh_off[i] : sh_off[i + 1]])
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
    scratch = scratch_dir or tempfile.mkdtemp(prefix="ngram_shingles_", dir=scratch_base())
    os.makedirs(scratch, exist_ok=True)  # explicit scratch_dir may not exist yet
    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "jaccard": pd.Series(dtype=float),
        }
    )
    # stage-level resume (same contract as minhash_dedup_pairs: markers per
    # completed storage stage, params.json guard, caller owns corpus identity)
    import json as _json

    params = {
        "shingle_k": shingle_k, "bucket_parts": bucket_parts,
        "max_shingle_df": max_shingle_df,
    }
    try:
        pfile = os.path.join(scratch, "params.json")
        stale = False
        if os.path.exists(pfile):
            with open(pfile) as f:
                try:
                    stale = _json.load(f) != params
                except _json.JSONDecodeError:
                    stale = True
        if stale:
            for sub in ("shingles", "pairs"):
                shutil.rmtree(os.path.join(scratch, sub), ignore_errors=True)
        with open(pfile, "w") as f:
            _json.dump(params, f)

        def assign(batch: pa.Table, B=bucket_parts) -> pa.Table:
            part = (
                batch["shingle"].to_numpy().astype(np.uint64) % np.uint64(B)
            ).astype(np.int64)
            return batch.append_column("bpart", pa.array(part, pa.int64()))

        sh_dir = os.path.join(scratch, "shingles")
        if not _stage_done(sh_dir):
            _fresh_stage(sh_dir)
            rows.map_batches(assign, batch_format="pyarrow").write_parquet(
                sh_dir, partition_cols=["bpart"], compression="zstd"
            )
            _stage_mark(sh_dir)
        specs = [
            {"src": d} for d in sorted(_glob.glob(os.path.join(sh_dir, "bpart=*")))
        ]
        if not specs:
            return empty
        pair_scratch = os.path.join(scratch, "pairs")
        if not _stage_done(pair_scratch):
            _fresh_stage(pair_scratch)
            (
                ray.data.from_items(specs)
                .map_batches(
                    partial(_shingle_copair_task, max_shingle_df=max_shingle_df),
                    batch_size=1,
                    batch_format="pyarrow",
                )
                .map_batches(
                    partial(_assign_pair_part, B=bucket_parts), batch_format="pyarrow"
                )
                .write_parquet(
                    pair_scratch, partition_cols=["ppart"], compression="zstd"
                )
            )
            _stage_mark(pair_scratch)
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


_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (byte-LUT sum)."""
    if len(x) == 0:
        return np.zeros(0, dtype=np.int64)
    return (
        _POPCOUNT_LUT[np.ascontiguousarray(x).view(np.uint8).reshape(len(x), 8)]
        .sum(axis=1)
        .astype(np.int64)
    )


def _simhash_band_explode(batch: pa.Table) -> pa.Table:
    """documents' fingerprints -> 4x (band_id, band_hash, doc_id, simhash64)
    rows, fully vectorized (np.repeat/np.tile — no Python list building)."""
    sims = batch["simhash64"].to_numpy().astype(np.uint64)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    shift = np.repeat(np.arange(4, dtype=np.uint64) * np.uint64(16), n)
    sims_t = np.tile(sims, 4)
    return pa.table(
        {
            "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
            "band_hash": pa.array((sims_t >> shift) & np.uint64(0xFFFF)),
            "doc_id": pa.array(np.tile(ids, 4)),
            "simhash64": pa.array(sims_t),
        }
    )


def _simhash_partition_pairs(
    spec: pa.Table, max_hamming: int, max_bucket_members: int | None
) -> pa.Table:
    """One simhash bucket partition -> its verified (a, b, hamming) pairs.
    The fingerprint rides along with the band rows, so Hamming verification
    is partition-local (no broadcast).  Buckets above ``max_bucket_members``
    emit star pairs (same semantics and logging as the MinHash cap: post-
    verify connectivity guaranteed only for identical-fingerprint clusters).
    """
    import pyarrow.parquet as pq

    df = pq.read_table(
        spec["src"][0].as_py(),
        columns=["band_id", "band_hash", "doc_id", "simhash64"],
    ).to_pandas()
    dup = df.duplicated(["band_id", "band_hash"], keep=False)
    out_a, out_b, out_h = [], [], []
    for _, g in df[dup].groupby(["band_id", "band_hash"], sort=False):
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy(np.int64)
        sims = g["simhash64"].to_numpy().astype(np.uint64)
        m = len(ids)
        if m < 2:
            continue
        if max_bucket_members is not None and m > max_bucket_members:
            _LOG.warning(
                "simhash bucket of %d members exceeds max_bucket_members=%d: "
                "emitting star pairs (recall loss possible for "
                "non-identical-fingerprint clusters)",
                m, max_bucket_members,
            )
            ia = np.zeros(m - 1, dtype=np.int64)
            ib = np.arange(1, m, dtype=np.int64)
        else:
            ia, ib = np.triu_indices(m, k=1)
        ham = _popcount64(sims[ia] ^ sims[ib])
        keep = ham <= max_hamming
        out_a.append(ids[ia[keep]])
        out_b.append(ids[ib[keep]])
        out_h.append(ham[keep])
    if not out_a:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            }
        )
    res = pd.DataFrame(
        {
            "a": np.concatenate(out_a),
            "b": np.concatenate(out_b),
            "hamming": np.concatenate(out_h),
        }
    ).drop_duplicates(["a", "b"])  # same pair from several bands in this partition
    return pa.table(
        {
            "a": pa.array(res["a"].to_numpy(np.int64)),
            "b": pa.array(res["b"].to_numpy(np.int64)),
            "hamming": pa.array(res["hamming"].to_numpy(np.int64)),
        }
    )


def simhash_pairs(
    ds,
    max_hamming: int = 3,
    bucket_parts: int = 16,
    max_bucket_members: int | None = 4096,
    scratch_dir: str | None = None,
) -> pd.DataFrame:
    """Near-dup pairs by 64-bit simhash: 4x16-bit band blocking guarantees
    recall for Hamming distance <= 3; verify by actual distance.

    Scale shape (same as minhash_dedup_pairs): band rows hash-partition by
    bucket to STORAGE (not an in-memory Ray groupby — measured 20x slower
    here at mid scale), one task per partition emits and Hamming-verifies
    its buckets' pairs with the fingerprint carried in-row, and only
    verified pairs reach the driver.  ``max_bucket_members`` is the
    giant-cluster star-pair valve (expected bucket size is N/65536 per
    band, so at 10^9 docs buckets average ~15k members — uncapped all-pairs
    would be ~10^8 pairs per bucket).
    """
    import glob as _glob
    import shutil
    import tempfile

    import ray
    import ray.data

    from .textstats import fingerprints

    fp = ds.map_batches(fingerprints, batch_format="pyarrow").select_columns(
        ["doc_id", "simhash64"]
    )
    empty = pd.DataFrame(
        {
            "a": pd.Series(dtype=np.int64),
            "b": pd.Series(dtype=np.int64),
            "hamming": pd.Series(dtype=np.int64),
        }
    )
    owns = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="simhash_bands_", dir=scratch_base())
    os.makedirs(scratch, exist_ok=True)  # explicit scratch_dir may not exist yet
    try:
        # bands depend on nothing but the corpus and bucket_parts: resume
        # marker + a bucket_parts stamp in the dir name are sufficient
        bands_dir = os.path.join(scratch, f"bands_b{bucket_parts}")
        if not _stage_done(bands_dir):
            _fresh_stage(bands_dir)
            (
                fp.map_batches(_simhash_band_explode, batch_format="pyarrow")
                .map_batches(_AssignBucketPart(bucket_parts), batch_format="pyarrow")
                .write_parquet(bands_dir, partition_cols=["bpart"], compression="zstd")
            )
            _stage_mark(bands_dir)
        specs = [
            {"src": d} for d in sorted(_glob.glob(os.path.join(bands_dir, "bpart=*")))
        ]
        if not specs:
            return empty
        out = (
            ray.data.from_items(specs)
            .map_batches(
                partial(
                    _simhash_partition_pairs,
                    max_hamming=max_hamming,
                    max_bucket_members=max_bucket_members,
                ),
                batch_size=1,
                batch_format="pyarrow",
            )
            .to_pandas()
        )
    finally:
        if owns:
            shutil.rmtree(scratch, ignore_errors=True)
    if len(out) == 0:
        return empty
    # same pair can surface from bands living in different partitions
    return (
        out.drop_duplicates(["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype({"a": np.int64, "b": np.int64, "hamming": np.int64})
    )


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
    scratch = scratch_dir or tempfile.mkdtemp(prefix="embdup_cells_", dir=scratch_base())
    os.makedirs(scratch, exist_ok=True)  # explicit scratch_dir may not exist yet
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
