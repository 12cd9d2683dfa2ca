"""Benchmark decontamination: flag documents sharing word k-grams with a
benchmark/test set — the standard contamination check of LLM training-data
pipelines (n-gram overlap against held-out eval sets).

Scale shape: the benchmark side is eval-set sized (thousands of docs), so
its DISTINCT k-gram hash set broadcasts once via ``ray.put`` and every
task probes it with one ``searchsorted`` against the sorted array — no
shuffle at all; the corpus streams through a stateless ``map_batches``.
Hashes come straight off the Arrow buffers (``shingle_hash_batch``), so
the k-gram SET is 1:1 with string k-grams modulo 64-bit collisions (same
contract as the MinHash route, `wse_ray/functions/dedup.py`).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _doc_kgram_hashes(texts: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(flat k-gram hashes, per-doc offsets); docs with fewer than k tokens
    emit NO grams (strict string k-gram semantics, one tokenize pass)."""
    from ..stages.vectorized_tokenize import shingle_hash_batch

    return shingle_hash_batch(texts, k=k, strict=True)


def benchmark_gram_set(bench_ds, k: int = 8, text_col: str = "text") -> np.ndarray:
    """Sorted distinct k-gram hashes of the benchmark set (driver-side —
    the benchmark is eval-sized by construction)."""

    def grams(t: pa.Table) -> pa.Table:
        h, _ = _doc_kgram_hashes(t[text_col], k)
        return pa.table({"h": pa.array(np.unique(h))})

    parts = bench_ds.map_batches(grams, batch_format="pyarrow").to_pandas()
    return np.unique(parts["h"].to_numpy())


def _distinct_hit_counts(
    h: np.ndarray, off: np.ndarray, hit: np.ndarray
) -> np.ndarray:
    """Per-doc count of DISTINCT gram hashes with ``hit`` set — shared by
    the exact (sorted-array) and Bloom probes."""
    nsh = np.diff(off)
    didx = np.repeat(np.arange(len(nsh)), nsh)
    counts = np.zeros(len(nsh), dtype=np.int64)
    if hit.any():
        dh, hh = didx[hit], h[hit]
        order = np.lexsort((hh, dh))
        dh, hh = dh[order], hh[order]
        first = np.concatenate(([True], (dh[1:] != dh[:-1]) | (hh[1:] != hh[:-1])))
        counts = np.bincount(dh[first], minlength=len(nsh)).astype(np.int64)
    return counts


def probe_hit_counts(
    h: np.ndarray, off: np.ndarray, bench: np.ndarray
) -> np.ndarray:
    """Per-doc count of DISTINCT gram hashes found in the SORTED ``bench``
    array — the shared probe of contamination_hits and the curation
    pipeline's decontamination stage."""
    if len(bench) and len(h):
        pos = np.searchsorted(bench, h).clip(max=len(bench) - 1)
        hit = bench[pos] == h
    else:
        hit = np.zeros(len(h), dtype=bool)
    return _distinct_hit_counts(h, off, hit)


class BloomFilter:
    """Vectorized 64-bit-word Bloom filter over gram hashes.

    The SCALE PATH of the benchmark probe: the exact sorted-array
    broadcast costs 8 B per distinct bench gram, a Bloom filter costs
    ``bits_per_elem``/8 B (2 B at the default 16) with O(1) probes — at a
    bench suite of 10^9 distinct grams that is a 2 GB broadcast instead
    of 8 GB, and the gap widens with wider gram hashes.  The price is a
    one-sided error: NO false negatives ever (every true hit is counted),
    and a false-positive rate of ~(1 - e^(-n_hashes/bits_per_elem))^
    n_hashes per probed gram (~5e-4 at 16 bits / 11 hashes), which
    inflates some hit counts — use ``min_hits`` > 1 downstream to push
    the per-DOC false-flag rate down geometrically.

    Double hashing (Kirsch–Mitzenmacher): probe i uses h1 + i*h2 where
    h1 is the gram hash and h2 an odd avalanche mix of it, so the filter
    needs no per-probe rehash of the underlying bytes.
    """

    def __init__(self, hashes: np.ndarray, bits_per_elem: int = 16, n_hashes: int = 11):
        from .joins import _mix64

        n = max(1, len(np.unique(hashes)))
        m = 1 << max(6, int(np.ceil(np.log2(n * bits_per_elem))))
        self.mask = np.uint64(m - 1)
        self.n_hashes = n_hashes
        self.bits_per_elem = bits_per_elem
        self.words = np.zeros(m >> 6, dtype=np.uint64)
        h1 = hashes.astype(np.uint64)
        h2 = _mix64(h1) | np.uint64(1)
        with np.errstate(over="ignore"):
            for i in range(n_hashes):
                pos = (h1 + np.uint64(i) * h2) & self.mask
                np.bitwise_or.at(
                    self.words, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: bool per hash (no false negatives)."""
        from .joins import _mix64

        if not len(hashes):
            return np.zeros(0, dtype=bool)
        h1 = hashes.astype(np.uint64)
        h2 = _mix64(h1) | np.uint64(1)
        member = np.ones(len(h1), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.n_hashes):
                pos = (h1 + np.uint64(i) * h2) & self.mask
                word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
                member &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return member


def benchmark_bloom(
    bench_ds, k: int = 8, text_col: str = "text",
    bits_per_elem: int = 16, n_hashes: int = 11,
) -> BloomFilter:
    """Bloom filter of the benchmark set's distinct k-gram hashes — the
    fixed-size replacement for ``benchmark_gram_set``'s sorted array."""
    return BloomFilter(
        benchmark_gram_set(bench_ds, k=k, text_col=text_col),
        bits_per_elem=bits_per_elem, n_hashes=n_hashes,
    )


def contamination_hits_bloom(ds, bloom: BloomFilter, k: int = 8, min_hits: int = 1):
    """(doc_id, n_hits) for docs whose count of DISTINCT Bloom-positive
    k-grams is >= ``min_hits``.  Superset of ``contamination_hits`` (no
    false negatives); counts may exceed the exact ones by the filter's
    false-positive rate."""
    import ray

    ref = ray.put(bloom)

    def probe(t: pa.Table) -> pa.Table:
        blm = ray.get(ref)
        h, off = _doc_kgram_hashes(t["text"], k)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = _distinct_hit_counts(h, off, blm.contains(h))
        keep = counts >= min_hits
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep]),
                "n_hits": pa.array(counts[keep].astype(np.int64)),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")


def contamination_hits(ds, bench_hashes: np.ndarray, k: int = 8):
    """(doc_id, n_hits) for every doc sharing >= 1 distinct k-gram with the
    benchmark set.  n_hits counts DISTINCT matching grams."""
    import ray

    ref = ray.put(np.sort(bench_hashes))

    def probe(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        h, off = _doc_kgram_hashes(t["text"], k)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = probe_hit_counts(h, off, bench)
        keep = counts > 0
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep]),
                "n_hits": pa.array(counts[keep].astype(np.int64)),
            }
        )

    return ds.map_batches(probe, batch_format="pyarrow")
