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


def probe_hit_counts(
    h: np.ndarray, off: np.ndarray, bench: np.ndarray
) -> np.ndarray:
    """Per-doc count of DISTINCT gram hashes found in the SORTED ``bench``
    array — the shared probe of contamination_hits and the curation
    pipeline's decontamination stage."""
    nsh = np.diff(off)
    didx = np.repeat(np.arange(len(nsh)), nsh)
    if len(bench) and len(h):
        pos = np.searchsorted(bench, h).clip(max=len(bench) - 1)
        hit = bench[pos] == h
    else:
        hit = np.zeros(len(h), dtype=bool)
    counts = np.zeros(len(nsh), dtype=np.int64)
    if hit.any():
        dh, hh = didx[hit], h[hit]
        order = np.lexsort((hh, dh))
        dh, hh = dh[order], hh[order]
        first = np.concatenate(([True], (dh[1:] != dh[:-1]) | (hh[1:] != hh[:-1])))
        counts = np.bincount(dh[first], minlength=len(nsh)).astype(np.int64)
    return counts


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
