"""End-to-end corpus curation: the flagship composition of the
training-data operators — quality filter -> exact-dedup survivors ->
benchmark decontamination — as one streaming pipeline.

Stages (all reuse the gated primitives):

1. **quality**: one map stage computes n_tokens (span scan only — no
   hashing) and the duplicate-trigram fraction (one
   ``shingle_hash_batch(strict=True)`` + ``_per_doc_runs``) and keeps
   docs with ``n_tokens >= min_tokens`` and ``dup_trigram_frac <=
   max_dup3``; its output is materialized ONCE because both later stages
   consume it.
2. **dedup**: ``groupby(md5(text)).aggregate(Min(doc_id))`` yields the
   survivor id set — broadcast once (output-sized; for corpora whose kept
   set outgrows a broadcast, swap the membership filter for
   ``functions.joins.partitioned_join`` on text_hash; the stage contract
   is unchanged).
3. **decontam**: the held-out slice's distinct 5-gram hash set broadcasts
   once; docs sharing any gram are dropped (``contamination_hits``).

Output: (doc_id, source, n_tokens) of the curated corpus, the exact rows
a downstream tokenize/pack stage would consume.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def curate_corpus(
    docs_ds, bench_ds, min_tokens: int = 20, max_dup3: float = 0.05,
    decontam_k: int = 5,
):
    """Curated (doc_id, source, n_tokens) Dataset; see module docstring."""
    import ray

    from ..functions.decontam import benchmark_gram_set
    from ..functions.textstats import _per_doc_runs
    from ..stages.vectorized_tokenize import shingle_hash_batch

    def quality(t: pa.Table) -> pa.Table:
        from ..stages.vectorized_tokenize import _binary_buffer, _token_spans

        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # token counts from the span scan alone (no hashing needed)
        data, doc_off = _binary_buffer(text)
        _, _, doc_idx = _token_spans(data, doc_off, "simple")
        ntok = np.bincount(doc_idx, minlength=len(doc_off) - 1).astype(np.int64)
        h3, off3 = shingle_hash_batch(text, k=3, strict=True)
        tot3 = np.diff(off3).astype(np.float64)
        _mx, distinct = _per_doc_runs(h3, off3)
        dup3 = np.where(tot3 > 0, 1.0 - distinct / np.maximum(tot3, 1.0), 0.0)
        keep = (ntok >= min_tokens) & (np.round(dup3, 6) <= max_dup3)
        out = t.filter(pa.array(keep))
        md5 = [hashlib.md5(s.as_py().encode()).hexdigest() for s in out["text"]]
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "source": out["source"],
                "text": out["text"],
                "n_tokens": pa.array(ntok[keep]),
                # typed: an all-filtered block must not emit a null column
                "text_hash": pa.array(md5, pa.string()),
            }
        )

    # materialize once: both the survivor groupby and the finalize pass
    # consume q — without this the whole quality lineage (read + tokenize +
    # md5) would execute twice.  Object-store backed; Ray spills to disk
    # when the kept set exceeds memory.
    q = docs_ds.map_batches(quality, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Min

    surv = q.groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))
    surv_ids = np.sort(surv.to_pandas()["doc_id"].to_numpy(np.int64))
    sref = ray.put(surv_ids)

    bench_grams = benchmark_gram_set(bench_ds, k=decontam_k)
    gref = ray.put(np.sort(bench_grams))

    def finalize(t: pa.Table) -> pa.Table:
        sids = ray.get(sref)
        grams = ray.get(gref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(sids, ids).clip(max=max(len(sids) - 1, 0))
        is_surv = (sids[pos] == ids) if len(sids) else np.zeros(len(ids), bool)
        from ..functions.decontam import probe_hit_counts

        h, off = shingle_hash_batch(
            t["text"].combine_chunks()
            if isinstance(t["text"], pa.ChunkedArray) else t["text"],
            k=decontam_k, strict=True,
        )
        keep = is_surv & (probe_hit_counts(h, off, grams) == 0)
        out = t.filter(pa.array(keep))
        return out.select(["doc_id", "source", "n_tokens"])

    return q.map_batches(finalize, batch_format="pyarrow")
