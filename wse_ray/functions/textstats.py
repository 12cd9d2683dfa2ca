"""Text-analysis operators for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` stages over a text column:
token counting, quality scoring, language ID (n-gram/stopword heuristic),
and document fingerprinting.  Each has a ``queries()`` entry over the
``documents`` table with a DuckDB oracle.

Vectorization: every stage tokenizes the WHOLE batch through the span
machinery of stages/vectorized_tokenize.tokenize_batch (one LUT gather +
one dictionary_encode, zero per-token Python objects) and reduces per-doc
with cumsum-difference segment sums — no ``for row in batch`` loops in any
hot path.  Only md5 (C hashlib) runs per document.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.vectorized_tokenize import content_hash64, tokenize_batch

# small built-in stopword list (engine + SQL oracle share it verbatim)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# tiny deterministic language marker profiles (word -> lang evidence);
# real systems use char n-gram models — this is the same plumbing with a
# transparent, dependency-free scorer.
LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is on for with this that".split()),
    "es": frozenset("el la de que y en un los del se por".split()),
    "de": frozenset("der die und das ist von mit den nicht ein".split()),
    "fr": frozenset("le la les de et un une que pour dans".split()),
    "zh": frozenset("de shi le zai you wo ta men zhe na".split()),
}
_LANG_ORDER = tuple(sorted(LANG_MARKERS))


def _text_col(batch: pa.Table) -> pa.Array:
    col = batch["text"]
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _flat_tf(batch: pa.Table):
    """Batch-tokenized view: (flat unique terms, flat tfs, per-doc list
    offsets, per-doc byte lengths).  Simple mode (trailing token flushed)
    so the DuckDB oracles stay exact."""
    terms_list, tfs_list, datalens, _wordnums = tokenize_batch(
        _text_col(batch), "simple"
    )
    offsets = np.asarray(terms_list.offsets)
    flat_terms = terms_list.values
    flat_tfs = tfs_list.values.to_numpy().astype(np.int64)
    return flat_terms, flat_tfs, offsets, datalens


def _segsum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-document sums of a flat per-term array (empty-segment safe)."""
    csum = np.concatenate(([0], np.cumsum(values, dtype=np.int64)))
    return csum[offsets[1:]] - csum[offsets[:-1]]


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_distinct) per document."""
    _terms, tfs, off, _dl = _flat_tf(batch)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(_segsum(tfs, off)),
            "n_distinct": pa.array((off[1:] - off[:-1]).astype(np.int64)),
        }
    )


def quality_score(batch: pa.Table) -> pa.Table:
    """Heuristic quality features: length, distinct ratio, stopword ratio,
    mean token length — the usual web-corpus filtering signals."""
    terms, tfs, off, datalens = _flat_tf(batch)
    n_tokens = _segsum(tfs, off).astype(np.float64)
    n_distinct = (off[1:] - off[:-1]).astype(np.float64)
    stop_set = pa.array([s.encode() for s in STOPWORDS], pa.large_binary())
    stop_mask = pc.is_in(terms, value_set=stop_set).to_numpy(zero_copy_only=False)
    n_stop = _segsum(tfs * stop_mask, off).astype(np.float64)
    tok_chars = _segsum(
        tfs * pc.binary_length(terms).to_numpy().astype(np.int64), off
    ).astype(np.float64)
    safe = np.maximum(n_tokens, 1.0)
    nz = n_tokens > 0
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(datalens.astype(np.float64)),
            "n_tokens": pa.array(n_tokens),
            "distinct_ratio": pa.array(np.where(nz, n_distinct / safe, 0.0)),
            "stopword_ratio": pa.array(np.where(nz, n_stop / safe, 0.0)),
            "mean_token_len": pa.array(np.where(nz, tok_chars / safe, 0.0)),
        }
    )


# GPT-style pre-tokenizer, RE2-subset (no lookahead): optional-space-
# prefixed letter runs / digit runs / punctuation runs.  Shared VERBATIM
# with the DuckDB oracle — both engines are RE2 (leftmost, alternation
# order respected), so counts match exactly.
BPE_PRETOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_token_count(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): BPE-ish pre-token count — the training-cost
    estimator column (whitespace token counts undercount punctuation-heavy
    text).  One RE2 kernel per batch, no per-row Python."""
    text = _text_col(batch)
    n = pc.count_substring_regex(text, BPE_PRETOKEN_RE).cast(pa.int64())
    return pa.table({"doc_id": batch["doc_id"], "n_bpe_tokens": n})


def unigram_lm_score(ds):
    """CCNet-style quality signal: per-doc mean token log-probability under
    the corpus's own unigram LM — (doc_id, lm_logprob).

    Two passes, both keyed by 64-bit content hashes of the terms (1:1 with
    strings modulo collisions — the repo-wide contract), so no per-term
    Python objects anywhere.  Pass 1: per-batch dictionary_encode +
    bincount -> (hash, cf) partials (vocab-sized per batch, batch_size
    8192 to amortize vocab saturation); the driver reduces them with one
    numpy sort+reduceat — O(batches x vocab) rows, never corpus-sized.
    The model broadcasts once via ``ray.put`` (~16 B/term).  Pass 2 is a
    stateless vectorized score: one searchsorted probe + a segment sum per
    batch.  Every term is in-vocab by construction (model built from the
    same corpus).  For corpora whose batches x vocab outgrows the driver,
    swap the reduce for the index builder's storage-shuffled term exchange
    (`wse_ray/index/build.py`) — the probe side is unchanged."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        terms, tfs, _off, _dl = _flat_tf(batch)
        denc = terms.dictionary_encode()
        idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cf = np.bincount(idx, weights=tfs).astype(np.int64)
        h = content_hash64(denc.dictionary)
        return pa.table({"h": pa.array(h), "cf_p": pa.array(cf)})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=8192
    ).to_pandas()
    ph = parts["h"].to_numpy(np.uint64)
    pcf = parts["cf_p"].to_numpy(np.int64)
    order = np.argsort(ph, kind="stable")
    ph, pcf = ph[order], pcf[order]
    first = np.concatenate(([True], ph[1:] != ph[:-1]))
    vocab_h = ph[first]
    cf = np.add.reduceat(pcf, np.flatnonzero(first)).astype(np.float64)
    logp = np.log(cf / cf.sum())
    mref = ray.put((vocab_h, logp))

    def score(batch: pa.Table) -> pa.Table:
        voc, lp = ray.get(mref)
        terms, tfs, off, _dl = _flat_tf(batch)
        h = content_hash64(terms)
        tok_lp = lp[np.searchsorted(voc, h)] * tfs
        n = _segsum(tfs, off).astype(np.float64)
        csum = np.concatenate(([0.0], np.cumsum(tok_lp)))
        lsum = csum[off[1:]] - csum[off[:-1]]
        # zero-token docs have no LM score (same as the SQL GROUP BY,
        # which emits no row) — a 0.0 here would rank empty docs as the
        # highest-quality documents in the corpus
        keep = n > 0
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(pa.array(keep)),
                "lm_logprob": pa.array(
                    np.round(lsum[keep] / n[keep], 6)
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _per_doc_runs(h: np.ndarray, off: np.ndarray):
    """Per-doc (max duplicate-run count, distinct count) over flat doc-major
    hashes — one lexsort, no per-doc loops."""
    ndoc = len(off) - 1
    nsh = np.diff(off)
    maxcnt = np.zeros(ndoc, np.int64)
    distinct = np.zeros(ndoc, np.int64)
    if len(h) == 0:
        return maxcnt, distinct
    didx = np.repeat(np.arange(ndoc, dtype=np.int64), nsh)
    order = np.lexsort((h, didx))
    hs, ds = h[order], didx[order]
    newrun = np.concatenate(([True], (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])))
    run_id = np.cumsum(newrun) - 1
    run_counts = np.bincount(run_id)
    run_doc = ds[newrun]
    distinct = np.bincount(run_doc, minlength=ndoc).astype(np.int64)
    np.maximum.at(maxcnt, run_doc, run_counts)
    return maxcnt, distinct


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Gopher-style token n-gram repetition signals (the repetition half of
    web-corpus quality filtering):

    - ``top_bigram_frac``: occurrences of the single most frequent token
      2-gram as a fraction of all 2-gram positions (0 if < 2 tokens)
    - ``dup_trigram_frac``: fraction of 3-gram positions whose 3-gram also
      occurs elsewhere in the doc, 1 - distinct/total (0 if < 3 tokens)

    N-grams are 64-bit window hashes straight off the Arrow buffers
    (``shingle_hash_batch(strict=True)`` — docs shorter than the window
    emit no grams) — 1:1 with string n-grams modulo collisions, so the
    DuckDB string-gram oracle matches exactly.
    """
    from ..stages.vectorized_tokenize import shingle_hash_batch

    texts = _text_col(batch)
    out = {"doc_id": batch["doc_id"]}
    for name, k in (("top_bigram_frac", 2), ("dup_trigram_frac", 3)):
        h, off = shingle_hash_batch(texts, k=k, strict=True)
        total = np.diff(off).astype(np.float64)
        maxcnt, distinct = _per_doc_runs(h, off)
        ok = total > 0
        safe = np.maximum(total, 1.0)
        if k == 2:
            frac = np.where(ok, maxcnt / safe, 0.0)
        else:
            frac = np.where(ok, 1.0 - distinct / safe, 0.0)
        out[name] = pa.array(np.round(frac, 6))
    return pa.table(out)


def lang_id(batch: pa.Table) -> pa.Table:
    """Deterministic language-ID heuristic: marker-word hit ratio per
    language, argmax with fixed alphabetical tie order (strict >, so equal
    scores keep the alphabetically first language; zero hits -> 'und')."""
    terms, tfs, off, _dl = _flat_tf(batch)
    n_docs = len(off) - 1
    nt = np.maximum(_segsum(tfs, off), 1).astype(np.float64)
    scores = np.zeros((n_docs, len(_LANG_ORDER)), dtype=np.float64)
    for li, lang in enumerate(_LANG_ORDER):
        markers = pa.array(
            sorted(w.encode() for w in LANG_MARKERS[lang]), pa.large_binary()
        )
        mask = pc.is_in(terms, value_set=markers).to_numpy(zero_copy_only=False)
        scores[:, li] = _segsum(tfs * mask, off) / nt
    best = np.argmax(scores, axis=1)  # first max == alphabetical tie rule
    best_score = scores[np.arange(n_docs), best]
    preds = np.where(
        best_score > 0, np.asarray(_LANG_ORDER, dtype=object)[best], "und"
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds.tolist(), pa.string()),
            "confidence": pa.array(np.round(best_score, 6), pa.float64()),
        }
    )


def _rolling64_batch(data: np.ndarray, offsets: np.ndarray, base: int = 1000003) -> np.ndarray:
    """Vectorized polynomial rolling hash mod 2**64 (natural uint64 wrap —
    NOT the (1<<61)-1 Mersenne modulus some rolling-hash formulations use;
    values are pinned by tests, note before persisting fingerprints).

    Docs are processed in LENGTH order so each byte-position step touches a
    contiguous suffix of still-live docs (slice, not dead-mask): total cost
    is O(total bytes) even when one 1 MB doc shares a batch with tweets.
    Per-doc values are position-independent, so the reorder cannot change
    results."""
    n_docs = len(offsets) - 1
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(data) == 0 or n_docs == 0:
        return out
    b = np.uint64(base)
    order = np.argsort(lens, kind="stable")
    sstarts = offsets[:-1][order].astype(np.int64)
    slens = lens[order]
    h = np.zeros(n_docs, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(slens[-1])):
            k = int(np.searchsorted(slens, j, side="right"))
            idx = sstarts[k:] + j
            h[k:] = h[k:] * b + data[idx].astype(np.uint64)
    out[order] = h
    return out


def _simhash64_batch(terms: pa.Array, tfs: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit simhash (weight = tf): bit (63 - j) of the result
    is set when the per-doc weighted sum of hash-bit j is positive —
    bit-identical to the scalar packbits formulation."""
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tfs) == 0:
        return out
    # content-complete buffer-level FNV-1a hash — zero per-token Python
    # objects, and the values no longer depend on pandas' hash internals
    hashes = content_hash64(terms)
    signed = np.empty(len(tfs), dtype=np.int64)
    for j in range(64):
        bit = ((hashes >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        np.multiply(bit * 2 - 1, tfs, out=signed)
        acc = _segsum(signed, offsets)
        out |= (acc > 0).astype(np.uint64) << np.uint64(63 - j)
    return out


def fingerprints(batch: pa.Table) -> pa.Table:
    """(doc_id, md5, rolling64, simhash64) content fingerprints.

    md5 is the exact-dedup key (SQL-parity via DuckDB md5()); rolling64 is a
    polynomial rolling hash mod 2**64; simhash64 is a 64-bit token-frequency
    simhash used by near-dup detection.
    """
    from ..stages.vectorized_tokenize import _binary_buffer

    terms, tfs, off, _dl = _flat_tf(batch)
    data, byte_off = _binary_buffer(_text_col(batch))
    md5s = [
        hashlib.md5(data[byte_off[i] : byte_off[i + 1]].tobytes()).hexdigest()
        for i in range(len(byte_off) - 1)
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5": pa.array(md5s, pa.string()),
            "rolling64": pa.array(_rolling64_batch(data, byte_off)),
            "simhash64": pa.array(_simhash64_batch(terms, tfs, off)),
        }
    )


def simhash64(data: bytes) -> int:
    """Scalar reference simhash (property-tested equal to the batch path)."""
    from ..tokenizer import tokenize_simple

    toks = tokenize_simple(data)
    if not toks:
        return 0
    s = pd.Series(toks, dtype=object).value_counts()
    hashes = content_hash64(pa.array(list(s.index), pa.large_binary()))
    weights = s.to_numpy(np.int64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
    return int(np.packbits((acc > 0)[::-1], bitorder="little").view(np.uint64)[0])
