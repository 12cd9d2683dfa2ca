"""Fully vectorized batch tokenizer — the hot path of the index build.

Tokenizes an ENTIRE Arrow batch of documents with numpy + Arrow kernels and
zero per-token Python objects:

1. classify every byte of the concatenated text buffer against the
   separator byte set (one LUT gather);
2. token spans = runs of non-separator bytes, with forced breaks at
   document boundaries;
3. apply the reference's per-document quirks vectorized — first-line (url)
   drop and unflushed-trailing-token drop in "trec" mode
   (hw2/DataLoader.cpp:27-57) — by span filtering;
4. gather token bytes into ONE Arrow large_binary array (single fancy
   gather), ``dictionary_encode`` it (exact byte identity, C hash table);
5. per-(doc, term) tf via one ``np.unique`` over composite keys, with terms
   bytewise-ordered inside each doc (std::map order, determinism).

Equivalent to the scalar tokenizer in wse_ray.tokenizer (property-tested
against it); ~10x fewer Python allocations per document.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import SEPARATOR_BYTES

_SEP_LUT = np.zeros(256, dtype=bool)
_SEP_LUT[list(SEPARATOR_BYTES)] = True


def _binary_buffer(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data bytes, value offsets) of a large_binary/large_string array."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = texts.type
    if t in (pa.string(), pa.binary()):
        texts = texts.cast(pa.large_binary())
    elif t == pa.large_string():
        texts = texts.cast(pa.large_binary())
    bufs = texts.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=np.int64, count=len(texts) + 1, offset=texts.offset * 8
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offsets


def _token_spans(
    data: np.ndarray, doc_off: np.ndarray, mode: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ordered token spans of the concatenated text buffer:
    (t_start, t_end, doc_idx), all ascending — the shared front half of
    tokenize_batch and the hash-only consumers (shingle_hash_batch)."""
    if len(data) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    tok = ~_SEP_LUT[data]
    prev = np.empty_like(tok)
    prev[0] = False
    prev[1:] = tok[:-1]
    nxt = np.empty_like(tok)
    nxt[-1] = False
    nxt[:-1] = tok[1:]
    starts_mask = tok & ~prev
    ends_mask = tok & ~nxt
    # force token breaks at document boundaries
    ds_idx = doc_off[:-1][doc_off[:-1] < len(data)]
    starts_mask[ds_idx] = tok[ds_idx]
    de_idx = doc_off[1:] - 1
    de_idx = de_idx[(de_idx >= 0) & (de_idx < len(data))]
    ends_mask[de_idx] = tok[de_idx]
    # a byte right after a doc boundary must not continue the previous token:
    # recompute starts at doc starts handled above; also clear "run continues
    # across boundary" starts suppression
    after_boundary = doc_off[1:][doc_off[1:] < len(data)]
    starts_mask[after_boundary] = tok[after_boundary]

    t_start = np.flatnonzero(starts_mask)
    t_end = np.flatnonzero(ends_mask) + 1
    assert len(t_start) == len(t_end)
    doc_idx = np.searchsorted(doc_off, t_start, side="right") - 1

    if mode == "trec":
        # first-line drop: body starts after the doc's first newline; if the
        # doc has no newline the whole text is tokenized (npos+1 == 0 quirk,
        # hw2/DataLoader.cpp:29-31)
        nl_pos = np.flatnonzero(data == 0x0A)
        if len(nl_pos) == 0:
            body_start = doc_off[:-1]
        else:
            first_nl = np.searchsorted(nl_pos, doc_off[:-1], side="left")
            has_nl = first_nl < len(nl_pos)
            cand = np.where(has_nl, nl_pos[np.minimum(first_nl, len(nl_pos) - 1)], -1)
            in_doc = has_nl & (cand < doc_off[1:])
            body_start = np.where(in_doc, cand + 1, doc_off[:-1])
        keep = t_start >= body_start[doc_idx]
        # trailing unflushed token drop: token running to the very end of
        # its document (no separator after it, hw2/DataLoader.cpp:36-57)
        keep &= t_end != doc_off[1:][doc_idx]
        t_start, t_end, doc_idx = t_start[keep], t_end[keep], doc_idx[keep]
    return t_start, t_end, doc_idx


def tokenize_batch(
    texts: pa.Array, mode: str = "trec"
) -> tuple[pa.Array, pa.Array, np.ndarray, np.ndarray]:
    """Returns (terms list<large_binary>, tfs list<uint32>, dataLen, wordnums)
    aligned with the input rows."""
    data, doc_off = _binary_buffer(texts)
    n_docs = len(doc_off) - 1
    datalens = (doc_off[1:] - doc_off[:-1]).astype(np.uint64)
    t_start, t_end, doc_idx = _token_spans(data, doc_off, mode)

    lens = t_end - t_start
    total = int(lens.sum())
    if total == 0 or len(t_start) == 0:
        empty_terms = pa.array([[] for _ in range(n_docs)], pa.large_list(pa.large_binary()))
        empty_tfs = pa.array([[] for _ in range(n_docs)], pa.large_list(pa.uint32()))
        return empty_terms, empty_tfs, datalens, np.zeros(n_docs, np.uint32)

    # one fancy gather builds the values buffer of all tokens
    cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gather = np.repeat(t_start - cum, lens) + np.arange(total, dtype=np.int64)
    values = data[gather]
    tok_offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    tok_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(lens),
        [None, pa.py_buffer(tok_offsets.tobytes()), pa.py_buffer(values.tobytes())],
    )

    enc = pc.dictionary_encode(tok_arr)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    dictionary = enc.dictionary
    V = len(dictionary)
    # bytewise rank of each dictionary entry (std::map order inside docs)
    order = pc.sort_indices(dictionary).to_numpy().astype(np.int64)
    rank = np.empty(V, dtype=np.int64)
    rank[order] = np.arange(V)
    sorted_dict = dictionary.take(pa.array(order))

    key = doc_idx.astype(np.int64) * V + rank[codes]
    uk, counts = np.unique(key, return_counts=True)
    u_doc = uk // V
    u_rank = uk % V

    list_offsets = np.searchsorted(u_doc, np.arange(n_docs + 1)).astype(np.int64)
    terms_flat = sorted_dict.take(pa.array(u_rank))
    terms_list = pa.LargeListArray.from_arrays(pa.array(list_offsets), terms_flat)
    tfs_list = pa.LargeListArray.from_arrays(
        pa.array(list_offsets), pa.array(counts.astype(np.uint32), pa.uint32())
    )
    wordnums = (list_offsets[1:] - list_offsets[:-1]).astype(np.uint32)
    return terms_list, tfs_list, datalens, wordnums


# --------------------------------------------------------------------------
# vectorized content hashing (FNV-1a 64) straight from Arrow buffers
# --------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_SHINGLE_MIX = np.uint64(0x9E3779B97F4A7C15)


def _span_hash64(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64-bit hash of arbitrary byte spans of one buffer.

    Spans are processed in LENGTH order, so each byte-position step touches
    a contiguous suffix of still-live spans (slice, not dead-mask): total
    cost is O(total span bytes) even when one span is far longer than the
    rest.  Content-complete (every byte mixed) — unlike the routing-only
    prefix/suffix hash in index/build.py — and library-portable, replacing
    the object-dtype ``pd.util.hash_array`` paths that pinned fingerprint
    values to pandas' hash implementation.
    """
    n = len(starts)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if n == 0 or len(data) == 0:
        return out
    order = np.argsort(lens, kind="stable")
    sstarts = starts[order].astype(np.int64)
    slens = lens[order].astype(np.int64)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(slens[-1])):
            k = int(np.searchsorted(slens, j, side="right"))
            idx = sstarts[k:] + j
            h[k:] = (h[k:] ^ data[idx].astype(np.uint64)) * _FNV_PRIME
    out[order] = h
    return out


def content_hash64(arr: pa.Array) -> np.ndarray:
    """FNV-1a 64-bit content hash of every value of a binary/string array,
    computed straight from the Arrow buffers (zero per-row Python objects)."""
    data, offsets = _binary_buffer(arr)
    starts = offsets[:-1]
    return _span_hash64(data, starts, offsets[1:] - starts)


def shingle_hash_batch(
    texts: pa.Array, k: int = 3, strict: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Word k-shingle hashes for EVERY doc of a batch in one vectorized pass.

    Returns (flat shingle hashes, doc-major; per-doc int64 offsets into it).
    Tokens are hashed content-complete from the shared text buffer (no token
    strings, no per-doc Python tokenize) and window hashes combine the k
    token hashes with a polynomial mix — the shingle-hash SET is 1:1 with
    the string k-shingle set (modulo 64-bit collisions), so Jaccard values
    over these hashes match a string-shingle oracle exactly.  Docs with
    0 < n < k tokens emit one whole-sequence shingle (``strict=False``, the
    MinHash convention) or NO shingles (``strict=True``, matching string
    k-gram semantics — decontamination/repetition); zero-token docs emit
    none.  Simple tokenizer mode (trailing token flushed, first line kept).
    """
    data, doc_off = _binary_buffer(texts)
    n_docs = len(doc_off) - 1
    t_start, t_end, doc_idx = _token_spans(data, doc_off, "simple")
    h = _span_hash64(data, t_start, t_end - t_start)
    ntok = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    tok_off = np.concatenate(([0], np.cumsum(ntok)))
    kk = np.minimum(k, ntok)
    if strict:
        nsh = np.where(ntok >= k, ntok - k + 1, 0)
    else:
        nsh = np.where(ntok > 0, ntok - kk + 1, 0)
    sh_off = np.concatenate(([0], np.cumsum(nsh))).astype(np.int64)
    total = int(sh_off[-1])
    if total == 0:
        return np.zeros(0, dtype=np.uint64), sh_off
    # flat window starts: for doc i, windows begin at tok_off[i] .. tok_off[i]+nsh[i]-1
    within = np.arange(total, dtype=np.int64) - np.repeat(sh_off[:-1], nsh)
    wstart = np.repeat(tok_off[:-1], nsh) + within
    kk_flat = np.repeat(kk, nsh)
    c = h[wstart].copy()
    with np.errstate(over="ignore"):
        for j in range(1, int(k)):
            live = kk_flat > j
            c[live] = (c[live] * _SHINGLE_MIX) ^ h[wstart[live] + j]
    return c, sh_off


def ngram_strings_batch(texts: pa.Array, n: int = 2) -> pa.Array:
    """All word n-grams of a batch as space-joined strings, corpus order —
    the vectorized front half of corpus n-gram counting.

    One gather builds the token values buffer (the tokenize_batch idiom),
    then Arrow's ``binary_join_element_wise`` stitches the n offset slices
    with spaces entirely in C++; a doc-boundary mask drops windows that
    would span two documents.  Simple tokenizer mode (same adjacency as
    consecutive non-empty tokens)."""
    data, doc_off = _binary_buffer(texts)
    t_start, t_end, doc_idx = _token_spans(data, doc_off, "simple")
    ntok = len(t_start)
    if ntok < n:
        return pa.array([], pa.large_string())
    lens = t_end - t_start
    total = int(lens.sum())
    cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    gather = np.repeat(t_start - cum, lens) + np.arange(total, dtype=np.int64)
    values = data[gather]
    tok_offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
    tok_arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(lens),
        [None, pa.py_buffer(tok_offsets.tobytes()), pa.py_buffer(values.tobytes())],
    ).cast(pa.large_string())

    m = ntok - n + 1  # candidate windows
    slices = [tok_arr.slice(j, m) for j in range(n)]
    joined = slices[0]
    for s in slices[1:]:
        joined = pc.binary_join_element_wise(joined, s, pa.scalar(" ", pa.large_string()))
    within_doc = doc_idx[: m] == doc_idx[n - 1 :]
    return joined.filter(pa.array(within_doc))
