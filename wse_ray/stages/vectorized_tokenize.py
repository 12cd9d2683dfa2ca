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


def tokenize_batch(
    texts: pa.Array, mode: str = "trec"
) -> tuple[pa.Array, pa.Array, np.ndarray, np.ndarray]:
    """Returns (terms list<large_binary>, tfs list<uint32>, dataLen, wordnums)
    aligned with the input rows."""
    data, doc_off = _binary_buffer(texts)
    n_docs = len(doc_off) - 1
    datalens = (doc_off[1:] - doc_off[:-1]).astype(np.uint64)
    if len(data) == 0:
        empty_terms = pa.array([[] for _ in range(n_docs)], pa.large_list(pa.large_binary()))
        empty_tfs = pa.array([[] for _ in range(n_docs)], pa.large_list(pa.uint32()))
        return empty_terms, empty_tfs, datalens, np.zeros(n_docs, np.uint32)

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
