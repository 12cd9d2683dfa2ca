"""Posting-list codec: VarByte + per-chunk delta + 64 KiB block packing.

Semantically reproduces the reference's blocked index format
(hw3/Lexicon.cpp:4-21 varbyte, :65-219 WriteBlocks; decode
hw3/DataLoader.cpp:591-634) with three documented upgrades:

* value 0 encodes as one byte ``0x00`` instead of zero bytes (the reference's
  ``while (value > 0)`` loop emits nothing for 0, which would make a
  chunk-leading docID of 0 round-trip as *absent* — SURVEY.md §7.4.4);
* docIDs / last_docIDs are uint64 (the reference's uint32 offsets cap the
  index at 4 GiB — SURVEY.md §1.2);
* each chunk additionally stores a varbyte stream of per-posting document
  lengths (``dl``) and a float32 BM25 upper bound (``ub``) used for
  block-max/WAND pruning, so query scoring never needs a global
  docID->dataLen table broadcast (it would be ~8 TB at 10^12 docs).

Layout per term segment (self-describing, walked front to back):

    block := [n_chunks:u32]
             [last_docid:u64  * n_chunks]
             [docid_sz :u32  * n_chunks]
             [tf_sz    :u32  * n_chunks]
             [dl_sz    :u32  * n_chunks]
             [ub       :f32  * n_chunks]
             ([docids varbyte][tfs varbyte][dls varbyte]) * n_chunks

Chunks hold up to ``POSTINGS_IN_CHUNK`` (=64) postings; docIDs are
delta-encoded with the delta reset at every chunk boundary
(hw3/Lexicon.cpp:103-112).  Blocks pack whole chunks up to ``BLOCK_SIZE``
bytes using the reference's accounting (header + metadata + payload,
hw3/Lexicon.cpp:149-167).

All codecs are vectorized numpy — no per-posting Python loops.
"""
from __future__ import annotations

import numpy as np

from .config import BLOCK_SIZE, POSTINGS_IN_CHUNK

_U64_THRESHOLDS = [1 << (7 * k) for k in range(1, 10)]


def varbyte_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array; returns (payload, per-value byte lengths).

    7-bit groups, least-significant first; high bit set on every byte except
    the last of a value (hw3/Lexicon.cpp:4-21).  0 -> b"\\x00" (see module
    docstring).
    """
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.ones(n, dtype=np.int64)
    for t in _U64_THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    maxb = int(nbytes.max())
    for k in range(maxb):
        mask = nbytes > k
        idx = starts[mask] + k
        chunk = (v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8) << 7
        out[idx] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def varbyte_decode(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode a varbyte stream into a uint64 array (hw3/DataLoader.cpp:591-634)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    n = len(ends)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    out = np.zeros(n, dtype=np.uint64)
    maxb = int(lens.max())
    for k in range(maxb):
        mask = lens > k
        byte = b[starts[mask] + k].astype(np.uint64) & np.uint64(0x7F)
        out[mask] |= byte << np.uint64(7 * k)
    return out


def _chunk_payloads(docids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """Split postings into chunks of POSTINGS_IN_CHUNK; delta docIDs per chunk.

    Vectorized: ONE varbyte_encode call per stream for the whole list (the
    codec is per-value independent; chunk boundaries only affect which
    deltas are absolute), then per-chunk byte slicing via reduceat — no
    per-chunk numpy-call overhead (this loop runs once per 64 postings of
    the entire corpus).

    Returns per-chunk lists: (last_docid, docid_bytes, tf_bytes, dl_bytes).
    """
    n = len(docids)
    n_chunks = (n + POSTINGS_IN_CHUNK - 1) // POSTINGS_IN_CHUNK
    # delta with reset at chunk boundaries (hw3/Lexicon.cpp:103-112)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docids[0]
    deltas[1:] = docids[1:] - docids[:-1]
    chunk_starts = np.arange(0, n, POSTINGS_IN_CHUNK)
    deltas[chunk_starts] = docids[chunk_starts]  # absolute at chunk head

    d_pay, d_lens = varbyte_encode(deltas)
    t_pay, t_lens = varbyte_encode(tfs)
    l_pay, l_lens = varbyte_encode(dls)

    # per-chunk payload byte offsets
    def _bounds(lens: np.ndarray) -> np.ndarray:
        ends = np.concatenate(([0], np.cumsum(lens)))
        return ends[np.concatenate((chunk_starts, [n]))]

    db, tb, lb = _bounds(d_lens), _bounds(t_lens), _bounds(l_lens)
    last_idx = np.minimum(chunk_starts + POSTINGS_IN_CHUNK - 1, n - 1)
    dm, tm, lm = memoryview(d_pay), memoryview(t_pay), memoryview(l_pay)
    return [
        (
            int(docids[last_idx[c]]),
            dm[db[c] : db[c + 1]],
            tm[tb[c] : tb[c + 1]],
            lm[lb[c] : lb[c + 1]],
        )
        for c in range(n_chunks)
    ]


def _meta_bytes(n_chunks: int) -> int:
    # u32 header + (u64 last_docid + 3*u32 sizes + f32 ub) per chunk
    return 4 + n_chunks * (8 + 4 + 4 + 4 + 4)


def encode_posting_list(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    chunk_ubs: np.ndarray | None = None,
) -> bytes:
    """Encode one term segment (docIDs strictly ascending) into blocked bytes.

    ``chunk_ubs``: optional per-chunk BM25 upper bounds (float32); pass None
    to store 0.0 (pruning disabled for that term).
    """
    docids = np.asarray(docids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    dls = np.asarray(dls, dtype=np.uint64)
    assert len(docids) > 0
    chunks = _chunk_payloads(docids, tfs, dls)
    n_chunks = len(chunks)
    if chunk_ubs is None:
        chunk_ubs = np.zeros(n_chunks, dtype=np.float32)
    else:
        chunk_ubs = np.asarray(chunk_ubs, dtype=np.float32)

    out = bytearray()
    c = 0
    while c < n_chunks:
        # pack whole chunks into one block, reference accounting
        # (hw3/Lexicon.cpp:149-167): stop before exceeding BLOCK_SIZE.
        lo = c
        nowbyte = 4
        while c < n_chunks:
            last, dp, tp, lp = chunks[c]
            newsize = (8 + 4 + 4 + 4 + 4) + len(dp) + len(tp) + len(lp)
            if nowbyte + newsize > BLOCK_SIZE and c > lo:
                break
            nowbyte += newsize
            c += 1
        blk = chunks[lo:c]
        m = len(blk)
        out += np.uint32(m).tobytes()
        out += np.array([b[0] for b in blk], dtype=np.uint64).tobytes()
        out += np.array([len(b[1]) for b in blk], dtype=np.uint32).tobytes()
        out += np.array([len(b[2]) for b in blk], dtype=np.uint32).tobytes()
        out += np.array([len(b[3]) for b in blk], dtype=np.uint32).tobytes()
        out += chunk_ubs[lo:c].tobytes()
        for _, dp, tp, lp in blk:
            out += dp
            out += tp
            out += lp
    return bytes(out)


def chunk_heads(seg_starts: np.ndarray, seg_ends: np.ndarray) -> np.ndarray:
    """Row indices where a new chunk begins, across MANY concatenated
    segments (every segment restarts chunking at its first row)."""
    seg_len = seg_ends - seg_starts
    n = int(seg_len.sum())
    within = np.arange(n, dtype=np.int64) - np.repeat(seg_starts, seg_len)
    return np.flatnonzero(within % POSTINGS_IN_CHUNK == 0)


def encode_segments(
    docids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    seg_starts: np.ndarray,
    seg_ends: np.ndarray,
    chunk_ubs: np.ndarray,
) -> tuple[bytes, dict[str, np.ndarray]]:
    """Encode MANY term segments in one vectorized pass.

    Byte-identical to concatenating ``encode_posting_list`` per segment
    (property-pinned in tests/test_codec.py), but the three varbyte
    streams are encoded ONCE for the whole partition instead of once per
    segment — on a high-vocab corpus (millions of short posting lists per
    partition) the per-segment fixed numpy overhead dominated the encode
    phase, and this removes it: the only remaining per-unit Python work is
    one loop over CHUNKS (n_postings/64) for the reference's greedy block
    accounting, and one over blocks for assembly.

    ``chunk_ubs``: float32 per chunk, in ``chunk_heads`` order.  Returns
    (payload, per-segment arrays: offset, length, n_chunks, n_blocks).
    """
    docids = np.asarray(docids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    dls = np.asarray(dls, dtype=np.uint64)
    n = len(docids)
    nseg = len(seg_starts)
    empty = {
        "offset": np.zeros(nseg, np.int64),
        "length": np.zeros(nseg, np.int64),
        "n_chunks": np.zeros(nseg, np.int64),
        "n_blocks": np.zeros(nseg, np.int64),
    }
    if n == 0 or nseg == 0:
        return b"", empty
    seg_len = (seg_ends - seg_starts).astype(np.int64)
    seg_of = np.repeat(np.arange(nseg, dtype=np.int64), seg_len)
    ch = chunk_heads(seg_starts, seg_ends)

    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = docids[0]
    deltas[1:] = docids[1:] - docids[:-1]
    deltas[ch] = docids[ch]  # absolute at every chunk head
    d_pay, d_lens = varbyte_encode(deltas)
    t_pay, t_lens = varbyte_encode(tfs)
    l_pay, l_lens = varbyte_encode(dls)

    chunk_seg = seg_of[ch]
    chunk_last = np.minimum(ch + POSTINGS_IN_CHUNK - 1, seg_ends[chunk_seg] - 1)
    dcum = np.concatenate(([0], np.cumsum(d_lens)))
    tcum = np.concatenate(([0], np.cumsum(t_lens)))
    lcum = np.concatenate(([0], np.cumsum(l_lens)))
    d_off, d_sz = dcum[ch], (dcum[chunk_last + 1] - dcum[ch]).astype(np.uint32)
    t_off, t_sz = tcum[ch], (tcum[chunk_last + 1] - tcum[ch]).astype(np.uint32)
    l_off, l_sz = lcum[ch], (lcum[chunk_last + 1] - lcum[ch]).astype(np.uint32)
    last_docid = docids[chunk_last]
    ubs = np.asarray(chunk_ubs, dtype=np.float32)
    newsize = 24 + d_sz.astype(np.int64) + t_sz.astype(np.int64) + l_sz.astype(np.int64)

    # greedy block packing, reference accounting (hw3/Lexicon.cpp:149-167):
    # a block always takes at least one chunk; a new segment starts a new
    # block.  One python iteration per CHUNK of the partition.
    nchunks = len(ch)
    sizes = newsize.tolist()  # plain ints: no numpy scalar overhead in the loop
    segl = chunk_seg.tolist()
    blocks: list[tuple[int, int, int]] = []  # (seg, chunk_lo, chunk_hi)
    c = 0
    while c < nchunks:
        seg = segl[c]
        lo = c
        nowbyte = 4
        while c < nchunks and segl[c] == seg:
            if nowbyte + sizes[c] > BLOCK_SIZE and c > lo:
                break
            nowbyte += sizes[c]
            c += 1
        blocks.append((seg, lo, c))

    out = bytearray()
    mv_d, mv_t, mv_l = memoryview(d_pay), memoryview(t_pay), memoryview(l_pay)
    seg_offset = np.zeros(nseg, np.int64)
    seg_length = np.zeros(nseg, np.int64)
    seg_blocks = np.zeros(nseg, np.int64)
    prev_seg = -1
    for seg, blo, bhi in blocks:
        if seg != prev_seg:
            seg_offset[seg] = len(out)
            prev_seg = seg
        m = bhi - blo
        out += np.uint32(m).tobytes()
        out += last_docid[blo:bhi].tobytes()
        out += d_sz[blo:bhi].tobytes()
        out += t_sz[blo:bhi].tobytes()
        out += l_sz[blo:bhi].tobytes()
        out += ubs[blo:bhi].tobytes()
        for c in range(blo, bhi):
            out += mv_d[d_off[c] : d_off[c] + int(d_sz[c])]
            out += mv_t[t_off[c] : t_off[c] + int(t_sz[c])]
            out += mv_l[l_off[c] : l_off[c] + int(l_sz[c])]
        seg_length[seg] = len(out) - seg_offset[seg]
        seg_blocks[seg] += 1
    return bytes(out), {
        "offset": seg_offset,
        "length": seg_length,
        "n_chunks": np.bincount(chunk_seg, minlength=nseg).astype(np.int64),
        "n_blocks": seg_blocks,
    }


def _walk_blocks(buf: memoryview):
    """Yield (last_docids, d_sizes, t_sizes, l_sizes, ubs, payload_off) per block."""
    pos = 0
    end = len(buf)
    while pos < end:
        m = int(np.frombuffer(buf[pos : pos + 4], dtype=np.uint32)[0])
        pos += 4
        last = np.frombuffer(buf[pos : pos + 8 * m], dtype=np.uint64)
        pos += 8 * m
        dsz = np.frombuffer(buf[pos : pos + 4 * m], dtype=np.uint32)
        pos += 4 * m
        tsz = np.frombuffer(buf[pos : pos + 4 * m], dtype=np.uint32)
        pos += 4 * m
        lsz = np.frombuffer(buf[pos : pos + 4 * m], dtype=np.uint32)
        pos += 4 * m
        ubs = np.frombuffer(buf[pos : pos + 4 * m], dtype=np.float32)
        pos += 4 * m
        yield last, dsz, tsz, lsz, ubs, pos
        pos += int(dsz.sum()) + int(tsz.sum()) + int(lsz.sum())


def _gather(data: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint8)
    cum = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = np.repeat(starts - cum, lens) + np.arange(total, dtype=np.int64)
    return data[idx]


def _decode_selected(
    mv: memoryview, min_docid: int | None, max_docid: int | None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized decode of the chunks that may intersect [min, max]:
    ONE gather + ONE varbyte_decode per stream across the SELECTED chunks,
    then a segmented cumsum restores absolute docIDs (chunk-leading deltas
    are absolute, so every chunk decodes independently of its neighbors).

    Chunk selection uses the per-chunk ``last_docid`` skip metadata — the
    Ray-native equivalent of the reference's chunk skipping
    (hw3/DataLoader.cpp:793,810-816); conservative (output may contain
    docIDs outside the range).
    """
    data = np.frombuffer(mv, dtype=np.uint8)
    d_starts, d_lens = [], []
    t_starts, t_lens = [], []
    l_starts, l_lens = [], []
    prev_block_last = -1
    for last, dsz, tsz, lsz, _ubs, pay in _walk_blocks(mv):
        m = len(last)
        lo_sel, hi_sel = 0, m
        if min_docid is not None:
            lo_sel = int(np.searchsorted(last, np.uint64(min_docid), side="left"))
        if max_docid is not None:
            # chunk c starts after last[c-1]; a chunk whose predecessor's
            # last_docid >= max_docid can't contain ids <= max_docid
            firsts = np.empty(m, dtype=np.int64)
            firsts[0] = prev_block_last
            firsts[1:] = last[:-1].astype(np.int64)
            hi_sel = int(np.searchsorted(firsts, max_docid, side="right"))
        prev_block_last = int(last[-1])
        hi_sel = max(lo_sel, hi_sel)
        if hi_sel == lo_sel:
            continue
        tot = (dsz + tsz + lsz).astype(np.int64)
        off = pay + np.concatenate(([0], np.cumsum(tot)[:-1]))
        sl = slice(lo_sel, hi_sel)
        d_starts.append(off[sl])
        d_lens.append(dsz[sl].astype(np.int64))
        t_starts.append(off[sl] + dsz[sl])
        t_lens.append(tsz[sl].astype(np.int64))
        l_starts.append(off[sl] + dsz[sl] + tsz[sl])
        l_lens.append(lsz[sl].astype(np.int64))
    if not d_starts:
        z = np.zeros(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    d_buf = _gather(data, np.concatenate(d_starts), np.concatenate(d_lens))
    t_buf = _gather(data, np.concatenate(t_starts), np.concatenate(t_lens))
    l_buf = _gather(data, np.concatenate(l_starts), np.concatenate(l_lens))
    deltas = varbyte_decode(d_buf)
    tfs = varbyte_decode(t_buf)
    dls = varbyte_decode(l_buf)
    # per-chunk value counts: count varbyte terminators inside each chunk's
    # byte range (selected chunks need not be contiguous or full)
    lens_cat = np.concatenate(d_lens)
    ends = np.cumsum(lens_cat)
    term_pos = np.flatnonzero((d_buf & 0x80) == 0)  # one per decoded value
    sizes = np.diff(np.concatenate(([0], np.searchsorted(term_pos, ends, side="left"))))
    n = len(deltas)
    csum = np.cumsum(deltas)
    chunk_starts = np.concatenate(([0], np.cumsum(sizes)[:-1])).astype(np.int64)
    rebase = np.repeat(csum[chunk_starts] - deltas[chunk_starts], sizes)
    docids = (csum - rebase).astype(np.uint64)
    return docids, tfs, dls


def decode_posting_list(
    buf: bytes | memoryview,
    min_docid: int | None = None,
    max_docid: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a term segment into (docids, tfs, dls), optionally restricted
    to a docID range via chunk skipping (see _decode_selected)."""
    return _decode_selected(memoryview(buf), min_docid, max_docid)


def read_chunk_meta(buf: bytes | memoryview):
    """Return (last_docids, ubs) across all blocks — for WAND pruning."""
    mv = memoryview(buf)
    lasts, ubs = [], []
    for last, _d, _t, _l, ub, _p in _walk_blocks(mv):
        lasts.append(last)
        ubs.append(ub)
    return np.concatenate(lasts), np.concatenate(ubs)


def count_blocks(buf: bytes | memoryview) -> int:
    """Number of ≤64 KiB blocks in a segment (lexicon blockNum analogue)."""
    return sum(1 for _ in _walk_blocks(memoryview(buf)))


# --------------------------------------------------------------------------
# hw2's unblocked format (format-parity extra; the blocked format above is
# the real index format)
# --------------------------------------------------------------------------


def encode_postings_unblocked(docids: np.ndarray, tfs: np.ndarray) -> bytes:
    """The hw2 final-index posting layout (hw2/Lexicon.cpp:82-132
    ``WriteBitArray``): interleaved varbyte(docID), varbyte(tf) per posting —
    ABSOLUTE docIDs, no delta, no chunks/blocks, no skip metadata.  Kept for
    format parity with the earlier reference milestone; no query path uses
    it (the hw3 blocked format is strictly better and is what
    ``encode_posting_list`` writes)."""
    d = np.asarray(docids, dtype=np.uint64)
    f = np.asarray(tfs, dtype=np.uint64)
    inter = np.empty(2 * len(d), dtype=np.uint64)
    inter[0::2] = d
    inter[1::2] = f
    payload, _ = varbyte_encode(inter)
    return payload


def decode_postings_unblocked(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of ``encode_postings_unblocked``."""
    vals = varbyte_decode(buf)
    return vals[0::2].copy(), vals[1::2].copy()
