"""Codec unit/property tests (FIXTURES.md §F4)."""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from wse_ray.codec import (
    count_blocks,
    decode_posting_list,
    encode_posting_list,
    read_chunk_meta,
    varbyte_decode,
    varbyte_encode,
)
from wse_ray.config import BLOCK_SIZE, POSTINGS_IN_CHUNK

EDGES = [0, 1, 127, 128, 16383, 16384, 2**31, 2**32 - 1, 2**63]


def test_varbyte_edges_roundtrip():
    vals = np.array(EDGES, dtype=np.uint64)
    payload, lens = varbyte_encode(vals)
    assert lens[0] == 1  # 0 -> single 0x00 byte (documented deviation)
    out = varbyte_decode(payload)
    np.testing.assert_array_equal(out, vals)


def test_varbyte_reference_bytes():
    # layout parity with hw3/Lexicon.cpp:4-21: LSB-first 7-bit groups,
    # continuation high bit on all but last byte
    payload, _ = varbyte_encode(np.array([300], dtype=np.uint64))
    assert payload == bytes([0xAC, 0x02])
    payload, _ = varbyte_encode(np.array([127], dtype=np.uint64))
    assert payload == bytes([0x7F])
    payload, _ = varbyte_encode(np.array([128], dtype=np.uint64))
    assert payload == bytes([0x80, 0x01])


@given(
    st.lists(st.integers(min_value=0, max_value=2**63), min_size=0, max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    payload, lens = varbyte_encode(v)
    assert int(lens.sum()) == len(payload)
    np.testing.assert_array_equal(varbyte_decode(payload), v)


@pytest.mark.parametrize("n", [1, 63, 64, 65, 128, 1000])
def test_posting_list_roundtrip_chunk_boundaries(n):
    rng = np.random.default_rng(42)
    docids = np.cumsum(rng.integers(1, 50, n)).astype(np.uint64)
    tfs = rng.integers(1, 30, n).astype(np.uint64)
    dls = rng.integers(1, 10_000, n).astype(np.uint64)
    buf = encode_posting_list(docids, tfs, dls)
    d, t, dl = decode_posting_list(buf)
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(dl, dls)


def test_docid_zero_leading_chunk():
    # docID 0 as first posting of a chunk (reference-latent bug, pinned fixed)
    docids = np.array([0, 5, 9], dtype=np.uint64)
    tfs = np.array([1, 2, 3], dtype=np.uint64)
    dls = np.array([10, 20, 30], dtype=np.uint64)
    d, t, _ = decode_posting_list(encode_posting_list(docids, tfs, dls))
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)


def test_block_packing_straddles_64k():
    # enough postings that payload straddles the 64 KiB block boundary
    n = 20_000
    docids = (np.arange(n, dtype=np.uint64) + 1) * 1000  # big deltas -> fat varbyte
    tfs = np.full(n, 3, dtype=np.uint64)
    dls = np.full(n, 5000, dtype=np.uint64)
    buf = encode_posting_list(docids, tfs, dls)
    assert count_blocks(buf) >= 2
    d, t, dl = decode_posting_list(buf)
    np.testing.assert_array_equal(d, docids)
    lasts, ubs = read_chunk_meta(buf)
    n_chunks = (n + POSTINGS_IN_CHUNK - 1) // POSTINGS_IN_CHUNK
    assert len(lasts) == n_chunks
    np.testing.assert_array_equal(
        lasts, docids[np.minimum(np.arange(n_chunks) * 64 + 63, n - 1)]
    )


def test_selective_decode_skips_chunks():
    n = 10_000
    docids = np.arange(1, n + 1, dtype=np.uint64) * 7
    tfs = np.ones(n, dtype=np.uint64)
    dls = np.full(n, 100, dtype=np.uint64)
    buf = encode_posting_list(docids, tfs, dls)
    lo, hi = 30_000, 31_000
    d, t, dl = decode_posting_list(buf, min_docid=lo, max_docid=hi)
    # conservative superset, but must contain the exact range and be small
    want = docids[(docids >= lo) & (docids <= hi)]
    assert np.isin(want, d).all()
    assert len(d) <= len(want) + 2 * POSTINGS_IN_CHUNK


def test_chunk_ubs_stored():
    docids = np.arange(1, 200, dtype=np.uint64)
    tfs = np.ones_like(docids)
    dls = np.full_like(docids, 10)
    ubs = np.arange((len(docids) + 63) // 64, dtype=np.float32) + 0.5
    buf = encode_posting_list(docids, tfs, dls, chunk_ubs=ubs)
    _, got = read_chunk_meta(buf)
    np.testing.assert_allclose(got, ubs)


def test_unblocked_hw2_format_bytes_and_roundtrip():
    """hw2/Lexicon.cpp:82-132 layout: absolute docID + tf varbyte pairs."""
    import numpy as np
    from wse_ray.codec import decode_postings_unblocked, encode_postings_unblocked

    # known byte layout: 5 -> 0x05; 300 -> 0xAC 0x02 (7-bit LSB-first,
    # continuation high bit)
    buf = encode_postings_unblocked(np.array([5, 300]), np.array([1, 7]))
    assert buf == b"\x05\x01\xac\x02\x07"
    d = np.array([0, 1, 127, 128, 300, 2**32], dtype=np.uint64)
    f = np.array([1, 2, 3, 4, 5, 6], dtype=np.uint64)
    dd, ff = decode_postings_unblocked(encode_postings_unblocked(d, f))
    assert dd.tolist() == d.tolist() and ff.tolist() == f.tolist()
    assert decode_postings_unblocked(encode_postings_unblocked(np.array([]), np.array([])))[0].size == 0


def test_encode_segments_byte_identical_to_per_segment():
    """The partition-wide vectorized encoder (codec.encode_segments, used
    by index/build.py encode_partition) must produce byte-for-byte the
    concatenation of per-segment encode_posting_list calls, with matching
    per-segment offsets/lengths — across short segments, a multi-block
    heavy segment (30k postings), and a single-posting segment."""
    import numpy as np
    from wse_ray.codec import (
        POSTINGS_IN_CHUNK,
        encode_posting_list,
        encode_segments,
    )

    rng = np.random.default_rng(42)
    for nseg, max_len, big in [(50, 20, None), (30, 200, None), (3, 10, 30_000), (1, 2, None)]:
        starts, ends, d, t, l, ubs = [], [], [], [], [], []
        pos = 0
        for s in range(nseg):
            m = big if (big is not None and s == 0) else int(rng.integers(1, max_len))
            ids = np.sort(rng.choice(10**7, size=m, replace=False)).astype(np.uint64)
            starts.append(pos)
            ends.append(pos + m)
            pos += m
            d.append(ids)
            t.append(rng.integers(1, 300, size=m).astype(np.uint64))
            l.append(rng.integers(1, 5000, size=m).astype(np.uint64))
            nch = (m + POSTINGS_IN_CHUNK - 1) // POSTINGS_IN_CHUNK
            ubs.append(rng.random(nch).astype(np.float32))
        dd, tt, ll = np.concatenate(d), np.concatenate(t), np.concatenate(l)
        sa, ea = np.array(starts), np.array(ends)
        pay, meta = encode_segments(dd, tt, ll, sa, ea, np.concatenate(ubs))
        ref = bytearray()
        offs, lens = [], []
        for s in range(nseg):
            buf = encode_posting_list(
                dd[sa[s]:ea[s]], tt[sa[s]:ea[s]], ll[sa[s]:ea[s]], chunk_ubs=ubs[s]
            )
            offs.append(len(ref))
            lens.append(len(buf))
            ref += buf
        assert bytes(ref) == pay
        assert meta["offset"].tolist() == offs
        assert meta["length"].tolist() == lens


@given(
    st.lists(
        st.integers(min_value=1, max_value=150),  # segment lengths
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=30, deadline=None)
def test_encode_segments_property(seg_lens, seed):
    """Hypothesis sweep of arbitrary segment shapes: encode_segments must
    stay byte-identical to the per-segment path for any partition."""
    from wse_ray.codec import encode_segments

    rng = np.random.default_rng(seed)
    starts, ends, d, t, l, ubs = [], [], [], [], [], []
    pos = 0
    for m in seg_lens:
        ids = np.sort(rng.choice(10**6, size=m, replace=False)).astype(np.uint64)
        starts.append(pos)
        ends.append(pos + m)
        pos += m
        d.append(ids)
        t.append(rng.integers(1, 1000, size=m).astype(np.uint64))
        l.append(rng.integers(1, 10**6, size=m).astype(np.uint64))
        nch = (m + POSTINGS_IN_CHUNK - 1) // POSTINGS_IN_CHUNK
        ubs.append(rng.random(nch).astype(np.float32))
    pay, meta = encode_segments(
        np.concatenate(d), np.concatenate(t), np.concatenate(l),
        np.array(starts), np.array(ends), np.concatenate(ubs),
    )
    ref = bytearray()
    for s in range(len(seg_lens)):
        ref += encode_posting_list(d[s], t[s], l[s], chunk_ubs=ubs[s])
    assert bytes(ref) == pay
    assert meta["n_chunks"].sum() == sum(len(u) for u in ubs)
