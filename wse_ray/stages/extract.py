"""HTML -> text extraction stage.

Reference semantics (``extractContent``, hw2/DataLoader.cpp:11-19): the text
is the byte range between the FIRST occurrence of the begin tag and the FIRST
occurrence of the end tag.  The per-row invariant from BASELINE.json: the
extracted ``text`` must be byte-identical per url to the corpus ``text``
column (the fixture generator wraps text reversibly — FIXTURES.md §F1).

Stateless ``map_batches`` stage, Arrow in / Arrow out.  The batch kernel
works on the Arrow binary buffers directly: the batch payload is copied ONCE
into a flat python bytes object and every row's tags are located with
``bytes.find(tag, row_start, row_end)`` — two-way/memchr under the hood,
with the search window bounded to the row so a tag can never match across a
row boundary.  Measured honestly (64x1MB and 20k x 1.6kB rows): throughput
is PARITY with a per-row ``.as_py()`` + ``find`` loop (0.8-1.1x across
runs) because extraction is find-bound and CPython's find is already the
fastest scan available — a numpy first-byte candidate sieve loses 4-7x to
it at HTML-like '<' densities, and ``pc.find_substring`` benches slower
too.  What the buffer kernel buys is the allocation profile: one flat
buffer + two int64 arrays per batch instead of a fresh MB-scale bytes
object per row, which matters in long-lived actor pools where per-row
churn fights the allocator across concurrent batches.  The output column
is assembled with bulk numpy slice copies into one preallocated buffer.
``extract_content`` remains the scalar reference the property tests compare
against.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

BEGIN_TAG = b"<body>"
END_TAG = b"</body>"


def extract_content(org: bytes, bstr: bytes, estr: bytes) -> bytes:
    """Byte-faithful port of hw2/DataLoader.cpp:11-19 (first-match substring).

    Like the reference, assumes both tags occur; a missing end tag yields the
    remainder (npos arithmetic in the reference would misbehave — we clamp).
    """
    start = org.find(bstr)
    end = org.find(estr)
    if start < 0:
        start = 0
        blen = 0
    else:
        blen = len(bstr)
    if end < 0:
        end = len(org)
    return org[start + blen : end]


def get_first_line(text: bytes) -> bytes:
    """hw2/DataLoader.cpp:21-25 — substring up to the first newline."""
    pos = text.find(b"\n")
    return text if pos < 0 else text[:pos]


def _binary_buffers(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, data) views over a binary/large_binary array's buffers."""
    buffers = col.buffers()
    if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type):
        offsets = np.frombuffer(
            buffers[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
        )
    else:
        offsets = np.frombuffer(
            buffers[1], dtype=np.int32, count=len(col) + 1, offset=col.offset * 4
        ).astype(np.int64)
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8)
        if buffers[2] is not None
        else np.zeros(0, np.uint8)
    )
    return offsets, data


def extract_batch(col: pa.Array, begin_tag: bytes, end_tag: bytes) -> pa.Array:
    """Vectorized ``extract_content`` over a binary column -> large_binary."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if col.null_count:
        raise ValueError("html column must not contain nulls")
    offsets, data = _binary_buffers(col)
    n = len(col)
    buf = data.tobytes()  # ONE copy of the batch payload; rows share it
    blen = len(begin_tag)
    offs = offsets.tolist()  # bulk C conversion beats per-element np scalars
    find = buf.find

    out_start = np.empty(n, dtype=np.int64)
    out_end = np.empty(n, dtype=np.int64)
    s = offs[0] if offs else 0
    for i in range(n):
        e = offs[i + 1]
        # window-bounded find: a match must fit inside [s, e), so bytes of
        # adjacent rows can never concatenate into a false tag match
        bp = find(begin_tag, s, e)
        ep = find(end_tag, s, e)
        out_start[i] = s if bp < 0 else bp + blen
        out_end[i] = e if ep < 0 else ep
        s = e
    lens = np.maximum(out_end - out_start, 0)  # end tag before begin -> empty

    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=new_offsets[1:])
    out_data = np.empty(int(new_offsets[-1]), dtype=np.uint8)
    for i in range(n):  # bulk memcpy per row, no python byte objects
        if lens[i]:
            out_data[new_offsets[i] : new_offsets[i + 1]] = data[
                out_start[i] : out_start[i] + lens[i]
            ]
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(new_offsets), pa.py_buffer(out_data)],  # zero-copy views
    )


class ExtractText:
    """map_batches fn: html:binary -> text:string (+ url passthrough)."""

    def __init__(self, begin_tag: bytes = BEGIN_TAG, end_tag: bytes = END_TAG):
        self.begin_tag = begin_tag
        self.end_tag = end_tag

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = extract_batch(batch["html"], self.begin_tag, self.end_tag)
        out = batch.drop_columns(["html"])
        # binary, not string: extraction is byte-exact and raw web bytes may
        # not be valid UTF-8; downstream tokenization is byte-level anyway
        return out.append_column("text", texts)
