"""HTML -> text extraction stage.

Reference semantics (``extractContent``, hw2/DataLoader.cpp:11-19): the text
is the byte range between the FIRST occurrence of the begin tag and the FIRST
occurrence of the end tag.  The per-row invariant from BASELINE.json: the
extracted ``text`` must be byte-identical per url to the corpus ``text``
column (the fixture generator wraps text reversibly — FIXTURES.md §F1).

Stateless ``map_batches`` stage, Arrow in / Arrow out.
"""
from __future__ import annotations

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


class ExtractText:
    """map_batches fn: html:binary -> text:string (+ url passthrough)."""

    def __init__(self, begin_tag: bytes = BEGIN_TAG, end_tag: bytes = END_TAG):
        self.begin_tag = begin_tag
        self.end_tag = end_tag

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"]
        texts = [
            extract_content(htmls[i].as_py(), self.begin_tag, self.end_tag)
            for i in range(len(htmls))
        ]
        out = batch.drop_columns(["html"])
        # binary, not string: extraction is byte-exact and raw web bytes may
        # not be valid UTF-8; downstream tokenization is byte-level anyway
        return out.append_column("text", pa.array(texts, pa.large_binary()))
