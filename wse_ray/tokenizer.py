"""Byte-level tokenizer replicating the reference scanner.

The reference scans text one BYTE at a time and splits on any byte of the
separator string (hw2/DataLoader.cpp:27-57; separator set hw3/config.h:59).
Two modes differ only in flush behavior:

* document mode (``calcWordFreq``, hw2/DataLoader.cpp:27-70): the first line
  (the url) is dropped before tokenizing, and a word still being accumulated
  when the text ends is NOT flushed (no post-loop flush) — a trailing token
  not followed by a separator is silently dropped;
* query mode (``splitQuery``, hw3/DataLoader.cpp:432-458): no first-line
  drop, trailing word IS flushed.

``mode="simple"`` flushes the trailing token and keeps the first line — used
by the documents-table pipelines so the DuckDB oracle SQL stays exactly
expressible.

Tokens are byte strings (multibyte UTF-8 chars that share bytes with the
separator set are split mid-character, exactly like the reference).
"""
from __future__ import annotations

import re
from collections import Counter

from .config import SEPARATOR_BYTES

_SEP_CLASS = b"[" + re.escape(bytes(sorted(SEPARATOR_BYTES))) + b"]"
_SEP_RE = re.compile(_SEP_CLASS)
_SEP_PLUS_RE = re.compile(_SEP_CLASS + b"+")


def split_tokens(data: bytes, flush_trailing: bool) -> list[bytes]:
    """Split ``data`` on separator bytes; empty tokens removed.

    ``flush_trailing=False`` replicates the document scanner's dropped
    unflushed trailing word (hw2/DataLoader.cpp:36-57: no flush after loop).
    """
    if not data:
        return []
    parts = _SEP_RE.split(data)
    if not flush_trailing and parts[-1] != b"":
        parts = parts[:-1]
    return [p for p in parts if p]


def tokenize_document(full_text: bytes) -> list[bytes]:
    """Reference document tokenization (hw2/DataLoader.cpp:27-57).

    Drops the first line (the url); if there is no newline the WHOLE text is
    tokenized (``find("\\n")+1`` == 0 when absent — hw2/DataLoader.cpp:29-31).
    Trailing unflushed token dropped.
    """
    nl = full_text.find(b"\n")
    body = full_text[nl + 1 :]  # nl == -1 -> whole text, replicating npos+1==0
    return split_tokens(body, flush_trailing=False)


def tokenize_query(query: bytes | str) -> list[bytes]:
    """Reference query tokenization (hw3/DataLoader.cpp:432-458): trailing
    word flushed, no first-line drop."""
    if isinstance(query, str):
        query = query.encode("utf-8")
    return split_tokens(query, flush_trailing=True)


def tokenize_simple(text: bytes) -> list[bytes]:
    """SQL-oracle-friendly mode: like query mode over the whole text."""
    return split_tokens(text, flush_trailing=True)


def term_frequencies(tokens: list[bytes]) -> Counter:
    """Per-document tf map (SortedPosting, hw2/sortedPosting.h:3-8)."""
    return Counter(tokens)


def doc_postings(full_text: bytes, mode: str = "trec") -> Counter:
    """tf map for one document under the given tokenizer mode."""
    if mode == "trec":
        return Counter(tokenize_document(full_text))
    return Counter(tokenize_simple(full_text))
