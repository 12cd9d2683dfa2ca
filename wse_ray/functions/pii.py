"""PII detection and redaction — the scrubbing pass of a training-data
pipeline (emails, IPv4 addresses, US-style phone numbers).

Stateless vectorized ``map_batches`` stage: counting and replacement run
through pyarrow.compute's RE2 kernels (``count_substring_regex`` /
``replace_substring_regex``) over the whole batch — no per-row Python.
The pattern strings are shared VERBATIM with the DuckDB oracle (both
engines are RE2), so counts and redacted text match exactly; the gate
hashes md5(redacted) instead of shipping the text.

Scale shape: no shuffle, no state — a pure streaming transform; at 100 TB
this is bandwidth-bound on the text column only (reads prune to
(doc_id, text)).
"""
from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# order matters: emails first (their host part would otherwise leave
# ip-like remnants), then IPs, then phones
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_scrub(batch: pa.Table) -> pa.Table:
    """(doc_id, n_email, n_ipv4, n_phone, redacted_md5) for every doc."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    out = {"doc_id": batch["doc_id"]}
    red = text
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = pc.count_substring_regex(red, pat).cast(pa.int64())
        red = pc.replace_substring_regex(red, pat, repl)
    md5 = [hashlib.md5(s.as_py().encode()).hexdigest() for s in red]
    out["redacted_md5"] = pa.array(md5)
    return pa.table(out)
