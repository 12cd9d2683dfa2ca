"""TREC corpus source — the reference's native input format.

Reads ``msmarco-docs.trec``-style files (optionally gzipped): documents are
``<DOC>...</DOC>`` blocks with ``<DOCNO>`` and ``<TEXT>`` (first line of
TEXT = url), split exactly like the reference's streaming parser
(hw2/DataLoader.cpp:72-141: accumulate, split on ``</DOC>``, extract fields
with first-match tag pairs) so a reference user can point this engine at
their existing corpus.

Exposed two ways:

* ``trec_to_parquet`` — one-off conversion into the engine's canonical web
  corpus shape (url, warc_ts, html, text, lang); the recommended path (the
  build then gets deterministic docIDs, column pruning, splittable files);
* ``read_trec`` — a Ray Dataset directly over TREC files (one read task per
  file; gzip streams are not splittable, so parallelism = file count).
"""
from __future__ import annotations

import gzip
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..stages.extract import extract_content, get_first_line

CHUNK = 1 << 20  # 1 MiB stream chunks (reference used 1 KiB, hw2/config.h:31)


def iter_trec_docs(path: str):
    """Yield (docno: bytes, full_text: bytes) per document, stream order."""
    opener = gzip.open if path.endswith(".gz") else open
    buf = b""
    with opener(path, "rb") as f:
        while True:
            chunk = f.read(CHUNK)
            if not chunk:
                break
            buf += chunk
            while True:
                pos = buf.find(b"</DOC>")
                if pos < 0:
                    break
                doc = buf[:pos]
                buf = buf[pos + len(b"</DOC>") :]
                docno = extract_content(doc, b"<DOCNO>", b"</DOCNO>")
                text = extract_content(doc, b"<TEXT>\n", b"</TEXT>")
                yield docno, text


def trec_docs_table(path: str) -> pa.Table:
    """One TREC file -> canonical corpus table (url, warc_ts, html, text, lang)."""
    urls, texts = [], []
    for _docno, text in iter_trec_docs(path):
        urls.append(get_first_line(text).decode("utf-8", "replace"))
        texts.append(text.decode("utf-8", "replace"))
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "html": pa.array([None] * n, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["und"] * n, pa.string()),
        }
    )


def trec_to_parquet(trec_paths: list[str] | str, out_dir: str, rows_per_file: int = 50000) -> list[str]:
    """Convert TREC file(s) to the canonical parquet corpus layout."""
    if isinstance(trec_paths, str):
        trec_paths = [trec_paths]
    os.makedirs(out_dir, exist_ok=True)
    written = []
    idx = 0
    for p in sorted(trec_paths):
        tbl = trec_docs_table(p)
        for lo in range(0, tbl.num_rows, rows_per_file):
            out = os.path.join(out_dir, f"corpus-{idx:05d}.parquet")
            pq.write_table(tbl.slice(lo, rows_per_file), out)
            written.append(out)
            idx += 1
    return written


def read_trec(paths: list[str] | str):
    """Ray Dataset of corpus rows directly from TREC files (docID attached
    per-file via footer-free sequential counting — single file only keeps
    exact reference stream order; multi-file order = sorted path order)."""
    import numpy as np
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)
    # sequential doc counts require one pre-pass per file (gzip: no footer)
    counts = []
    for p in paths:
        counts.append(sum(1 for _ in iter_trec_docs(p)))
    bases = [0]
    for c in counts[:-1]:
        bases.append(bases[-1] + c)
    specs = [{"path": p, "base": b} for p, b in zip(paths, bases)]

    def read_one(batch: pa.Table):
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            base = batch["base"][i].as_py()
            tbl = trec_docs_table(path)
            docids = pa.array(
                np.arange(base, base + tbl.num_rows, dtype=np.uint64), pa.uint64()
            )
            yield tbl.append_column("docID", docids)

    return ray.data.from_items(specs).map_batches(
        read_one, batch_size=1, batch_format="pyarrow"
    )
