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
* ``read_trec`` — a Ray Dataset directly over TREC files.  UNCOMPRESSED
  files are split-scanned: a parallel offset-index pre-pass (one Ray task
  per file) records every ``docs_per_split``-th ``</DOC>`` boundary, and
  each read task then seeks straight to its byte range — parallelism =
  total splits, not file count.  Gzip streams are not seekable, so a
  ``.gz`` file stays one task (documented limitation; use
  ``trec_to_parquet`` for the splittable path).
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


def _trec_range_docs(path: str, start: int, end: int):
    """Yield (docno, full_text) for every document whose terminating
    ``</DOC>`` lies in ``[start, end)`` of an UNCOMPRESSED trec file.
    ``start`` must sit exactly after a ``</DOC>`` boundary (or 0) — the
    offset-index pre-pass guarantees that.  ``end < 0`` means whole file
    (the gzip fallback)."""
    if end < 0:
        yield from iter_trec_docs(path)
        return
    with open(path, "rb") as f:
        f.seek(start)
        remaining = end - start
        buf = b""
        while remaining > 0:
            chunk = f.read(min(CHUNK, remaining))
            if not chunk:
                break
            remaining -= len(chunk)
            buf += chunk
            while True:
                pos = buf.find(b"</DOC>")
                if pos < 0:
                    break
                doc = buf[:pos]
                buf = buf[pos + len(b"</DOC>") :]
                yield (
                    extract_content(doc, b"<DOCNO>", b"</DOCNO>"),
                    extract_content(doc, b"<TEXT>\n", b"</TEXT>"),
                )


def _file_split_specs(path: str, docs_per_split: int) -> tuple[int, list[tuple[int, int, int, int]]]:
    """Offset-index pre-pass for ONE file: scan for ``</DOC>`` boundaries
    and return (total_docs, [(start_byte, end_byte, base_doc, n_docs)]) —
    one tuple per split of <= docs_per_split documents.  Only every
    docs_per_split-th boundary is kept, so the index is O(docs/split), not
    O(docs).  Gzip: no seeking -> one whole-file split."""
    if path.endswith(".gz"):
        n = sum(1 for _ in iter_trec_docs(path))
        return n, ([(0, -1, 0, n)] if n else [])
    tag = b"</DOC>"
    boundaries = [0]
    n = 0
    buf = b""
    buf_start = 0  # absolute file offset of buf[0]
    with open(path, "rb") as f:
        while True:
            chunk = f.read(CHUNK)
            if not chunk:
                break
            buf += chunk
            search_from = 0
            while True:
                i = buf.find(tag, search_from)
                if i < 0:
                    break
                n += 1
                search_from = i + len(tag)
                if n % docs_per_split == 0:
                    boundaries.append(buf_start + search_from)
            # drop consumed bytes; keep len(tag)-1 for a straddling match
            keep_from = max(search_from, len(buf) - (len(tag) - 1))
            buf_start += keep_from
            buf = buf[keep_from:]
    size = os.path.getsize(path)
    splits = []
    for j, s in enumerate(boundaries):
        e = boundaries[j + 1] if j + 1 < len(boundaries) else size
        cnt = min(docs_per_split, n - j * docs_per_split)
        if cnt > 0:
            splits.append((s, e, j * docs_per_split, cnt))
    return n, splits


def trec_docs_table(path: str, start: int = 0, end: int = -1) -> pa.Table:
    """TREC file (or byte range of one) -> canonical corpus table
    (url, warc_ts, html, text, lang)."""
    urls, texts = [], []
    for _docno, text in _trec_range_docs(path, start, end):
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


def read_trec(paths: list[str] | str, docs_per_split: int = 20000):
    """Ray Dataset of corpus rows directly from TREC files, with
    deterministic sequential docIDs (stream order within a file; multi-file
    order = sorted path order).

    Plain files are split-scanned: the offset-index pre-pass runs as ONE
    RAY TASK PER FILE (parallel across files; the driver keeps only every
    ``docs_per_split``-th boundary), then one read task per split seeks
    straight to its byte range — read parallelism = total splits.  Gzip
    files are not seekable and stay one task each (documented; convert with
    ``trec_to_parquet`` for the fully splittable path)."""
    import numpy as np
    import ray
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)

    index_file = ray.remote(num_cpus=1)(_file_split_specs)
    per_file = ray.get([index_file.remote(p, docs_per_split) for p in paths])

    specs = []
    base = 0
    for p, (n, splits) in zip(paths, per_file):
        for (s, e, b, cnt) in splits:
            specs.append(
                {"path": p, "start": s, "end": e, "base": base + b, "count": cnt}
            )
        base += n

    def read_one(batch: pa.Table):
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            tbl = trec_docs_table(
                path, batch["start"][i].as_py(), batch["end"][i].as_py()
            )
            b0 = batch["base"][i].as_py()
            docids = pa.array(
                np.arange(b0, b0 + tbl.num_rows, dtype=np.uint64), pa.uint64()
            )
            yield tbl.append_column("docID", docids)

    return ray.data.from_items(specs).map_batches(
        read_one, batch_size=1, batch_format="pyarrow"
    )
