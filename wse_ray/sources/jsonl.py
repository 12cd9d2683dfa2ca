"""JSONL corpus source — newline-delimited JSON, the lingua franca of web
text dumps (one document object per line).

Mirrors the TREC source's shape (`wse_ray/sources/trec.py`): a one-off
``jsonl_to_parquet`` conversion into the engine's canonical corpus layout
(the recommended path — deterministic docIDs, column pruning, splittable
files), and ``read_jsonl`` for reading the files directly.  UNCOMPRESSED
files are split-scanned: a parallel offset-index pre-pass (one Ray task
per file) records every ``docs_per_split``-th newline boundary, and each
read task seeks straight to its byte range — read parallelism = total
splits, not file count.  Gzip streams are not seekable, so a ``.gz`` file
stays one task (use ``jsonl_to_parquet`` for the fully splittable path).

DocIDs are deterministic: line order within a file, sorted-path order
across files — the same contract as the parquet and TREC sources.
The per-line ``json.loads`` is the honest cost of the format (it is why
conversion to parquet is the recommended steady-state).
"""
from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 1 << 20  # 1 MiB stream chunks


def iter_jsonl_docs(path: str):
    """Yield one parsed JSON object per non-empty line, stream order."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def _jsonl_split_specs(path: str, docs_per_split: int) -> tuple[int, list[tuple[int, int, int, int]]]:
    """Offset-index pre-pass for ONE file: scan newline boundaries and
    return (total_docs, [(start_byte, end_byte, base_doc, n_docs)]) — one
    tuple per split of <= docs_per_split non-empty lines.  O(docs/split)
    index.  Gzip: no seeking -> one whole-file split."""
    if path.endswith(".gz"):
        n = sum(1 for _ in iter_jsonl_docs(path))
        return n, ([(0, -1, 0, n)] if n else [])
    boundaries = [0]
    n = 0
    line_start_blank = True  # current line so far contains only whitespace
    with open(path, "rb") as f:
        pos = 0
        while True:
            chunk = f.read(CHUNK)
            if not chunk:
                break
            search_from = 0
            while True:
                i = chunk.find(b"\n", search_from)
                if i < 0:
                    # does the tail contribute non-ws bytes to the open line?
                    if chunk[search_from:].strip():
                        line_start_blank = False
                    break
                if not line_start_blank or chunk[search_from:i].strip():
                    n += 1
                    if n % docs_per_split == 0:
                        boundaries.append(pos + i + 1)
                line_start_blank = True
                search_from = i + 1
            pos += len(chunk)
        if not line_start_blank:  # final line without trailing newline
            n += 1
    size = os.path.getsize(path)
    splits = []
    for j, s in enumerate(boundaries):
        e = boundaries[j + 1] if j + 1 < len(boundaries) else size
        cnt = min(docs_per_split, n - j * docs_per_split)
        if cnt > 0:
            splits.append((s, e, j * docs_per_split, cnt))
    return n, splits


def _jsonl_range_docs(path: str, start: int, end: int):
    """Yield parsed objects for every line ending in ``[start, end)`` of an
    uncompressed file; ``start`` sits exactly after a newline (or 0),
    ``end < 0`` means whole file (the gzip fallback)."""
    if end < 0:
        yield from iter_jsonl_docs(path)
        return
    with open(path, "rb") as f:
        f.seek(start)
        data = f.read(end - start)
    for line in data.split(b"\n"):
        line = line.strip()
        if line:
            yield json.loads(line)


def jsonl_docs_table(
    path: str,
    start: int = 0,
    end: int = -1,
    text_key: str = "text",
    url_key: str = "url",
) -> pa.Table:
    """JSONL file (or byte range of one) -> canonical corpus table
    (url, warc_ts, html, text, lang); missing keys become '' / 'und'."""
    urls, texts, langs = [], [], []
    for obj in _jsonl_range_docs(path, start, end):
        urls.append(str(obj.get(url_key, "")))
        texts.append(str(obj.get(text_key, "")))
        langs.append(str(obj.get("lang", "und")))
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n, pa.timestamp("us")),
            "html": pa.array([None] * n, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def jsonl_to_parquet(
    jsonl_paths: list[str] | str,
    out_dir: str,
    rows_per_file: int = 50000,
    text_key: str = "text",
    url_key: str = "url",
) -> list[str]:
    """Convert JSONL file(s) to the canonical parquet corpus layout."""
    if isinstance(jsonl_paths, str):
        jsonl_paths = [jsonl_paths]
    os.makedirs(out_dir, exist_ok=True)
    written = []
    idx = 0
    for p in sorted(jsonl_paths):
        tbl = jsonl_docs_table(p, text_key=text_key, url_key=url_key)
        for lo in range(0, tbl.num_rows, rows_per_file):
            out = os.path.join(out_dir, f"corpus-{idx:05d}.parquet")
            pq.write_table(tbl.slice(lo, rows_per_file), out)
            written.append(out)
            idx += 1
    return written


def read_jsonl(
    paths: list[str] | str,
    docs_per_split: int = 20000,
    text_key: str = "text",
    url_key: str = "url",
):
    """Ray Dataset of corpus rows (+ deterministic docIDs) directly from
    JSONL files — the same split-scan pattern as ``read_trec``."""
    import numpy as np
    import ray
    import ray.data

    if isinstance(paths, str):
        paths = [paths]
    paths = sorted(paths)

    index_file = ray.remote(num_cpus=1)(_jsonl_split_specs)
    per_file = ray.get([index_file.remote(p, docs_per_split) for p in paths])

    specs = []
    base = 0
    for p, (n, splits) in zip(paths, per_file):
        for (s, e, b, cnt) in splits:
            specs.append(
                {"path": p, "start": s, "end": e, "base": base + b, "count": cnt}
            )
        base += n
    if not specs:  # only empty/blank files: a valid empty corpus
        return ray.data.from_arrow(
            jsonl_docs_table(paths[0], 0, 0).append_column(
                "docID", pa.array([], pa.uint64())
            )
        )

    def read_one(batch: pa.Table):
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            tbl = jsonl_docs_table(
                path,
                batch["start"][i].as_py(),
                batch["end"][i].as_py(),
                text_key=text_key,
                url_key=url_key,
            )
            b0 = batch["base"][i].as_py()
            docids = pa.array(
                np.arange(b0, b0 + tbl.num_rows, dtype=np.uint64), pa.uint64()
            )
            yield tbl.append_column("docID", docids)

    return ray.data.from_items(specs).map_batches(
        read_one, batch_size=1, batch_format="pyarrow"
    )
