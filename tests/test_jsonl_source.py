"""JSONL corpus source: split-scan parity, edge cases, docID determinism."""
import gzip
import json
import os

import pytest


def _write(path, lines):
    with open(path, "wb") as f:
        f.write(b"\n".join(lines))


def _docs(n, prefix="doc"):
    return [
        json.dumps({"url": f"u{i}", "text": f"{prefix} text {i} " + "w " * (i % 5)}).encode()
        for i in range(n)
    ]


def test_split_specs_match_full_scan(tmp_path):
    from wse_ray.sources.jsonl import _jsonl_split_specs, _jsonl_range_docs, iter_jsonl_docs

    p = str(tmp_path / "a.jsonl")
    lines = _docs(57)
    # blank + whitespace-only lines sprinkled in, and NO trailing newline
    lines.insert(10, b"")
    lines.insert(30, b"   ")
    _write(p, lines)

    full = list(iter_jsonl_docs(p))
    assert len(full) == 57

    n, splits = _jsonl_split_specs(p, docs_per_split=10)
    assert n == 57
    assert [cnt for (_, _, _, cnt) in splits] == [10, 10, 10, 10, 10, 7]
    got = []
    for (s, e, b, cnt) in splits:
        part = list(_jsonl_range_docs(p, s, e))
        assert len(part) == cnt
        got.extend(part)
    assert got == full


def test_gzip_single_split_and_trailing_newline(tmp_path):
    from wse_ray.sources.jsonl import _jsonl_split_specs, iter_jsonl_docs

    p = str(tmp_path / "a.jsonl.gz")
    with gzip.open(p, "wb") as f:
        f.write(b"\n".join(_docs(12)) + b"\n")  # WITH trailing newline
    n, splits = _jsonl_split_specs(p, docs_per_split=5)
    assert n == 12 and splits == [(0, -1, 0, 12)]
    assert len(list(iter_jsonl_docs(p))) == 12


def test_read_jsonl_docids_and_parity(ray_session, tmp_path):
    """read_jsonl attaches deterministic line-order docIDs across sorted
    files, identical between 1-split and many-split reads."""
    from wse_ray.sources.jsonl import read_jsonl

    p1, p2 = str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")
    _write(p1, _docs(23, "first"))
    _write(p2, _docs(9, "second"))

    one = read_jsonl([p2, p1], docs_per_split=1000).to_pandas().sort_values("docID")
    many = read_jsonl([p2, p1], docs_per_split=7).to_pandas().sort_values("docID")
    assert one["docID"].tolist() == list(range(32))
    assert one["text"].tolist() == many["text"].tolist()
    assert one["url"].tolist() == many["url"].tolist()
    # sorted-path order: a.jsonl's 23 docs come first
    assert one["text"].iloc[0].startswith("first") and one["text"].iloc[23].startswith("second")


def test_jsonl_to_parquet_roundtrip(ray_session, tmp_path):
    from wse_ray.sources.corpus import read_corpus
    from wse_ray.sources.jsonl import jsonl_to_parquet

    p = str(tmp_path / "a.jsonl")
    _write(p, _docs(15))
    out = jsonl_to_parquet(p, str(tmp_path / "pq"), rows_per_file=6)
    assert len(out) == 3
    ds = read_corpus(str(tmp_path / "pq"), columns=["url", "text"]).to_pandas()
    assert len(ds) == 15 and ds["url"].iloc[0] == "u0"


def test_read_jsonl_empty_file(ray_session, tmp_path):
    from wse_ray.sources.jsonl import read_jsonl

    p = str(tmp_path / "empty.jsonl")
    open(p, "wb").close()
    ds = read_jsonl(p)
    assert ds.count() == 0
    assert set(ds.schema().names) >= {"url", "text", "docID"}
