"""TREC source: parse parity with the reference's stream splitter."""
import gzip

import pytest

from wse_ray.sources.trec import iter_trec_docs, trec_to_parquet


def _make_trec(tmp_path, gz: bool):
    docs = [
        (b"D1", b"https://a.example/1\nalpha beta gamma\n"),
        (b"D2", b"https://a.example/2\nthe quick brown fox\n"),
        (b"D3", b"https://a.example/3\n"),  # empty body
    ]
    raw = b"".join(
        b"<DOC>\n<DOCNO>" + no + b"</DOCNO>\n<TEXT>\n" + text + b"</TEXT>\n</DOC>\n"
        for no, text in docs
    )
    p = tmp_path / ("c.trec.gz" if gz else "c.trec")
    if gz:
        with gzip.open(p, "wb") as f:
            f.write(raw)
    else:
        p.write_bytes(raw)
    return str(p), docs


@pytest.mark.parametrize("gz", [False, True])
def test_iter_trec_docs(tmp_path, gz):
    path, docs = _make_trec(tmp_path, gz)
    got = list(iter_trec_docs(path))
    assert [g[0] for g in got] == [d[0] for d in docs]
    assert [g[1] for g in got] == [d[1] for d in docs]


def test_trec_to_parquet_and_build(tmp_path, ray_session):
    import pyarrow.parquet as pq

    path, docs = _make_trec(tmp_path, gz=True)
    out = trec_to_parquet(path, str(tmp_path / "corpus"))
    t = pq.read_table(out[0])
    assert t.num_rows == 3
    assert t["url"][0].as_py() == "https://a.example/1"
    assert t["text"][1].as_py() == "https://a.example/2\nthe quick brown fox\n"

    # the converted corpus builds and answers queries
    from wse_ray.config import BuildConfig
    from wse_ray.index.build import build_index
    from wse_ray.query.scorer import SearchEngine

    idx = str(tmp_path / "idx")
    build_index(str(tmp_path / "corpus"), idx, BuildConfig(num_partitions=2))
    eng = SearchEngine(idx)
    res = eng.search("quick fox", "conjunctive", 5)
    assert res and res[0][0] == 1  # docID 1 = second doc


def _make_big_trec(tmp_path, n_docs: int, gz: bool = False):
    import gzip as _gzip

    raw = b"".join(
        b"<DOC>\n<DOCNO>D%d</DOCNO>\n<TEXT>\nhttps://x/%d\nword%d common text\n</TEXT>\n</DOC>\n"
        % (i, i, i)
        for i in range(n_docs)
    )
    p = tmp_path / ("big.trec.gz" if gz else "big.trec")
    if gz:
        with _gzip.open(p, "wb") as f:
            f.write(raw)
    else:
        p.write_bytes(raw)
    return str(p)


def test_trec_split_scan_parity(tmp_path, ray_session):
    """Uncompressed .trec files must split into multiple byte-range read
    tasks whose union reproduces the sequential stream exactly (same docs,
    same order, sequential docIDs)."""
    from wse_ray.sources.trec import _file_split_specs, read_trec

    path = _make_big_trec(tmp_path, 57)
    n, splits = _file_split_specs(path, docs_per_split=10)
    assert n == 57
    assert len(splits) == 6  # parallelism > 1 on a plain file
    assert [s[3] for s in splits] == [10, 10, 10, 10, 10, 7]
    # splits tile the doc sequence with contiguous byte ranges
    for (s0, e0, _, _), (s1, _, _, _) in zip(splits, splits[1:]):
        assert e0 == s1

    df = read_trec(path, docs_per_split=10).to_pandas().sort_values("docID")
    want = list(iter_trec_docs(path))
    assert len(df) == 57
    assert df["docID"].tolist() == list(range(57))
    assert df["text"].tolist() == [t.decode() for _no, t in want]

    # gzip fallback: one whole-file split, identical rows
    gzp = _make_big_trec(tmp_path, 57, gz=True)
    from wse_ray.sources.trec import _file_split_specs as fss

    ngz, gsplits = fss(gzp, docs_per_split=10)
    assert ngz == 57 and gsplits == [(0, -1, 0, 57)]
    dfg = read_trec(gzp, docs_per_split=10).to_pandas().sort_values("docID")
    assert dfg["text"].tolist() == df["text"].tolist()


def test_trec_split_scan_boundary_straddle(tmp_path, ray_session):
    """CHUNK-boundary robustness: a </DOC> tag straddling the scanner's
    chunk boundary must still be counted (regression for the tail-keep)."""
    from wse_ray.sources import trec as trec_mod

    path = _make_big_trec(tmp_path, 23)
    old_chunk = trec_mod.CHUNK
    trec_mod.CHUNK = 7  # pathological tiny chunks force straddles
    try:
        n, splits = trec_mod._file_split_specs(path, docs_per_split=5)
    finally:
        trec_mod.CHUNK = old_chunk
    assert n == 23
    assert sum(s[3] for s in splits) == 23
