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
