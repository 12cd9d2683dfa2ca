"""Robustness: degenerate inputs must not crash or corrupt results."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings, strategies as st

from wse_ray.config import BuildConfig
from wse_ray.index.build import build_index


def test_null_and_empty_text_rows(ray_session, tmp_path):
    t = pa.table(
        {
            "url": pa.array(["u0", "u1", "u2", "u3"]),
            "warc_ts": pa.array([0] * 4, pa.timestamp("us")),
            "html": pa.array([None] * 4, pa.binary()),
            "text": pa.array(["u0\nalpha beta ", None, "", "u3\ngamma "]),
            "lang": pa.array(["en"] * 4),
        }
    )
    cdir = tmp_path / "c"
    cdir.mkdir()
    pq.write_table(t, str(cdir / "c.parquet"))
    out = tmp_path / "idx"
    build_index(str(cdir), str(out), BuildConfig(num_partitions=2))
    from wse_ray.query.scorer import SearchEngine

    eng = SearchEngine(str(out))
    assert eng.N == 4
    res = eng.search("alpha", "disjunctive", 4)
    assert res[0][0] == 0 and res[0][1] > 0
    # null text treated as empty doc: present in doctable, no postings
    assert eng.df(b"alpha") == 1


def test_vectorized_tokenizer_null_handling():
    from wse_ray.stages.vectorized_tokenize import tokenize_batch

    arr = pa.array([b"a b ", None, b""], pa.large_binary())
    terms, tfs, dls, wn = tokenize_batch(arr, "simple")
    assert terms[0].as_py() == [b"a", b"b"]
    assert terms[1].as_py() == [] and terms[2].as_py() == []
    assert wn[1] == 0


@given(st.binary(min_size=0, max_size=300), st.lists(st.binary(min_size=1, max_size=8), max_size=4))
@settings(max_examples=60, deadline=None)
def test_snippet_algorithms_never_crash(text, words):
    from wse_ray.query.snippets import ALGORITHMS, generate_snippet

    dfs = [max(1, len(w)) for w in words]
    for algo in ALGORITHMS:
        out = generate_snippet(text, words, dfs, algo)
        assert isinstance(out, bytes)


def test_search_empty_query_and_whitespace(ray_session, tmp_path):
    t = pa.table(
        {
            "url": pa.array(["u"]),
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([None], pa.binary()),
            "text": pa.array(["u\nword "]),
            "lang": pa.array(["en"]),
        }
    )
    cdir = tmp_path / "c"
    cdir.mkdir()
    pq.write_table(t, str(cdir / "c.parquet"))
    out = tmp_path / "idx"
    build_index(str(cdir), str(out), BuildConfig(num_partitions=1))
    from wse_ray.query.scorer import SearchEngine

    eng = SearchEngine(str(out))
    assert eng.search("", "disjunctive", 5) == []
    assert eng.search("   ,;. ", "conjunctive", 5) == []
    assert eng.search("word", "disjunctive_pruned", 5)[0][0] == 0
