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


def test_run_write_retry_idempotent(tmp_path):
    """A re-executed phase-1 task must overwrite its run file, not duplicate
    the row group (run names derive from the batch's min docID)."""
    import glob
    from wse_ray.index.build import TokenizeWriteRuns

    runs_dir = tmp_path / "runs"
    runs_dir.mkdir()
    batch = pa.table(
        {
            "docID": pa.array([5, 6, 7], pa.uint64()),
            "url": pa.array(["a", "b", "c"]),
            "text": pa.array([b"x y ", b"y z ", b"z x "], pa.large_binary()),
        }
    )
    tok = TokenizeWriteRuns(str(runs_dir), "simple", 1000, 3)
    tok(batch)
    tok(batch)  # simulated lineage re-execution
    files = glob.glob(str(runs_dir / "*.parquet"))
    assert len(files) == 1
    assert pq.read_table(files[0]).num_rows == 3


def test_postings_compaction_o_p_files(ray_session, tmp_path, tiny_corpus_dir):
    """compact_min_fragments=1 must leave exactly one exchange file per
    partition with identical query results."""
    import glob
    from wse_ray.fixtures import make_queries
    from wse_ray.query.scorer import SearchEngine

    plain = tmp_path / "idx_plain"
    compact = tmp_path / "idx_compact"
    build_index(tiny_corpus_dir, str(plain), BuildConfig(num_partitions=4, compact_min_fragments=0))
    build_index(tiny_corpus_dir, str(compact), BuildConfig(num_partitions=4, compact_min_fragments=1))
    for d in sorted(glob.glob(str(compact / "postings" / "part=*"))):
        files = glob.glob(d + "/*.parquet")
        assert len(files) == 1 and "compacted" in files[0], d
    ep, ec = SearchEngine(str(plain)), SearchEngine(str(compact))
    for q in make_queries():
        assert ep.search(q["query"], q["mode"], q["k"]) == ec.search(q["query"], q["mode"], q["k"])


def test_compaction_crash_resume_no_duplication(tmp_path):
    """A compaction interrupted between the compacted-file rename and the
    fragment deletes must finish the deletes on rerun — never double-count."""
    import pyarrow as pa
    from wse_ray.index.build import _compact_part_task

    part = tmp_path / "part=00000"
    part.mkdir()
    t1 = pa.table({"term": [b"a", b"b"], "docID": [1, 2], "tf": [1, 1], "dl": [3, 3]})
    t2 = pa.table({"term": [b"c"], "docID": [3], "tf": [2], "dl": [4]})
    pq.write_table(t1, str(part / "frag-1.parquet"))
    pq.write_table(t2, str(part / "frag-2.parquet"))
    spec = pa.table({"src": [str(part)]})
    _compact_part_task(spec, min_fragments=1)
    files = sorted(p.name for p in part.glob("*.parquet"))
    assert files == ["compacted-0.parquet"]
    total = pq.read_table(str(part)).num_rows
    assert total == 3
    # simulate the crash: compacted file exists AND a leftover fragment
    pq.write_table(t2, str(part / "frag-9.parquet"))
    _compact_part_task(spec, min_fragments=1)
    files = sorted(p.name for p in part.glob("*.parquet"))
    assert files == ["compacted-0.parquet"]
    assert pq.read_table(str(part)).num_rows == 3
