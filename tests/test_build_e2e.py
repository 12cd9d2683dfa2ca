"""End-to-end: Ray build + query vs the pure-python oracle (SURVEY.md §5.2)."""
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from wse_ray.config import BuildConfig
from wse_ray.fixtures import HEAVY_TERM, make_corpus, make_queries
from wse_ray.index.build import build_index
from wse_ray.oracle import OracleIndex
from wse_ray.query.scorer import SearchEngine


@pytest.fixture(scope="module")
def built(ray_session, tiny_corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_tiny"))
    cfg = BuildConfig(num_partitions=4, heavy_df_threshold=50, heavy_subparts=2)
    manifest = build_index(tiny_corpus_dir, out, cfg)
    return out, manifest


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    return OracleIndex.build(tiny_corpus["text"].to_pylist())


@pytest.fixture(scope="module")
def engine(built):
    return SearchEngine(built[0])


def test_stats_match(built, oracle):
    import json

    with open(os.path.join(built[0], "stats.json")) as f:
        stats = json.load(f)
    assert stats["N"] == oracle.N
    assert stats["avgdl"] == oracle.avgdl


def test_doctable_matches(built, oracle):
    # the runs checkpoint IS the doctable (column-pruned read)
    dt = pq.read_table(
        os.path.join(built[0], "runs"),
        columns=["docID", "url", "dataLen", "wordnums"],
    ).sort_by("docID")
    assert dt.num_rows == oracle.N
    urls = dt["url"].to_pylist()
    datalens = dt["dataLen"].to_pylist()
    wordnums = dt["wordnums"].to_pylist()
    for i, d in enumerate(oracle.doctable):
        assert urls[i] == d["url"], i
        assert datalens[i] == d["dataLen"], i
        assert wordnums[i] == d["wordnums"], i


def test_heavy_term_was_split(built, engine, oracle):
    # the fixture puts HEAVY_TERM in (almost) every doc; threshold 50 << df
    segs = engine._term_segments(HEAVY_TERM.encode())
    assert len(segs) == 2  # heavy_subparts
    assert segs[0]["last_docid"] < segs[1]["first_docid"]
    assert engine.df(HEAVY_TERM.encode()) == oracle.df(HEAVY_TERM.encode()) > 50


def test_postings_match_oracle(engine, oracle):
    assert set(engine.vocab()) == set(oracle.postings)
    for term, plist in oracle.postings.items():
        d, t, dl = engine.postings(term)
        want_ids = np.array([p[0] for p in plist], dtype=np.uint64)
        want_tfs = np.array([p[1] for p in plist], dtype=np.uint64)
        np.testing.assert_array_equal(d, want_ids, err_msg=repr(term))
        np.testing.assert_array_equal(t, want_tfs, err_msg=repr(term))
        want_dls = np.array(
            [oracle.doctable[p[0]]["dataLen"] for p in plist], dtype=np.uint64
        )
        np.testing.assert_array_equal(dl, want_dls, err_msg=repr(term))
        assert engine.df(term) == len(plist)


def test_rank_identical_on_query_set(engine, oracle):
    for q in make_queries():
        got = engine.search(q["query"], q["mode"], q["k"])
        want = oracle.search(q["query"], q["mode"], q["k"])
        assert [g[0] for g in got] == [w[0] for w in want], q
        np.testing.assert_allclose(
            [g[1] for g in got], [w[1] for w in want], rtol=0, atol=1e-12, err_msg=str(q)
        )


def test_extraction_invariant_byte_identical(tiny_corpus):
    # BASELINE.json per-row invariant: html -> text extraction reproduces the
    # text column byte-identically per url
    from wse_ray.stages.extract import extract_content

    for i in range(tiny_corpus.num_rows):
        html = tiny_corpus["html"][i].as_py()
        text = tiny_corpus["text"][i].as_py().encode("utf-8")
        assert extract_content(html, b"<body>", b"</body>") == text


def test_resume_skips_completed_phases(built, tiny_corpus_dir):
    out, _ = built
    import time

    t0 = time.perf_counter()
    manifest = build_index(tiny_corpus_dir, out, BuildConfig(num_partitions=4))
    assert manifest["stats"]["N"] == 100
    assert manifest["timings_sec"] == {}  # all phases skipped
    assert time.perf_counter() - t0 < 5.0


def test_callable_corpus_partials_bounded(tmp_path):
    """With an unknown corpus size (callable corpora, approx_docs<=0) the
    per-batch heavy-candidate partials must be CAPPED (top-M by count), not
    the full batch vocab — the driver sums partials across every batch, so
    unbounded vocab rows per batch would grow driver memory with corpus
    width.  Routing-only: a missed heavy term costs skew, not correctness."""
    import numpy as np
    import pyarrow as pa

    from wse_ray.index.build import _CALLABLE_PARTIALS_CAP, TokenizeWriteRuns

    n_docs, vocab_per_doc = 100, 80  # 8000 distinct terms >> cap? use cap check
    texts = [
        " ".join(f"t{i}_{j}" for j in range(vocab_per_doc)) for i in range(n_docs)
    ]
    batch = pa.table(
        {
            "docID": pa.array(np.arange(n_docs, dtype=np.uint64)),
            "url": pa.array(["u"] * n_docs, pa.large_string()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    tok = TokenizeWriteRuns(str(tmp_path), "simple", heavy_threshold=10, approx_docs=0)
    out = tok(batch)
    # stats row + at most CAP candidate rows (8000 distinct terms in batch)
    assert out.num_rows <= _CALLABLE_PARTIALS_CAP + 1
    # known-size corpora keep the density-cutoff behavior (no cap applied)
    tok2 = TokenizeWriteRuns(str(tmp_path), "simple", heavy_threshold=10, approx_docs=n_docs)
    out2 = tok2(batch)
    assert out2.num_rows >= 1


def test_extract_batch_matches_scalar(tiny_corpus):
    """The vectorized buffer-level kernel must equal the scalar reference
    byte-for-byte over the fixture corpus AND over adversarial rows:
    missing tags, end-before-begin, empty rows, multi-occurrence, and tag
    bytes that only form a match ACROSS a row boundary in the concatenated
    Arrow data buffer (must NOT match)."""
    import pyarrow as pa

    from wse_ray.stages.extract import ExtractText, extract_batch, extract_content

    rows = [tiny_corpus["html"][i].as_py() for i in range(20)]
    rows += [
        b"",
        b"<body>",
        b"</body>",
        b"</body>pre<body>post",          # end before begin -> empty
        b"no tags at all",
        b"<body>only begin, no end",
        b"only end</body>tail",
        b"<body>first</body><body>second</body>",  # first-match semantics
        b"x<bo",                           # begin tag split across...
        b"dy>y</bo",                       # ...row boundaries: no match
        b"dy>z",
        b"\x00\xff<body>\x80bin\x00</body>\xfe",  # non-UTF8 bytes
    ]
    for typ in (pa.large_binary(), pa.binary()):
        col = pa.array(rows, typ)
        got = extract_batch(col, b"<body>", b"</body>")
        want = [extract_content(r, b"<body>", b"</body>") for r in rows]
        assert got.to_pylist() == want, typ
        # sliced-offset view (non-zero col.offset) must read the right rows
        got_sliced = extract_batch(col.slice(3, 9), b"<body>", b"</body>")
        assert got_sliced.to_pylist() == want[3:12], typ

    # stage-level: url passthrough + large_binary output dtype
    t = pa.table({"url": pa.array(["u"] * len(rows)), "html": pa.array(rows, pa.large_binary())})
    out = ExtractText()(t)
    assert out.column_names == ["url", "text"]
    assert out["text"].type == pa.large_binary()
    assert out["text"].to_pylist() == [extract_content(r, b"<body>", b"</body>") for r in rows]


def test_extract_batch_hypothesis_matches_scalar():
    """Property sweep: the batch kernel equals the scalar reference on
    arbitrary byte rows (tags may appear zero, once, many times, split
    across rows, overlapping)."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from wse_ray.stages.extract import extract_batch, extract_content

    frag = st.binary(max_size=12)
    row = st.lists(
        st.one_of(frag, st.just(b"<body>"), st.just(b"</body>"),
                  st.just(b"<bo"), st.just(b"dy>"), st.just(b"</bo")),
        max_size=6,
    ).map(b"".join)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(row, max_size=8))
    def check(rows):
        col = pa.array(rows, pa.large_binary())
        got = extract_batch(col, b"<body>", b"</body>").to_pylist()
        want = [extract_content(r, b"<body>", b"</body>") for r in rows]
        assert got == want

    check()


def test_term_index_hypothesis_matches_dict():
    """Property sweep: the sorted-buffer binary-search probe agrees with a
    dict lookup for arbitrary vocabularies and probes."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    term = st.binary(min_size=1, max_size=8)

    @settings(max_examples=150, deadline=None)
    @given(st.sets(term, max_size=30), st.lists(term, max_size=10))
    def check(vocab, probes):
        terms = sorted(vocab)
        uniq = pa.array(terms, pa.large_binary())
        bufs = uniq.buffers()
        offs = (
            np.frombuffer(bufs[1], dtype=np.int64, count=len(uniq) + 1)
            if len(uniq) else np.zeros(1, dtype=np.int64)
        )
        buf = bufs[2].to_pybytes() if bufs[2] is not None else b""

        class Probe:
            _ut_offsets, _ut_buf = offs, buf
            from wse_ray.query.scorer import SearchEngine as _SE
            _term_index = _SE._term_index

        p = Probe()
        want = {t: i for i, t in enumerate(terms)}
        for q in list(probes) + terms:
            assert p._term_index(q) == want.get(q, -1), q

    check()
