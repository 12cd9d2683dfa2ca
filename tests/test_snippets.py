"""Golden/behavior tests for the six snippet algorithms (hw3/Snippets.cpp)."""
import pytest

from wse_ray.query.snippets import (
    ALGORITHMS,
    generate_snippet,
    get_word_pos,
    bm25_snippet_score,
    get_snippets_by_pos,
    linear_match,
    prefix_match,
)

TEXT = (
    b"the quick brown fox jumps over the lazy dog. a cat sat on the mat with "
    b"another cat nearby, watching the quick fox run far away into the deep "
    b"dark forest tonight "
)
WL = [b"cat", b"fox"]
DFS = [3, 7]

GOLDEN = {
    "linear": b"... quick brown fox jumps over the lazy dog. a cat  ...on the mat with another cat nearby,...",
    "prefix": b"... quick brown fox jumps over the lazy dog. a cat  ...on the mat with another cat nearby,...",
    "bm25": b"...fox jumps over the lazy dog. a cat sat on the mat with another cat nearby, watching the quick fox run...",
    "vector": b"...fox jumps over the lazy dog. a cat sat on the mat with another cat nearby, watching the quick fox run...",
    "keyword": b"... quick brown fox jumps over the lazy dog. a cat  ...on the mat with another cat nearby,...",
    "weight": b"...fox jumps over the lazy dog. a cat sat on the mat with another cat nearby, watching the quick fox run...",
}


@pytest.mark.parametrize("algo", ALGORITHMS)
def test_golden(algo):
    assert generate_snippet(TEXT, WL, DFS, algo) == GOLDEN[algo]


def test_single_hit_short_text_yields_empty():
    # a passage is only emitted when the window deque overflows — short docs
    # return "" exactly like the C++ (hw3/Snippets.cpp:69-96 never fires)
    assert linear_match(b"alpha beta cat gamma delta ", [b"cat"]) == b""


def test_prefix_matches_substring():
    # prefix_in_list is really substring match (hw3/Snippets.cpp:15-25)
    long = b"xx " * 10 + b"catalog yy " + b"zz " * 10 + b"catalytic ww " + b"qq " * 10
    out = prefix_match(long, [b"cat"])
    assert b"catalog" in out and b"catalytic" in out


def test_word_pos_counts_trailing_drop():
    # trailing unflushed word not position-counted (like the doc tokenizer)
    pos = get_word_pos(b"cat dog cat", [b"cat", b"dog"])
    assert pos[b"cat"] == [0]
    assert pos[b"dog"] == [4]


def test_punctuated_word_does_not_match():
    # matched words carry glued punctuation: 'cat,' != 'cat' (cpp :64-67)
    t = b"aa " * 10 + b"cat, bb " + b"cc " * 10
    assert linear_match(t, [b"cat"]) == b""


def test_bm25_snippet_clamped_nonnegative():
    # F5 clamps at 0 (hw3/Snippets.cpp:239) — unlike the ranking BM25
    assert bm25_snippet_score(freq=5, doc_num=3_000_000, data_len=100) == 0.0
    assert bm25_snippet_score(freq=5, doc_num=10, data_len=100) > 0.0


def test_get_snippets_by_pos_window():
    text = b"0123456789 " * 30
    out = get_snippets_by_pos(text, [11, 22])
    assert out.startswith(b"...")  # pos[0] != 0
    assert len(out) <= 3 + 100 + 20  # ~2*SNIPPETS_RANGE + next-separator slack


def test_empty_text_and_no_match():
    assert generate_snippet(b"", WL, DFS, "bm25") == b""
    assert generate_snippet(b"nothing here at all ", WL, DFS, "linear") == b""


def test_llm_snippet_stage(ray_session):
    """N7 plumbing: injectable LLM, reference prompt/truncation contract."""
    import pandas as pd
    import ray.data
    from wse_ray.query.snippets_llm import (
        MAX_CHARS, MAX_TERMS, USER_CONTENT_MAX, LLMSnippetStage,
        build_user_content, deterministic_stub_llm,
    )

    big = "x" * 20000
    assert len(build_user_content("q", big)) == USER_CONTENT_MAX

    user = build_user_content("fox jumps", "the quick brown fox jumps over the lazy dog " * 20)
    s = deterministic_stub_llm("sys", user)
    assert "fox" in s and len(s) <= MAX_CHARS and len(s.split()) <= MAX_TERMS
    assert deterministic_stub_llm("sys", user) == s  # deterministic

    rows = pd.DataFrame(
        {
            "query_id": [0, 0],
            "query": ["brown fox", "zzz"],
            "doc_id": [1, 2],
            "text": ["a b c brown fox d e", "nothing relevant here"],
        }
    )
    out = (
        ray.data.from_pandas(rows)
        .map_batches(LLMSnippetStage, concurrency=1, batch_format="pandas")
        .to_pandas()
    )
    assert list(out.columns)[-1] == "snippet" and len(out) == 2
    assert "fox" in out["snippet"].iloc[0]

    # injectable client is constructed once per actor and used per row
    calls = []
    def fake_llm(system, user):
        calls.append(user)
        return "SNIP"
    st = LLMSnippetStage(llm_fn=fake_llm)
    got = st(rows)
    assert list(got["snippet"]) == ["SNIP", "SNIP"] and len(calls) == 2
