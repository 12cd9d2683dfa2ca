"""Property: vectorized batch tokenizer == scalar reference tokenizer."""
from collections import Counter

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from wse_ray.stages.vectorized_tokenize import tokenize_batch
from wse_ray.tokenizer import doc_postings


def _check(texts: list[bytes], mode: str):
    arr = pa.array(texts, pa.large_binary())
    terms_l, tfs_l, datalens, wordnums = tokenize_batch(arr, mode)
    for i, text in enumerate(texts):
        want = doc_postings(text, mode=mode)
        got_terms = terms_l[i].as_py()
        got_tfs = tfs_l[i].as_py()
        assert got_terms == sorted(want), (i, text)
        assert dict(zip(got_terms, got_tfs)) == dict(want), (i, text)
        assert datalens[i] == len(text)
        assert wordnums[i] == len(want)


CASES = [
    b"url\nalpha beta gamma",      # trailing token dropped in trec
    b"url\nalpha beta gamma\n",    # trailing separator -> kept
    b"no newline at all",          # whole text tokenized (npos+1 quirk)
    b"",                            # empty
    b",,;;..  ",                    # separators only
    b"u\n" + "data·base c++ née：x “q”".encode(),  # multibyte separator bytes
    b"u\nthe the the cat",
    b"a",                           # single token no separator
]


@pytest.mark.parametrize("mode", ["trec", "simple"])
def test_edge_cases(mode):
    _check(CASES, mode)


@given(
    st.lists(
        st.binary(min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=150, deadline=None)
def test_property_random_bytes(texts):
    _check(texts, "trec")
    _check(texts, "simple")


def test_fixture_corpus_equivalence(tiny_corpus):
    texts = [t.encode("utf-8") for t in tiny_corpus["text"].to_pylist()]
    _check(texts, "trec")


def test_ngram_strings_batch_boundaries():
    """n-grams never span documents; separator runs collapse; short docs
    emit nothing; n=3 works through the chained join."""
    import pyarrow as pa

    from wse_ray.stages.vectorized_tokenize import ngram_strings_batch

    t = pa.array(["a b c", "x  y", "solo", "", "p q r s"])
    assert ngram_strings_batch(t, 2).to_pylist() == [
        "a b", "b c", "x y", "p q", "q r", "r s",
    ]
    assert ngram_strings_batch(t, 3).to_pylist() == ["a b c", "p q r", "q r s"]
    assert ngram_strings_batch(pa.array([], pa.string()), 2).to_pylist() == []
