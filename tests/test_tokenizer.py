"""Tokenizer parity tests (byte-level semantics, hw2/DataLoader.cpp:27-57)."""
from collections import Counter

from wse_ray.tokenizer import (
    doc_postings,
    tokenize_document,
    tokenize_query,
    tokenize_simple,
)


def test_basic_split():
    assert tokenize_query("cat dog mouse") == [b"cat", b"dog", b"mouse"]
    assert tokenize_query("a,b;c.d:e") == [b"a", b"b", b"c", b"d", b"e"]


def test_no_lowercasing_no_stemming():
    assert tokenize_query("Cat CATS cat") == [b"Cat", b"CATS", b"cat"]


def test_trailing_token_dropped_in_doc_mode():
    # document scanner never flushes the final word (hw2/DataLoader.cpp:36-57)
    text = b"http://u\nalpha beta gamma"
    assert tokenize_document(text) == [b"alpha", b"beta"]
    # ... unless the text ends with a separator
    text2 = b"http://u\nalpha beta gamma\n"
    assert tokenize_document(text2) == [b"alpha", b"beta", b"gamma"]


def test_query_mode_flushes_trailing():
    assert tokenize_query("alpha beta gamma") == [b"alpha", b"beta", b"gamma"]


def test_first_line_dropped():
    assert tokenize_document(b"url-line with tokens\nbody ") == [b"body"]


def test_no_newline_tokenizes_everything():
    # find("\n")+1 == 0 when absent (hw2/DataLoader.cpp:29-31)
    assert tokenize_document(b"alpha beta ") == [b"alpha", b"beta"]


def test_multibyte_separators_split_at_byte_level():
    # '·' = C2 B7, '：' = EF BC 9A, '“' = E2 80 9C, '”' = E2 80 9D: every byte
    # of these chars is in the separator byte set -> clean splits
    assert tokenize_query("data·base") == [b"data", b"base"]
    assert tokenize_query("a：b") == [b"a", b"b"]
    assert tokenize_query("“quoted”") == [b"quoted"]
    # an em-dash (E2 80 94) shares its first two bytes with the set: the
    # remaining byte survives as a (non-UTF8) token — byte-level semantics
    assert tokenize_query("a—b") == [b"a", b"\x94b"]


def test_unicode_non_separator_kept_whole():
    # 'é' = C3 A9, neither byte in the separator set
    assert tokenize_query("café au") == ["café".encode(), b"au"]


def test_tf_counts():
    tf = doc_postings(b"u\nthe cat the dog the ", mode="trec")
    assert tf == Counter({b"the": 3, b"cat": 1, b"dog": 1})


def test_simple_mode_keeps_first_line_and_trailing():
    assert tokenize_simple(b"alpha beta") == [b"alpha", b"beta"]
