"""Snippet generation — the reference final project's six algorithms.

Behavioral ports of hw3/Snippets.cpp (N1 Linear Match :45-119, N2 Prefix
Match :121-195, N3 BM25 Selection / N4 Vector-Space Selection :308-438,
N5 Keyword Match :664-746, N6 Weight Selection :497-621).  All operate on
raw text BYTES with the byte-level separator set, like the C++.

Deviations (the C++ relies on unspecified/undefined behavior; we pin
deterministic rules and golden-test them):

* empty words in the window deque: the C++ indexes ``word[-1]`` (UB); we
  treat an empty word as not punctuation-terminated (joined with a space);
* priority-queue tie order (equal positions / scores / weights) is
  unspecified in C++; we break position ties by term bytes, cluster-score
  ties by creation order, keyword-weight ties by term bytes;
* the snippet BM25/vector scores use the reference's compile-time corpus
  constants DOC_AVG_LEN=7111, DOC_NUM=3213835 (hw3/config.h:60-61) by
  default — parameterizable per index;
* df=0 terms: C++ divides by zero (-> inf weight); we use math.inf.
"""
from __future__ import annotations

import heapq
import math
from collections import deque

from ..config import (
    CLUSTER_SIZE,
    KEYWORD_PERCENT,
    MAX_SNIPPETS,
    MIN_KEYWORD,
    RESULT_NUM,
    SEPARATOR_BYTES,
    SNIPPET_WS_BYTES,
    SNIPPETS_RANGE,
    TERM_NUM,
)

# concatDeque's separator set lacks the whitespace chars (hw3/Snippets.cpp:29)
_CONCAT_SEP_BYTES = frozenset(
    ":;,.[]{}()<>+-=*&^%$#@!~`'\"|\\/?·\"：“”".encode("utf-8")
)

DOC_AVG_LEN = 7111  # hw3/config.h:60
DOC_NUM = 3213835   # hw3/config.h:61


def _concat_deque(words) -> bytes:
    out = bytearray()
    for w in words:
        if w and w[-1] in _CONCAT_SEP_BYTES:
            out += w
        else:
            out += w + b" "
    return bytes(out)


def _window_snippets(text: bytes, is_match) -> bytes:
    """Shared sliding-window pass of Linear/Prefix/Keyword Match
    (hw3/Snippets.cpp:45-119): find the first two matching words, emit up to
    two ~TERM_NUM-word passages joined with '...'."""
    snippets = bytearray()
    word = bytearray()
    find_one = find_two = False
    contain_first = True
    deque_max = TERM_NUM + 1
    dq: deque[bytes] = deque()
    for c in text:
        if c not in SEPARATOR_BYTES:
            word.append(c)
            continue
        if word and c not in SNIPPET_WS_BYTES:
            word.append(c)  # glue trailing punctuation (cpp :64-67)
        w = bytes(word)
        if len(dq) < deque_max:
            dq.append(w)
        else:
            dq.popleft()
            contain_first = False
            dq.append(w)
            if find_one and not find_two and not snippets:
                if not contain_first:
                    snippets += b"... "
                snippets += _concat_deque(dq) + b" ..."
                dq.clear()
                deque_max = TERM_NUM
            elif find_two:
                if not contain_first and not snippets:
                    snippets += b"... "
                snippets += _concat_deque(dq) + b"..."
                return bytes(snippets)
        if is_match(w):
            if not find_one:
                find_one = True
                deque_max = len(dq) + TERM_NUM
            elif not find_two:
                find_two = True
                deque_max = len(dq) + TERM_NUM
        word.clear()
    return bytes(snippets)


def linear_match(text: bytes, word_list: list[bytes]) -> bytes:
    """N1 — exact query-term hits (hw3/Snippets.cpp:45-119)."""
    ws = set(word_list)
    return _window_snippets(text, lambda w: w in ws)


def prefix_match(text: bytes, word_list: list[bytes]) -> bytes:
    """N2 — substring match: word.find(q) != npos (hw3/Snippets.cpp:15-25)."""
    return _window_snippets(text, lambda w: any(q in w for q in word_list))


def get_word_pos(text: bytes, word_list: list[bytes]) -> dict[bytes, list[int]]:
    """Byte offsets of exact term occurrences (hw3/Snippets.cpp:197-226).
    Trailing unflushed word not counted, like the doc tokenizer."""
    word_pos: dict[bytes, list[int]] = {w: [] for w in word_list}
    word = bytearray()
    for i, c in enumerate(text):
        if c not in SEPARATOR_BYTES:
            word.append(c)
        else:
            if word:
                w = bytes(word)
                if w in word_pos:
                    word_pos[w].append(i - len(w))
            word.clear()
    return word_pos


def bm25_snippet_score(
    freq: int, doc_num: int, data_len: int,
    avgdl: float = DOC_AVG_LEN, n_docs: int = DOC_NUM,
) -> float:
    """F5 — clamped BM25 with compile-time constants (hw3/Snippets.cpp:228-240)."""
    k1, b = 1.2, 0.75
    K = k1 * ((1 - b) + b * data_len / avgdl)
    ft = float(doc_num)
    score = math.log((n_docs - ft + 0.5) / (ft + 0.5)) * (k1 + 1) * freq / (K + freq)
    return score if score > 0 else 0.0


def vector_snippet_score(
    freq: int, doc_num: int, data_len: int, n_docs: int = DOC_NUM
) -> float:
    """F6 — vector-space score (hw3/Snippets.cpp:242-250)."""
    ft = float(doc_num)
    w_d_t = 1 + (math.log(freq) if freq > 0 else -math.inf)
    w_q_t = math.log(1 + n_docs / ft) if ft > 0 else math.inf
    return w_d_t * w_q_t / math.sqrt(data_len) if data_len else 0.0


def get_snippets_by_pos(text: bytes, pos: list[int]) -> bytes:
    """Extract ~MAX_SNIPPETS chars covering a position cluster
    (hw3/Snippets.cpp:270-306)."""
    endpos = pos[-1]
    if endpos - pos[0] < SNIPPETS_RANGE * 2:
        endpos = pos[0] + SNIPPETS_RANGE * 2
    while endpos < len(text) and text[endpos] not in SEPARATOR_BYTES:
        endpos += 1
    res = bytearray()
    for i in range(pos[0], min(endpos, len(text))):
        if text[i] in SNIPPET_WS_BYTES:
            if len(res) > MAX_SNIPPETS:
                break
            res += b" "
        else:
            res.append(text[i])
    if pos[0] != 0:
        res = b"..." + res
    return bytes(res)


def _cluster_and_extract(
    text: bytes, word_pos: dict[bytes, list[int]], word_score: dict[bytes, float]
) -> bytes:
    """Position-merge + top-2 cluster machinery shared by N3/N4/N6
    (hw3/Snippets.cpp:326-432).  Clusters group positions within
    SNIPPETS_RANGE; the two best-scoring clusters are emitted in ASCENDING
    score order (the C++ pops its min-heap), '...'-joined."""
    heap: list[tuple[int, bytes, int]] = []
    for term, plist in word_pos.items():
        if term in word_score and plist:
            heapq.heappush(heap, (plist[0], term, 0))
    clusters: list[tuple[float, list[int], int]] = []  # (score, pos, created)
    cur_score = 0.0
    cur_pos: list[int] = []
    created = 0
    while heap:
        val, term, idx = heapq.heappop(heap)
        if idx + 1 < len(word_pos[term]):
            heapq.heappush(heap, (word_pos[term][idx + 1], term, idx + 1))
        if not cur_pos or val - cur_pos[-1] < SNIPPETS_RANGE:
            cur_pos.append(val)
            cur_score += word_score[term]
        else:
            clusters.append((cur_score, cur_pos, created))
            created += 1
            cur_pos = [val]
            cur_score = word_score[term]
    if cur_pos:
        clusters.append((cur_score, cur_pos, created))
    # keep top CLUSTER_SIZE by (score desc, creation asc); emit score-asc
    clusters.sort(key=lambda c: (-c[0], c[2]))
    selected = clusters[:CLUSTER_SIZE]
    selected.sort(key=lambda c: (c[0], c[2]))
    snippets = bytearray()
    for score, pos, _ in selected:
        if len(snippets) > MAX_SNIPPETS:
            break
        snippets += get_snippets_by_pos(text, pos)
    if snippets:
        snippets += b"..."
    return bytes(snippets)


def score_snippets(
    text: bytes,
    word_list: list[bytes],
    word_dfs: list[int],
    kind: str = "bm25",
    avgdl: float = DOC_AVG_LEN,
    n_docs: int = DOC_NUM,
) -> bytes:
    """N3 (kind='bm25') / N4 (kind='vector') — hw3/Snippets.cpp:308-438."""
    word_pos = get_word_pos(text, word_list)
    word_score: dict[bytes, float] = {}
    for term, df in zip(word_list, word_dfs):
        freq = len(word_pos[term])
        if kind == "bm25":
            word_score[term] = bm25_snippet_score(freq, df, len(text), avgdl, n_docs)
        else:
            word_score[term] = vector_snippet_score(freq, df, len(text), n_docs)
    return _cluster_and_extract(text, word_pos, word_score)


def get_word_weight(
    word_list: list[bytes], word_pos: dict[bytes, list[int]], word_dfs: list[int]
) -> dict[bytes, float]:
    """F7 — tf * log(RESULT_NUM / df) keyword weight (hw3/Snippets.cpp:440-450)."""
    out: dict[bytes, float] = {}
    for term, df in zip(word_list, word_dfs):
        tf = len(word_pos[term])
        out[term] = tf * (math.log(RESULT_NUM / df) if df > 0 else math.inf)
    return out


def _top_keywords(word_weight: dict[bytes, float]) -> list[bytes]:
    """ceil(25%)>=2 highest-weight terms (hw3/Snippets.cpp:623-662);
    weight ties broken by term bytes ascending."""
    n = max(int(math.ceil(len(word_weight) * KEYWORD_PERCENT)), MIN_KEYWORD)
    ranked = sorted(word_weight.items(), key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in ranked[:n]]


def keyword_match(text: bytes, word_list: list[bytes], word_dfs: list[int]) -> bytes:
    """N5 — Linear Match restricted to the top-weight keywords
    (hw3/Snippets.cpp:664-746)."""
    word_pos = get_word_pos(text, word_list)
    weights = get_word_weight(word_list, word_pos, word_dfs)
    kws = set(_top_keywords(weights))
    return _window_snippets(text, lambda w: w in kws)


def weight_snippets(text: bytes, word_list: list[bytes], word_dfs: list[int]) -> bytes:
    """N6 — cluster selection driven by keyword weights
    (hw3/Snippets.cpp:497-621)."""
    word_pos = get_word_pos(text, word_list)
    weights = get_word_weight(word_list, word_pos, word_dfs)
    kw = {t: w for t, w in weights.items() if t in set(_top_keywords(weights))}
    return _cluster_and_extract(text, word_pos, kw)


def calc_word_percent(snippet: bytes, word_list: list[bytes]) -> float:
    """Fraction of snippet bytes covered by query/keyword terms — the
    snippet-quality metric (hw3/Snippets.cpp:749-772).

    The C++ divides two size_t's (integer division, nearly always 0); we
    return the obviously-intended float ratio and note the deviation.
    """
    if not snippet:
        return 0.0
    ws = set(word_list)
    covered = 0
    word = bytearray()
    for c in snippet:
        if c not in SEPARATOR_BYTES:
            word.append(c)
        else:
            if word and bytes(word) in ws:
                covered += len(word)
            word.clear()
    # unlike the scanner quirks, the metric's final word IS counted in the
    # reference only if followed by a separator — keep that behavior
    return covered / len(snippet)


def eval_snippet_quality(
    snippets: list[bytes], word_lists: list[list[bytes]]
) -> dict[str, float]:
    """Mean coverage across snippets (the genExpResult.py averaging,
    hw3/metrix/genExpResult.py:1-38, as a library/test utility)."""
    vals = [calc_word_percent(s, w) for s, w in zip(snippets, word_lists)]
    return {
        "mean_word_percent": sum(vals) / len(vals) if vals else 0.0,
        "n": float(len(vals)),
    }


ALGORITHMS = ("linear", "prefix", "bm25", "vector", "keyword", "weight")


def generate_snippet(
    text: bytes,
    word_list: list[bytes],
    word_dfs: list[int],
    algo: str = "bm25",
    avgdl: float = DOC_AVG_LEN,
    n_docs: int = DOC_NUM,
) -> bytes:
    """Dispatch like Result::extractSnippets (hw3/Result.cpp:43-83)."""
    if algo == "linear":
        return linear_match(text, word_list)
    if algo == "prefix":
        return prefix_match(text, word_list)
    if algo in ("bm25", "vector"):
        return score_snippets(text, word_list, word_dfs, algo, avgdl, n_docs)
    if algo == "keyword":
        return keyword_match(text, word_list, word_dfs)
    if algo == "weight":
        return weight_snippets(text, word_list, word_dfs)
    raise ValueError(f"unknown snippet algorithm {algo!r}")
