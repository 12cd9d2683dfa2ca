"""Pure-python oracle: slow, obviously-correct reference semantics.

Independent of the Ray engine (no numpy vectorization, no codec) — mirrors
the C++ reference step by step so end-to-end tests can compare rank-identical
top-k and exact scores (SURVEY.md §5.2.3):

* tokenizer: hw2/DataLoader.cpp:27-57 (byte-level, trailing token dropped)
* BM25: hw3/DataLoader.cpp:302-314 (k1=1.2 b=0.75, |d| = char length,
  avgdl truncated to uint32 on load — hw3/DocTable.h:27, DocTable.cpp:57-65;
  NO clamp: scores can be negative)
* TAAT disjunctive: hw3/DataLoader.cpp:376-392 — dense score array over ALL
  N docs; top-k therefore pads with zero-score docs and ranks negative-score
  matches BELOW non-matches
* TAAT conjunctive: hw3/DataLoader.cpp:393-428 — SOFT conjunction: the
  candidate set is the min-df term's posting list; other terms add score when
  present but absent terms do NOT remove candidates.  The first query term
  achieving the minimal df is the seed (strict '<' scan); every query word
  equal to the seed term is skipped once seeding happened; duplicate non-seed
  terms are scored twice.  A term missing from the lexicon has df 0 (std::map
  operator[] default) and therefore becomes the seed -> empty result.
* top-k tie-break: the reference heap's tie order is unspecified
  (hw3/DataLoader.cpp:644-648); we DEFINE (score desc, docID asc) and use the
  same rule in the engine (SURVEY.md §7.4.3).
"""
from __future__ import annotations

import math
from collections import Counter

from .tokenizer import tokenize_document, tokenize_query
from .config import BM25_K1, BM25_B


class OracleIndex:
    def __init__(self):
        self.postings: dict[bytes, list[tuple[int, int]]] = {}  # term -> [(docID, tf)]
        self.doctable: list[dict] = []  # docID -> {url, dataLen, wordnums}
        self.N = 0
        self.avgdl = 0  # uint32-truncated

    @classmethod
    def build(cls, texts: list[str], urls: list[str] | None = None) -> "OracleIndex":
        """texts[i] = full <TEXT> body of doc i (first line = url)."""
        idx = cls()
        for doc_id, text in enumerate(texts):
            data = text.encode("utf-8")
            tf = Counter(tokenize_document(data))
            url = data.split(b"\n", 1)[0].decode("utf-8", "replace")
            idx.doctable.append(
                {"url": url, "dataLen": len(data), "wordnums": len(tf)}
            )
            for term in sorted(tf):  # std::map order = bytewise
                idx.postings.setdefault(term, []).append((doc_id, tf[term]))
        idx.N = len(texts)
        total = sum(d["dataLen"] for d in idx.doctable)
        idx.avgdl = int(total / idx.N) if idx.N else 0  # double -> uint32 trunc
        return idx

    def df(self, term: bytes) -> int:
        return len(self.postings.get(term, []))

    def bm25(self, term: bytes, doc_id: int, tf: int) -> float:
        # hw3/DataLoader.cpp:302-314, float64 op order preserved
        k1, b = BM25_K1, BM25_B
        dl = self.doctable[doc_id]["dataLen"]
        K = k1 * ((1 - b) + b * dl / self.avgdl)
        ft = float(self.df(term))
        return math.log((self.N - ft + 0.5) / (ft + 0.5)) * (k1 + 1) * tf / (K + tf)

    # --- query ---------------------------------------------------------------

    def search(self, query: str, mode: str, k: int) -> list[tuple[int, float]]:
        words = tokenize_query(query)
        if not words:
            return []
        if mode == "disjunctive":
            scores = [0.0] * self.N  # dense over ALL docs (cpp :378)
            for term in words:  # duplicates double-count, like the reference
                for doc_id, tf in self.postings.get(term, []):
                    scores[doc_id] += self.bm25(term, doc_id, tf)
            ranked = sorted(range(self.N), key=lambda d: (-scores[d], d))
            return [(d, scores[d]) for d in ranked[:k]]
        # conjunctive (soft)
        minterm = words[0]
        mindf = self.df(minterm)
        for term in words[1:]:
            if self.df(term) < mindf:
                minterm, mindf = term, self.df(term)
        score_hash: dict[int, float] = {}
        for doc_id, tf in self.postings.get(minterm, []):
            score_hash[doc_id] = self.bm25(minterm, doc_id, tf)
        for term in words:
            if term == minterm:
                continue  # skips ALL copies of the seed term (cpp :413)
            plist = dict(self.postings.get(term, []))
            for doc_id in score_hash:
                if doc_id in plist:
                    score_hash[doc_id] += self.bm25(term, doc_id, plist[doc_id])
        ranked = sorted(score_hash, key=lambda d: (-score_hash[d], d))
        return [(d, score_hash[d]) for d in ranked[:k]]
