"""Deterministic synthetic fixtures (FIXTURES.md).

Generates the Common-Crawl-style ``corpus`` table with EXACTLY the
`BASELINE.json` input_hint shape — (url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string) — plus the fixed ``queries`` set.
Seed 1337, pure ``random.Random`` so bytes are stable across machines.

``text`` is built first (first line = url, then body — reference semantics,
hw2/DataLoader.cpp:94-97) and wrapped reversibly into ``html`` so the
html→text extraction invariant ("byte-identical text per url") is testable.
"""
from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1337
HEAVY_TERM = "the0"  # present in every doc -> df == N (skew exercise)
_VOCAB_SIZE = 2000

# a few tokens containing unicode/punctuation bytes from the separator set,
# to pin the byte-level tokenizer (they split into sub-tokens)
_TRICKY = ["data·base", "c++", "née：name", "“quoted”", "x|y", "a\\b"]

_LANGS = ["es", "zh", "pl"]


def _vocab() -> list[str]:
    return [f"w{i}" for i in range(_VOCAB_SIZE)]


def _zipf_sampler(rng: random.Random, n: int, a: float = 1.3):
    # cumulative Zipf weights, sampled by bisection
    import bisect

    weights = [1.0 / (k ** a) for k in range(1, n + 1)]
    cum = []
    s = 0.0
    for w in weights:
        s += w
        cum.append(s)
    total = cum[-1]

    def sample() -> int:
        return bisect.bisect_left(cum, rng.random() * total)

    return sample


def make_corpus(n_docs: int, seed: int = SEED) -> pa.Table:
    rng = random.Random(seed)
    vocab = _vocab()
    zipf = _zipf_sampler(rng, _VOCAB_SIZE)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    base_ts = 1704067200_000000  # 2024-01-01T00:00:00Z in us
    for i in range(n_docs):
        s = rng.randrange(100)
        url = f"https://site{s}.example/p/{i}"
        # doc length log-normal in [50, 5000] tokens (FIXTURES.md §F1);
        # mean ~250 tokens ≈ 1.6 kB of text per doc
        ntok = min(5000, max(50, int(rng.lognormvariate(5.0, 1.0))))
        toks = [HEAVY_TERM]
        for _ in range(ntok):
            if rng.random() < 0.05:
                toks.append(rng.choice(_TRICKY))
            else:
                toks.append(vocab[zipf()])
        # a few separator-flavored joins; body ends WITHOUT newline sometimes
        # to exercise the trailing-token-drop quirk
        body = " ".join(toks)
        if rng.random() < 0.3:
            body += "\n"
        # edge docs
        if i == 1:
            body = ""  # empty body
        elif i == 2:
            body = ",,;;..  "  # separators only
        text = url + "\n" + body
        html = (
            f"<html><head><title>T{i}</title></head><body>".encode()
            + text.encode("utf-8")
            + b"</body></html>"
        )
        urls.append(url)
        tss.append(base_ts + i * 1_000_000)
        htmls.append(html)
        texts.append(text)
        langs.append("en" if rng.random() < 0.9 else _LANGS[i % 3])

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def make_queries(seed: int = SEED) -> list[dict]:
    """Fixed query set: 40 queries, both modes, incl. heavy/absent/unicode/dup
    terms and k in {10, 20} (FIXTURES.md §F2)."""
    rng = random.Random(seed + 1)
    vocab = _vocab()
    specials = [
        HEAVY_TERM,
        "zzz_absent_term",
        "data·base",
        f"{HEAVY_TERM} {HEAVY_TERM}",  # duplicate-term query
    ]
    queries = []
    qid = 0
    for mode in ("disjunctive", "conjunctive"):
        for j in range(20):
            if j < len(specials):
                q = specials[j] if j != 3 else specials[3]
                if j == 0:
                    q = f"{HEAVY_TERM} {vocab[3]}"
                elif j == 1:
                    q = f"zzz_absent_term {vocab[5]}"
            else:
                nterms = rng.randint(1, 5)
                q = " ".join(vocab[rng.randrange(200)] for _ in range(nterms))
            queries.append(
                {
                    "query_id": qid,
                    "query": q,
                    "mode": mode,
                    "k": 10 if j % 2 == 0 else 20,
                }
            )
            qid += 1
    return queries


def write_corpus_parquet(path: str, n_docs: int, n_files: int = 4, seed: int = SEED) -> list[str]:
    """Write the corpus as ``n_files`` parquet files (fixed lexicographic
    naming => deterministic docID enumeration; SURVEY.md §4.2.3)."""
    os.makedirs(path, exist_ok=True)
    t = make_corpus(n_docs, seed)
    per = (n_docs + n_files - 1) // n_files
    paths = []
    for f in range(n_files):
        lo = f * per
        hi = min(lo + per, n_docs)
        if lo >= hi:
            break
        p = os.path.join(path, f"corpus-{f:05d}.parquet")
        pq.write_table(t.slice(lo, hi - lo), p)
        paths.append(p)
    return paths
