"""Text-analysis operators for large-scale training-data pipelines.

All are stateless vectorized ``map_batches`` stages over a text column:
token counting, quality scoring, language ID (n-gram/stopword heuristic),
and document fingerprinting.  Each has a ``queries()`` entry over the
``documents`` table; the SQL-expressible ones carry DuckDB oracles.
"""
from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tokenizer import tokenize_simple

# small built-in stopword list (engine + SQL oracle share it verbatim)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# tiny deterministic language marker profiles (word -> lang evidence);
# real systems use char n-gram models — this is the same plumbing with a
# transparent, dependency-free scorer.
LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is on for with this that".split()),
    "es": frozenset("el la de que y en un los del se por".split()),
    "de": frozenset("der die und das ist von mit den nicht ein".split()),
    "fr": frozenset("le la les de et un une que pour dans".split()),
    "zh": frozenset("de shi le zai you wo ta men zhe na".split()),
}
_LANG_ORDER = tuple(sorted(LANG_MARKERS))


def token_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_distinct) per document."""
    texts = batch["text"].to_pylist()
    n_tok = np.empty(len(texts), np.int64)
    n_dis = np.empty(len(texts), np.int64)
    for i, t in enumerate(texts):
        toks = tokenize_simple(t.encode("utf-8"))
        n_tok[i] = len(toks)
        n_dis[i] = len(set(toks))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_dis),
        }
    )


def quality_score(batch: pa.Table) -> pa.Table:
    """Heuristic quality features: length, distinct ratio, stopword ratio,
    mean token length — the usual web-corpus filtering signals."""
    texts = batch["text"].to_pylist()
    n = len(texts)
    cols = {k: np.zeros(n) for k in ("n_chars", "n_tokens", "distinct_ratio", "stopword_ratio", "mean_token_len")}
    stop = set(s.encode() for s in STOPWORDS)
    for i, t in enumerate(texts):
        data = t.encode("utf-8")
        toks = tokenize_simple(data)
        nt = len(toks)
        cols["n_chars"][i] = len(data)
        cols["n_tokens"][i] = nt
        cols["distinct_ratio"][i] = (len(set(toks)) / nt) if nt else 0.0
        cols["stopword_ratio"][i] = (sum(1 for w in toks if w in stop) / nt) if nt else 0.0
        cols["mean_token_len"][i] = (sum(len(w) for w in toks) / nt) if nt else 0.0
    out = {"doc_id": batch["doc_id"]}
    out.update({k: pa.array(v) for k, v in cols.items()})
    return pa.table(out)


def lang_id(batch: pa.Table) -> pa.Table:
    """Deterministic language-ID heuristic: marker-word hit ratio per
    language, argmax with fixed alphabetical tie order."""
    texts = batch["text"].to_pylist()
    preds, confs = [], []
    for t in texts:
        toks = [w.decode("utf-8", "replace") for w in tokenize_simple(t.encode())]
        nt = max(1, len(toks))
        best_lang, best = "und", 0.0
        for lang in _LANG_ORDER:
            score = sum(1 for w in toks if w in LANG_MARKERS[lang]) / nt
            if score > best:
                best_lang, best = lang, score
        preds.append(best_lang)
        confs.append(round(best, 6))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "pred_lang": pa.array(preds, pa.string()),
            "confidence": pa.array(confs, pa.float64()),
        }
    )


def _rolling_hash64(data: bytes, base: int = 1000003, mod: int = (1 << 61) - 1) -> int:
    h = 0
    for b in data:
        h = (h * base + b) % mod
    return h


def fingerprints(batch: pa.Table) -> pa.Table:
    """(doc_id, md5, rolling64, simhash64) content fingerprints.

    md5 is the exact-dedup key (SQL-parity via DuckDB md5()); rolling64 is a
    polynomial rolling hash; simhash64 is a 64-bit token-frequency simhash
    used by near-dup detection.
    """
    texts = batch["text"].to_pylist()
    md5s, rolls, sims = [], [], []
    for t in texts:
        data = t.encode("utf-8")
        md5s.append(hashlib.md5(data).hexdigest())
        rolls.append(_rolling_hash64(data))
        sims.append(simhash64(data))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5": pa.array(md5s, pa.string()),
            "rolling64": pa.array(np.array(rolls, dtype=np.uint64)),
            "simhash64": pa.array(np.array(sims, dtype=np.uint64)),
        }
    )


def simhash64(data: bytes) -> int:
    """64-bit simhash over tokens (weight = tf), deterministic hashing."""
    toks = tokenize_simple(data)
    if not toks:
        return 0
    s = pd.Series(toks, dtype=object).value_counts()
    hashes = pd.util.hash_array(np.asarray(s.index, dtype=object), categorize=False)
    weights = s.to_numpy(np.int64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * weights[:, None]).sum(axis=0)
    return int(np.packbits((acc > 0)[::-1], bitorder="little").view(np.uint64)[0])
