"""Property test: engine == oracle on RANDOM corpora and queries.

The fixture corpus pins known quirks; this test hunts unknown ones by
generating adversarial random corpora (separator-heavy text, empty docs,
duplicate docs, unicode fragments) and random queries, then requiring
rank-identical results in every mode.
"""
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from wse_ray.config import BuildConfig
from wse_ray.index.build import build_index
from wse_ray.oracle import OracleIndex
from wse_ray.query.scorer import SearchEngine

VOCAB = ["a", "bb", "ccc", "the", "zz9", "x·y", "“q”", "w\\v", "é", "LONG" * 8]
SEPS = [" ", ",", ";", "\n", "·", "：", ".", "\t"]


def _random_corpus(rng: random.Random, n_docs: int) -> list[str]:
    texts = []
    for i in range(n_docs):
        url = f"https://r{rng.randrange(5)}.example/{i}"
        ntok = rng.randrange(0, 30)
        parts = []
        for _ in range(ntok):
            parts.append(rng.choice(VOCAB))
            parts.append(rng.choice(SEPS) * rng.randrange(1, 3))
        body = "".join(parts)
        if rng.random() < 0.15:
            body = ""  # empty body
        if rng.random() < 0.2 and texts:
            texts.append(texts[-1])  # exact duplicate doc
            continue
        texts.append(url + "\n" + body)
    return texts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_corpus_rank_identity(ray_session, tmp_path, seed):
    rng = random.Random(1000 + seed)
    texts = _random_corpus(rng, 30)
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    t = pa.table(
        {
            "url": pa.array([x.split("\n", 1)[0] for x in texts]),
            "warc_ts": pa.array([0] * len(texts), pa.timestamp("us")),
            "html": pa.array([None] * len(texts), pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    pq.write_table(t.slice(0, 17), str(corpus_dir / "a.parquet"))
    pq.write_table(t.slice(17), str(corpus_dir / "b.parquet"))

    out = tmp_path / "idx"
    build_index(
        str(corpus_dir), str(out),
        BuildConfig(num_partitions=3, heavy_df_threshold=5, heavy_subparts=2),
    )
    engine = SearchEngine(str(out))
    oracle = OracleIndex.build(texts)

    assert engine.N == oracle.N and engine.avgdl == oracle.avgdl
    for term, plist in oracle.postings.items():
        d, tf, _ = engine.postings(term)
        np.testing.assert_array_equal(d, [p[0] for p in plist], err_msg=repr(term))
        np.testing.assert_array_equal(tf, [p[1] for p in plist], err_msg=repr(term))

    queries = [
        " ".join(rng.choice(VOCAB + ["missing"]) for _ in range(rng.randrange(1, 4)))
        for _ in range(12)
    ]
    for q in queries:
        for mode in ("disjunctive", "conjunctive"):
            want = oracle.search(q, mode, 7)
            got = engine.search(q, mode, 7)
            assert [g[0] for g in got] == [w[0] for w in want], (q, mode)
            np.testing.assert_allclose(
                [g[1] for g in got], [w[1] for w in want], rtol=0, atol=1e-12
            )
        assert engine.search(q, "disjunctive_pruned", 7) == engine.search(
            q, "disjunctive", 7
        ), q
