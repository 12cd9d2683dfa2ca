"""Integration: search -> snippet stage over the tiny corpus."""
import pandas as pd
import pytest

from wse_ray.config import BuildConfig
from wse_ray.fixtures import HEAVY_TERM
from wse_ray.index.build import build_index
from wse_ray.query.scorer import SearchEngine
from wse_ray.query.snippets_stage import attach_snippets
from wse_ray.sources.corpus import read_corpus


@pytest.fixture(scope="module")
def env(ray_session, tiny_corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_snip"))
    build_index(tiny_corpus_dir, out, BuildConfig(num_partitions=4))
    return SearchEngine(out), tiny_corpus_dir


def test_attach_snippets(env):
    engine, corpus_dir = env
    q = f"{HEAVY_TERM} w3"
    res = engine.search_batch(
        [{"query_id": 0, "query": q, "mode": "disjunctive", "k": 5}]
    )
    res["query"] = q
    corpus = read_corpus(corpus_dir, columns=["text"])
    out = attach_snippets(res, engine, corpus, algo="linear")
    assert "snippet" in out.columns
    assert len(out) == 5
    # at least one matched doc should yield a non-empty passage
    assert any(s for s in out["snippet"])


def test_attach_snippets_empty_results(env):
    engine, corpus_dir = env
    corpus = read_corpus(corpus_dir, columns=["text"])
    empty = pd.DataFrame(columns=["query_id", "query", "docID", "score"])
    out = attach_snippets(empty, engine, corpus)
    assert list(out.columns)[-1] == "snippet" and len(out) == 0
