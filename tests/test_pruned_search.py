"""MaxScore pruned disjunctive must be rank- and score-identical to TAAT."""
import pytest

from wse_ray.config import BuildConfig
from wse_ray.fixtures import make_queries
from wse_ray.index.build import build_index
from wse_ray.query.scorer import SearchEngine


@pytest.fixture(scope="module")
def engine(ray_session, tiny_corpus_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_pruned"))
    build_index(tiny_corpus_dir, out, BuildConfig(num_partitions=4, heavy_df_threshold=50))
    return SearchEngine(out)


def test_pruned_equals_taat_on_query_set(engine):
    for q in make_queries():
        if q["mode"] != "disjunctive":
            continue
        exact = engine.search(q["query"], "disjunctive", q["k"])
        pruned = engine.search(q["query"], "disjunctive_pruned", q["k"])
        assert pruned == exact, q


@pytest.mark.parametrize(
    "query",
    [
        "the0",                 # heavy negative-idf term only
        "the0 w1500",           # heavy + rare
        "w1500",                # rare only
        "zzz_absent",           # no match -> pure zero padding
        "the0 the0 w3",         # duplicates
        "w0 w1 w2 w3 w4",       # many common terms
    ],
)
def test_pruned_equals_taat_adhoc(engine, query):
    for k in (5, 10, 20):
        assert engine.search(query, "disjunctive_pruned", k) == engine.search(
            query, "disjunctive", k
        ), (query, k)


def test_term_upper_bound_is_true_bound(engine):
    import numpy as np

    for term in [b"the0", b"w0", b"w3"]:
        d, t, l = engine.postings(term)
        if len(d) == 0:
            continue
        scores = engine.bm25_vec(engine.df(term), t, l)
        assert engine.term_upper_bound(term) >= float(np.max(scores)) - 1e-12
