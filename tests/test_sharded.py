"""Doc-partitioned layout + sharded scatter-gather serving must reproduce
the single-node, term-partitioned engine exactly."""
import pytest

from wse_ray.config import BuildConfig
from wse_ray.fixtures import make_queries
from wse_ray.index.build import build_index
from wse_ray.query.scorer import SearchEngine


@pytest.fixture(scope="module")
def both_indexes(ray_session, tiny_corpus_dir, tmp_path_factory):
    term_idx = str(tmp_path_factory.mktemp("idx_term"))
    doc_idx = str(tmp_path_factory.mktemp("idx_doc"))
    build_index(tiny_corpus_dir, term_idx, BuildConfig(num_partitions=4, heavy_df_threshold=50))
    build_index(
        tiny_corpus_dir, doc_idx,
        BuildConfig(num_partitions=4, partition_by="doc"),
    )
    return term_idx, doc_idx


def test_doc_layout_single_engine_identical(both_indexes):
    # the same loader reads both layouts; results must match exactly
    term_e = SearchEngine(both_indexes[0])
    doc_e = SearchEngine(both_indexes[1])
    assert term_e.N == doc_e.N
    for q in make_queries():
        assert doc_e.search(q["query"], q["mode"], q["k"]) == term_e.search(
            q["query"], q["mode"], q["k"]
        ), q


def test_sharded_scatter_gather_identical(both_indexes):
    from wse_ray.query.sharded import ShardedSearchEngine

    term_e = SearchEngine(both_indexes[0])
    sharded = ShardedSearchEngine(both_indexes[1])
    assert len(sharded.shards) == 4
    for q in make_queries():
        got = sharded.search(q["query"], q["mode"], q["k"])
        want = term_e.search(q["query"], q["mode"], q["k"])
        assert got == want, q


def test_sharded_rejects_term_layout(both_indexes):
    from wse_ray.query.sharded import ShardedSearchEngine

    with pytest.raises(ValueError):
        ShardedSearchEngine(both_indexes[0])
