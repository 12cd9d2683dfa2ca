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


def test_sharded_uneven_partition_identical(both_indexes, tiny_corpus_dir, tmp_path_factory):
    """N % P != 0 regression: with N=100, P=3 the boundary docs (34, 67) must
    belong to exactly one shard.  A floor-based doc range (p*N//P) makes shard
    p claim shard p-1's boundary doc as zero-padding, emitting spurious
    zero-score hits that displace real results."""
    from wse_ray.query.sharded import ShardedSearchEngine

    doc_idx = str(tmp_path_factory.mktemp("idx_doc_p3"))
    build_index(
        tiny_corpus_dir, doc_idx,
        BuildConfig(num_partitions=3, partition_by="doc"),
    )
    term_e = SearchEngine(both_indexes[0])
    sharded = ShardedSearchEngine(doc_idx)
    assert len(sharded.shards) == 3
    # ranges must tile [0, N) exactly, matching AssignPartByDoc
    assert sharded.doc_ranges[0][0] == 0 and sharded.doc_ranges[-1][1] == 100
    for (_, hi), (lo, _) in zip(sharded.doc_ranges, sharded.doc_ranges[1:]):
        assert hi == lo
    for q in make_queries():
        got = sharded.search(q["query"], q["mode"], q["k"])
        want = term_e.search(q["query"], q["mode"], q["k"])
        assert got == want, q


def test_sharded_pruned_identical(both_indexes):
    """disjunctive_pruned through the sharded scatter-gather (per-query AND
    batched) must be bit-identical to single-node exhaustive disjunctive:
    per-shard MaxScore pruning is an exact top-k optimization and global
    dfs are installed before any scoring."""
    from wse_ray.query.sharded import ShardedSearchEngine

    term_e = SearchEngine(both_indexes[0])
    sharded = ShardedSearchEngine(both_indexes[1])
    dis = [q for q in make_queries() if q["mode"] == "disjunctive"]
    for q in dis:
        got = sharded.search(q["query"], "disjunctive_pruned", q["k"])
        want = term_e.search(q["query"], "disjunctive", q["k"])
        assert got == want, q
    batch = sharded.search_batch([dict(q, mode="disjunctive_pruned") for q in dis])
    for q, got in zip(dis, batch):
        assert got == term_e.search(q["query"], "disjunctive", q["k"]), q


def test_sharded_rejects_term_layout(both_indexes):
    from wse_ray.query.sharded import ShardedSearchEngine

    with pytest.raises(ValueError):
        ShardedSearchEngine(both_indexes[0])


def test_sharded_batch_search_identical(both_indexes):
    """search_batch (one round trip per stage for the whole batch) must
    return exactly what per-query search returns."""
    from wse_ray.query.sharded import ShardedSearchEngine

    sharded = ShardedSearchEngine(both_indexes[1])
    qs = make_queries()[:12] + [{"query": "", "mode": "disjunctive", "k": 5}]
    batched = sharded.search_batch(
        [{"query": q.get("query", ""), "mode": q.get("mode", "disjunctive"), "k": q.get("k", 10)} for q in qs]
    )
    for q, got in zip(qs, batched):
        want = sharded.search(q.get("query", ""), q.get("mode", "disjunctive"), q.get("k", 10))
        assert got == want, q
