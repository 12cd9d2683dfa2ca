"""Driver-style gate: run every queries() entry vs its DuckDB oracle at
sf0.01 — row count, column names/dtypes, and order-insensitive values."""
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ql(ray_session):
    import __ray_entry__ as entrymod

    return entrymod.queries(), entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64).round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


SQL_CHECKED = [
    "postings",
    "doctable",
    "corpus_stats",
    "term_df",
    "top_bigrams",
    "doc_keywords",
    "lexicon_stats",
    "bm25_disjunctive",
    "bm25_conjunctive",
    "bm25_sharded",
    "bm25_trec",
    "token_counts",
    "bpe_token_count",
    "doc_quality",
    "fingerprint_md5",
    "dedup_exact",
    "dedup_normalized",
    "decontam",
    "bm25_extend",
    "bm25_deleted",
    "bm25_jsonl",
    "repetition_stats",
    "pii_scrub",
    "lm_score",
    "sample_docs",
    "sample_weighted",
    "knn_graph",
    "semantic_clusters",
    "rebalance_sources",
    "pack_windows",
    "training_shuffle",
    "curate_corpus",
    "docs_per_source_cap",
    "dedup_minhash",
    "dedup_ngram",
    "dedup_survivors",
    "dedup_best_survivor",
    "lang_id",
    "multimodal_meta",
    "dedup_embedding",
    "embedding_centroid",
    "ann_topk",
    "pricing_summary",
    "revenue_by_nation",
    "join_priority_revenue",
    "events_asof_purchase",
    "events_sliding_window",
    "click_error_pairs",
    "session_assignments",
    "price_quantiles",
    "funnel",
    "events_window",
    "top_users",
    "sessionize",
    "distinct_users_daily",
    "customers_without_orders",
    # pinned-golden oracles (goldens.py): valid at sf0.01 only
    "search_snippets",
    "dedup_simhash",
    "ann_ivf",
    "ann_lsh",
    "decontam_bloom",
    "kmeans_embed",
    "hll_users_daily",
    "crawl_frontier",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(ql, con, name):
    queries, oracles = ql
    got = _canon(pd.DataFrame(queries[name](SF_DIR)))
    want = _canon(con.sql(oracles[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0, rtol=0)


# gates that are DECLARED rows-only: iterative/stateful pipelines whose
# semantics SQL cannot recompute (the driver records the weaker rows-only
# check for these; pytest pins their behavior instead)
ROWS_ONLY: set[str] = set()  # r4: crawl_frontier gained a pinned-golden oracle


def test_every_query_has_an_oracle(ql):
    queries, oracles = ql
    assert set(queries) - ROWS_ONLY == set(oracles)
    assert ROWS_ONLY.isdisjoint(oracles)
    assert ROWS_ONLY <= set(queries)


def test_crawl_frontier_deterministic(ql):
    """The rows-only gate still needs a determinism pin: two runs must be
    row-identical (the driver hashes whatever it gets)."""
    queries, _ = ql
    a = queries["crawl_frontier"](SF_DIR)
    b = queries["crawl_frontier"](SF_DIR)
    pd.testing.assert_frame_equal(a, b)


def test_entry_smoke(ray_session):
    import __ray_entry__ as entrymod

    out = pd.DataFrame(entrymod.entry())
    assert len(out) > 0
    assert set(out.columns) == {"query_id", "rank", "doc_id", "score"}
