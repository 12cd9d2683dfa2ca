"""Extra integration coverage: html-path build parity, actor-pool batch
queries, snippet quality metric."""
import numpy as np
import pandas as pd
import pytest

from wse_ray.config import BuildConfig
from wse_ray.fixtures import make_queries
from wse_ray.index.build import build_index
from wse_ray.query.scorer import QueryScorer, SearchEngine


def test_build_from_html_identical(ray_session, tiny_corpus_dir, tmp_path_factory):
    """from_html=True re-extracts text from the html column; the resulting
    index must answer queries identically (BASELINE.json byte-identity)."""
    out_a = str(tmp_path_factory.mktemp("idx_text"))
    out_b = str(tmp_path_factory.mktemp("idx_html"))
    cfg = BuildConfig(num_partitions=4)
    build_index(tiny_corpus_dir, out_a, cfg)
    build_index(tiny_corpus_dir, out_b, cfg, from_html=True)
    ea, eb = SearchEngine(out_a), SearchEngine(out_b)
    assert ea.N == eb.N and ea.avgdl == eb.avgdl
    assert ea.vocab() == eb.vocab()
    for q in make_queries()[:10]:
        assert ea.search(q["query"], q["mode"], q["k"]) == eb.search(
            q["query"], q["mode"], q["k"]
        )


def test_actor_pool_batch_queries(ray_session, tiny_corpus_dir, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("idx_pool"))
    build_index(tiny_corpus_dir, out, BuildConfig(num_partitions=4))
    qs = pd.DataFrame(make_queries()[:8])
    res = (
        ray.data.from_pandas(qs)
        .map_batches(
            QueryScorer,
            fn_constructor_args=(out,),
            concurrency=2,
            batch_format="pandas",
            batch_size=4,
        )
        .to_pandas()
    )
    # actor-pool results == driver-side engine results
    eng = SearchEngine(out)
    want = eng.search_batch(qs.to_dict("records"))
    got = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_snippet_quality_metric():
    from wse_ray.query.snippets import calc_word_percent, eval_snippet_quality

    assert calc_word_percent(b"cat dog bird ", [b"cat", b"dog"]) == 6 / 13
    assert calc_word_percent(b"", [b"x"]) == 0.0
    out = eval_snippet_quality(
        [b"cat x ", b"dog dog "], [[b"cat"], [b"dog"]]
    )
    assert out["n"] == 2 and 0 < out["mean_word_percent"] <= 1
