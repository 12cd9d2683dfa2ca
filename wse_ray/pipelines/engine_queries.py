"""Driver-facing pipelines over the testdata tables (the correctness gate).

Every function takes ``sf_dir`` and returns a pandas DataFrame whose column
NAMES AND TYPES match the DuckDB oracle SQL in ``oracle_sql_map()`` exactly
(the driver hashes values after sorting columns by name — int64/float64/str
only, floats rounded to 6 dp on BOTH sides before ranking/output).

The search-engine entries run the REAL pipeline: they build (and cache,
resumably) a partitioned index under /tmp/wse_ray_cache/<sf>, then query it.
``tokenizer_mode="simple"`` keeps the oracle SQL exactly expressible
(documents.text is body-only: no url first line, no trailing-drop quirk —
the TREC quirks are pinned against the python oracle in pytest instead).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import BuildConfig, scratch_base
from ..index.build import build_index
from ..query.scorer import SearchEngine
from ..sources.corpus import corpus_from_documents_table
from ..stages.tokenize_stage import TokenizeDocs, explode_postings

# ---------------------------------------------------------------------------
# fixed query sets over the documents table ('dup' is the only rare term;
# most terms have df > N/2 and therefore NEGATIVE idf — faithful reference
# behavior, exercised on purpose)
# ---------------------------------------------------------------------------

DISJ_QUERIES = [
    (0, "dup"),
    (1, "join hash"),
    (2, "the dup"),
    (3, "zzz_absent"),
    (4, "sort merge join"),
    (5, "window scan"),
]
CONJ_QUERIES = [
    (0, "dup join"),
    (1, "sort merge"),
    (2, "zzz_absent join"),
    (3, "the dup scan"),
]
TOP_K = 10

_ENGINE_CACHE: dict[str, SearchEngine] = {}


def _index_dir(sf_dir: str) -> str:
    return os.path.join("/tmp/wse_ray_cache", sf_dir.strip("/").replace("/", "_"))


CURRENT_FORMAT_VERSION = 2  # keep in sync with index/build.py manifest


def get_engine(sf_dir: str) -> SearchEngine:
    if sf_dir not in _ENGINE_CACHE:
        import json
        import shutil

        out = _index_dir(sf_dir)
        # a cached index built by an older code version must not be reused
        manifest_path = os.path.join(out, "manifest.json")
        if os.path.exists(manifest_path):
            try:
                with open(manifest_path) as f:
                    ver = json.load(f).get("format_version")
            except (OSError, ValueError):
                ver = None
            if ver != CURRENT_FORMAT_VERSION:
                shutil.rmtree(out, ignore_errors=True)
        elif os.path.exists(out):  # partial/crashed build from another run
            shutil.rmtree(out, ignore_errors=True)
        build_index(
            lambda: corpus_from_documents_table(sf_dir),
            out,
            BuildConfig(num_partitions=8, tokenizer_mode="simple"),
        )
        _ENGINE_CACHE[sf_dir] = SearchEngine(out)
    return _ENGINE_CACHE[sf_dir]


def _tokenized_runs(sf_dir: str):
    """Tokenized documents Dataset (reuses the cached index's runs files)."""
    import ray.data

    get_engine(sf_dir)  # ensure built
    return ray.data.read_parquet(os.path.join(_index_dir(sf_dir), "runs"))


# ---------------------------------------------------------------------------
# search-engine operator pipelines
# ---------------------------------------------------------------------------


def q_postings(sf_dir: str) -> pd.DataFrame:
    """Exploded posting rows (G1/A1: per-(doc,term) tf)."""
    ds = _tokenized_runs(sf_dir).map_batches(explode_postings, batch_format="pyarrow")
    pdf = ds.select_columns(["term", "docID", "tf"]).to_pandas()
    return pd.DataFrame(
        {
            "term": [t.decode("utf-8") for t in pdf["term"]],
            "doc_id": pdf["docID"].astype(np.int64),
            "tf": pdf["tf"].astype(np.int64),
        }
    ).sort_values(["term", "doc_id"]).reset_index(drop=True)


def q_doctable(sf_dir: str) -> pd.DataFrame:
    """DocTable projection (S6/O6): per-doc char length + distinct terms."""
    pdf = (
        _tokenized_runs(sf_dir)
        .select_columns(["docID", "dataLen", "wordnums"])
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "doc_id": pdf["docID"].astype(np.int64),
            "data_len": pdf["dataLen"].astype(np.int64),
            "wordnums": pdf["wordnums"].astype(np.int64),
        }
    ).sort_values("doc_id").reset_index(drop=True)


def q_corpus_stats(sf_dir: str) -> pd.DataFrame:
    """Global N / avgdl (G4/G5, avgdl uint32-truncated like hw3/DocTable.h:27)."""
    eng = get_engine(sf_dir)
    return pd.DataFrame(
        {
            "n_docs": pd.array([eng.N], dtype=np.int64),
            "avgdl": pd.array([eng.avgdl], dtype=np.int64),
        }
    )


def q_term_df(sf_dir: str) -> pd.DataFrame:
    """Per-term document and collection frequency (G3)."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    ds = _tokenized_runs(sf_dir).map_batches(explode_postings, batch_format="pyarrow")

    # pre-aggregate inside batches before the groupby (vocab-sized partials)
    def partial(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {
                "term": batch["term"].to_numpy(zero_copy_only=False),
                "tf": batch["tf"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = pdf.groupby("term", sort=False)["tf"].agg(["count", "sum"]).reset_index()
        return pa.table(
            {
                "term": pa.array([t.decode("utf-8") for t in g["term"]], pa.string()),
                "df_p": pa.array(g["count"].to_numpy(np.int64)),
                "cf_p": pa.array(g["sum"].to_numpy(np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"), Sum("cf_p", alias_name="cf"))
        .to_pandas()
    )
    agg = agg.astype({"df": np.int64, "cf": np.int64})
    return agg.sort_values("term").reset_index(drop=True)


TOP_BIGRAMS_K = 20


def q_top_bigrams(sf_dir: str) -> pd.DataFrame:
    """Corpus top-20 word bigrams by count (tie-break: bigram asc) — the
    n-gram counting stage of corpus-statistics pipelines.  Per-batch
    ``value_counts`` partials bound the shuffle at distinct-bigrams per
    block; the global top-k runs as a distributed sort+limit, so the driver
    never holds the full bigram table."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.vectorized_tokenize import ngram_strings_batch

    def partial(batch: pa.Table) -> pa.Table:
        grams = ngram_strings_batch(batch["text"], n=2)
        vc = grams.value_counts()
        return pa.table(
            {
                "bigram": vc.field("values").cast(pa.string()),
                "cnt_p": vc.field("counts").cast(pa.int64()),
            }
        )

    out = (
        _docs_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("cnt_p", alias_name="cnt"))
        .sort(["cnt", "bigram"], descending=[True, False])
        .limit(TOP_BIGRAMS_K)
        .to_pandas()
    )
    return out.astype({"cnt": np.int64}).reset_index(drop=True)


KEYWORDS_PER_DOC = 3


def q_doc_keywords(sf_dir: str) -> pd.DataFrame:
    """Top-3 tf·idf keywords per document (weight = tf * ln(N/df), the
    keyword-extraction stage of snippet generation, cf. hw3 tf·idf weights).

    Two passes: a vocab-sized df aggregate (same envelope as the serving
    lexicon — broadcast once via ray.put, read per task), then a per-batch
    vectorized top-k: every doc's postings live in one batch row, so the
    selection is a single lexsort per batch with NO shuffle."""
    import ray
    import ray.data

    from ray.data.aggregate import Sum

    runs = _tokenized_runs(sf_dir)

    def df_partial(batch: pa.Table) -> pa.Table:
        batch = explode_postings(batch)
        terms = batch["term"].to_numpy(zero_copy_only=False)
        u, c = np.unique(terms, return_counts=True)
        return pa.table(
            {"term": pa.array(list(u), pa.large_binary()), "df_p": pa.array(c.astype(np.int64))}
        )

    dft = (
        runs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df_p", alias_name="df"))
        .to_pandas()
    )
    vocab = np.sort(dft["term"].to_numpy())
    order = np.argsort(dft["term"].to_numpy())
    dfs = dft["df"].to_numpy(np.int64)[order]
    n_docs = _docs_ds(sf_dir).count()
    ref = ray.put((vocab, dfs))

    def topk(batch: pa.Table) -> pa.Table:
        # explode INSIDE the task: a doc's postings come from one runs row,
        # so the whole doc is guaranteed local to this batch (re-batching
        # between two map_batches could otherwise split a doc)
        batch = explode_postings(batch)
        v, d = ray.get(ref)
        doc = batch["docID"].to_numpy(zero_copy_only=False).astype(np.int64)
        term = batch["term"].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        rank = np.searchsorted(v, term)
        w = tf * np.log(float(n_docs) / d[rank])
        sel = np.lexsort((rank, -w, doc))
        doc_s = doc[sel]
        first = np.concatenate(([True], doc_s[1:] != doc_s[:-1]))
        grp_start = np.repeat(np.flatnonzero(first), np.diff(np.concatenate((np.flatnonzero(first), [len(doc_s)]))))
        within = np.arange(len(doc_s)) - grp_start
        keep = sel[within < KEYWORDS_PER_DOC]
        return pa.table(
            {
                "doc_id": pa.array(doc[keep]),
                "term": pa.array([t.decode("utf-8") for t in term[keep]], pa.string()),
                "weight": pa.array(np.round(w[keep], 6)),
            }
        )

    out = runs.map_batches(topk, batch_format="pyarrow").to_pandas()
    return out.astype({"doc_id": np.int64, "weight": np.float64}).sort_values(
        ["doc_id", "term"]
    ).reset_index(drop=True)


def q_lexicon_stats(sf_dir: str) -> pd.DataFrame:
    """Lexicon view of the BUILT index: df + 64-posting chunk counts (S5)."""
    import glob

    import pyarrow.parquet as pq

    get_engine(sf_dir)
    frames = [
        pq.read_table(p).to_pandas()
        for p in sorted(
            glob.glob(os.path.join(_index_dir(sf_dir), "parts", "part=*", "lexicon.parquet"))
        )
    ]
    lex = pd.concat(frames, ignore_index=True)
    out = pd.DataFrame(
        {
            "term": [t.decode("utf-8") for t in lex["term"]],
            "df": lex["df_seg"].astype(np.int64),
            "n_chunks": lex["n_chunks"].astype(np.int64),
        }
    )
    # heavy terms appear once per segment; global df = sum of segment dfs
    out = (
        out.groupby("term", as_index=False)
        .agg(df=("df", "sum"), n_chunks=("n_chunks", "sum"))
        .astype({"df": np.int64, "n_chunks": np.int64})
    )
    return out.sort_values("term").reset_index(drop=True)


def _ranked_rows(engine, queries, mode: str) -> pd.DataFrame:
    """Shared gate-result shaper: re-rank on 6-dp ROUNDED scores with the
    (score desc, doc_id) tie-break the oracles use — every bm25_* gate
    (single-node, sharded, extended, deleted) goes through THIS function
    so the rounding/tie rules can never drift apart."""
    rows = []
    for qid, q in queries:
        res = engine.search(q, mode, TOP_K + 20)
        res = [(int(d), round(float(s), 6)) for d, s in res]
        res.sort(key=lambda r: (-r[1], r[0]))  # rank on ROUNDED score
        for rank, (d, s) in enumerate(res[:TOP_K], 1):
            rows.append((qid, rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"]).astype(
        {"query_id": np.int64, "rank": np.int64, "doc_id": np.int64, "score": float}
    )


def _bm25_results(sf_dir: str, queries, mode: str) -> pd.DataFrame:
    return _ranked_rows(get_engine(sf_dir), queries, mode)


def q_bm25_disjunctive(sf_dir: str) -> pd.DataFrame:
    """TAAT disjunctive BM25 top-10 (Q2) on the fixed query set."""
    return _bm25_results(sf_dir, DISJ_QUERIES, "disjunctive")


_EXTEND_CACHE: dict[str, SearchEngine] = {}


def q_bm25_extend(sf_dir: str) -> pd.DataFrame:
    """Incremental ingestion end-to-end: build a doc-layout index over the
    FIRST 60% of documents, ``extend_index`` it with the remaining 40%
    (index/extend.py — delta-only tokenize/exchange/encode into new
    partitions), then serve the fixed disjunctive query set.  Must match
    the same DuckDB oracle as ``bm25_disjunctive`` over the full table —
    the extension is exact, not approximate."""
    import json
    import shutil

    import pyarrow.parquet as pq

    from ..index.extend import extend_index

    if sf_dir not in _EXTEND_CACHE:
        out = _index_dir(sf_dir) + "_ext"
        n = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
        split = int(n * 0.6)

        def _slice(lo: int, hi: int):
            def corpus():
                def f(t: pa.Table) -> pa.Table:
                    ids = t["docID"].to_numpy(zero_copy_only=False).astype(np.int64)
                    return t.filter(pa.array((ids >= lo) & (ids < hi)))

                return corpus_from_documents_table(sf_dir).map_batches(
                    f, batch_format="pyarrow"
                )

            return corpus

        manifest_path = os.path.join(out, "manifest.json")
        fresh = True
        if os.path.exists(manifest_path):
            try:
                with open(manifest_path) as f:
                    mf = json.load(f)
                done = os.path.exists(os.path.join(out, "ext_gen001", "done"))
                fresh = not (
                    mf.get("extensions")
                    and done
                    and mf.get("format_version") == CURRENT_FORMAT_VERSION
                )
            except (OSError, ValueError):
                fresh = True
        if fresh:
            shutil.rmtree(out, ignore_errors=True)
            build_index(
                _slice(0, split),
                out,
                BuildConfig(num_partitions=3, partition_by="doc", tokenizer_mode="simple"),
            )
            extend_index(out, _slice(split, n))
        _EXTEND_CACHE[sf_dir] = SearchEngine(out)
    eng = _EXTEND_CACHE[sf_dir]
    rows = []
    for qid, q in DISJ_QUERIES:
        res = [(int(d), round(float(s), 6)) for d, s in eng.search(q, "disjunctive", TOP_K + 20)]
        res.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d, s) in enumerate(res[:TOP_K], 1):
            rows.append((qid, rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"]).astype(
        {"query_id": np.int64, "rank": np.int64, "doc_id": np.int64, "score": float}
    )


_SHARDED_CACHE: dict[str, object] = {}


def q_bm25_sharded(sf_dir: str) -> pd.DataFrame:
    """Disjunctive BM25 served by the document-partitioned scatter-gather
    engine (query/sharded.py) — must match the DuckDB oracle exactly, same
    as the single-node path (the oracle is shared with bm25_disjunctive)."""
    from ..query.sharded import ShardedSearchEngine

    if sf_dir not in _SHARDED_CACHE:
        out = _index_dir(sf_dir) + "_doc"
        import shutil

        manifest_path = os.path.join(out, "manifest.json")
        if not os.path.exists(manifest_path):
            shutil.rmtree(out, ignore_errors=True)
        build_index(
            lambda: corpus_from_documents_table(sf_dir),
            out,
            BuildConfig(num_partitions=4, partition_by="doc", tokenizer_mode="simple"),
        )
        _SHARDED_CACHE[sf_dir] = ShardedSearchEngine(out)
    return _ranked_rows(_SHARDED_CACHE[sf_dir], DISJ_QUERIES, "disjunctive")


def q_bm25_conjunctive(sf_dir: str) -> pd.DataFrame:
    """Soft-conjunctive BM25 top-10 (Q3, candidates = min-df term postings)."""
    return _bm25_results(sf_dir, CONJ_QUERIES, "conjunctive")


def _trec_corpus(sf_dir: str):
    """documents table shaped like the reference's raw docs: the url is the
    FIRST LINE of the text (hw2/DataLoader.cpp:29-31 drops it)."""
    ds = corpus_from_documents_table(sf_dir)

    def add_url_line(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = pc.binary_join_element_wise(
            pc.cast(t["url"], pa.large_string()),
            pc.cast(t["text"], pa.large_string()),
            pa.scalar("\n", pa.large_string()),
        )
        return pa.table({"docID": t["docID"], "url": t["url"], "text": text})

    return ds.map_batches(add_url_line, batch_format="pyarrow")


_TREC_CACHE: dict[str, SearchEngine] = {}


_DELETED_CACHE: dict[str, SearchEngine] = {}


def q_bm25_deleted(sf_dir: str) -> pd.DataFrame:
    """Tombstone deletion end-to-end: delete every doc_id % 7 == 0 from a
    copy of the index (index/extend.py delete_docs), then serve the fixed
    disjunctive query set.  Deleted docs vanish from results (including
    the zero-pad pool) while N/avgdl/df keep the stored full-corpus values
    until compaction — the SQL oracle recomputes exactly that: scores
    under full-corpus stats, ranking over surviving docs only."""
    import shutil

    import pyarrow.parquet as pq

    from ..index.extend import delete_docs

    if sf_dir not in _DELETED_CACHE:
        src_engine = get_engine(sf_dir)  # ensure the base index exists
        import glob as _glob

        out = _index_dir(sf_dir) + "_del"
        # the marker must be the tombstone FILES, not the directory:
        # delete_docs makes the dir before the atomic parquet rename, so a
        # crash in between would leave an empty dir that looks "done"
        if not _glob.glob(os.path.join(out, "tombstones", "del-*.parquet")):
            shutil.rmtree(out, ignore_errors=True)
            shutil.copytree(src_engine.index_dir, out)
            n = pq.ParquetFile(
                os.path.join(sf_dir, "documents.parquet")
            ).metadata.num_rows
            delete_docs(out, [i for i in range(n) if i % 7 == 0])
        _DELETED_CACHE[sf_dir] = SearchEngine(out)
    return _ranked_rows(_DELETED_CACHE[sf_dir], DISJ_QUERIES, "disjunctive")


def q_bm25_trec(sf_dir: str) -> pd.DataFrame:
    """Disjunctive BM25 through the TREC tokenizer quirks end-to-end:
    first-line (url) drop, trailing-unflushed-token drop, dataLen = FULL doc
    bytes including the url line (hw2/DataLoader.cpp:27-70).  The oracle SQL
    reproduces all three, so the reference-fidelity path is driver-gated,
    not only pytest-pinned."""
    if sf_dir not in _TREC_CACHE:
        import shutil

        out = _index_dir(sf_dir) + "_trec"
        if not os.path.exists(os.path.join(out, "manifest.json")):
            shutil.rmtree(out, ignore_errors=True)
        build_index(
            lambda: _trec_corpus(sf_dir),
            out,
            BuildConfig(num_partitions=8, tokenizer_mode="trec"),
        )
        _TREC_CACHE[sf_dir] = SearchEngine(out)
    eng = _TREC_CACHE[sf_dir]
    rows = []
    for qid, q in DISJ_QUERIES:
        res = eng.search(q, "disjunctive", TOP_K + 20)
        res = [(int(d), round(float(s), 6)) for d, s in res]
        res.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d, s) in enumerate(res[:TOP_K], 1):
            rows.append((qid, rank, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"]).astype(
        {"query_id": np.int64, "rank": np.int64, "doc_id": np.int64, "score": float}
    )


_JSONL_CACHE: dict[str, SearchEngine] = {}


def q_bm25_jsonl(sf_dir: str) -> pd.DataFrame:
    """Disjunctive BM25 over a corpus ingested from JSONL end-to-end: the
    documents table is rendered once as newline-delimited JSON, read back
    through the split-scanned ``sources.jsonl.read_jsonl`` source
    (deterministic line-order docIDs), indexed, and served — same DuckDB
    oracle as ``bm25_disjunctive`` because the corpus is identical."""
    if sf_dir not in _JSONL_CACHE:
        import json as _json
        import shutil

        import pyarrow.parquet as pq

        from ..sources.jsonl import read_jsonl

        jsonl_path = _index_dir(sf_dir) + "_docs.jsonl"
        if not os.path.exists(jsonl_path):
            t = pq.read_table(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text", "source"],
            ).sort_by("doc_id")
            tmp = jsonl_path + ".tmp"
            with open(tmp, "w") as f:
                for did, tx, src in zip(
                    t["doc_id"].to_pylist(), t["text"].to_pylist(), t["source"].to_pylist()
                ):
                    f.write(_json.dumps({"url": f"doc://{src}/{did}", "text": tx}) + "\n")
            os.rename(tmp, jsonl_path)
        out = _index_dir(sf_dir) + "_jsonl"
        if not os.path.exists(os.path.join(out, "manifest.json")):
            shutil.rmtree(out, ignore_errors=True)
        build_index(
            lambda: read_jsonl(jsonl_path, docs_per_split=100),
            out,
            BuildConfig(num_partitions=4, tokenizer_mode="simple"),
        )
        _JSONL_CACHE[sf_dir] = SearchEngine(out)
    return _ranked_rows(_JSONL_CACHE[sf_dir], DISJ_QUERIES, "disjunctive")


def q_search_snippets(sf_dir: str) -> pd.DataFrame:
    """Search + snippet generation (N1-N6 dispatch; rows-only check)."""
    from ..query.snippets_stage import attach_snippets

    eng = get_engine(sf_dir)
    frames = []
    # one query whose top-k is zero-padding docs (empty snippets — faithful
    # dense-array semantics) and one conjunctive query whose candidates
    # contain mid-text matches (non-empty snippet path exercised end-to-end)
    for qid, q, mode in [
        (0, "dup join", "disjunctive"),
        (1, "dup table", "conjunctive"),
    ]:
        res = eng.search_batch([{"query_id": qid, "query": q, "mode": mode, "k": 5}])
        res["query"] = q
        frames.append(res)
    res = pd.concat(frames, ignore_index=True)
    corpus = corpus_from_documents_table(sf_dir)
    out = attach_snippets(res, eng, corpus, algo="bm25", use_index_stats=True)
    out = out[["query_id", "rank", "docID", "snippet"]].rename(columns={"docID": "doc_id"})
    return out.astype({"query_id": np.int64, "rank": np.int64, "doc_id": np.int64})


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------


def _docs_ds(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def q_token_counts(sf_dir: str) -> pd.DataFrame:
    from ..functions.textstats import token_stats

    out = _docs_ds(sf_dir).map_batches(token_stats, batch_format="pyarrow").to_pandas()
    return out.astype(
        {"doc_id": np.int64, "n_tokens": np.int64, "n_distinct": np.int64}
    ).sort_values("doc_id").reset_index(drop=True)


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    from ..functions.textstats import quality_score

    out = _docs_ds(sf_dir).map_batches(quality_score, batch_format="pyarrow").to_pandas()
    for c in ("distinct_ratio", "stopword_ratio", "mean_token_len"):
        out[c] = out[c].round(6)
    return out.astype(
        {"doc_id": np.int64, "n_chars": np.int64, "n_tokens": np.int64}
    ).sort_values("doc_id").reset_index(drop=True)


def q_lang_id(sf_dir: str) -> pd.DataFrame:
    from ..functions.textstats import lang_id

    out = _docs_ds(sf_dir).map_batches(lang_id, batch_format="pyarrow").to_pandas()
    return out.astype({"doc_id": np.int64}).sort_values("doc_id").reset_index(drop=True)


def q_bpe_token_count(sf_dir: str) -> pd.DataFrame:
    from ..functions.textstats import bpe_token_count

    out = _docs_ds(sf_dir).map_batches(
        bpe_token_count, batch_format="pyarrow"
    ).to_pandas()
    return out.astype({"doc_id": np.int64, "n_bpe_tokens": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_lm_score(sf_dir: str) -> pd.DataFrame:
    from ..functions.textstats import unigram_lm_score

    out = unigram_lm_score(_docs_ds(sf_dir)).to_pandas()
    return out.astype({"doc_id": np.int64}).sort_values("doc_id").reset_index(
        drop=True
    )


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    from ..functions.textstats import repetition_stats

    out = _docs_ds(sf_dir).map_batches(
        repetition_stats, batch_format="pyarrow"
    ).to_pandas()
    return out.astype({"doc_id": np.int64}).sort_values("doc_id").reset_index(
        drop=True
    )


def q_pii_scrub(sf_dir: str) -> pd.DataFrame:
    """PII counts + md5 of the redacted text per doc.  The synthetic corpus
    contains no PII (counts 0, redacted == original — validating the
    passthrough path); the firing semantics are pinned by a planted-PII
    pytest that runs the same SQL on the planted frame."""
    from ..functions.pii import pii_scrub

    out = _docs_ds(sf_dir).map_batches(pii_scrub, batch_format="pyarrow").to_pandas()
    return out.astype(
        {"doc_id": np.int64, "n_email": np.int64, "n_ipv4": np.int64,
         "n_phone": np.int64}
    ).sort_values("doc_id").reset_index(drop=True)


def q_fingerprint_md5(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import add_md5

    out = _docs_ds(sf_dir).map_batches(add_md5, batch_format="pyarrow").to_pandas()
    return out.astype({"doc_id": np.int64}).sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# dedup / similarity
# ---------------------------------------------------------------------------


def q_dedup_exact(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import exact_dedup

    out = exact_dedup(_docs_ds(sf_dir)).to_pandas()
    return out.astype({"doc_id": np.int64, "n_copies": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_dedup_normalized(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import normalized_dedup

    out = normalized_dedup(_docs_ds(sf_dir)).to_pandas()
    return out.astype({"doc_id": np.int64, "n_copies": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_pack_windows(sf_dir: str) -> pd.DataFrame:
    """Concat-and-chunk sequence packing into 256-token context windows:
    per doc, its global token offset and first/last window index."""
    from ..functions.packing import pack_windows

    out = pack_windows(
        [os.path.join(sf_dir, "documents.parquet")], window=256
    ).to_pandas()
    return out.astype(
        {c: np.int64 for c in ["doc_id", "tok_start", "n_tokens", "win_start", "win_end"]}
    ).sort_values("doc_id").reset_index(drop=True)


def q_curate_corpus(sf_dir: str) -> pd.DataFrame:
    """Flagship curation composition: quality filter (>=20 tokens,
    dup-trigram <= 0.05) -> exact-dedup survivors -> 5-gram
    decontamination vs the held-out doc_id%5==0 slice."""
    import ray.data

    from .curation import curate_corpus

    def _split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (ids % 5 == 0) if bench else (ids % 5 != 0)
            return t.filter(pa.array(mask))

        return f

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    out = curate_corpus(
        ds.map_batches(_split(False), batch_format="pyarrow"),
        ds.map_batches(_split(True), batch_format="pyarrow"),
    ).to_pandas()
    return out.astype({"doc_id": np.int64, "n_tokens": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_rebalance_sources(sf_dir: str) -> pd.DataFrame:
    """Mixture rebalancing to a 200-doc uniform target across sources —
    per-source content-hash-threshold downsample (no shuffle)."""
    import ray.data

    from ..functions.sampling import rebalance_sources

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    out = rebalance_sources(ds, total=200).to_pandas()
    return out.astype({"doc_id": np.int64}).sort_values("doc_id").reset_index(
        drop=True
    )


def q_training_shuffle(sf_dir: str) -> pd.DataFrame:
    """First 100 docs of the seed-42 deterministic global shuffle (the
    epoch-order permutation); rank is the position in the sorted stream."""
    import ray.data

    from ..functions.sampling import training_shuffle

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    head = training_shuffle(ds, seed=42).limit(100).to_pandas()
    head["rank"] = np.arange(len(head), dtype=np.int64)
    return head[["rank", "doc_id"]].astype({"doc_id": np.int64})


def q_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic ~12.5% content-hash sample (md5 hex prefix < 0x2000) —
    stateless filter, no shuffle, rerun/resume stable."""
    from ..functions.sampling import hash_sample

    out = hash_sample(_docs_ds(sf_dir), keep_of_65536=0x2000).to_pandas()
    return (
        out[["doc_id"]]
        .astype({"doc_id": np.int64})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_sample_weighted(sf_dir: str) -> pd.DataFrame:
    """Weighted sample without replacement (Efraimidis–Spirakis over
    md5-derived uniforms, weight = n_chars): distributed argmax — each
    batch ships only its local top-k partial, no shuffle."""
    import ray.data

    from ..functions.sampling import weighted_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    out = weighted_sample(ds, k=20, weight_col="n_chars")
    return out.astype(
        {"rank": np.int64, "doc_id": np.int64, "weight": float, "lnkey": float}
    )


def q_docs_per_source_cap(sf_dir: str) -> pd.DataFrame:
    """Per-domain quota: keep the 5 lowest-id docs of each source (the
    per-domain cap of curation pipelines), via map-side top-k combiner +
    keys x k shuffle."""
    import ray.data

    from ..functions.sampling import cap_per_key

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    out = cap_per_key(ds, key_col="source", order_col="doc_id", k=5).to_pandas()
    return out.astype({"doc_id": np.int64}).sort_values("doc_id").reset_index(
        drop=True
    )


def q_dedup_minhash(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs_ds(sf_dir), threshold=0.5)


def q_dedup_ngram(sf_dir: str) -> pd.DataFrame:
    """EXACT shingle-Jaccard pairs via the distributed inverted shingle
    index — same output contract and oracle as dedup_minhash (the LSH
    route), so the two engines cross-check each other.

    max_shingle_df skips hub shingles (shared by >256 docs) in the
    intersection counts; it can only SHRINK intersections, and qualifying
    near-dup pairs share mostly non-hub shingles, so the gate stays
    oracle-exact while sum(bucket^2) stays bounded (verified at sf0.01/0.1)."""
    from ..functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs_ds(sf_dir), threshold=0.5, max_shingle_df=256)


def q_dedup_survivors(sf_dir: str) -> pd.DataFrame:
    """Near-dup cluster assignment: connected components over the verified
    MinHash pairs, rep = min doc_id of each component (the survivor)."""
    from ..functions.dedup import dedup_clusters

    return dedup_clusters(q_dedup_minhash(sf_dir))


def q_dedup_best_survivor(sf_dir: str) -> pd.DataFrame:
    """Quality-aware survivor selection: within each near-dup cluster keep
    the member with the MOST tokens (tie -> lowest doc_id) instead of the
    lowest id — the 'keep the best copy' policy of curation pipelines.

    Scale shape: clusters are output-sized (docs with no near-dup never
    appear), so the per-cluster argmax is driver-side; the token counts
    are fetched with a broadcast-filter streaming pass over the corpus
    (only cluster members' stats ship back)."""
    import ray

    from ..functions.textstats import token_stats

    clusters = q_dedup_survivors(sf_dir)  # (doc_id, rep_id)
    if not len(clusters):
        return pd.DataFrame(
            {"rep_id": pd.array([], dtype=np.int64),
             "survivor_id": pd.array([], dtype=np.int64),
             "n_tokens": pd.array([], dtype=np.int64)}
        )
    ids_ref = ray.put(np.sort(clusters["doc_id"].to_numpy(np.int64)))

    def filt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(np.isin(d, ids)))

    q = (
        _docs_ds(sf_dir)
        .map_batches(filt, batch_format="pyarrow")
        .map_batches(token_stats, batch_format="pyarrow")
        .to_pandas()
    )
    m = clusters.merge(q[["doc_id", "n_tokens"]], on="doc_id")
    m = m.sort_values(
        ["rep_id", "n_tokens", "doc_id"], ascending=[True, False, True]
    )
    out = m.groupby("rep_id", sort=True).head(1).reset_index(drop=True)
    return pd.DataFrame(
        {
            "rep_id": out["rep_id"].astype(np.int64),
            "survivor_id": out["doc_id"].astype(np.int64),
            "n_tokens": out["n_tokens"].astype(np.int64),
        }
    )


def q_decontam(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: docs sharing >=1 distinct word 5-gram with
    a deterministic held-out "benchmark" slice (doc_id % 5 == 0).  The
    bench side is eval-set sized, so its distinct gram-hash set broadcasts
    once (ray.put) and the corpus streams through a stateless probe — no
    shuffle (functions/decontam.py)."""
    import pyarrow as pa

    from ..functions.decontam import benchmark_gram_set, contamination_hits

    def _split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (ids % 5 == 0) if bench else (ids % 5 != 0)
            return t.filter(pa.array(mask))

        return f

    ds = _docs_ds(sf_dir)
    grams = benchmark_gram_set(
        ds.map_batches(_split(True), batch_format="pyarrow"), k=5
    )
    out = contamination_hits(
        ds.map_batches(_split(False), batch_format="pyarrow"), grams, k=5
    ).to_pandas()
    return out.astype({"doc_id": np.int64, "n_hits": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_decontam_bloom(sf_dir: str) -> pd.DataFrame:
    """Bloom-filter decontamination: same bench/corpus split as
    ``q_decontam``, but the bench gram set broadcasts as a fixed
    16-bits-per-gram Bloom filter instead of the exact sorted hash array —
    the scale path when the benchmark suite outgrows a comfortable
    broadcast.  Superset of the exact output by construction (no false
    negatives; pytest pins the containment and the FP envelope)."""
    import pyarrow as pa

    from ..functions.decontam import benchmark_bloom, contamination_hits_bloom

    def _split(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            mask = (ids % 5 == 0) if bench else (ids % 5 != 0)
            return t.filter(pa.array(mask))

        return f

    ds = _docs_ds(sf_dir)
    bloom = benchmark_bloom(
        ds.map_batches(_split(True), batch_format="pyarrow"), k=5
    )
    out = contamination_hits_bloom(
        ds.map_batches(_split(False), batch_format="pyarrow"), bloom, k=5
    ).to_pandas()
    return out.astype({"doc_id": np.int64, "n_hits": np.int64}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_dedup_simhash(sf_dir: str) -> pd.DataFrame:
    from ..functions.dedup import simhash_pairs

    out = simhash_pairs(_docs_ds(sf_dir), max_hamming=3)
    return out.astype({"a": np.int64, "b": np.int64, "hamming": np.int64})


def _emb_ds(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def q_hll_users_daily(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog (p=12) approximate distinct users per day — the
    bounded-state counterpart of distinct_users_daily.  Deterministic and
    partitioning-independent (max-merge registers), but approximate ->
    pinned-golden oracle; the error bound vs the exact count is
    pytest-pinned."""
    import ray.data

    from ..functions.sketches import hll_distinct_daily

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    out = hll_distinct_daily(ds, p=12)
    out["day"] = pd.to_datetime(out["day"]).dt.strftime("%Y-%m-%d")
    return out.astype({"n_users_approx": np.int64}).sort_values("day").reset_index(
        drop=True
    )


def q_kmeans_embed(sf_dir: str) -> pd.DataFrame:
    """Distributed k-means (k=10, 5 fixed Lloyd's iterations, deterministic
    min-id init) over the embeddings table; output = (vec_id, cluster).
    Iterative state is not SQL-expressible -> pinned-golden oracle (the
    algorithm's semantics — monotone inertia, planted-blob recovery — are
    pytest-pinned in tests/test_functions.py)."""
    import ray.data

    from ..functions.clustering import kmeans_assign, kmeans_fit

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    centroids, _hist = kmeans_fit(ds, k=10, iters=5)
    out = kmeans_assign(ds, centroids).to_pandas()
    return out.astype({"vec_id": np.int64, "cluster": np.int64}).sort_values(
        "vec_id"
    ).reset_index(drop=True)


def q_embedding_centroid(sf_dir: str) -> pd.DataFrame:
    """Per-vector cosine to the global mean embedding (semantic-outlier
    signal) — broadcast mean, stateless score."""
    import ray.data

    from ..functions.clustering import centroid_cosine

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    out = centroid_cosine(ds).to_pandas()
    return out.astype({"vec_id": np.int64}).sort_values("vec_id").reset_index(
        drop=True
    )


def q_dedup_embedding(sf_dir: str) -> pd.DataFrame:
    """Same-label cosine >= 0.4 pairs (label is the blocking key).

    Exact blocked pair stage, storage-exchange shape (r5): labels
    hash-partition to storage (``functions.exchange.partition_apply``)
    and ONE task per partition runs per-label all-pairs matmuls over its
    label blocks — each matmul bounded by the block size, no full-matrix
    broadcast, nothing corpus-sized on the driver, and no in-memory
    groupby (this was the last pipeline on it).  The 100 TB path stays
    functions/dedup.embedding_dup_pairs (the SCALE variant, pytest-pinned
    and stress-run at 1M vectors in BASELINE.md), which derives its
    blocks from IVF cells instead of labels."""
    import tempfile

    from ..functions.exchange import partition_apply

    _EMPTY = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def label_pairs(t: pa.Table) -> pa.Table:
        from ..functions.ann import cosine_matrix_duckdb

        if t.num_rows < 2:
            return _EMPTY
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = t["embedding"].combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(len(arr), flat.size // len(arr))
        order = np.lexsort((ids, lab))
        lab, ids, mat = lab[order], ids[order], mat[order]
        starts = np.flatnonzero(np.concatenate(([True], lab[1:] != lab[:-1])))
        ends = np.concatenate((starts[1:], [len(lab)]))
        a_out, b_out, c_out = [], [], []
        for s, e in zip(starts, ends):  # one matmul per label BLOCK
            if e - s < 2:
                continue
            sims = np.round(cosine_matrix_duckdb(mat[s:e], mat[s:e]), 6)
            ia, ib = np.nonzero(np.triu(sims >= 0.4, k=1))
            a_out.append(ids[s:e][ia])
            b_out.append(ids[s:e][ib])
            c_out.append(sims[ia, ib])
        if not a_out:
            return _EMPTY
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_out), pa.int64()),
                "b": pa.array(np.concatenate(b_out), pa.int64()),
                "cosine": pa.array(np.concatenate(c_out), pa.float64()),
            }
        )

    with tempfile.TemporaryDirectory(prefix="embdup_gate_", dir=scratch_base()) as scratch:
        out = partition_apply(
            _emb_ds(sf_dir), "label", label_pairs, num_parts=8,
            scratch_dir=scratch,
        ).to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


ANN_QUERY_IDS = [0, 1, 2, 3, 4]
ANN_K = 10


def q_ann_topk(sf_dir: str) -> pd.DataFrame:
    from ..functions.ann import brute_topk

    out = brute_topk(_emb_ds(sf_dir), ANN_QUERY_IDS, ANN_K)
    return out.astype(
        {"query_id": np.int64, "rank": np.int64, "vec_id": np.int64, "cosine": float}
    )


def q_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF top-k through the PERSISTENT cell-partitioned index (cached per
    sf dir): probes read only the queried cells' partitions."""
    from ..functions.ann import ivf_topk

    out = ivf_topk(
        _emb_ds(sf_dir),
        ANN_QUERY_IDS,
        ANN_K,
        n_clusters=16,
        nprobe=8,
        index_dir=_index_dir(sf_dir) + "_ivf",
    )
    return out.astype(
        {"query_id": np.int64, "rank": np.int64, "vec_id": np.int64, "cosine": float}
    )


def q_ann_lsh(sf_dir: str) -> pd.DataFrame:
    """Multi-probe LSH top-k through the PERSISTENT bucket-partitioned
    index (cached per sf dir): probes read only the queried buckets'
    partitions."""
    from ..functions.ann import lsh_topk

    out = lsh_topk(
        _emb_ds(sf_dir),
        ANN_QUERY_IDS,
        ANN_K,
        n_bits=6,
        nprobe=16,
        index_dir=_index_dir(sf_dir) + "_lsh",
    )
    return out.astype(
        {"query_id": np.int64, "rank": np.int64, "vec_id": np.int64, "cosine": float}
    )


def q_knn_graph(sf_dir: str) -> pd.DataFrame:
    """EXACT top-5 kNN graph over the embeddings table via the block-pair
    nested-loop join (no broadcast; each task holds two blocks)."""
    from ..functions.ann import knn_join

    out = knn_join(os.path.join(sf_dir, "embeddings.parquet"), k=5, block_rows=128)
    return out.astype(
        {"vec_id": np.int64, "rank": np.int64, "nbr_id": np.int64, "cosine": float}
    ).reset_index(drop=True)


SEMANTIC_TAU = 0.4


def q_semantic_clusters(sf_dir: str) -> pd.DataFrame:
    """Semantic clustering: connected components over the exact kNN graph's
    edges with cosine >= tau — the grouping step of embedding-based corpus
    curation (near-topic buckets, semantic dedup clusters).  Composes the
    block-pair kNN join with the union-find finisher; components are
    output-sized (vectors with no qualifying edge never appear)."""
    from ..functions.dedup import dedup_clusters

    g = q_knn_graph(sf_dir)
    edges = g[g["cosine"] >= SEMANTIC_TAU].rename(
        columns={"vec_id": "a", "nbr_id": "b"}
    )
    out = dedup_clusters(edges[["a", "b"]])
    return out.rename(columns={"doc_id": "vec_id", "rep_id": "cluster_rep"}).astype(
        {"vec_id": np.int64, "cluster_rep": np.int64}
    )


def q_multimodal_meta(sf_dir: str) -> pd.DataFrame:
    from ..functions.multimodal import DecodeMedia, synth_media_ds

    out = (
        synth_media_ds(sf_dir)
        .map_batches(DecodeMedia, concurrency=2, batch_size=128, batch_format="pyarrow")
        .to_pandas()
    )
    out["byte_mean"] = out["byte_mean"].round(6)
    return out.astype(
        {
            "media_id": np.int64,
            "width": np.int64,
            "height": np.int64,
            "channels": np.int64,
            "n_bytes": np.int64,
            "decoded": np.int64,  # 0/1 so the DuckDB oracle types align
        }
    ).sort_values("media_id").reset_index(drop=True)


def q_crawl_frontier(sf_dir: str) -> pd.DataFrame:
    """hw1 crawler over the deterministic synthetic web store (no network
    in this container; fetch resolves against a local page-store parquet —
    wse_ray/crawl.py documents the re-expression and pinned deviations).

    Oracle: pinned-golden VALUES (oracles.sql_crawl_frontier) — the crawl is
    iterative frontier state, not a relational query, but the synthetic web
    store/seeds/round size are deterministic so the full fetch log pins;
    semantics are independently verified by tests/test_crawl.py
    (hand-verified scores, filters, budget and robots behavior)."""
    import os as _os

    from ..crawl import crawl, make_web_store

    store = _os.path.join("/tmp", "wse_crawl_store_v1.parquet")
    if not _os.path.exists(store):
        make_web_store(store, n_domains=6, pages_per_domain=12, seed=42)
    out = crawl(
        store,
        seeds=["https://site0.example/page0", "https://site2.example/page5"],
        page_budget=40,
        round_size=8,
    )
    log = out["log"].copy()
    log["priority"] = log["priority"].round(6)
    return log.astype(
        {
            "ord": np.int64,
            "round": np.int64,
            "status": np.int64,
            "size": np.int64,
            "in_sample": np.int64,
            "n_links_enqueued": np.int64,
        }
    )
