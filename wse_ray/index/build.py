"""Phased, resumable inverted-index build (the engine's flagship pipeline).

Replaces the reference's single-threaded parse -> spill -> pairwise-merge ->
block-encode lifecycle (hw2/main.cpp:1-32, hw2/DataLoader.cpp:239-255,
hw3/Lexicon.cpp:221-257) with one Ray-Data-native DAG per phase:

  1. runs      corpus read (deterministic docIDs) [-> html extract]
               -> TokenizeDocs map_batches -> parquet checkpoint
  2. doctable  column-pruned read of runs -> Count/Sum/Max aggregates
               (N, avgdl uint32-truncated, max dl) -> docID-sorted parquet
  3. heavy     per-batch partial term counts -> hash-bucket groupby ->
               exact dfs -> heavy-hitter set (df > threshold)
  4. parts     explode postings (Arrow list flatten) -> partition key
               hash(term) % P, heavy terms split by docID range into
               sub-segments -> groupby(part).map_groups encode (sort, delta,
               varbyte, 64-posting chunks, <=64 KiB blocks, per-chunk BM25
               upper bounds) -> part=K/{postings.bin, lexicon.parquet,
               metrics.json, _SUCCESS}

Each phase directory carries a ``_SUCCESS`` marker; ``build_index`` skips
completed phases, and within phase 4 completed partitions are skipped — the
per-partition lineage + metrics required by the north rule.  The ``runs``
checkpoint doubles as the posting-run store: a crashed build resumes from it
without re-tokenizing.

Shuffle accounting (SURVEY.md §7.3): exactly one all-to-all exchange of the
full postings stream (groupby part); the doctable aggregate and heavy-term
detection shuffle only per-batch partials (vocab-sized, not corpus-sized).
"""
from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict
from functools import partial
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..codec import count_blocks, encode_posting_list
from ..config import BM25_B, BM25_K1, POSTINGS_IN_CHUNK, BuildConfig
from ..stages.extract import ExtractText
from ..stages.tokenize_stage import TokenizeDocs, explode_postings
from ..sources.corpus import read_corpus

_HASH_BUCKETS = 4096

LEXICON_SCHEMA = pa.schema(
    [
        ("term", pa.large_binary()),
        ("seg_seq", pa.uint32()),
        ("df_seg", pa.uint64()),
        ("df_global", pa.uint64()),
        ("first_docid", pa.uint64()),
        ("last_docid", pa.uint64()),
        ("offset", pa.uint64()),
        ("length", pa.uint64()),
        ("n_chunks", pa.uint32()),
        ("n_blocks", pa.uint32()),
    ]
)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _mark(path: str) -> None:
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok\n")


def term_hash(terms) -> np.ndarray:
    """Deterministic 64-bit hash of term byte strings (stable across
    processes/machines — never python hash())."""
    arr = np.asarray(terms, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


# --------------------------------------------------------------------------
# phase 3: exact heavy-term detection from vocab-sized partials
# --------------------------------------------------------------------------


def _partial_term_counts(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    flat = pc.list_flatten(batch["terms"].combine_chunks())
    terms = flat.to_numpy(zero_copy_only=False)
    s = pd.Series(terms).value_counts()
    uniq = np.asarray(s.index, dtype=object)
    return pa.table(
        {
            "th": pa.array(term_hash(uniq) % _HASH_BUCKETS, pa.uint32()),
            "term": pa.array(list(uniq), pa.large_binary()),
            "df": pa.array(s.to_numpy(dtype=np.uint64), pa.uint64()),
        }
    )


def _sum_filter_heavy(g: pd.DataFrame, threshold: int) -> pd.DataFrame:
    sums = g.groupby("term", sort=False)["df"].sum()
    heavy = sums[sums > threshold]
    return pd.DataFrame({"term": heavy.index, "df": heavy.to_numpy(np.uint64)})


# --------------------------------------------------------------------------
# phase 4: partition assignment + per-partition encode
# --------------------------------------------------------------------------


class AssignPart:
    """Adds the shuffle key.  Normal terms: hash(term) % P.  Heavy terms are
    split by docID range into ``subparts`` segments with their own partition
    ids (explicit skew handling, SURVEY.md §4.2.2)."""

    def __init__(self, P: int, subparts: int, heavy_rank: dict[bytes, int], n_docs: int):
        self.P = P
        self.S = subparts
        self.heavy_rank = heavy_rank
        self.N = max(1, n_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_numpy(zero_copy_only=False)
        part = (term_hash(terms) % self.P).astype(np.int64)
        if self.heavy_rank:
            ranks = pd.Series(terms).map(self.heavy_rank)
            hmask = ranks.notna().to_numpy()
            if hmask.any():
                docids = batch["docID"].to_numpy().astype(np.uint64)
                sub = (docids[hmask] * self.S) // self.N
                sub = np.minimum(sub, self.S - 1).astype(np.int64)
                part[hmask] = self.P + ranks.to_numpy()[hmask].astype(np.int64) * self.S + sub
        return batch.append_column("part", pa.array(part, pa.int64()))


def _metrics_row(part: int, part_dir: str, cached: bool = False) -> pa.Table:
    with open(os.path.join(part_dir, "metrics.json")) as f:
        m = json.load(f)
    return pa.table(
        {
            "part": pa.array([part], pa.int64()),
            "n_postings": pa.array([m["n_postings"]], pa.int64()),
            "n_terms": pa.array([m["n_terms"]], pa.int64()),
            "bytes": pa.array([m["bytes"]], pa.int64()),
            "encode_sec": pa.array([m["encode_sec"]], pa.float64()),
            "cached": pa.array([cached], pa.bool_()),
        }
    )


def encode_partition(
    group: pa.Table, out_dir: str, stats: dict, heavy_df: dict[bytes, int]
) -> pa.Table:
    """map_groups fn: one shuffle partition -> encoded segment on disk.

    Sorts by (term, docID) — the reference's std::map order + docID-ascending
    stream invariant (hw2/InvertedIndex.h:8, hw2/DataLoader.cpp:81-116) made
    explicit — then encodes each term's postings into the blocked format and
    writes the partition directory atomically (tmp dir + rename, resumable).
    """
    t0 = time.perf_counter()
    N, avgdl = stats["N"], stats["avgdl"]
    part = int(group["part"][0].as_py())
    part_dir = os.path.join(out_dir, "parts", f"part={part:05d}")
    if _done(part_dir):  # resume: partition already encoded
        return _metrics_row(part, part_dir, cached=True)

    group = group.sort_by([("term", "ascending"), ("docID", "ascending")])
    terms = group["term"].to_numpy(zero_copy_only=False)
    docids = group["docID"].to_numpy().astype(np.uint64)
    tfs = group["tf"].to_numpy().astype(np.uint64)
    dls = group["dl"].to_numpy().astype(np.uint64)
    n = len(terms)

    starts = np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1])))
    ends = np.concatenate((starts[1:], [n]))

    k1, b = BM25_K1, BM25_B
    payload = bytearray()
    lex_rows = {k: [] for k in (
        "term", "seg_seq", "df_seg", "df_global", "first_docid",
        "last_docid", "offset", "length", "n_chunks", "n_blocks",
    )}
    for s, e in zip(starts, ends):
        term = terms[s]
        seg_df = e - s
        df_global = heavy_df.get(term, seg_df)
        d, f, l = docids[s:e], tfs[s:e], dls[s:e]
        # exact per-posting BM25 -> per-chunk upper bound (block-max)
        idf = np.log((N - float(df_global) + 0.5) / (float(df_global) + 0.5))
        K = k1 * ((1 - b) + b * l.astype(np.float64) / avgdl)
        scores = idf * (k1 + 1) * f.astype(np.float64) / (K + f.astype(np.float64))
        chunk_ubs = np.maximum.reduceat(
            scores, np.arange(0, len(scores), POSTINGS_IN_CHUNK)
        ).astype(np.float32)
        buf = encode_posting_list(d, f, l, chunk_ubs=chunk_ubs)
        lex_rows["term"].append(term)
        lex_rows["seg_seq"].append(0)  # ordered by first_docid at load
        lex_rows["df_seg"].append(int(seg_df))
        lex_rows["df_global"].append(int(df_global))
        lex_rows["first_docid"].append(int(d[0]))
        lex_rows["last_docid"].append(int(d[-1]))
        lex_rows["offset"].append(len(payload))
        lex_rows["length"].append(len(buf))
        lex_rows["n_chunks"].append((seg_df + POSTINGS_IN_CHUNK - 1) // POSTINGS_IN_CHUNK)
        lex_rows["n_blocks"].append(count_blocks(buf))
        payload += buf

    tmp_dir = part_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "postings.bin"), "wb") as f:
        f.write(bytes(payload))
    lex = pa.table(
        {k: pa.array(v, LEXICON_SCHEMA.field(k).type) for k, v in lex_rows.items()}
    )
    pq.write_table(lex, os.path.join(tmp_dir, "lexicon.parquet"))
    metrics = {
        "part": part,
        "n_postings": int(n),
        "n_terms": int(len(starts)),
        "bytes": len(payload),
        "encode_sec": round(time.perf_counter() - t0, 4),
    }
    with open(os.path.join(tmp_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    _mark(tmp_dir)
    shutil.rmtree(part_dir, ignore_errors=True)
    os.rename(tmp_dir, part_dir)
    return _metrics_row(part, part_dir)


# --------------------------------------------------------------------------
# the build driver
# --------------------------------------------------------------------------


def build_index(
    corpus: str | list[str] | Callable[[], "ray.data.Dataset"],
    out_dir: str,
    cfg: BuildConfig | None = None,
    from_html: bool = False,
) -> dict:
    """Build a partitioned inverted index under ``out_dir``.

    ``corpus``: parquet path(s) with (url, warc_ts, html, text, lang) — read
    with deterministic docID enumeration — or a zero-arg callable returning a
    Dataset with (docID, url, text) already attached.
    ``from_html=True`` reproduces text from the html column through the
    extraction stage instead of trusting the text column (slower; the two are
    byte-identical per the BASELINE.json invariant, which pytest pins).
    """
    cfg = cfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)
    timings: dict[str, float] = {}

    def make_ds() -> "ray.data.Dataset":
        if callable(corpus):
            return corpus()
        cols = ["url", "html"] if from_html else ["url", "text"]
        ds = read_corpus(corpus, columns=cols)
        if from_html:
            ds = ds.map_batches(ExtractText(), batch_format="pyarrow")
        return ds

    # ---- phase 1: tokenize -> runs checkpoint -----------------------------
    runs_dir = os.path.join(out_dir, "runs")
    if not _done(runs_dir):
        t0 = time.perf_counter()
        shutil.rmtree(runs_dir, ignore_errors=True)
        ds = make_ds().map_batches(
            TokenizeDocs(cfg.tokenizer_mode),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
        )
        ds.write_parquet(runs_dir)
        _mark(runs_dir)
        timings["runs"] = time.perf_counter() - t0

    # ---- phase 2: doctable + global stats ---------------------------------
    doctable_dir = os.path.join(out_dir, "doctable")
    stats_path = os.path.join(out_dir, "stats.json")
    if not _done(doctable_dir):
        t0 = time.perf_counter()
        shutil.rmtree(doctable_dir, ignore_errors=True)
        dt = ray.data.read_parquet(
            runs_dir, columns=["docID", "url", "dataLen", "wordnums"]
        )
        agg = dt.aggregate(Count(), Sum("dataLen"), Max("dataLen"))
        n_docs = int(agg["count()"])
        total_dl = int(agg["sum(dataLen)"])
        stats = {
            "N": n_docs,
            "total_dl": total_dl,
            # double -> uint32 truncation, hw3/DocTable.cpp:57-65 + DocTable.h:27
            "avgdl": int(total_dl / n_docs) if n_docs else 0,
            "max_dl": int(agg["max(dataLen)"] or 0),
        }
        dt.sort("docID").write_parquet(doctable_dir)
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        _mark(doctable_dir)
        timings["doctable"] = time.perf_counter() - t0
    with open(stats_path) as f:
        stats = json.load(f)

    # ---- phase 3: exact heavy-hitter dfs ----------------------------------
    heavy_dir = os.path.join(out_dir, "heavy")
    threshold = cfg.heavy_df_threshold
    if threshold is None:
        threshold = max(65536, (4 * stats["N"]) // max(1, cfg.num_partitions))
    if not _done(heavy_dir):
        t0 = time.perf_counter()
        shutil.rmtree(heavy_dir, ignore_errors=True)
        os.makedirs(heavy_dir, exist_ok=True)
        partials = ray.data.read_parquet(runs_dir, columns=["terms"]).map_batches(
            _partial_term_counts, batch_format="pyarrow"
        )
        heavy_ds = partials.groupby("th").map_groups(
            partial(_sum_filter_heavy, threshold=threshold), batch_format="pandas"
        )
        heavy_pdf = heavy_ds.to_pandas()
        heavy_schema = pa.schema([("term", pa.large_binary()), ("df", pa.uint64())])
        if len(heavy_pdf) == 0:  # no heavy hitters at this threshold
            heavy_tbl = heavy_schema.empty_table()
        else:
            heavy_tbl = pa.Table.from_pandas(
                heavy_pdf, schema=heavy_schema, preserve_index=False
            )
        pq.write_table(heavy_tbl, os.path.join(heavy_dir, "heavy.parquet"))
        _mark(heavy_dir)
        timings["heavy"] = time.perf_counter() - t0
    heavy_tbl = pq.read_table(os.path.join(heavy_dir, "heavy.parquet"))
    heavy_terms = heavy_tbl["term"].to_pylist()
    heavy_df = dict(zip(heavy_terms, heavy_tbl["df"].to_pylist()))
    heavy_rank = {t: i for i, t in enumerate(sorted(heavy_terms))}

    # ---- phase 4: postings shuffle + encode -------------------------------
    parts_root = os.path.join(out_dir, "parts")
    if not _done(parts_root):
        t0 = time.perf_counter()
        os.makedirs(parts_root, exist_ok=True)
        posts = ray.data.read_parquet(
            runs_dir, columns=["docID", "dataLen", "terms", "tfs"]
        ).map_batches(explode_postings, batch_format="pyarrow")
        posts = posts.map_batches(
            AssignPart(cfg.num_partitions, cfg.heavy_subparts, heavy_rank, stats["N"]),
            batch_format="pyarrow",
        )
        enc = posts.groupby("part").map_groups(
            partial(encode_partition, out_dir=out_dir, stats=stats, heavy_df=heavy_df),
            batch_format="pyarrow",
        )
        metrics = enc.to_pandas()  # tiny: one row per partition
        metrics.to_json(
            os.path.join(parts_root, "build_metrics.json"), orient="records"
        )
        _mark(parts_root)
        timings["parts"] = time.perf_counter() - t0

    manifest = {
        "config": asdict(cfg),
        "stats": stats,
        "heavy_terms": len(heavy_df),
        "heavy_df_threshold": threshold,
        "timings_sec": {k: round(v, 3) for k, v in timings.items()},
        "format_version": 1,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
