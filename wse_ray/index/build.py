"""Phased, resumable inverted-index build (the engine's flagship pipeline).

Replaces the reference's single-threaded parse -> spill -> pairwise-merge ->
block-encode lifecycle (hw2/main.cpp:1-32, hw2/DataLoader.cpp:239-255,
hw3/Lexicon.cpp:221-257) with THREE map-only Ray Data executions:

  1. runs      corpus read (deterministic docIDs) [-> html extract]
               -> vectorized tokenize -> each task side-writes its runs
               parquet (atomic tmp+rename) and RETURNS only vocab-sized
               partials: per-batch doc stats (N, sum/max dataLen) and
               heavy-term candidates.  The driver merges them into
               stats.json (avgdl uint32-truncated, hw3/DocTable.h:27) and
               the heavy set.  The runs files double as the doctable
               (columns docID,url,dataLen,wordnums) and the checkpointed
               posting runs.
  2. postings  read runs -> Arrow list-flatten explode -> partition key
               route_hash(term) % P with heavy terms split by docID range
               into sub-segments -> hive-partitioned parquet write.
               Storage IS the shuffle: each map task appends one file per
               partition it touches; no in-memory all-to-all.
  3. parts     one encode task per partition: sort (term, docID), delta +
               varbyte, 64-posting chunks, <=64 KiB blocks, per-chunk BM25
               upper bounds -> part=K/{postings.bin, lexicon.parquet,
               metrics.json, _SUCCESS}.

Every phase directory carries ``_SUCCESS`` lineage; completed phases and
completed partitions are skipped on resume, and the partitioned postings
persist as resumable runs — the distributed analogue of the reference's
spill files (hw2/InvertedIndex.cpp:109-117) minus the pairwise merge tree.

Heavy-hitter handling: candidates come from per-batch density partials
(pigeonhole: global df > T implies density > T/N in some batch, filtered at
T/(2N) for margin).  The heavy set only affects ROUTING (which terms get
docID-range split), never correctness: the query engine computes each
term's exact global df by summing per-segment dfs at lexicon load, and
per-chunk score bounds computed with a segment-local df remain true upper
bounds (idf is decreasing in df).
"""
from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import asdict
from functools import partial
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..codec import chunk_heads, encode_segments
from ..config import BM25_B, BM25_K1, POSTINGS_IN_CHUNK, BuildConfig
from ..stages.extract import ExtractText
from ..stages.tokenize_stage import TokenizeDocs, explode_postings
from ..sources.corpus import read_corpus

# driver-side bound on heavy-candidate partial rows PER BATCH when the
# corpus size is unknown (callable corpora): see TokenizeWriteRuns._partials
_CALLABLE_PARTIALS_CAP = 4096

LEXICON_SCHEMA = pa.schema(
    [
        ("term", pa.large_binary()),
        ("df_seg", pa.uint64()),
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


# --------------------------------------------------------------------------
# phase 1: tokenize + side-write runs + vocab-sized partials
# --------------------------------------------------------------------------


class TokenizeWriteRuns:
    """map_batches fn: tokenize a batch, side-write the runs file, return
    only per-batch partials (doc stats + heavy candidates).

    Side-writing keeps the whole phase ONE streaming execution: the heavy
    row data goes straight to storage while the tiny metadata flows back
    through the Dataset.  Writes are atomic (tmp + rename).
    """

    def __init__(
        self,
        runs_dir: str,
        mode: str,
        heavy_threshold: int,
        approx_docs: int,
        min_docid: int | None = None,
    ):
        self.runs_dir = runs_dir
        self.tokenize = TokenizeDocs(mode)
        self.threshold = heavy_threshold
        self.approx_docs = approx_docs  # <= 0: unknown (callable corpus)
        # extension guard: a delta corpus must not write run files whose
        # min docID collides with the base/earlier-generation range — check
        # BEFORE the file write so a misbehaving callable can never clobber
        # run-<id>.parquet files the doctable and compaction depend on
        self.min_docid = min_docid

    def __call__(self, batch: pa.Table) -> pa.Table:
        runs = self.tokenize(batch)
        if runs.num_rows:
            if self.min_docid is not None:
                import pyarrow.compute as pc

                lo = int(pc.min(runs["docID"]).as_py())
                if lo < self.min_docid:
                    raise ValueError(
                        f"delta corpus produced docID {lo} below the index "
                        f"extension floor {self.min_docid}; delta docIDs must "
                        f"start at the floor and be contiguous"
                    )
            # deterministic filename from the batch's min docID (docIDs are
            # globally unique and batches are disjoint row ranges): a Ray
            # task re-execution rewrites the SAME file instead of silently
            # duplicating the row group in the runs checkpoint.  tmp name is
            # per-attempt so concurrent attempts can't interleave writes;
            # the rename is atomic and idempotent (same content).
            import pyarrow.compute as pc

            base = int(pc.min(runs["docID"]).as_py())
            fname = os.path.join(self.runs_dir, f"run-{base:012d}.parquet")
            tmp = f"{fname}.tmp-{uuid.uuid4().hex}"
            pq.write_table(runs, tmp, compression="zstd")
            os.rename(tmp, fname)
        return self._partials(runs)

    def _partials(self, runs: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dl = runs["dataLen"].to_numpy()
        # heavy candidates: per-batch density filter with 2x margin; when the
        # corpus size is unknown (callable corpora) the density cutoff is
        # meaningless, so return FULL per-batch counts (cutoff 1) and let the
        # driver's exact sum decide — routing-only either way, never
        # correctness (module docstring)
        flat = pc.list_flatten(runs["terms"].combine_chunks())
        vc = pc.value_counts(flat)
        counts = vc.field("counts").to_numpy()
        if self.approx_docs <= 0:
            cutoff = 1.0
        else:
            cutoff = max(1.0, self.threshold * len(dl) / (2.0 * self.approx_docs))
        keep = np.flatnonzero(counts >= cutoff)
        if self.approx_docs <= 0 and len(keep) > _CALLABLE_PARTIALS_CAP:
            # unknown corpus size -> cutoff 1 would ship the FULL per-batch
            # vocab to the driver (batches x vocab rows).  Cap to the top-M
            # by count: routing-only (a missed heavy term costs shuffle
            # skew, never correctness), and a globally heavy term is by
            # definition near the top of most batches' counts.
            top = np.argpartition(-counts[keep], _CALLABLE_PARTIALS_CAP - 1)[
                :_CALLABLE_PARTIALS_CAP
            ]
            keep = keep[top]
        cand_terms = vc.field("values").take(pa.array(keep)).cast(pa.large_binary())
        n_cand = len(keep)
        return pa.table(
            {
                "n": pa.array([len(dl)] + [0] * n_cand, pa.int64()),
                "sum_dl": pa.array([int(dl.sum()) if len(dl) else 0] + [0] * n_cand, pa.int64()),
                "max_dl": pa.array([int(dl.max()) if len(dl) else 0] + [0] * n_cand, pa.int64()),
                "term": pa.concat_arrays([pa.array([None], pa.large_binary()), cand_terms]),
                "df": pa.concat_arrays(
                    [
                        pa.array([0], pa.int64()),
                        pa.array(counts[keep].astype(np.int64), pa.int64()),
                    ]
                ),
            }
        )


# --------------------------------------------------------------------------
# phase 2: partition assignment (vectorized)
# --------------------------------------------------------------------------


def _binary_route_hash(col: pa.Array) -> np.ndarray:
    """Vectorized deterministic 64-bit routing hash of a large_binary array,
    computed straight from the Arrow buffers (no per-row python objects).

    Mixes length, first 8 bytes and last 4 bytes — NOT an identity hash;
    only used to spread terms across shuffle partitions (a collision just
    co-locates two terms, which is harmless).
    """
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buffers = col.buffers()
    offsets = np.frombuffer(
        buffers[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
    )
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    starts = offsets[:-1]
    lens = (offsets[1:] - starts).astype(np.uint64)
    h = lens * np.uint64(0xC2B2AE3D27D4EB4F)
    n = len(starts)
    for j in range(8):
        mask = lens > j
        byte = np.zeros(n, dtype=np.uint64)
        byte[mask] = data[starts[mask] + j]
        h = (h ^ (byte << np.uint64(8 * (j % 8)))) * np.uint64(0x9E3779B97F4A7C15)
    for j in range(4):  # last bytes disambiguate shared prefixes
        mask = lens > j
        byte = np.zeros(n, dtype=np.uint64)
        byte[mask] = data[offsets[1:][mask] - 1 - j]
        h ^= byte << np.uint64(8 * j + 16)
    return h


class AssignPartByDoc:
    """Shuffle key for the document-partitioned layout: contiguous docID
    ranges (part = docID * P // N).  No term skew by construction — every
    shard holds ~N/P docs of every term."""

    def __init__(self, P: int, n_docs: int):
        self.P = P
        self.N = max(1, n_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docids = batch["docID"].to_numpy().astype(np.uint64)
        part = np.minimum(
            (docids * np.uint64(self.P)) // np.uint64(self.N), self.P - 1
        ).astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))


class AssignPart:
    """Adds the shuffle key.  Normal terms: route_hash(term) % P.  Heavy
    terms are split by docID range into ``subparts`` segments with their own
    partition ids (explicit skew handling, SURVEY.md §4.2.2).  Fully
    vectorized: buffer hash + Arrow index_in for the heavy lookup."""

    def __init__(self, P: int, subparts: int, heavy_terms: list[bytes], n_docs: int):
        self.P = P
        self.S = subparts
        self.heavy_terms = sorted(heavy_terms)
        self.N = max(1, n_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        term_col = batch["term"].combine_chunks()
        part = (_binary_route_hash(term_col) % np.uint64(self.P)).astype(np.int64)
        if self.heavy_terms:
            ranks = pc.index_in(
                term_col, value_set=pa.array(self.heavy_terms, pa.large_binary())
            ).to_numpy(zero_copy_only=False)
            hmask = ~np.isnan(ranks.astype(np.float64))
            if hmask.any():
                docids = batch["docID"].to_numpy().astype(np.uint64)
                sub = (docids[hmask] * self.S) // self.N
                sub = np.minimum(sub, self.S - 1).astype(np.int64)
                part[hmask] = self.P + ranks[hmask].astype(np.int64) * self.S + sub
        return batch.append_column("part", pa.array(part, pa.int64()))


# --------------------------------------------------------------------------
# phase 3: per-partition encode
# --------------------------------------------------------------------------


def _compact_part_task(spec: pa.Table, min_fragments: int) -> pa.Table:
    """Rewrite one exchange partition's fragment files as a single file.

    write_parquet(partition_cols) leaves one fragment per (map task,
    partition) pair — O(tasks * P) files; at 10^12 docs that's a
    filesystem-killing file count, so partitions touched by more than
    ``min_fragments`` tasks are compacted to one file (O(P) total).

    Idempotent / crash-safe: the compacted file is tmp+renamed first, then
    fragments are deleted; a rerun that finds a ``compacted-`` file only
    finishes the deletes.
    """
    import glob as _glob

    part_dir = spec["src"][0].as_py()
    frags = sorted(_glob.glob(os.path.join(part_dir, "*.parquet")))
    done_marker = os.path.join(part_dir, "compacted-0.parquet")
    leftovers = [f for f in frags if not os.path.basename(f).startswith("compacted-")]
    if os.path.exists(done_marker):
        for f in leftovers:  # finish an interrupted fragment cleanup
            os.remove(f)
        return pa.table({"n_files": pa.array([1], pa.int64())})
    if len(leftovers) <= min_fragments:
        return pa.table({"n_files": pa.array([len(leftovers)], pa.int64())})
    merged = pa.concat_tables([pq.read_table(f) for f in leftovers])
    tmp = done_marker + f".tmp-{uuid.uuid4().hex}"
    pq.write_table(merged, tmp, compression="zstd")
    os.rename(tmp, done_marker)
    for f in leftovers:
        os.remove(f)
    return pa.table({"n_files": pa.array([1], pa.int64())})


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


def _encode_part_task(spec: pa.Table, out_dir: str, stats: dict) -> pa.Table:
    """Read one storage-shuffle partition dir and encode it."""
    src = spec["src"][0].as_py()
    part = int(spec["part"][0].as_py())
    part_dir = os.path.join(out_dir, "parts", f"part={part:05d}")
    if _done(part_dir):  # resume: partition already encoded
        return _metrics_row(part, part_dir, cached=True)
    group = pq.read_table(src, columns=["term", "docID", "tf", "dl"])
    return encode_partition(group, part, out_dir, stats)


def encode_partition(group: pa.Table, part: int, out_dir: str, stats: dict) -> pa.Table:
    """One partition's posting rows -> encoded segment on disk.

    Sorts by (term, docID) — the reference's std::map order + docID-ascending
    stream invariant (hw2/InvertedIndex.h:8, hw2/DataLoader.cpp:81-116) made
    explicit — then encodes each term's postings into the blocked format and
    writes the partition directory atomically (tmp dir + rename, resumable).

    The per-chunk BM25 upper bound uses the SEGMENT-local df: idf decreases
    in df and segment df <= global df, so the bound stays a true upper bound
    for block-max pruning (just looser on split heavy terms).
    """
    t0 = time.perf_counter()
    N, avgdl = stats["N"], stats["avgdl"]
    part_dir = os.path.join(out_dir, "parts", f"part={part:05d}")
    if _done(part_dir):
        return _metrics_row(part, part_dir, cached=True)

    import pyarrow.compute as pc

    group = group.sort_by([("term", "ascending"), ("docID", "ascending")])
    term_col = group["term"].combine_chunks()
    docids = group["docID"].to_numpy().astype(np.uint64)
    tfs = group["tf"].to_numpy().astype(np.uint64)
    dls = group["dl"].to_numpy().astype(np.uint64)
    n = len(docids)

    # C-speed run-length boundaries (no per-row python byte objects)
    enc = pc.dictionary_encode(term_col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy()
    starts = np.flatnonzero(np.concatenate(([True], codes[1:] != codes[:-1])))
    ends = np.concatenate((starts[1:], [n]))

    k1, b = BM25_K1, BM25_B
    # exact per-posting BM25 with segment df -> per-chunk upper bound,
    # computed for the WHOLE partition in one vectorized pass (seg_df per
    # row via repeat; chunk heads restart per segment)
    seg_df_arr = (ends - starts).astype(np.int64)
    seg_df_row = np.repeat(seg_df_arr, seg_df_arr).astype(np.float64)
    idf = np.log((N - seg_df_row + 0.5) / (seg_df_row + 0.5))
    K = k1 * ((1 - b) + b * dls.astype(np.float64) / avgdl)
    f64 = tfs.astype(np.float64)
    scores = idf * (k1 + 1) * f64 / (K + f64)
    ch = chunk_heads(starts, ends)
    chunk_ubs = np.maximum.reduceat(scores, ch).astype(np.float32) if len(ch) else np.zeros(0, np.float32)
    payload, seg_meta = encode_segments(docids, tfs, dls, starts, ends, chunk_ubs)
    lex_rows = {
        "term": term_col.take(pa.array(starts)),
        "df_seg": seg_df_arr,
        "first_docid": docids[starts],
        "last_docid": docids[ends - 1],
        "offset": seg_meta["offset"],
        "length": seg_meta["length"],
        "n_chunks": seg_meta["n_chunks"],
        "n_blocks": seg_meta["n_blocks"],
    }

    tmp_dir = part_dir + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "postings.bin"), "wb") as f:
        f.write(bytes(payload))
    lex = pa.table(
        {
            k: (
                v.cast(LEXICON_SCHEMA.field(k).type)
                if isinstance(v, (pa.Array, pa.ChunkedArray))
                else pa.array(v, LEXICON_SCHEMA.field(k).type)
            )
            for k, v in lex_rows.items()
        }
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
    extraction stage instead of trusting the text column (the two are
    byte-identical per the BASELINE.json invariant, which pytest pins).
    ``out_dir`` must be shared storage on a multi-node cluster (it is the
    shuffle medium and the checkpoint store).
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

    # rough doc count for the heavy-candidate density cutoff (exactness not
    # required — see module docstring); parquet footers are free to read
    if callable(corpus):
        approx_docs = 0  # unknown -> cutoff falls back to >=1 (full partials)
    else:
        from ..sources.corpus import list_corpus_files, rowgroup_specs

        approx_docs = sum(s["rows"] for s in rowgroup_specs(list_corpus_files(corpus)))

    threshold = cfg.heavy_df_threshold
    if threshold is None:
        threshold = max(65536, (4 * max(1, approx_docs)) // max(1, cfg.num_partitions))

    # ---- phase 1: tokenize -> runs + stats + heavy candidates -------------
    runs_dir = os.path.join(out_dir, "runs")
    stats_path = os.path.join(out_dir, "stats.json")
    heavy_path = os.path.join(out_dir, "heavy.parquet")
    if not _done(runs_dir):
        t0 = time.perf_counter()
        shutil.rmtree(runs_dir, ignore_errors=True)
        os.makedirs(runs_dir, exist_ok=True)
        tok = TokenizeWriteRuns(runs_dir, cfg.tokenizer_mode, threshold, approx_docs)
        if callable(corpus):
            ds = make_ds().map_batches(
                tok, batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
            )
        else:
            # fused fast path: read + (extract +) tokenize + side-write
            # inside ONE task per row group — the text/html bytes never
            # enter the object store.  from_html runs the extraction stage
            # in-task (the object-store detour cost a measured 1.4x on the
            # 50k bench before this; extraction itself is ~0.2 s/50k docs
            # single-threaded — see stages/extract.py)
            from ..sources.corpus import list_corpus_files, rowgroup_specs

            specs = rowgroup_specs(list_corpus_files(corpus))
            cols = ["url", "html"] if from_html else ["url", "text"]

            def fused(spec: pa.Table, _tok=tok) -> pa.Table:
                path = spec["path"][0].as_py()
                rg = spec["row_group"][0].as_py()
                base = spec["base"][0].as_py()
                t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
                if from_html:
                    t = ExtractText()(t)
                docids = pa.array(
                    np.arange(base, base + t.num_rows, dtype=np.uint64), pa.uint64()
                )
                return _tok(t.append_column("docID", docids))

            ds = ray.data.from_items(specs).map_batches(
                fused, batch_size=1, batch_format="pyarrow"
            )
        partials = ds.to_pandas()
        n_docs = int(partials["n"].sum())
        total_dl = int(partials["sum_dl"].sum())
        stats = {
            "N": n_docs,
            "total_dl": total_dl,
            # double -> uint32 truncation, hw3/DocTable.cpp:57-65 + DocTable.h:27
            "avgdl": int(total_dl / n_docs) if n_docs else 0,
            "max_dl": int(partials["max_dl"].max()) if len(partials) else 0,
        }
        cand = partials[partials["term"].notna()]
        sums = cand.groupby("term")["df"].sum() if len(cand) else pd.Series(dtype=np.int64)
        heavy = sums[sums > threshold // 2]  # margin: partials undercount
        heavy_tbl = pa.table(
            {
                "term": pa.array(list(heavy.index), pa.large_binary()),
                "df_approx": pa.array(heavy.to_numpy(np.int64), pa.int64()),
            }
        )
        with open(stats_path, "w") as f:
            json.dump(stats, f)
        pq.write_table(heavy_tbl, heavy_path)
        _mark(runs_dir)
        timings["runs"] = time.perf_counter() - t0
    with open(stats_path) as f:
        stats = json.load(f)
    heavy_terms = pq.read_table(heavy_path)["term"].to_pylist()

    # ---- phase 2: postings exchange via partitioned storage ---------------
    postings_dir = os.path.join(out_dir, "postings")
    if not _done(postings_dir):
        t0 = time.perf_counter()
        shutil.rmtree(postings_dir, ignore_errors=True)
        # coalesce the exchange's map side: fragments per partition equal the
        # number of write tasks, so reading the runs as ~2 blocks per core
        # (instead of one per file) keeps the fragment count low enough that
        # compaction is usually a no-op — same parallelism, zero extra I/O
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        posts = ray.data.read_parquet(
            runs_dir,
            columns=["docID", "dataLen", "terms", "tfs"],
            override_num_blocks=max(2, 2 * ncpu),
        ).map_batches(explode_postings, batch_format="pyarrow")
        if cfg.partition_by == "doc":
            assigner = AssignPartByDoc(cfg.num_partitions, stats["N"])
        else:
            assigner = AssignPart(
                cfg.num_partitions, cfg.heavy_subparts, heavy_terms, stats["N"]
            )
        posts = posts.map_batches(assigner, batch_format="pyarrow")
        # zstd: the exchange is disk-bandwidth-bound on slow storage; trading
        # CPU for bytes keeps the storage shuffle scalable (and the postings
        # stream compresses extremely well: sorted docIDs, repeated terms)
        posts.write_parquet(
            postings_dir,
            partition_cols=["part"],
            compression="zstd",
        )
        if cfg.compact_min_fragments:
            import glob as _glob

            cspecs = [
                {"src": d}
                for d in sorted(_glob.glob(os.path.join(postings_dir, "part=*")))
            ]
            ray.data.from_items(cspecs).map_batches(
                partial(_compact_part_task, min_fragments=cfg.compact_min_fragments),
                batch_size=1,
                batch_format="pyarrow",
            ).to_pandas()  # tiny: one row per partition
        _mark(postings_dir)
        timings["postings"] = time.perf_counter() - t0

    # ---- phase 3: per-partition encode ------------------------------------
    parts_root = os.path.join(out_dir, "parts")
    if not _done(parts_root):
        t0 = time.perf_counter()
        os.makedirs(parts_root, exist_ok=True)
        import glob as _glob

        part_dirs = sorted(_glob.glob(os.path.join(postings_dir, "part=*")))
        specs = [
            {"src": d, "part": int(os.path.basename(d).split("=")[1])}
            for d in part_dirs
        ]
        enc_kwargs = {}
        if cfg.encode_concurrency:
            # cap concurrent encode tasks (each holds one decoded partition
            # in heap; bound = concurrency x partition size)
            enc_kwargs["concurrency"] = cfg.encode_concurrency
        enc = ray.data.from_items(specs).map_batches(
            partial(_encode_part_task, out_dir=out_dir, stats=stats),
            batch_size=1,
            batch_format="pyarrow",
            **enc_kwargs,
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
        "heavy_terms": len(heavy_terms),
        "heavy_df_threshold": threshold,
        "timings_sec": {k: round(v, 3) for k, v in timings.items()},
        "format_version": 2,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
