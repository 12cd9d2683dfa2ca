"""Incremental index extension — ingest a new crawl batch into an existing
index without rebuilding from scratch.

This is the daily operation of a production index at 100 TB: the corpus
grows by a delta (a new crawl, a new dump partition) and re-tokenizing /
re-exchanging the base corpus for every delta is unaffordable.  The build's
storage-is-the-shuffle layout makes extension natural: the ``runs/``
checkpoint, the ``postings/`` exchange and the ``parts/`` segments are all
durable, so an extension only ADDS to them.

Two strategies, chosen by the index's ``partition_by`` layout:

* ``doc`` (append-only, O(delta) work): the delta's contiguous docID range
  [N_old, N_old+M) maps to BRAND-NEW partitions — base parts are never
  touched.  Phase 1 tokenizes only the delta (runs files append into
  ``runs/``; their filenames are keyed by min docID, so they cannot collide
  with base files and a retry overwrites rather than duplicates).  Phase 2
  exchanges only the delta postings into new ``postings/part=K`` dirs;
  phase 3 encodes only those.  Serving stays exact for the exhaustive and
  conjunctive modes because every per-posting score is computed at query
  time from the (updated) global stats and the summed segment dfs.  The
  ONE thing that goes stale is the baked per-chunk BM25 upper bound in the
  BASE parts: idf = ln((N-df+.5)/(df+.5)) grows with N, so a bound computed
  at N_old is no longer an upper bound at N_new and MaxScore pruning over
  it would be unsound.  The manifest records ``stale_ubs: true`` and the
  query engine silently serves ``disjunctive_pruned`` as exhaustive until
  ``refresh_bounds`` re-encodes (results identical either way — pruning is
  an optimization, never a semantic).

* ``term`` (append-only generation partitions, O(delta) work): delta
  postings rows are routed with the SAME assigner params as the base build
  (hash(term)%P; heavy terms keep the base heavy list, their >=N_old
  docIDs clip into the last docID sub-segment — routing is correctness-
  neutral) but into BRAND-NEW partition ids offset past every existing
  one, and phase 3 encodes only those — base partitions are never read,
  never rewritten, never unavailable.  A term's postings now live in one
  segment per generation; the segments are docID-disjoint by construction
  (delta docIDs start at N_old), and the scorer's segment machinery
  already merges multi-segment terms in first_docid order (heavy terms
  work exactly this way), with global df = sum of segment dfs staying
  exact.  Base partitions keep their old-stats chunk bounds, so
  ``stale_ubs`` stays set exactly as in the doc layout (pruned mode
  silently serves exhaustive — identical results) until the opt-in
  ``refresh_bounds`` re-bakes every bound at the new stats.  Cost:
  tokenize + exchange + encode of the DELTA only — the per-generation
  price is one extra (seek+read) per queried term per generation;
  ``consolidate_generations`` re-merges generations at O(sum of deltas)
  when fragmentation matters (auto-triggered by ``extend_index``'s
  ``max_generations`` knob; latency-vs-generations measured in
  BASELINE.md), and ``compact_index`` remains the full tombstone-
  removing rebuild.

Both strategies serve BIT-IDENTICAL search results to a from-scratch
rebuild of the concatenated corpus (tests/test_extend.py pins this for
every query mode, single-node and sharded).

Serving DURING an extension (either layout) is a documented maintenance
window, not a correctness hole: ``stale_ubs`` is published before the new
stats (crash-window ordering, pinned by test_stale_ubs_visible_before_new
_stats) so pruning is never unsound, and the worst mid-window observation
is the new stats with not-yet-encoded delta partitions — delta docIDs then
surface only as zero-score pad rows until their parts land.  We keep the
stats-before-parts order deliberately: the reverse (parts before stats)
would let the scorer read delta docIDs >= stats.N, which it does not
guard; zero-pad phantoms are benign, out-of-range docIDs are not.

Resume: each extension generation keeps its phase markers under
``ext_genNNN/``; an interrupted extension is resumed by calling
``extend_index`` again with the same delta corpus (a corpus fingerprint is
stamped and verified).  ``stats.json`` is always recomputed as
base stats + the sum of all completed generations' durable delta stats, so
a crash between phases can never double-count.
"""
from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
from functools import partial
from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import BuildConfig
from ..stages.tokenize_stage import explode_postings
from .build import (
    AssignPart,
    TokenizeWriteRuns,
    _compact_part_task,
    _encode_part_task,
)


def _enc_kwargs(cfg: BuildConfig) -> dict:
    """map_batches kwargs for encode stages: cap concurrency when the
    config bounds per-node heap (each task holds one decoded partition)."""
    return {"concurrency": cfg.encode_concurrency} if cfg.encode_concurrency else {}


def _exchange_paths(a: str, b: str) -> bool:
    """Atomically exchange two paths with renameat2(RENAME_EXCHANGE)
    (Linux >= 3.15).  Returns False when the syscall is unavailable or
    unsupported by the filesystem so the caller can fall back."""
    import ctypes

    try:
        libc = ctypes.CDLL(None, use_errno=True)
        fn = libc.renameat2
    except (OSError, AttributeError):
        return False
    AT_FDCWD = -100
    RENAME_EXCHANGE = 2
    r = fn(
        ctypes.c_int(AT_FDCWD),
        os.fsencode(a),
        ctypes.c_int(AT_FDCWD),
        os.fsencode(b),
        ctypes.c_uint(RENAME_EXCHANGE),
    )
    if r == 0:
        return True
    err = ctypes.get_errno()
    import errno

    if err in (errno.EINVAL, errno.ENOSYS, errno.ENOTSUP):
        return False  # kernel/fs doesn't support EXCHANGE
    raise OSError(err, os.strerror(err), a)


def _encode_parts_staged(
    index_dir: str, specs: list[dict], stats: dict, cfg: BuildConfig, staging_root: str
) -> None:
    """Re-encode partitions WITHOUT a serving gap: encode every spec into
    ``staging_root/parts/part=K`` (the normal atomic per-partition encode,
    resumable via its _SUCCESS marker), then swap each into the live
    ``parts/`` — atomically via renameat2(RENAME_EXCHANGE) where the
    kernel/fs supports it (this sandbox does), else two renames whose
    window is two syscalls wide (documented residual: a SearchEngine
    CONSTRUCTED inside that fallback window could miss the partition; an
    engine holding open files is unaffected on POSIX).  ``swap-*`` markers
    in ``staging_root`` make the swap idempotent across crashes (an
    already-swapped partition is not re-encoded on resume)."""
    import ray
    import ray.data

    todo = [
        s
        for s in specs
        if not _flag(os.path.join(staging_root, f"swap-{int(s['part']):05d}.done"))
    ]
    if not todo:
        return
    os.makedirs(staging_root, exist_ok=True)
    ray.data.from_items(todo).map_batches(
        partial(_encode_part_task, out_dir=staging_root, stats=stats),
        batch_size=1,
        batch_format="pyarrow",
        **_enc_kwargs(cfg),
    ).to_pandas()
    parts_root = os.path.join(index_dir, "parts")
    os.makedirs(parts_root, exist_ok=True)
    for s in todo:
        name = f"part={int(s['part']):05d}"
        src = os.path.join(staging_root, "parts", name)
        dst = os.path.join(parts_root, name)
        trash = os.path.join(staging_root, f"old-{name}")
        shutil.rmtree(trash, ignore_errors=True)
        if os.path.isdir(dst):
            # crash-idempotency of the EXCHANGE path: strip the live dir's
            # _SUCCESS first, so if we crash after the exchange but before
            # the swap marker, the OLD encode now sitting in staging is NOT
            # a valid cached encode — the resume re-encodes it fresh instead
            # of swapping stale-stats bounds back live (which refresh_bounds
            # would then unsoundly clear stale_ubs over).  The new encode
            # keeps its own _SUCCESS through the swap, and the scorer never
            # reads the marker, so serving is unaffected either way.
            try:
                os.remove(os.path.join(dst, "_SUCCESS"))
            except FileNotFoundError:
                pass
            if _exchange_paths(src, dst):  # atomic: no missing-dir window
                os.rename(src, trash)  # src now holds the OLD encode
            else:
                os.rename(dst, trash)
                os.rename(src, dst)
        else:
            os.rename(src, dst)
        shutil.rmtree(trash, ignore_errors=True)
        _touch(os.path.join(staging_root, f"swap-{int(s['part']):05d}.done"))


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned docIDs (uint64) — the single reader the
    scorer, delete_docs and compact_index all share."""
    files = glob.glob(os.path.join(index_dir, "tombstones", "*.parquet"))
    if not files:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.concatenate(
            [
                pq.read_table(f, columns=["doc_id"])["doc_id"]
                .to_numpy(zero_copy_only=False)
                .astype(np.uint64)
                for f in files
            ]
        )
    )


def _flag(path: str) -> bool:
    return os.path.exists(path)


def _touch(path: str) -> None:
    with open(path, "w") as f:
        f.write("ok\n")


def _corpus_fingerprint(corpus) -> str:
    """Stable id of a delta corpus: file list + row counts for parquet
    paths; for callables, the qualname + code bytes + repr of closure cell
    values — so two closures from the same factory with different
    parameters (the q_bm25_extend _slice pattern) get DIFFERENT
    fingerprints and the mid-generation corpus guard actually bites.
    Best-effort: a callable whose behavior depends on external state the
    closure does not capture is the caller's responsibility."""
    if callable(corpus):
        h = hashlib.md5(getattr(corpus, "__qualname__", repr(corpus)).encode())
        code = getattr(corpus, "__code__", None)
        if code is not None:
            h.update(code.co_code)
        for cell in getattr(corpus, "__closure__", None) or ():
            try:
                h.update(repr(cell.cell_contents).encode())
            except ValueError:  # empty cell
                h.update(b"<empty>")
        # parameters can also arrive as defaults rather than closure cells
        # (factories that bake arguments into def f(x, lo=lo): ...) — fold
        # them in so same-factory callables differing only by defaults get
        # distinct fingerprints
        h.update(repr(getattr(corpus, "__defaults__", None)).encode())
        h.update(repr(getattr(corpus, "__kwdefaults__", None)).encode())
        return f"callable:{h.hexdigest()}"
    from ..sources.corpus import list_corpus_files, rowgroup_specs

    specs = rowgroup_specs(list_corpus_files(corpus))
    h = hashlib.md5()
    for s in specs:
        h.update(f"{os.path.basename(s['path'])}:{s['rows']};".encode())
    return h.hexdigest()


def _load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _dump_json(obj: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f, indent=1)


def _fold_stats(base: dict, deltas: list[dict]) -> dict:
    n = base["N"] + sum(d["n"] for d in deltas)
    total = base["total_dl"] + sum(d["sum_dl"] for d in deltas)
    max_dl = max([base["max_dl"]] + [d["max_dl"] for d in deltas])
    return {
        "N": n,
        "total_dl": total,
        # same double -> uint32 truncation as build_index
        "avgdl": int(total / n) if n else 0,
        "max_dl": max_dl,
    }


def _live_max_part(manifest: dict, cfg: BuildConfig) -> int:
    """Largest partition id the manifest accounts for: the base layout's
    ceiling (term layout: P + n_heavy*S sub-partitions; doc layout: P) plus
    every recorded extension's parts.  Partition dirs ABOVE this are
    orphans of an abandoned generation — never part of the served index."""
    if cfg.partition_by == "doc":
        base_max = cfg.num_partitions - 1
    else:
        base_max = (
            cfg.num_partitions
            + int(manifest.get("heavy_terms", 0)) * cfg.heavy_subparts
            - 1
        )
    ext_parts = [p for e in manifest.get("extensions", []) for p in e["parts"]]
    return max([base_max, *ext_parts])


def _delta_run_files(runs_dir: str, lo: int) -> list[str]:
    """Run files whose min docID >= ``lo`` — exactly the current
    generation's files (earlier docIDs are base/earlier gens; later gens
    do not exist while this one is in flight)."""
    out = []
    for p in sorted(glob.glob(os.path.join(runs_dir, "run-*.parquet"))):
        base = int(os.path.basename(p)[len("run-"):-len(".parquet")])
        if base >= lo:
            out.append(p)
    return out


def _formula_ranges(n: int, P: int, lo: int = 0, parts0: int = 0) -> dict[str, list[int]]:
    """Contiguous docID ranges of ``P`` partitions over [lo, lo+n) —
    the exact inverse of the (docID - lo) * P // n assignment."""
    out = {}
    for p in range(P):
        a = lo + (p * n + P - 1) // P
        b = lo + ((p + 1) * n + P - 1) // P
        out[str(parts0 + p)] = [a, b]
    return out


class _AssignDeltaPartByDoc:
    """Shuffle key for a doc-layout delta: contiguous ranges of the delta's
    docID span [lo, hi) map onto ``P`` brand-new partitions starting at
    ``part0`` — base partitions are never written to."""

    def __init__(self, part0: int, P: int, lo: int, hi: int):
        self.part0, self.P, self.lo, self.n = part0, P, lo, max(1, hi - lo)

    def __call__(self, batch: pa.Table) -> pa.Table:
        d = batch["docID"].to_numpy().astype(np.int64)
        part = self.part0 + np.minimum((d - self.lo) * self.P // self.n, self.P - 1)
        return batch.append_column("part", pa.array(part, pa.int64()))


def extend_index(
    index_dir: str,
    corpus: str | list[str] | Callable[[], "ray.data.Dataset"],  # noqa: F821
    delta_partitions: int | None = None,
    from_html: bool = False,
    max_generations: int | None = None,
) -> dict:
    """Ingest ``corpus`` as the next generation of an existing index.

    Parquet corpora are enumerated with docIDs starting at the index's
    current N; a callable corpus must attach globally-correct docIDs
    itself (contiguous, starting at current N — asserted).
    ``delta_partitions`` (doc layout only) overrides the number of new
    partitions; default keeps delta partition sizes ~equal to base ones.
    ``from_html=True`` extracts the text from the delta's html column
    (same byte-exact stage as build_index).  ``max_generations``: when
    the number of recorded extension generations exceeds it after this
    ingest, ``consolidate_generations`` runs automatically — the
    auto-compaction policy for per-generation cost (term layout: one
    extra seek+decode per queried term per generation, measured in
    BASELINE.md's latency-vs-generations table; doc layout: shard
    fragmentation of the scatter-gather fan-out).  Returns the updated
    manifest.
    """
    import time

    import ray
    import ray.data

    finish_pending_consolidation(index_dir)
    timings: dict[str, float] = {}
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = _load_json(manifest_path)
    cfg = BuildConfig(**manifest["config"])
    stats_path = os.path.join(index_dir, "stats.json")
    base_stats_path = os.path.join(index_dir, "stats_base.json")
    if not os.path.exists(base_stats_path):
        # first extension: preserve the original build's stats as the fold
        # base (stats.json becomes a derived value from here on)
        shutil.copyfile(stats_path, base_stats_path)
    base_stats = _load_json(base_stats_path)

    # ---- generation discovery / resume ------------------------------------
    fingerprint = _corpus_fingerprint(corpus)
    done_exts = list(manifest.get("extensions", []))
    prior_deltas: list[dict] = []
    gen = 1
    for e in done_exts:
        prior_deltas.append(e["delta_stats"])
        gen = e["gen"] + 1
    gen_dir = os.path.join(index_dir, f"ext_gen{gen:03d}")
    corpus_stamp = os.path.join(gen_dir, "corpus.json")
    if os.path.exists(corpus_stamp):
        stamped = _load_json(corpus_stamp)["fingerprint"]
        if stamped != fingerprint:
            raise ValueError(
                f"generation {gen} is mid-flight for a different corpus "
                f"({stamped} != {fingerprint}); finish or remove {gen_dir}"
            )
    if not os.path.exists(corpus_stamp):
        # starting a FRESH generation: sweep orphan partition dirs left by
        # an abandoned one (operator removed ext_genNNN per the error
        # advice above, but its exchanged postings/encoded parts remained).
        # Anything above the manifest-recorded ceiling is unreachable by
        # the served index and must not survive into refresh_bounds.
        live_max = _live_max_part(manifest, cfg)
        for root in (
            os.path.join(index_dir, "postings"),
            os.path.join(index_dir, "parts"),
        ):
            for d in glob.glob(os.path.join(root, "part=*")):
                if int(os.path.basename(d).split("=")[1]) > live_max:
                    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(gen_dir, exist_ok=True)
    _dump_json({"fingerprint": fingerprint}, corpus_stamp)

    n_before = base_stats["N"] + sum(d["n"] for d in prior_deltas)
    runs_dir = os.path.join(index_dir, "runs")
    postings_dir = os.path.join(index_dir, "postings")
    parts_root = os.path.join(index_dir, "parts")

    # ---- phase 1: tokenize the delta into runs/ ---------------------------
    p1_marker = os.path.join(gen_dir, "phase_runs.done")
    delta_stats_path = os.path.join(gen_dir, "delta_stats.json")
    if not _flag(p1_marker):
        t0 = time.perf_counter()
        # retry hygiene: drop any partial delta run files (filenames key on
        # min docID, so >= n_before means "this generation")
        for p in _delta_run_files(runs_dir, n_before):
            os.remove(p)
        tok = TokenizeWriteRuns(
            runs_dir,
            cfg.tokenizer_mode,
            manifest.get("heavy_df_threshold", 1 << 62),  # heavy list is frozen
            approx_docs=0,
            # rejects any batch with docIDs below n_before INSIDE the map,
            # before its run file is written — a bad callable can therefore
            # never overwrite base/earlier-generation run files
            min_docid=n_before,
        )
        if callable(corpus):
            ds = corpus().map_batches(
                tok, batch_format="pyarrow", batch_size=cfg.tokenize_batch_size
            )
        else:
            from ..sources.corpus import list_corpus_files, rowgroup_specs

            specs = rowgroup_specs(list_corpus_files(corpus))

            cols = ["url", "html"] if from_html else ["url", "text"]

            def fused(spec: pa.Table, _tok=tok) -> pa.Table:
                path = spec["path"][0].as_py()
                rg = spec["row_group"][0].as_py()
                base = spec["base"][0].as_py() + n_before  # offset into the index
                t = pq.ParquetFile(path).read_row_group(rg, columns=cols)
                if from_html:
                    from ..stages.extract import ExtractText

                    t = ExtractText()(t)
                docids = pa.array(
                    np.arange(base, base + t.num_rows, dtype=np.uint64), pa.uint64()
                )
                return _tok(t.append_column("docID", docids))

            ds = ray.data.from_items(specs).map_batches(
                fused, batch_size=1, batch_format="pyarrow"
            )
        partials = ds.to_pandas()
        delta = {
            "n": int(partials["n"].sum()),
            "sum_dl": int(partials["sum_dl"].sum()),
            "max_dl": int(partials["max_dl"].max()) if len(partials) else 0,
        }
        if callable(corpus) and delta["n"]:
            # a callable owns its docIDs: verify they EXACTLY continue the
            # index.  One docID-column read per file (delta-sized IO, one
            # file's ids held at a time): per-file uniqueness + pairwise-
            # disjoint file ranges + total count + global endpoints together
            # force the set to be exactly [n_before, n_before+m) — count +
            # endpoints alone would accept a duplicate-plus-gap interior
            # (e.g. [100, 101, 101, 103]), a gap-shifted range, or overlap
            # between batches (per-batch floor violations were already
            # rejected inside the map, before any file write)
            files = _delta_run_files(runs_dir, n_before)
            n_file_rows = 0
            lo = hi = None
            ranges: list[tuple[int, int, str]] = []
            for p in files:
                ids = (
                    pq.read_table(p, columns=["docID"])["docID"]
                    .combine_chunks()
                    .to_numpy(zero_copy_only=False)
                )
                n_file_rows += len(ids)
                if len(np.unique(ids)) != len(ids):
                    raise ValueError(
                        f"callable delta corpus produced duplicate docIDs "
                        f"(run file {os.path.basename(p)})"
                    )
                fmin, fmax = int(ids.min()), int(ids.max())
                ranges.append((fmin, fmax, p))
                lo = fmin if lo is None else min(lo, fmin)
                hi = fmax if hi is None else max(hi, fmax)
            ranges.sort()
            for (_, a_hi, a_p), (b_lo, _, b_p) in zip(ranges, ranges[1:]):
                if b_lo <= a_hi:
                    raise ValueError(
                        f"callable delta corpus batches overlap in docID "
                        f"ranges: {os.path.basename(a_p)} and "
                        f"{os.path.basename(b_p)}"
                    )
            want_hi = n_before + delta["n"] - 1
            if n_file_rows != delta["n"] or lo != n_before or hi != want_hi:
                raise ValueError(
                    f"callable delta corpus docIDs must be contiguous in "
                    f"[{n_before}, {want_hi}]: got {n_file_rows} rows "
                    f"(expected {delta['n']}) spanning [{lo}, {hi}]"
                )
        _dump_json(delta, delta_stats_path)
        _touch(p1_marker)
        timings["runs"] = time.perf_counter() - t0
    delta_stats = _load_json(delta_stats_path)
    m = delta_stats["n"]
    new_stats = _fold_stats(base_stats, prior_deltas + [delta_stats])
    if m > 0 and not manifest.get("stale_ubs"):
        # ORDER MATTERS: once stats.json says N_new, every baked chunk
        # bound (computed at N_old) is no longer a sound upper bound, so
        # the pruning gate must be visible FIRST — otherwise a crash (or a
        # concurrently restarting actor) between the two writes would
        # serve unsound MaxScore pruning.  Both layouts keep the flag
        # until the opt-in refresh_bounds re-bakes every chunk bound.
        manifest["stale_ubs"] = True
        _dump_json(manifest, manifest_path)
    _dump_json(new_stats, stats_path)
    if m == 0:  # empty delta: record the generation and return
        record = {"gen": gen, "kind": cfg.partition_by, "delta_stats": delta_stats,
                  "doc_lo": n_before, "doc_hi": n_before, "parts": []}
        manifest["extensions"] = done_exts + [record]
        manifest["stats"] = new_stats
        _dump_json(manifest, manifest_path)
        _touch(os.path.join(gen_dir, "done"))
        return manifest

    delta_files = _delta_run_files(runs_dir, n_before)

    def _delta_posts():
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        return ray.data.read_parquet(
            delta_files,
            columns=["docID", "dataLen", "terms", "tfs"],
            override_num_blocks=max(2, 2 * ncpu),
        ).map_batches(explode_postings, batch_format="pyarrow")

    p2_marker = os.path.join(gen_dir, "phase_postings.done")
    p3_marker = os.path.join(gen_dir, "phase_parts.done")

    if cfg.partition_by == "doc":
        # ---- doc layout: delta -> brand-new partitions --------------------
        # next free id from the MANIFEST ceiling (same contract as the
        # term layout) — the old P + sum(len(parts)) formula assumed
        # generations occupy contiguous ids from P, which a prior
        # consolidation breaks (its merged ids jump past the old
        # ceiling); colliding with them here would let the retry
        # hygiene below rmtree LIVE merged partitions
        part0 = _live_max_part(manifest, cfg) + 1
        explicit = delta_partitions is not None
        if delta_partitions is None:
            # keep delta partitions ~the size of base ones
            per_part = max(1, base_stats["N"] // cfg.num_partitions)
            delta_partitions = max(1, (m + per_part - 1) // per_part)
        # the resolved values are part of the generation's layout: a
        # resume MUST reuse them (a different delta_partitions would
        # leave phase-2-routed partitions unencoded and record wrong
        # doc_ranges; a different part0 would orphan routed partitions)
        layout_stamp = os.path.join(gen_dir, "layout.json")
        if os.path.exists(layout_stamp):
            stamped = _load_json(layout_stamp)
            stamped_p = stamped["delta_partitions"]
            if explicit and stamped_p != delta_partitions:
                raise ValueError(
                    f"generation {gen} was started with delta_partitions="
                    f"{stamped_p}; resume with the same value (got "
                    f"{delta_partitions})"
                )
            delta_partitions = stamped_p
            part0 = stamped.get("part0", part0)
        else:
            _dump_json(
                {"delta_partitions": delta_partitions, "part0": part0},
                layout_stamp,
            )
        new_parts = list(range(part0, part0 + delta_partitions))
        staging = os.path.join(gen_dir, "postings")
        if not _flag(p2_marker):
            t0 = time.perf_counter()
            shutil.rmtree(staging, ignore_errors=True)
            for p in new_parts:  # retry hygiene: partial moves + encodes
                shutil.rmtree(os.path.join(postings_dir, f"part={p}"), ignore_errors=True)
                shutil.rmtree(os.path.join(parts_root, f"part={p:05d}"), ignore_errors=True)
            assigner = _AssignDeltaPartByDoc(
                part0, delta_partitions, n_before, n_before + m
            )
            _delta_posts().map_batches(assigner, batch_format="pyarrow").write_parquet(
                staging, partition_cols=["part"], compression="zstd"
            )
            if cfg.compact_min_fragments:
                cspecs = [
                    {"src": d}
                    for d in sorted(glob.glob(os.path.join(staging, "part=*")))
                ]
                ray.data.from_items(cspecs).map_batches(
                    partial(_compact_part_task, min_fragments=cfg.compact_min_fragments),
                    batch_size=1,
                    batch_format="pyarrow",
                ).to_pandas()
            for d in sorted(glob.glob(os.path.join(staging, "part=*"))):
                os.rename(d, os.path.join(postings_dir, os.path.basename(d)))
            _touch(p2_marker)
            timings["postings"] = time.perf_counter() - t0
        if not _flag(p3_marker):
            t0 = time.perf_counter()
            specs = [
                {"src": os.path.join(postings_dir, f"part={p}"), "part": p}
                for p in new_parts
                if os.path.isdir(os.path.join(postings_dir, f"part={p}"))
            ]
            if specs:
                ray.data.from_items(specs).map_batches(
                    partial(_encode_part_task, out_dir=index_dir, stats=new_stats),
                    batch_size=1,
                    batch_format="pyarrow",
                    **_enc_kwargs(cfg),
                ).to_pandas()
            _touch(p3_marker)
            timings["parts"] = time.perf_counter() - t0
        ranges = _formula_ranges(base_stats["N"], cfg.num_partitions)
        for e in done_exts:
            if e["parts"]:
                ranges.update(
                    _formula_ranges(
                        e["doc_hi"] - e["doc_lo"], len(e["parts"]), e["doc_lo"],
                        min(int(p) for p in e["parts"]),
                    )
                )
        ranges.update(_formula_ranges(m, delta_partitions, n_before, part0))
        manifest["doc_ranges"] = ranges
        # base parts' baked chunk bounds were computed at the old N/avgdl;
        # idf grows with N, so they are no longer sound upper bounds
        manifest["stale_ubs"] = True
        record_parts = new_parts
    else:
        # ---- term layout: delta -> new generation partitions ---------------
        heavy_terms = pq.read_table(os.path.join(index_dir, "heavy.parquet"))[
            "term"
        ].to_pylist()
        # next free partition id past base + every RECORDED generation,
        # derived from the MANIFEST, never the filesystem: a filesystem max
        # would (a) collide with orphan dirs of an abandoned generation and
        # (b) collapse to 0 if postings/ were missing, letting the retry
        # hygiene below rmtree live base parts.  A resume MUST reuse the
        # stamped value (same contract as the doc layout).
        layout_stamp = os.path.join(gen_dir, "layout.json")
        if os.path.exists(layout_stamp):
            part0 = _load_json(layout_stamp)["part0"]
        else:
            part0 = _live_max_part(manifest, cfg) + 1
            _dump_json({"part0": part0}, layout_stamp)
        staging = os.path.join(gen_dir, "postings")
        if not _flag(p2_marker):
            t0 = time.perf_counter()
            shutil.rmtree(staging, ignore_errors=True)
            for d in glob.glob(os.path.join(postings_dir, "part=*")):
                if int(os.path.basename(d).split("=")[1]) >= part0:
                    shutil.rmtree(d, ignore_errors=True)  # retry hygiene
            for d in glob.glob(os.path.join(parts_root, "part=*")):
                if int(os.path.basename(d).split("=")[1]) >= part0:
                    shutil.rmtree(d, ignore_errors=True)
            # base assigner params (incl. the base N for heavy docID-range
            # splitting): delta docIDs >= N_old clip into the last heavy
            # sub-segment — routing-neutral, segments stay docID-disjoint;
            # the generation offset keeps a stable term->partition-set map
            # (term t lives in parts {g_part0 + assign(t)} per generation)
            assigner = AssignPart(
                cfg.num_partitions, cfg.heavy_subparts, heavy_terms, base_stats["N"]
            )

            def offset_part(t: pa.Table, _a=assigner, _p0=part0) -> pa.Table:
                t = _a(t)
                i = t.schema.get_field_index("part")
                return t.set_column(
                    i, "part", pc.add(t["part"], pa.scalar(_p0, pa.int64()))
                )

            _delta_posts().map_batches(
                offset_part, batch_format="pyarrow"
            ).write_parquet(staging, partition_cols=["part"], compression="zstd")
            if cfg.compact_min_fragments:
                cspecs = [
                    {"src": d}
                    for d in sorted(glob.glob(os.path.join(staging, "part=*")))
                ]
                ray.data.from_items(cspecs).map_batches(
                    partial(_compact_part_task, min_fragments=cfg.compact_min_fragments),
                    batch_size=1,
                    batch_format="pyarrow",
                ).to_pandas()
            for d in sorted(glob.glob(os.path.join(staging, "part=*"))):
                os.rename(d, os.path.join(postings_dir, os.path.basename(d)))
            _touch(p2_marker)
            timings["postings"] = time.perf_counter() - t0
        new_parts = sorted(
            int(os.path.basename(d).split("=")[1])
            for d in glob.glob(os.path.join(postings_dir, "part=*"))
            if int(os.path.basename(d).split("=")[1]) >= part0
        )
        if not _flag(p3_marker):
            t0 = time.perf_counter()
            # O(delta): encode ONLY the generation's partitions — brand-new
            # dirs, so the standard atomic per-part encode suffices (no
            # serving swap needed; base parts are never touched)
            specs = [
                {"src": os.path.join(postings_dir, f"part={p}"), "part": p}
                for p in new_parts
            ]
            if specs:
                ray.data.from_items(specs).map_batches(
                    partial(_encode_part_task, out_dir=index_dir, stats=new_stats),
                    batch_size=1,
                    batch_format="pyarrow",
                    **_enc_kwargs(cfg),
                ).to_pandas()
            _touch(p3_marker)
            timings["parts"] = time.perf_counter() - t0
        # stale_ubs stays SET (phase 1): base partitions still carry bounds
        # baked at the old stats; refresh_bounds is the opt-in re-bake that
        # restores pruned mode (results identical either way)
        record_parts = new_parts

    record = {
        "gen": gen,
        "kind": cfg.partition_by,
        "delta_stats": delta_stats,
        "doc_lo": n_before,
        "doc_hi": n_before + m,
        "parts": record_parts,
        # explicit slot origin: part_id - part0 is the base assigner slot
        # (consolidation depends on it; the _gen_part0s ceiling walk is
        # the fallback for records written before this field existed)
        "part0": part0,
        "timings_sec": {k: round(v, 3) for k, v in timings.items()},
    }
    manifest["extensions"] = done_exts + [record]
    manifest["stats"] = new_stats
    _dump_json(manifest, manifest_path)
    _touch(os.path.join(gen_dir, "done"))
    if (
        max_generations is not None
        and sum(1 for e in manifest["extensions"] if e["parts"]) > max_generations
    ):
        manifest = consolidate_generations(index_dir)
    return manifest


def delete_docs(index_dir: str, doc_ids) -> int:
    """Tombstone documents: they vanish from every query result immediately
    (postings filtered at decode, zero-pad pool skips them — scorer.py),
    while N/avgdl/df keep the stored values until a compacting rebuild —
    the standard delete semantics of segment-based indexes (Lucene-style).

    Idempotent: the tombstone file is named by the content hash of the id
    set, so re-issuing the same delete writes the same file.  Returns the
    total tombstone count.  Compaction = rebuild from a corpus with the
    docs removed (docIDs renumber; tombstones then reset).
    """
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.uint64))
    tomb_dir = os.path.join(index_dir, "tombstones")
    os.makedirs(tomb_dir, exist_ok=True)
    if len(ids):
        name = hashlib.md5(ids.tobytes()).hexdigest()[:16]
        path = os.path.join(tomb_dir, f"del-{name}.parquet")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            pq.write_table(pa.table({"doc_id": pa.array(ids, pa.uint64())}), tmp)
            os.rename(tmp, path)
    return int(len(load_tombstones(index_dir)))


def compact_index(index_dir: str, out_dir: str, cfg=None) -> dict:
    """Rewrite the index WITHOUT its tombstoned documents: survivors keep
    their order but docIDs renumber densely, stats/dfs/chunk bounds are
    recomputed, and the new index starts with zero tombstones — search
    results over it equal a from-scratch build of the corpus with the
    deleted docs removed (tests/test_extend.py pins this).

    Never re-tokenizes: the old ``runs/`` checkpoint is filtered and
    renumbered with one streaming map (new docID = old - #deleted <= old,
    a searchsorted against the broadcast tombstone array — the same
    driver-side envelope the scorer already holds), then the standard
    phase-2/3 machinery runs over the new runs.  ``cfg`` defaults to the
    source index's BuildConfig.
    """
    import ray
    import ray.data

    from .build import build_index

    manifest = _load_json(os.path.join(index_dir, "manifest.json"))
    cfg = cfg or BuildConfig(**manifest["config"])
    deleted = load_tombstones(index_dir)

    os.makedirs(out_dir, exist_ok=True)
    new_runs = os.path.join(out_dir, "runs")
    stats_path = os.path.join(out_dir, "stats.json")
    heavy_path = os.path.join(out_dir, "heavy.parquet")
    from .build import _done, _mark

    if not _done(new_runs):
        shutil.rmtree(new_runs, ignore_errors=True)
        os.makedirs(new_runs, exist_ok=True)
        dref = ray.put(deleted)

        def renumber(t: pa.Table) -> pa.Table:
            import uuid

            dd = ray.get(dref)
            ids = t["docID"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if len(dd):
                pos = np.searchsorted(dd, ids)
                pos_c = np.minimum(pos, len(dd) - 1)
                keep = dd[pos_c] != ids
                t = t.filter(pa.array(keep))
                ids = ids[keep]
                new_ids = ids - np.searchsorted(dd, ids, side="right").astype(np.uint64)
            else:
                new_ids = ids
            t = t.set_column(
                t.schema.get_field_index("docID"), "docID",
                pa.array(new_ids, pa.uint64()),
            )
            if t.num_rows:
                base = int(new_ids.min())
                fname = os.path.join(new_runs, f"run-{base:012d}.parquet")
                tmp = f"{fname}.tmp-{uuid.uuid4().hex}"
                pq.write_table(t, tmp, compression="zstd")
                os.rename(tmp, fname)
                dl = t["dataLen"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "n": pa.array([t.num_rows], pa.int64()),
                        "sum_dl": pa.array([int(dl.sum())], pa.int64()),
                        "max_dl": pa.array([int(dl.max())], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "n": pa.array([0], pa.int64()),
                    "sum_dl": pa.array([0], pa.int64()),
                    "max_dl": pa.array([0], pa.int64()),
                }
            )

        parts = (
            ray.data.read_parquet(os.path.join(index_dir, "runs"))
            .map_batches(renumber, batch_format="pyarrow")
            .to_pandas()
        )
        n = int(parts["n"].sum())
        total = int(parts["sum_dl"].sum())
        stats = {
            "N": n,
            "total_dl": total,
            "avgdl": int(total / n) if n else 0,
            "max_dl": int(parts["max_dl"].max()) if len(parts) else 0,
        }
        _dump_json(stats, stats_path)
        # heavy list is routing-only: reuse the source's
        shutil.copyfile(os.path.join(index_dir, "heavy.parquet"), heavy_path)
        _mark(new_runs)
    # phases 2+3 run via the standard builder: phase 1 is already _done,
    # so the corpus argument is never read (callable -> approx_docs=0)
    return build_index(lambda: None, out_dir, cfg)


def refresh_bounds(index_dir: str) -> None:
    """Re-encode every partition from the durable postings exchange with the
    CURRENT stats, restoring sound per-chunk BM25 upper bounds after an
    extension (clears ``stale_ubs``; pruned mode is exact again).  Uses the
    staged encode + rename swap, so serving never observes a missing
    partition dir; the staging root is removed on completion."""
    finish_pending_consolidation(index_dir)
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = _load_json(manifest_path)
    if not manifest.get("stale_ubs"):
        # a prior refresh may have crashed AFTER clearing stale_ubs but
        # BEFORE its cleanup glob — sweep leaked staging dirs (including
        # old-encode trash) here too, not only on the full-refresh path
        for d in glob.glob(os.path.join(index_dir, "bounds_refresh_N*")):
            shutil.rmtree(d, ignore_errors=True)
        return
    stats = _load_json(os.path.join(index_dir, "stats.json"))
    cfg = BuildConfig(**manifest["config"])
    # only manifest-accounted partitions: an exchange dir above the live
    # ceiling is an orphan of an abandoned generation — encoding it would
    # serve duplicate docIDs.  The LATEST extension's parts are already
    # baked at the current stats (stats.json is written by that same
    # extension), so re-encoding them would be pure waste — skip.
    live_max = _live_max_part(manifest, cfg)
    exts = manifest.get("extensions", [])
    fresh = set(exts[-1]["parts"]) if exts else set()
    specs = [
        {"src": d, "part": p}
        for d in sorted(glob.glob(os.path.join(index_dir, "postings", "part=*")))
        if (p := int(os.path.basename(d).split("=")[1])) <= live_max
        and p not in fresh
    ]
    # staging root keyed by the stats it bakes: a LATER refresh (after a
    # further extension) must not inherit this run's swap markers, while a
    # crashed refresh at the SAME N resumes through them
    staging = os.path.join(index_dir, f"bounds_refresh_N{stats['N']}")
    _encode_parts_staged(index_dir, specs, stats, cfg, staging)
    manifest["stale_ubs"] = False
    _dump_json(manifest, manifest_path)
    for d in glob.glob(os.path.join(index_dir, "bounds_refresh_N*")):
        shutil.rmtree(d, ignore_errors=True)


# --------------------------------------------------------------------------
# generation consolidation (term layout): merge extension generations
# --------------------------------------------------------------------------

_PENDING = "consolidate_pending.json"


def _gen_part0s(manifest: dict, cfg: BuildConfig) -> list[tuple[dict, int]]:
    """[(extension record, its part0)] for a term-layout index — the same
    ceiling walk ``_live_max_part`` does, so slot = part_id - part0 is the
    base assigner's partition slot for every generation."""
    base_max = (
        cfg.num_partitions
        + int(manifest.get("heavy_terms", 0)) * cfg.heavy_subparts
        - 1
    )
    out, ceiling = [], base_max
    for e in manifest.get("extensions", []):
        # prefer the recorded part0 (exact even for a previously
        # consolidated generation, whose ids start far past the walk's
        # ceiling+1); the walk remains the pre-field fallback
        out.append((e, e.get("part0", ceiling + 1)))
        if e["parts"]:
            ceiling = max(ceiling, max(e["parts"]))
    return out


def finish_pending_consolidation(index_dir: str) -> None:
    """Resume a crashed ``consolidate_generations`` before any operation
    that sweeps orphan partitions or re-encodes from the postings
    exchange (extend_index, refresh_bounds call this first)."""
    if os.path.exists(os.path.join(index_dir, _PENDING)):
        consolidate_generations(index_dir)


def consolidate_generations(index_dir: str) -> dict:
    """Merge ALL of an index's extension generations into ONE, for both
    layouts, at O(sum of delta postings) — base partitions are never
    read or rewritten.

    Term layout: each generation adds one segment per touched partition
    slot, costing every queried term one extra (seek + decode) per
    generation (measured: tools/stress_generations.py, BASELINE.md
    latency-vs-generations table).  Merge = per SLOT, hardlink-concat
    the generations' postings exchanges into one brand-new partition id
    and re-encode at the CURRENT stats.

    Doc layout: each generation adds its own (often small) shard
    partitions, fragmenting the sharded engine's fan-out and doc
    ranges.  Merge = ONE re-exchange of the generations' postings by
    docID range into right-sized partitions (~base N/P docs each, the
    same sizing a fresh extension would pick), encode at current stats,
    and re-derive ``doc_ranges``.

    OFFLINE maintenance op (same contract as ``compact_index``): do not
    serve from the index while it runs — mid-run, delta postings are
    briefly in neither the old nor the new partitions.  Crash-RESUMABLE:
    the plan (generation ids, new partition ids) is journaled to
    ``consolidate_pending.json`` first and every step is marker-guarded;
    ``extend_index`` and ``refresh_bounds`` finish a pending
    consolidation before touching the index.  Search results are
    bit-identical before and after (pinned by tests/test_extend.py).
    """
    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest = _load_json(manifest_path)
    cfg = BuildConfig(**manifest["config"])
    pending_path = os.path.join(index_dir, _PENDING)
    work = os.path.join(index_dir, "consolidate_work")
    exts = manifest.get("extensions", [])
    live_gens = {e["gen"] for e in exts}

    if os.path.exists(pending_path):
        plan = _load_json(pending_path)
        if not set(plan["gens"]) & live_gens:
            # crashed AFTER the manifest commit: just clean up
            shutil.rmtree(work, ignore_errors=True)
            os.remove(pending_path)
            return manifest
    else:
        plan = _plan_consolidation(manifest, cfg)
        if plan is None:
            return manifest
        tmp = pending_path + ".tmp"
        _dump_json(plan, tmp)
        os.rename(tmp, pending_path)  # the journal IS the commit point

    stats = _load_json(os.path.join(index_dir, "stats.json"))
    postings_dir = os.path.join(index_dir, "postings")
    parts_root = os.path.join(index_dir, "parts")
    os.makedirs(work, exist_ok=True)

    if plan.get("kind", "term") == "doc":
        new_parts = _apply_doc_plan(
            plan, cfg, stats, work, postings_dir, parts_root
        )
    else:
        new_parts = _apply_term_plan(
            plan, cfg, stats, work, postings_dir, parts_root
        )

    # final: single-file manifest commit, then cleanup
    merged = dict(plan["merged"], parts=new_parts)
    manifest["extensions"] = [
        e for e in exts if e["gen"] not in set(plan["gens"])
    ] + [merged]
    manifest["extensions"].sort(key=lambda e: e["gen"])
    if plan.get("kind", "term") == "doc":
        base_stats = _load_json(os.path.join(index_dir, "stats_base.json"))
        ranges = _formula_ranges(base_stats["N"], cfg.num_partitions)
        for e in manifest["extensions"]:
            if e["parts"]:
                ranges.update(
                    _formula_ranges(
                        e["doc_hi"] - e["doc_lo"], len(e["parts"]),
                        e["doc_lo"], min(int(p) for p in e["parts"]),
                    )
                )
        manifest["doc_ranges"] = ranges
    _dump_json(manifest, manifest_path)
    shutil.rmtree(work, ignore_errors=True)
    os.remove(pending_path)
    return manifest


def _merged_record(gens: list[dict], new_part0: int, kind: str) -> dict:
    return {
        "gen": max(e["gen"] for e in gens),
        "part0": new_part0,
        "kind": kind,
        "delta_stats": {
            "n": sum(e["delta_stats"]["n"] for e in gens),
            "sum_dl": sum(e["delta_stats"]["sum_dl"] for e in gens),
            "max_dl": max(e["delta_stats"]["max_dl"] for e in gens),
        },
        "doc_lo": min(e["doc_lo"] for e in gens),
        "doc_hi": max(e["doc_hi"] for e in gens),
        "consolidated_from": [e["gen"] for e in gens],
    }


def _plan_consolidation(manifest: dict, cfg: BuildConfig) -> dict | None:
    """Build (and return) the immutable consolidation plan, or None when
    fewer than two generations carry partitions."""
    if cfg.partition_by == "term":
        gens = [(e, p0) for e, p0 in _gen_part0s(manifest, cfg) if e["parts"]]
        if len(gens) < 2:
            return None
        new_part0 = _live_max_part(manifest, cfg) + 1
        slot_srcs: dict[str, list[int]] = {}
        for e, p0 in gens:
            for pid in e["parts"]:
                slot_srcs.setdefault(str(pid - p0), []).append(pid)
        return {
            "kind": "term",
            "gens": [e["gen"] for e, _ in gens],
            "new_part0": new_part0,
            "slot_srcs": slot_srcs,
            "merged": _merged_record([e for e, _ in gens], new_part0, "term"),
        }
    gens = [e for e in manifest.get("extensions", []) if e["parts"]]
    if len(gens) < 2:
        return None
    # doc-layout generations tile consecutive docID spans by construction
    lo = min(e["doc_lo"] for e in gens)
    hi = max(e["doc_hi"] for e in gens)
    # the first extension's doc_lo IS the base corpus size (docIDs are a
    # dense enumeration); size merged partitions like a fresh extension
    base_n = min(e["doc_lo"] for e in manifest["extensions"])
    per_part = max(1, base_n // cfg.num_partitions)
    new_P = max(1, min(hi - lo, (hi - lo + per_part - 1) // per_part))
    new_part0 = _live_max_part(manifest, cfg) + 1
    return {
        "kind": "doc",
        "gens": [e["gen"] for e in gens],
        "new_part0": new_part0,
        "new_P": new_P,
        "lo": lo,
        "hi": hi,
        "old_parts": sorted(int(p) for e in gens for p in e["parts"]),
        "merged": _merged_record(gens, new_part0, "doc"),
    }


def _apply_doc_plan(
    plan: dict, cfg: BuildConfig, stats: dict, work: str,
    postings_dir: str, parts_root: str,
) -> list[int]:
    """Doc-layout consolidation body: one distributed re-exchange of the
    generations' postings by docID range into ``new_P`` fresh partitions,
    one distributed encode pass, then a marker-guarded commit."""
    import ray.data

    part0, P = plan["new_part0"], plan["new_P"]
    lo, hi = plan["lo"], plan["hi"]
    new_parts = list(range(part0, part0 + P))
    staging = os.path.join(work, "postings")

    all_live = all(
        os.path.isdir(os.path.join(parts_root, f"part={p:05d}"))
        for p in new_parts
    )
    if not _flag(os.path.join(staging, "_SUCCESS")) and not all_live:
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)
        files = [
            e.path
            for pid in plan["old_parts"]
            if os.path.isdir(os.path.join(postings_dir, f"part={pid}"))
            for e in sorted(
                os.scandir(os.path.join(postings_dir, f"part={pid}")),
                key=lambda e: e.name,
            )
            if e.name.endswith(".parquet")
        ]
        if files:
            assigner = _AssignDeltaPartByDoc(part0, P, lo, hi)
            ray.data.read_parquet(
                files, columns=["term", "docID", "tf", "dl"]
            ).map_batches(assigner, batch_format="pyarrow").write_parquet(
                staging, partition_cols=["part"], compression="zstd"
            )
            if cfg.compact_min_fragments:
                cspecs = [
                    {"src": d}
                    for d in sorted(glob.glob(os.path.join(staging, "part=*")))
                ]
                ray.data.from_items(cspecs).map_batches(
                    partial(_compact_part_task, min_fragments=cfg.compact_min_fragments),
                    batch_size=1,
                    batch_format="pyarrow",
                ).to_pandas()
        _touch(os.path.join(staging, "_SUCCESS"))

    enc_specs = [
        {"src": d, "part": int(os.path.basename(d).split("=")[1])}
        for d in sorted(glob.glob(os.path.join(staging, "part=*")))
        if not os.path.isdir(
            os.path.join(
                parts_root,
                f"part={int(os.path.basename(d).split('=')[1]):05d}",
            )
        )
        and not _flag(
            os.path.join(
                work, "parts",
                f"part={int(os.path.basename(d).split('=')[1]):05d}",
                "_SUCCESS",
            )
        )
    ]
    if enc_specs:
        ray.data.from_items(enc_specs).map_batches(
            partial(_encode_part_task, out_dir=work, stats=stats),
            batch_size=1,
            batch_format="pyarrow",
            **_enc_kwargs(cfg),
        ).to_pandas()

    # commit (offline window): old generation dirs out, merged dirs in
    for pid in plan["old_parts"]:
        shutil.rmtree(os.path.join(parts_root, f"part={pid:05d}"), ignore_errors=True)
        shutil.rmtree(os.path.join(postings_dir, f"part={pid}"), ignore_errors=True)
    for d in sorted(glob.glob(os.path.join(work, "parts", "part=*"))):
        dst = os.path.join(parts_root, os.path.basename(d))
        if not os.path.isdir(dst):
            os.rename(d, dst)
    for d in sorted(glob.glob(os.path.join(staging, "part=*"))):
        dst = os.path.join(postings_dir, os.path.basename(d))
        if not os.path.isdir(dst):
            os.rename(d, dst)
    return new_parts


def _apply_term_plan(
    plan: dict, cfg: BuildConfig, stats: dict, work: str,
    postings_dir: str, parts_root: str,
) -> list[int]:
    """Term-layout consolidation body: hardlink-concat per slot, one
    distributed encode pass, per-slot marker-guarded commit."""

    def _slot_paths(slot_str: str):
        new_id = plan["new_part0"] + int(slot_str)
        return (
            new_id,
            os.path.join(postings_dir, f"part={new_id}"),
            os.path.join(parts_root, f"part={new_id:05d}"),
            os.path.join(work, "stage_postings", f"part={new_id}"),
            os.path.join(work, f"slot-{new_id:05d}.done"),
        )

    slots = sorted(plan["slot_srcs"], key=int)
    new_parts = [plan["new_part0"] + int(s) for s in slots]

    # C1: per slot, merged postings staged by hardlink-concat of the
    # generations' exchange files (same filesystem; falls back to copy),
    # gen-prefixed filenames — cheap driver-side file ops, idempotent
    for slot_str in slots:
        new_id, new_postings, new_part, stage_p, marker = _slot_paths(slot_str)
        if _flag(marker) or os.path.isdir(new_postings) or os.path.isdir(new_part):
            continue  # already committed (fully or partially) — no staging
        if _flag(os.path.join(stage_p, "_SUCCESS")):
            continue
        shutil.rmtree(stage_p, ignore_errors=True)
        os.makedirs(stage_p)
        for pid in plan["slot_srcs"][slot_str]:
            src = os.path.join(postings_dir, f"part={pid}")
            if not os.path.isdir(src):
                continue
            for e in sorted(os.scandir(src), key=lambda e: e.name):
                if not e.name.endswith(".parquet"):
                    continue
                dst = os.path.join(stage_p, f"g{pid}_{e.name}")
                try:
                    os.link(e.path, dst)
                except OSError:
                    shutil.copyfile(e.path, dst)
        _touch(os.path.join(stage_p, "_SUCCESS"))

    # C2: ONE parallel encode pass over every staged slot at the CURRENT
    # stats (distributed, atomic tmp+rename + _SUCCESS per part inside
    # _encode_part_task) — no per-slot driver-side decode
    enc_specs = []
    for slot_str in slots:
        new_id, new_postings, new_part, stage_p, marker = _slot_paths(slot_str)
        if _flag(marker) or os.path.isdir(new_part):
            continue  # encoded-and-moved already (marker may lag a crash)
        if _flag(os.path.join(work, "parts", f"part={new_id:05d}", "_SUCCESS")):
            continue
        if os.path.isdir(stage_p):
            enc_specs.append({"src": stage_p, "part": new_id})
    if enc_specs:
        import ray.data

        ray.data.from_items(enc_specs).map_batches(
            partial(_encode_part_task, out_dir=work, stats=stats),
            batch_size=1,
            batch_format="pyarrow",
            **_enc_kwargs(cfg),
        ).to_pandas()

    # C3: per-slot commit (offline window): old dirs out, merged dirs in
    for slot_str in slots:
        new_id, new_postings, new_part, stage_p, marker = _slot_paths(slot_str)
        if _flag(marker):
            continue
        for pid in plan["slot_srcs"][slot_str]:
            shutil.rmtree(os.path.join(parts_root, f"part={pid:05d}"), ignore_errors=True)
            shutil.rmtree(os.path.join(postings_dir, f"part={pid}"), ignore_errors=True)
        if not os.path.isdir(new_part):
            os.rename(os.path.join(work, "parts", f"part={new_id:05d}"), new_part)
        if not os.path.isdir(new_postings):
            # strip the staging marker: exchange dirs never carry _SUCCESS
            try:
                os.remove(os.path.join(stage_p, "_SUCCESS"))
            except FileNotFoundError:
                pass
            os.rename(stage_p, new_postings)
        _touch(marker)

    return new_parts
