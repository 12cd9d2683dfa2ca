"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "build": {...docs/sec detail...}}

Headline = end-to-end inverted-index build (tokenize -> shuffle -> blocked
varbyte encode) over a deterministic synthetic web corpus (FIXTURES.md
corpus_bench shape) + the fixed BM25 query set, at $RAY_GRAFT_CPUS cpus.

``--scaling``: runs the SAME build in two fresh processes (num_cpus N then
4N, default 2 and 8 — see BASELINE.md for why) on the SAME pre-generated
input and reports docs/s at both, the scaling efficiency, and the
machine's raw parallel-CPU ceiling measured the same way.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_DOCS = int(os.environ.get("WSE_BENCH_DOCS", "50000"))
# transient exchanges default to the system tempdir (safe for any input
# size); the bench KNOWS its inputs fit in RAM, so it opts in to tmpfs
# scratch explicitly (free-space-checked) — see config.scratch_base
from wse_ray.config import opt_in_fast_scratch  # noqa: E402

opt_in_fast_scratch()
# corpus lives on tmpfs when available: this sandbox's single ~65 MB/s disk
# would make the runs phase read-bound at EVERY core count (a cold 800k
# corpus floors it at ~45 s), measuring the disk, not the engine — a real
# cluster reads input from storage whose bandwidth scales with node count
_SCRATCH_BASE = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
CORPUS_DIR = f"{_SCRATCH_BASE}/wse_bench_corpus_{BENCH_DOCS}"


def ensure_corpus() -> str:
    marker = os.path.join(CORPUS_DIR, "_DONE")
    if not os.path.exists(marker):
        from wse_ray.fixtures import write_corpus_parquet

        shutil.rmtree(CORPUS_DIR, ignore_errors=True)
        write_corpus_parquet(CORPUS_DIR, BENCH_DOCS, n_files=32)
        open(marker, "w").write("ok")
    return CORPUS_DIR


BENCH_OUT = os.environ.get(
    "WSE_BENCH_OUT",
    "/dev/shm/wse_bench" if os.path.isdir("/dev/shm") else "/tmp/wse_bench",
)


def run_build(
    corpus_dir: str,
    out_dir: str,
    num_partitions: int | None = None,
    from_html: bool = False,
) -> dict:
    from wse_ray.config import BuildConfig
    from wse_ray.index.build import build_index

    if num_partitions is None:
        # size partitions to the corpus so no single encode task straggles
        num_partitions = max(32, BENCH_DOCS // 25000)
    # best-of-reps: the burstable host varies +-40% between windows; min is
    # the standard estimator here (BASELINE.md hardware note). Scaling runs
    # (WSE_BENCH_BUILD_ONLY=1) keep 1 rep — bench.py --scaling already does
    # best-of-reps across whole processes.
    reps = 1 if os.environ.get("WSE_BENCH_BUILD_ONLY") == "1" else int(
        os.environ.get("WSE_BENCH_BUILD_REPS", "2")
    )
    best = None
    secs = []
    for _ in range(reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        manifest = build_index(
            corpus_dir,
            out_dir,
            BuildConfig(num_partitions=num_partitions),
            from_html=from_html,
        )
        sec = time.perf_counter() - t0
        secs.append(round(sec, 3))
        if best is None or sec < best[0]:
            best = (sec, manifest)
    sec, manifest = best
    n = manifest["stats"]["N"]
    return {
        "sec": round(sec, 3),
        "docs": n,
        "docs_per_sec": round(n / sec, 1),
        "timings": manifest["timings_sec"],
        "rep_secs": secs,
    }


def _pcts(times_sec: list[float]) -> dict:
    import numpy as np

    a = np.asarray(times_sec) * 1000.0
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p95_ms": round(float(np.percentile(a, 95)), 2),
    }


def run_queries_bench(index_dir: str) -> dict:
    from wse_ray.fixtures import make_queries
    from wse_ray.query.scorer import SearchEngine

    t0 = time.perf_counter()
    eng = SearchEngine(index_dir)
    startup = time.perf_counter() - t0
    qs = make_queries()
    per_mode: dict[str, list[float]] = {}
    t0 = time.perf_counter()
    n_results = 0
    for q in qs:
        tq = time.perf_counter()
        n_results += len(eng.search(q["query"], q["mode"], q["k"]))
        per_mode.setdefault(q["mode"], []).append(time.perf_counter() - tq)
    qsec = time.perf_counter() - t0
    pruned_times = []
    t0 = time.perf_counter()
    for q in qs:
        mode = "disjunctive_pruned" if q["mode"] == "disjunctive" else q["mode"]
        tq = time.perf_counter()
        eng.search(q["query"], mode, q["k"])
        if mode == "disjunctive_pruned":
            pruned_times.append(time.perf_counter() - tq)
    psec = time.perf_counter() - t0
    return {
        "startup_sec": round(startup, 3),
        "queries": len(qs),
        "sec": round(qsec, 3),
        "qps": round(len(qs) / qsec, 1),
        "pruned_sec": round(psec, 3),
        "pruned_qps": round(len(qs) / psec, 1),
        "n_results": n_results,
        "latency": {
            **{m: _pcts(ts) for m, ts in per_mode.items()},
            "disjunctive_pruned": _pcts(pruned_times),
        },
    }


def run_sharded_bench(corpus_dir: str, out_dir: str, num_shards: int = 16) -> dict:
    """Doc-partitioned build + scatter-gather serving latency (p50/p95)."""
    from wse_ray.config import BuildConfig
    from wse_ray.fixtures import make_queries
    from wse_ray.index.build import build_index
    from wse_ray.query.sharded import ShardedSearchEngine

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(
        corpus_dir,
        out_dir,
        BuildConfig(num_partitions=num_shards, partition_by="doc"),
    )
    build_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng = ShardedSearchEngine(out_dir)
    eng.search("warmup", "disjunctive", 10)  # actor spin-up out of the timing
    startup = time.perf_counter() - t0
    times = []
    qs = make_queries()
    for q in qs:
        tq = time.perf_counter()
        eng.search(q["query"], q["mode"], q["k"])
        times.append(time.perf_counter() - tq)
    total = sum(times)
    t0 = time.perf_counter()
    eng.search_batch(qs)  # one round-trip pair for the whole batch
    batch_sec = time.perf_counter() - t0
    # MaxScore-pruned through the shards (bit-identical results,
    # tests/test_sharded.py::test_sharded_pruned_identical)
    pruned_qs = [
        dict(q, mode="disjunctive_pruned") if q["mode"] == "disjunctive" else q
        for q in qs
    ]
    pruned_times = []
    for q in pruned_qs:
        tq = time.perf_counter()
        eng.search(q["query"], q["mode"], q["k"])
        pruned_times.append(time.perf_counter() - tq)
    t0 = time.perf_counter()
    eng.search_batch(pruned_qs)
    pruned_batch_sec = time.perf_counter() - t0
    return {
        "num_shards": num_shards,
        "build_sec": round(build_sec, 3),
        "startup_sec": round(startup, 3),
        "queries": len(qs),
        "qps": round(len(qs) / total, 1),
        "batched_qps": round(len(qs) / batch_sec, 1),
        "latency": _pcts(times),
        "pruned_qps": round(len(qs) / sum(pruned_times), 1),
        "pruned_batched_qps": round(len(qs) / pruned_batch_sec, 1),
        "pruned_latency": _pcts(pruned_times),
    }


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # warm the worker pool (spawn + imports) so the measurement reflects a
    # steady-state cluster, not process cold-start
    def _warm(b):
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        import wse_ray.index.build  # noqa: F401

        return b

    ray.data.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        _warm, batch_size=1
    ).count()

    corpus = ensure_corpus()
    timings: dict[str, float] = {}

    # headline: index build + query over the synthetic web corpus
    build = run_build(corpus, f"{BENCH_OUT}_index_{NUM_CPUS}")
    timings["index_build"] = build["sec"]
    qbench = run_queries_bench(f"{BENCH_OUT}_index_{NUM_CPUS}")
    timings["bm25_queries"] = qbench["sec"]

    snippet_bench = None
    if os.environ.get("WSE_BENCH_BUILD_ONLY") != "1":
        # snippet stage at index scale: top-20 of the 40-query set through
        # all six reference snippet algorithms (N1-N6) over the 50k corpus
        from wse_ray.fixtures import make_queries
        from wse_ray.query.scorer import SearchEngine
        from wse_ray.query.snippets_stage import attach_snippets
        from wse_ray.sources.corpus import read_corpus

        eng = SearchEngine(f"{BENCH_OUT}_index_{NUM_CPUS}")
        sqs = [dict(q, k=20) for q in make_queries()]
        res = eng.search_batch(sqs)
        res["query"] = res["query_id"].map({q["query_id"]: q["query"] for q in sqs})
        corpus_ds = read_corpus(corpus, columns=["text"])
        t0 = time.perf_counter()
        per_algo = {}
        n_snips = 0
        for algo in ("linear", "prefix", "bm25", "vector", "keyword", "weight"):
            ta = time.perf_counter()
            out_rows = attach_snippets(res, eng, corpus_ds, algo=algo, use_index_stats=True)
            per_algo[algo] = round(time.perf_counter() - ta, 3)
            n_snips += len(out_rows)
        snip_sec = time.perf_counter() - t0
        timings["snippets"] = round(snip_sec, 3)
        snippet_bench = {
            "queries": len(sqs),
            "snippets": n_snips,
            "snippets_per_sec": round(n_snips / snip_sec, 1),
            "per_algo_sec": per_algo,
        }

    html_build = None
    if os.environ.get("WSE_BENCH_BUILD_ONLY") != "1":
        # from-html build: same corpus through the extraction stage — the
        # ratio vs the trusted-text build prices the O1 html path
        html_build = run_build(
            corpus, f"{BENCH_OUT}_index_html_{NUM_CPUS}", from_html=True
        )
        timings["index_build_from_html"] = html_build["sec"]
        timings["from_html_ratio"] = round(html_build["sec"] / build["sec"], 3)

    sharded = None
    if os.environ.get("WSE_BENCH_BUILD_ONLY") != "1":
        sharded = run_sharded_bench(corpus, f"{BENCH_OUT}_index_doc_{NUM_CPUS}")
        timings["sharded_build_and_queries"] = round(
            sharded["build_sec"] + sharded["queries"] / sharded["qps"], 3
        )

    if os.environ.get("WSE_BENCH_BUILD_ONLY") != "1":
        # index lifecycle micro-bench: build 80% of a 10k-doc corpus,
        # extend with the rest, tombstone 10%, serve — tracks the cost of
        # the maintenance path (index/extend.py) per round
        from wse_ray.config import BuildConfig
        from wse_ray.fixtures import write_corpus_parquet
        from wse_ray.index.build import build_index
        from wse_ray.index.extend import delete_docs, extend_index
        from wse_ray.query.scorer import SearchEngine

        life_corpus = f"{_SCRATCH_BASE}/wse_bench_life_corpus"
        if not os.path.exists(os.path.join(life_corpus, "_DONE")):
            shutil.rmtree(life_corpus, ignore_errors=True)
            write_corpus_parquet(life_corpus, 10_000, n_files=10)
            open(os.path.join(life_corpus, "_DONE"), "w").write("ok")
        life_files = sorted(
            p for p in os.listdir(life_corpus) if p.endswith(".parquet")
        )
        life_files = [os.path.join(life_corpus, p) for p in life_files]
        life_idx = f"{BENCH_OUT}_life_{NUM_CPUS}"
        t0 = time.perf_counter()
        shutil.rmtree(life_idx, ignore_errors=True)
        build_index(
            life_files[:8], life_idx, BuildConfig(num_partitions=8, partition_by="doc")
        )
        t_base = time.perf_counter()
        extend_index(life_idx, life_files[8:])
        t_ext = time.perf_counter() - t_base
        delete_docs(life_idx, range(0, 10_000, 10))
        eng = SearchEngine(life_idx)
        for q in ("data table", "zzz_absent", "join"):
            eng.search(q, "disjunctive", 10)
        timings["index_lifecycle"] = round(time.perf_counter() - t0, 3)

        # extension ratio: extend(20% delta) vs a from-scratch rebuild of
        # base+delta, both layouts — O(delta) means ratio ~ delta fraction
        # (authoritative large-scale numbers: tools/stress_extend.py in
        # BASELINE.md; this tracks the per-round trend cheaply)
        full_idx = f"{BENCH_OUT}_life_full_{NUM_CPUS}"
        shutil.rmtree(full_idx, ignore_errors=True)
        t0 = time.perf_counter()
        build_index(
            life_files, full_idx, BuildConfig(num_partitions=10, partition_by="doc")
        )
        t_full = time.perf_counter() - t0
        timings["extend_ratio_doc"] = round(t_ext / t_full, 3)
        term_idx = f"{BENCH_OUT}_life_term_{NUM_CPUS}"
        shutil.rmtree(term_idx, ignore_errors=True)
        cfg_t = BuildConfig(num_partitions=8)
        build_index(life_files[:8], term_idx, cfg_t)
        t0 = time.perf_counter()
        extend_index(term_idx, life_files[8:])
        timings["extend_ratio_term"] = round((time.perf_counter() - t0) / t_full, 3)

        from wse_ray.pipelines import engine_queries as eq
        from wse_ray.pipelines import relational as rel

        for name, fn in [
            ("sf_index_build_and_bm25", lambda: eq.q_bm25_disjunctive(SF_DIR)),
            ("dedup_exact", lambda: eq.q_dedup_exact(SF_DIR)),
            ("dedup_minhash", lambda: eq.q_dedup_minhash(SF_DIR)),
            ("dedup_ngram", lambda: eq.q_dedup_ngram(SF_DIR)),
            ("ann_topk", lambda: eq.q_ann_topk(SF_DIR)),
            ("decontam", lambda: eq.q_decontam(SF_DIR)),
            ("curate_corpus", lambda: eq.q_curate_corpus(SF_DIR)),
            ("pricing_summary", lambda: rel.q_pricing_summary(SF_DIR)),
            ("join_priority_revenue", lambda: rel.q_join_priority_revenue(SF_DIR)),
            ("events_window", lambda: rel.q_events_window(SF_DIR)),
            ("sessionize", lambda: rel.q_sessionize(SF_DIR)),
            ("top_users", lambda: rel.q_top_users(SF_DIR)),
        ]:
            t0 = time.perf_counter()
            fn()
            timings[name] = round(time.perf_counter() - t0, 3)

    out = {
        "metric": "index build + BM25 query wall time (synthetic web corpus, "
        f"{build['docs']} docs) and per-pipeline seconds over {SF_DIR}",
        "value": round(timings["index_build"] + timings["bm25_queries"], 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "build": build,
        "query_bench": qbench,
    }
    if sharded is not None:
        out["sharded_bench"] = sharded
    if snippet_bench is not None:
        out["snippet_bench"] = snippet_bench
    print(json.dumps(out))
    ray.shutdown()


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def machine_cpu_baseline(lo: int, hi: int) -> dict:
    """Raw parallel-CPU ceiling of this machine (pure busy loops, no Ray).

    The sandbox runs on shared/burstable vCPUs whose per-process speed
    degrades with concurrency; engine scaling numbers should be read
    against this ceiling (engine_eff / machine_eff = architectural eff).
    """
    import multiprocessing as mp

    out = {}
    n = 20_000_000
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            t0 = time.perf_counter()
            p.map(_burn, [n] * procs * 2)
            wall = time.perf_counter() - t0
        out[procs] = procs * 2 * n / wall / 1e6
    return {
        f"mops_{lo}": round(out[lo], 1),
        f"mops_{hi}": round(out[hi], 1),
        "machine_efficiency": round((out[hi] / out[lo]) / (hi / lo), 3),
    }


def scaling() -> None:
    # the scaling measurement needs a COMPUTE-dominated build: the
    # engine carries a FIXED ~4.5 s serial term per build (phase
    # transitions, stats folding, manifest writes — measured by the
    # round-5 Amdahl decomposition, BASELINE.md), so small corpora
    # under-report scaling: 200k docs reads 0.77-0.81 raw where the SAME
    # code at 800k reads 0.974 (window 11).  Default 500k (~0.95
    # predicted, ~8-minute window); pin WSE_SCALING_DOCS to trade
    # precision for time.
    global BENCH_DOCS, CORPUS_DIR
    if "WSE_BENCH_DOCS" not in os.environ:
        BENCH_DOCS = int(os.environ.get("WSE_SCALING_DOCS", "500000"))
        CORPUS_DIR = f"{_SCRATCH_BASE}/wse_bench_corpus_{BENCH_DOCS}"
        os.environ["WSE_BENCH_DOCS"] = str(BENCH_DOCS)
    # pre-generate shared input + warm page cache in this process
    ensure_corpus()

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            WSE_BENCH_BUILD_ONLY="1",
            PYTHONPATH=REPO,
        )
        # pin the WHOLE process tree (driver, raylet, workers) to exactly
        # ncpu cores — a faithful N-core-cluster simulation; without it the
        # low-cpu run leaks driver/raylet work onto spare cores
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
        if shutil.which("taskset"):
            ncores = os.cpu_count() or 32
            # pin to the UPPER cores: core 0/low cores host OS + raylet noise
            cmd = ["taskset", "-c", f"{ncores - ncpu}-{ncores - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # default pair 2 vs 8 (N and 4N): this sandbox runs on shared
    # burstable vCPUs that actively throttle >8 concurrent heavy
    # processes (see machine_cpu_baseline + BASELINE.md) — 8 vs 32
    # measures the hypervisor, not the architecture
    lo = int(os.environ.get("WSE_SCALE_LO", "2"))
    hi = int(os.environ.get("WSE_SCALE_HI", "8"))
    reps = int(os.environ.get("WSE_SCALE_REPS", "2"))
    # best-of-reps per level, INTERLEAVED lo/hi (r5): the host's burst
    # level drifts on minute scales, so an all-lo-then-all-hi order can
    # hand one level a systematically different machine — the same
    # artifact the --ab mode guards against.  Interleaving exposes both
    # levels to the same drift; min is still the estimator per level.
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = min(runs_lo, key=lambda r: r["build"]["sec"])
    r_hi = min(runs_hi, key=lambda r: r["build"]["sec"])
    t_lo = r_lo["build"]["sec"]
    t_hi = r_hi["build"]["sec"]
    eff = (t_lo / t_hi) / (hi / lo)
    machine = machine_cpu_baseline(lo, hi)
    print(
        json.dumps(
            {
                "docs": r_lo["build"]["docs"],
                f"sec_{lo}": t_lo,
                f"sec_{hi}": t_hi,
                f"docs_per_sec_{lo}": r_lo["build"]["docs_per_sec"],
                f"docs_per_sec_{hi}": r_hi["build"]["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
                f"timings_{lo}": r_lo["build"]["timings"],
                f"timings_{hi}": r_hi["build"]["timings"],
                "machine_cpu_baseline": machine,
                "architectural_efficiency": round(
                    eff / max(1e-9, machine["machine_efficiency"]), 3
                ),
            }
        )
    )


def ab() -> None:
    """Interleaved A/B of one queries() pipeline between two git refs.

    ``python bench.py --ab <ref_old> <ref_new> [--pipeline name]``
    (ref "." = the current working tree).  Per-round bench deltas on this
    burstable host are confounded by the window's burst level; this mode
    answers "did THIS change make pipeline X faster" by running both
    versions alternately in ONE window, best-of-N fresh processes each
    (no warm run — several pipelines memoize engines per process, and a
    warm call would measure the cache).  Each ref runs from its own git
    worktree under /tmp with PYTHONPATH pinned to that tree.
    """
    args = sys.argv[sys.argv.index("--ab") + 1:]
    refs = args[:2]
    if len(refs) != 2:
        raise SystemExit("usage: bench.py --ab <ref_old> <ref_new> [--pipeline name]")
    pipeline = args[args.index("--pipeline") + 1] if "--pipeline" in args else (
        "join_priority_revenue"
    )
    reps = int(os.environ.get("WSE_AB_REPS", "3"))

    trees = {}
    for ref in refs:
        if ref == ".":
            trees[ref] = REPO
            continue
        wt = f"/tmp/wse_ab_{ref.replace('/', '_')}"
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "-C", REPO, "worktree", "add", "--detach", wt, ref],
                check=True, capture_output=True,
            )
        trees[ref] = wt

    runner = (
        "import json,os,sys,time\n"
        "import ray\n"
        "ray.init(address='local',num_cpus=int(os.environ.get('RAY_GRAFT_CPUS','32')),"
        "include_dashboard=False,logging_level='ERROR')\n"
        "from ray.data import DataContext\n"
        "DataContext.get_current().enable_progress_bars=False\n"
        "import __ray_entry__ as e\n"
        "q=e.queries()[os.environ['WSE_AB_PIPELINE']]\n"
        "sf=os.environ.get('GRAFT_SF_DIR','/root/testdata/sf0.1')\n"
        "t0=time.perf_counter();q(sf)\n"
        "print('WSE_AB_RESULT '+json.dumps({'sec':round(time.perf_counter()-t0,3)}))\n"
        "ray.shutdown()\n"
    )

    def run_one(ref: str) -> float:
        tree = trees[ref]
        env = dict(os.environ, PYTHONPATH=tree, WSE_AB_PIPELINE=pipeline)
        p = subprocess.run(
            [sys.executable, "-c", runner], env=env, cwd=tree,
            capture_output=True, text=True, check=True,
        )
        for line in p.stdout.splitlines():
            if line.startswith("WSE_AB_RESULT "):
                return json.loads(line[len("WSE_AB_RESULT "):])["sec"]
        raise RuntimeError(f"no result line from {ref}:\n{p.stderr[-2000:]}")

    secs: dict[str, list[float]] = {r: [] for r in refs}
    for _ in range(reps):
        for ref in refs:  # interleaved: both sides see the same burst level
            secs[ref].append(run_one(ref))
    best = {r: min(s) for r, s in secs.items()}
    print(
        json.dumps(
            {
                "pipeline": pipeline,
                "refs": refs,
                "reps": reps,
                "secs": secs,
                "best": best,
                "speedup_old_over_new": round(best[refs[0]] / best[refs[1]], 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--ab" in sys.argv:
        ab()
    else:
        main()
