"""2M-doc stress for the round-3 curation operators: decontam,
repetition_stats, lm_score, pack_windows — plus k-means on 500k vectors.

Same deterministic splitmix corpus as stress_dedup_2m (40-token docs,
vocab 49,999).  Records wall time, docs/sec, and driver peak RSS: every
stage here must keep driver state sub-corpus-sized (decontam's broadcast
is bench-set-sized, lm_score's is vocab-sized, pack_windows' is
row-group-count-sized, k-means' is k x d).

    PYTHONPATH=. python tools/stress_curation_2m.py [--docs N] [--vecs N]
"""
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stress_dedup_2m import CLUSTER, _mix64, rss_gb  # noqa: E402

DOCS = 2_000_000
VECS = 500_000
for i, a in enumerate(sys.argv):
    if a == "--docs":
        DOCS = int(sys.argv[i + 1])
    if a == "--vecs":
        VECS = int(sys.argv[i + 1])
DUP_DOCS = DOCS // 10
CORPUS = f"/dev/shm/wse_stress_dup_{DOCS}"
VCORPUS = f"/dev/shm/wse_stress_vec_{VECS}"


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    seed = np.where(ids < DUP_DOCS, ids // CLUSTER, 10_000_000 + ids)
    with np.errstate(over="ignore"):
        cell = seed.astype(np.uint64)[:, None] * np.uint64(
            0x9E3779B97F4A7C15
        ) + np.arange(40, dtype=np.uint64)[None, :]
    toks = _mix64(cell) % np.uint64(49999)
    texts = [" ".join(map(str, row)) for row in toks]
    return pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(texts, pa.large_string())}
    )


def gen_vecs(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    # 100 well-separated centers + small deterministic noise
    centers = ids % 100
    with np.errstate(over="ignore"):
        cc = _mix64(
            centers.astype(np.uint64)[:, None] * np.uint64(7919)
            + np.arange(64, dtype=np.uint64)[None, :]
        )
        nn = _mix64(
            ids.astype(np.uint64)[:, None] * np.uint64(104729)
            + np.arange(64, dtype=np.uint64)[None, :]
        )
    c = (cc % np.uint64(2001)).astype(np.float32) / 100.0  # 0..20
    n = (nn % np.uint64(2001)).astype(np.float32) / 2000.0 - 0.5  # +-0.5
    vecs = c + n
    return pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )


def main():
    import ray
    import ray.data
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    if not os.path.exists(CORPUS + "/_DONE"):
        shutil.rmtree(CORPUS, ignore_errors=True)
        ray.data.range(DOCS, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow"
        ).write_parquet(CORPUS, compression="zstd")
        open(CORPUS + "/_DONE", "w").write("ok")
    if not os.path.exists(VCORPUS + "/_DONE"):
        shutil.rmtree(VCORPUS, ignore_errors=True)
        ray.data.range(VECS, override_num_blocks=32).map_batches(
            gen_vecs, batch_format="pyarrow"
        ).write_parquet(VCORPUS, compression="zstd")
        open(VCORPUS + "/_DONE", "w").write("ok")

    out = {"docs": DOCS, "vecs": VECS}

    def docs_ds():
        return ray.data.read_parquet(CORPUS, columns=["doc_id", "text"])

    from wse_ray.functions.decontam import benchmark_gram_set, contamination_hits
    from wse_ray.functions.packing import pack_windows
    from wse_ray.functions.textstats import repetition_stats, unigram_lm_score

    # --- decontam: bench slice = every 1000th doc (~DOCS/1000 docs) -------
    t0 = time.perf_counter()
    bench = docs_ds().map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 1000 == 0)
        ),
        batch_format="pyarrow",
    )
    grams = benchmark_gram_set(bench, k=8)
    hits = contamination_hits(docs_ds(), grams, k=8).to_pandas()
    sec = time.perf_counter() - t0
    # every doc sharing a cluster with a bench doc (exact dup) must hit
    out["decontam"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec),
        "bench_grams": len(grams), "hit_docs": len(hits),
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- repetition_stats -------------------------------------------------
    t0 = time.perf_counter()
    n = docs_ds().map_batches(repetition_stats, batch_format="pyarrow").count()
    sec = time.perf_counter() - t0
    out["repetition_stats"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec), "rows": n,
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- lm_score ---------------------------------------------------------
    t0 = time.perf_counter()
    n = unigram_lm_score(docs_ds()).count()
    sec = time.perf_counter() - t0
    out["lm_score"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec), "rows": n,
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- pack_windows -----------------------------------------------------
    paths = sorted(
        os.path.join(CORPUS, f) for f in os.listdir(CORPUS) if f.endswith(".parquet")
    )
    t0 = time.perf_counter()
    packed = pack_windows(paths, window=2048)
    n = packed.count()
    sec = time.perf_counter() - t0
    out["pack_windows"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec), "rows": n,
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- training shuffle: 2M-row distributed sort ------------------------
    from wse_ray.functions.sampling import training_shuffle

    ids = ray.data.read_parquet(CORPUS, columns=["doc_id"])
    t0 = time.perf_counter()
    head = training_shuffle(ids, seed=7).limit(100).to_pandas()
    sec = time.perf_counter() - t0
    out["training_shuffle"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec),
        "head_ok": bool(head["shuffle_key"].is_monotonic_increasing),
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- HLL over 2M synthetic events ------------------------------------
    from wse_ray.functions.sketches import hll_distinct_daily

    def as_events(t: pa.Table) -> pa.Table:
        ids2 = t["doc_id"].to_numpy(zero_copy_only=False)
        ts = (
            np.datetime64("2024-01-01") + (ids2 % 30).astype("timedelta64[D]")
        ).astype("datetime64[us]")
        return pa.table(
            {"ts": pa.array(ts), "user_id": pa.array(ids2 % 100_000)}
        )

    ev = ray.data.read_parquet(CORPUS, columns=["doc_id"]).map_batches(
        as_events, batch_format="pyarrow"
    )
    t0 = time.perf_counter()
    est = hll_distinct_daily(ev, p=12)
    sec = time.perf_counter() - t0
    # exact distinct per day = |{u : u = id % 100k, id % 30 = d}| — ids 0..DOCS
    errs = []
    for _, row in est.iterrows():
        d = (np.datetime64(row["day"], "D") - np.datetime64("2024-01-01")).astype(int)
        exact = len({i % 100_000 for i in range(d, DOCS, 30)})
        errs.append(abs(row["n_users_approx"] - exact) / exact)
    out["hll"] = {
        "sec": round(sec, 1), "rows_per_sec": round(DOCS / sec),
        "days": len(est), "max_rel_err": round(max(errs), 4),
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- full curate_corpus composition (r4: storage-checkpointed) --------
    # quality -> survivor groupby over (text_hash, doc_id) ONLY -> decontam;
    # the kept corpus text lives in the parquet checkpoint, never in the
    # object store (round-3 VERDICT finding #3)
    from wse_ray.pipelines.curation import curate_corpus

    def with_source(t: pa.Table) -> pa.Table:
        ids2 = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "source", pa.array(np.char.mod("s%d", ids2 % 10))
        )

    full = docs_ds().map_batches(with_source, batch_format="pyarrow")
    bench2 = docs_ds().map_batches(
        lambda t: t.filter(
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 1000 == 0)
        ),
        batch_format="pyarrow",
    )
    scratch = f"/dev/shm/wse_stress_curate_{DOCS}"
    shutil.rmtree(scratch, ignore_errors=True)
    t0 = time.perf_counter()
    curated = curate_corpus(full, bench2, min_tokens=20, max_dup3=0.9,
                            scratch_dir=scratch)
    n = curated.count()
    sec = time.perf_counter() - t0
    out["curate_corpus"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec), "kept": n,
        "rss_gb_peak": rss_gb(),
    }
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out), flush=True)

    # --- kmeans on 500k vectors ------------------------------------------
    from wse_ray.functions.clustering import kmeans_assign, kmeans_fit

    vds = ray.data.read_parquet(VCORPUS)
    t0 = time.perf_counter()
    C, hist = kmeans_fit(vds, k=100, iters=5)
    n = kmeans_assign(vds, C).count()
    sec = time.perf_counter() - t0
    out["kmeans"] = {
        "sec": round(sec, 1), "vecs_per_sec_per_iter": round(VECS * 5 / sec),
        "rows": n, "inertia_first_last": [round(hist[0]), round(hist[-1])],
        "monotone": bool(all(a >= b - 1e-6 for a, b in zip(hist, hist[1:]))),
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
