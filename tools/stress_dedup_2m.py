"""2M-doc dup-heavy dedup stress (round-3): minhash + simhash at scale.

Corpus: 2,000,000 docs, 10% planted EXACT dups (20,000 clusters x 10 docs;
cluster members identical, every other doc ~unique 40-token text).  Records
wall time, throughput, verified pair counts, and DRIVER peak RSS — the
round-3 co-partitioned verify stage must keep driver state at
O(routing-table entries), not O(candidate shingles).

    PYTHONPATH=. python tools/stress_dedup_2m.py [--docs N] [--skip-simhash]
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

DOCS = 2_000_000
for i, a in enumerate(sys.argv):
    if a == "--docs":
        DOCS = int(sys.argv[i + 1])
CLUSTER = 10
DUP_DOCS = DOCS // 10  # 10% planted dups
CORPUS = f"/dev/shm/wse_stress_dup_{DOCS}"
SCRATCH = "/dev/shm/wse_stress_scratch"


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — avalanche so distinct (seed, pos) cells give
    uncorrelated tokens (a linear generator makes shifted near-dup docs)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))


def gen(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    seed = np.where(ids < DUP_DOCS, ids // CLUSTER, 10_000_000 + ids)
    with np.errstate(over="ignore"):
        cell = seed.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15) + np.arange(
            40, dtype=np.uint64
        )[None, :]
    toks = _mix64(cell) % np.uint64(49999)
    texts = [" ".join(map(str, row)) for row in toks]
    return pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(texts, pa.large_string())}
    )


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


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

    from wse_ray.functions.dedup import minhash_dedup_pairs, simhash_pairs

    out = {"docs": DOCS, "planted_dup_docs": DUP_DOCS,
           "expected_pairs": (DOCS // 10 // CLUSTER) * (CLUSTER * (CLUSTER - 1) // 2)}

    ds = ray.data.read_parquet(CORPUS, columns=["doc_id", "text"])
    out["rss_gb_before"] = rss_gb()
    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH)
    t0 = time.perf_counter()
    pairs = minhash_dedup_pairs(
        ds, threshold=0.8, scratch_dir=os.path.join(SCRATCH, "mh"),
        bucket_parts=64, verify_parts=64,
    )
    sec = time.perf_counter() - t0
    out["minhash"] = {
        "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec),
        "verified_pairs": len(pairs),
        "all_exact": bool((pairs["jaccard"] == 1.0).all()) if len(pairs) else None,
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    if "--skip-simhash" not in sys.argv:
        ds = ray.data.read_parquet(CORPUS, columns=["doc_id", "text"])
        t0 = time.perf_counter()
        spairs = simhash_pairs(
            ds, max_hamming=3, bucket_parts=64,
            scratch_dir=os.path.join(SCRATCH, "sh"),
        )
        sec = time.perf_counter() - t0
        n_planted = int(((spairs["a"] < DUP_DOCS) & (spairs["hamming"] == 0)).sum()) if len(spairs) else 0
        out["simhash"] = {
            "sec": round(sec, 1), "docs_per_sec": round(DOCS / sec),
            "pairs": len(spairs), "planted_h0_pairs": n_planted,
            "rss_gb_peak": rss_gb(),
        }
        print(json.dumps(out), flush=True)
    shutil.rmtree(SCRATCH, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
