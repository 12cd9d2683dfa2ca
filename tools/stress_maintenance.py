"""Maintenance-path + as-of-join stress: the two round-4 paths without a
large-scale measurement yet.

1. **compact_index** at BASE docs with 10% tombstoned: filter+renumber the
   runs checkpoint (never re-tokenizes) + standard phases 2-3, then verify
   sampled queries equal a FRESH build over the corpus with the deleted
   docs removed.  Reports compact time vs that fresh build (upper bound:
   compaction should cost <= rebuild minus tokenize).
2. **asof_join** at EVENTS rows ⋈ EVENTS//10 quotes over USERS keys:
   storage-exchanged by key, per-partition vectorized merge_asof; result
   row count must equal the left side (LEFT semantics) and a sampled key
   is checked exactly against pandas.

    PYTHONPATH=. python tools/stress_maintenance.py [--base N] [--events N]
"""
import json
import os
import resource
import shutil
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = 400_000
EVENTS = 2_000_000
USERS = 50_000
for i, a in enumerate(sys.argv):
    if a == "--base":
        BASE = int(sys.argv[i + 1])
    if a == "--events":
        EVENTS = int(sys.argv[i + 1])
ROOT = "/dev/shm/wse_stress_maint"


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


def gen_docs(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    with np.errstate(over="ignore"):
        cell = ids.astype(np.uint64)[:, None] * np.uint64(
            0x9E3779B97F4A7C15
        ) + np.arange(40, dtype=np.uint64)[None, :]
    toks = _mix64(cell) % np.uint64(49999)
    texts = [
        f"https://site{int(i) % 97}.example/p/{int(i)}\n" + " ".join(map(str, row))
        for i, row in zip(ids, toks)
    ]
    return pa.table(
        {
            "url": pa.array([t.split("\n", 1)[0] for t in texts]),
            "text": pa.array(texts, pa.large_string()),
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
    out = {"base_docs": BASE, "events": EVENTS, "rss_gb_before": rss_gb()}

    from wse_ray.config import BuildConfig
    from wse_ray.index.build import build_index
    from wse_ray.index.extend import compact_index, delete_docs
    from wse_ray.query.scorer import SearchEngine

    corpus = os.path.join(ROOT, f"docs_{BASE}")
    if not os.path.exists(corpus + "/_DONE"):
        shutil.rmtree(corpus, ignore_errors=True)
        ray.data.range(BASE, override_num_blocks=32).map_batches(
            gen_docs, batch_format="pyarrow"
        ).write_parquet(corpus, compression="zstd")
        open(corpus + "/_DONE", "w").write("ok")

    cfg = BuildConfig(num_partitions=16, partition_by="doc")
    idx = os.path.join(ROOT, "idx")
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(corpus, idx, cfg)
    t_build = time.perf_counter() - t0
    dead = list(range(0, BASE, 10))
    delete_docs(idx, dead)

    cmp_dir = os.path.join(ROOT, "idx_compact")
    shutil.rmtree(cmp_dir, ignore_errors=True)
    t0 = time.perf_counter()
    compact_index(idx, cmp_dir, cfg)
    t_compact = time.perf_counter() - t0

    # reference: fresh build over the corpus minus deleted docs (global
    # docIDs = row order, so filter by position)
    filt = os.path.join(ROOT, "docs_filtered")
    shutil.rmtree(filt, ignore_errors=True)
    os.makedirs(filt)
    import glob as _glob

    full = pd.concat(  # deterministic row order = the builder's docID order
        [
            pd.read_parquet(f)
            for f in sorted(_glob.glob(os.path.join(corpus, "*.parquet")))
        ],
        ignore_index=True,
    )
    keep = np.ones(len(full), bool)
    keep[dead] = False
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(full[keep].reset_index(drop=True)),
        os.path.join(filt, "corpus-00000.parquet"),
    )
    ref = os.path.join(ROOT, "idx_ref")
    shutil.rmtree(ref, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(filt, ref, cfg)
    t_ref = time.perf_counter() - t0

    e_cmp, e_ref = SearchEngine(cmp_dir), SearchEngine(ref)
    assert e_cmp.stats == e_ref.stats
    queries = ["1234 5678", "42", "9999 1 17", "zzz_absent", "100 200 300"]
    for q in queries:
        for mode in ("disjunctive", "conjunctive", "disjunctive_pruned"):
            assert e_cmp.search(q, mode, 10) == e_ref.search(q, mode, 10), (q, mode)
    out["compact"] = {
        "build_sec": round(t_build, 1),
        "compact_sec": round(t_compact, 1),
        "fresh_filtered_build_sec": round(t_ref, 1),
        "compact_vs_fresh_ratio": round(t_compact / t_ref, 3),
        "queries_identical": len(queries) * 3,
        "rss_gb_peak": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # ---- as-of join stress -------------------------------------------------
    from wse_ray.functions.joins import asof_join

    t0_us = np.datetime64("2024-01-01", "us").astype(np.int64)
    span = 30 * 86_400 * 1_000_000

    def gen_left(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        h = _mix64(ids.astype(np.uint64))
        return pa.table(
            {
                "event_id": pa.array(ids),
                "user_id": pa.array((h % np.uint64(USERS)).astype(np.int64)),
                "ts": pa.array(
                    (t0_us + (_mix64(h) % np.uint64(span)).astype(np.int64)).view(
                        "datetime64[us]"
                    )
                ),
            }
        )

    def gen_right(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy().astype(np.int64)
        h = _mix64((ids + 10_000_000).astype(np.uint64))
        return pa.table(
            {
                "quote_id": pa.array(ids),
                "user_id": pa.array((h % np.uint64(USERS)).astype(np.int64)),
                "qts": pa.array(
                    (t0_us + (_mix64(h) % np.uint64(span)).astype(np.int64)).view(
                        "datetime64[us]"
                    )
                ),
                "price": pa.array((h % np.uint64(10_000)).astype(np.float64) / 100.0),
            }
        )

    ldir = os.path.join(ROOT, f"ev_{EVENTS}")
    rdir = os.path.join(ROOT, f"qt_{EVENTS}")
    for d, n, g in ((ldir, EVENTS, gen_left), (rdir, EVENTS // 10, gen_right)):
        if not os.path.exists(d + "/_DONE"):
            shutil.rmtree(d, ignore_errors=True)
            ray.data.range(n, override_num_blocks=32).map_batches(
                g, batch_format="pyarrow"
            ).write_parquet(d, compression="zstd")
            open(d + "/_DONE", "w").write("ok")

    t0 = time.perf_counter()
    joined = asof_join(
        ray.data.read_parquet(ldir),
        ray.data.read_parquet(rdir),
        by="user_id", on="ts", right_on="qts", num_parts=64,
    )
    n_joined = joined.count()
    sec = time.perf_counter() - t0
    assert n_joined == EVENTS  # LEFT semantics: every event row survives
    out["asof_join"] = {
        "sec": round(sec, 1),
        "rows_per_sec": round(EVENTS / sec),
        "rows": n_joined,
        "rss_gb_peak": rss_gb(),
    }

    # exact spot-check on one key against pandas merge_asof
    uid = 123
    lf = pd.read_parquet(ldir)
    rf = pd.read_parquet(rdir)
    want = pd.merge_asof(
        lf[lf.user_id == uid].sort_values("ts"),
        rf[rf.user_id == uid].sort_values("qts"),
        left_on="ts", right_on="qts", direction="backward",
    ).sort_values("event_id").reset_index(drop=True)
    got = (
        joined.filter(lambda r: r["user_id"] == uid or r.get("user_id_r") == uid)
        .to_pandas()
    )
    got = got[got["user_id"] == uid].sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_series_equal(
        got["quote_id"].astype("float64"), want["quote_id"].astype("float64"),
        check_names=False,
    )
    out["asof_join"]["spot_checked_rows"] = len(got)
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
