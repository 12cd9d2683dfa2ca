"""Per-actor lexicon memory: sorted-Arrow-buffer probe vs python dicts.

Round-3 VERDICT finding #5: the query actors built `_term_run`/`_df` dicts
over the WHOLE vocabulary (plus an object-array detour), which is the
per-actor memory ceiling at web-scale vocab (1e8+ terms).  The loader now
keeps the vocabulary as the concatenated term bytes + one int64 offset
array and probes with binary search (scorer.SearchEngine._term_index).

This tool measures both representations over a synthetic V-term lexicon
(16-byte avg terms, segment rows like a real heavy-split lexicon) and the
probe latency of the new path.  Run:

    PYTHONPATH=. python tools/stress_lexicon.py [V]
"""
import os
import sys
import time

import numpy as np
import pyarrow as pa


def rss_mb() -> float:
    """CURRENT resident set (not ru_maxrss peak, which can't go down)."""
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * os.sysconf("SC_PAGESIZE") / 2**20


def synth_terms(v: int) -> pa.Array:
    """V sorted unique terms, ~16 bytes each, generated vectorized."""
    ids = np.arange(v, dtype=np.uint64)
    # hex-encode for realistic byte spread; sorted by construction
    widths = 16
    buf = np.char.zfill(np.char.mod("%x", ids).astype("S16"), widths)
    data = buf.tobytes()
    offsets = np.arange(0, (v + 1) * widths, widths, dtype=np.int64)
    return pa.Array.from_buffers(
        pa.large_binary(), v, [None, pa.py_buffer(offsets), pa.py_buffer(data)]
    )


def main() -> None:
    v = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    terms = synth_terms(v)
    dfs = np.random.default_rng(0).integers(1, 1000, v).astype(np.int64)
    base = rss_mb()
    print(f"V={v:,} terms  base RSS {base:.0f} MB")

    # --- new path: offsets + bytes + binary search -------------------------
    t0 = time.perf_counter()
    bufs = terms.buffers()
    ut_offsets = np.frombuffer(bufs[1], dtype=np.int64, count=v + 1)
    ut_buf = bufs[2].to_pybytes()
    t_new = time.perf_counter() - t0
    new_mb = rss_mb() - base
    print(f"sorted-buffer vocab: +{new_mb:.0f} MB, built in {t_new:.2f}s")

    def probe(term: bytes) -> int:
        lo, hi = 0, v
        while lo < hi:
            mid = (lo + hi) >> 1
            if ut_buf[ut_offsets[mid] : ut_offsets[mid + 1]] < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < v and ut_buf[ut_offsets[lo] : ut_offsets[lo + 1]] == term:
            return lo
        return -1

    rng = np.random.default_rng(1)
    picks = rng.integers(0, v, 10_000)
    keys = [ut_buf[ut_offsets[i] : ut_offsets[i + 1]] for i in picks]
    t0 = time.perf_counter()
    hits = sum(probe(k) >= 0 for k in keys)
    per = (time.perf_counter() - t0) / len(keys)
    assert hits == len(keys)
    assert probe(b"\xffnope") < 0
    print(f"probe: {per * 1e6:.1f} us/term ({len(keys)} random probes, all hit)")

    # --- old path: full-vocab python dicts (what round <=3 actors held) ----
    if os.environ.get("SKIP_DICT"):
        return
    t0 = time.perf_counter()
    tl = terms.to_pylist()
    term_run = {t: (i, i + 1) for i, t in enumerate(tl)}
    df_map = {t: int(d) for t, d in zip(tl, dfs)}
    t_old = time.perf_counter() - t0
    old_mb = rss_mb() - base - new_mb
    print(
        f"dict vocab (old): +{old_mb:.0f} MB, built in {t_old:.2f}s "
        f"-> {old_mb / max(new_mb, 0.001):.0f}x the sorted-buffer footprint"
    )
    _ = (term_run, df_map)


if __name__ == "__main__":
    main()
