"""sliding_window_explode (wse_ray/functions/windows.py): coverage
invariants and parity with a brute-force per-row reference."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from wse_ray.functions.windows import sliding_window_explode

SIZE, HOP = 3_600_000_000, 900_000_000  # 1h / 15min


def _batch(ts_us):
    return pa.table(
        {
            "ts": pa.array(np.asarray(ts_us, np.int64).astype("datetime64[us]")),
            "v": pa.array(np.arange(len(ts_us), dtype=np.int64)),
        }
    )


def test_each_row_in_exactly_size_over_hop_windows():
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 10**12, 500)
    out = sliding_window_explode(_batch(ts), "ts", SIZE, HOP)
    assert len(out) == 500 * 4
    ws = out["window_start"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    t = out["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    assert (ws % HOP == 0).all()
    assert ((t >= ws) & (t < ws + SIZE)).all()  # every window covers its row
    # per original row: 4 DISTINCT window starts
    df = pd.DataFrame({"v": out["v"].to_numpy(zero_copy_only=False), "ws": ws})
    assert (df.groupby("v")["ws"].nunique() == 4).all()


def test_matches_bruteforce_reference():
    ts = np.array([0, 1, HOP - 1, HOP, SIZE, SIZE + 123456], np.int64)
    out = sliding_window_explode(_batch(ts), "ts", SIZE, HOP)
    got = set(
        zip(
            out["v"].to_numpy(zero_copy_only=False).tolist(),
            out["window_start"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64).tolist(),
        )
    )
    want = set()
    for i, t in enumerate(ts):
        ws = t // HOP * HOP
        while ws > t - SIZE:
            want.add((i, ws))
            ws -= HOP
    assert got == want


def test_hop_must_divide_size():
    with pytest.raises(ValueError):
        sliding_window_explode(_batch([0]), "ts", SIZE, 1_000_000_007)
