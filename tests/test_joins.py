"""partitioned_join: the big-big storage-shuffled hash join
(wse_ray/functions/joins.py) — how-variants vs pandas merge, key types,
null keys, empty sides, stage resume."""
import glob
import os

import numpy as np
import pandas as pd
import pytest

from wse_ray.functions.joins import asof_join, partitioned_join, range_join


def _pdf(**cols):
    return pd.DataFrame(cols)


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df)


L = _pdf(k=[1, 2, 2, 3, 5], lv=["a", "b", "c", "d", "e"])
R = _pdf(k=[2, 3, 3, 4], rv=[10, 20, 30, 40])


@pytest.mark.parametrize("how,phow", [("inner", "inner"), ("left", "left"),
                                      ("right", "right"), ("full", "outer")])
def test_how_variants_match_pandas(ray_session, how, phow):
    got = (
        partitioned_join(_ds(L), _ds(R), on="k", how=how, num_parts=4)
        .to_pandas()
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    want = (
        L.merge(R, on="k", how=phow)
        .sort_values(["k", "lv", "rv"], na_position="last")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for col in ("k", "lv", "rv"):
        pd.testing.assert_series_equal(
            got[col], want[col], check_dtype=False, check_names=False
        )


def test_semi_and_anti(ray_session):
    semi = partitioned_join(_ds(L), _ds(R), on="k", how="semi", num_parts=4).to_pandas()
    assert sorted(semi["k"].tolist()) == [2, 2, 3]
    assert list(semi.columns) == ["k", "lv"]  # no right columns
    anti = partitioned_join(_ds(L), _ds(R), on="k", how="anti", num_parts=4).to_pandas()
    assert sorted(anti["k"].tolist()) == [1, 5]


def test_differing_key_names_and_suffix(ray_session):
    r2 = R.rename(columns={"k": "rk"}).assign(lv=["p", "q", "r", "s"])
    got = partitioned_join(
        _ds(L), _ds(r2), on="k", right_on="rk", num_parts=4
    ).to_pandas()
    # collision on non-key column lv -> right side suffixed
    assert "lv" in got.columns and "lv_r" in got.columns
    assert sorted(got["k"].tolist()) == [2, 2, 3, 3]


def test_string_and_multicolumn_keys(ray_session):
    ls = _pdf(s=["x", "y", "y", "z"], g=[1, 1, 2, 1], v=[1, 2, 3, 4])
    rs = _pdf(s=["y", "y", "z", "w"], g=[1, 2, 2, 1], w=[9, 8, 7, 6])
    got = (
        partitioned_join(_ds(ls), _ds(rs), on=["s", "g"], num_parts=4)
        .to_pandas()
        .sort_values(["s", "g"])
        .reset_index(drop=True)
    )
    want = ls.merge(rs, on=["s", "g"]).sort_values(["s", "g"]).reset_index(drop=True)
    assert got[["s", "g", "v", "w"]].values.tolist() == want[["s", "g", "v", "w"]].values.tolist()


def test_null_keys_never_match(ray_session):
    ln = _pdf(k=pd.array([1, None, 2], dtype="Int64"), v=[1, 2, 3])
    rn = _pdf(k=pd.array([None, 2], dtype="Int64"), w=[8, 9])
    got = partitioned_join(_ds(ln), _ds(rn), on="k", num_parts=4).to_pandas()
    assert got["k"].tolist() == [2]  # SQL semantics: null != null


def test_empty_side(ray_session):
    empty = _pdf(k=pd.Series(dtype=np.int64), rv=pd.Series(dtype=np.int64))
    got = partitioned_join(_ds(L), _ds(empty), on="k", num_parts=4).to_pandas()
    assert len(got) == 0
    left = partitioned_join(_ds(L), _ds(empty), on="k", how="left", num_parts=4).to_pandas()
    assert sorted(left["k"].tolist()) == [1, 2, 2, 3, 5]
    assert left["rv"].isna().all()


def test_scratch_resume_skips_completed_exchanges(ray_session, tmp_path):
    scratch = str(tmp_path / "pj")
    os.makedirs(scratch)
    p1 = (
        partitioned_join(_ds(L), _ds(R), on="k", num_parts=4, scratch_dir=scratch)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    files = sorted(glob.glob(scratch + "/left/jpart=*/*.parquet"))
    assert files and os.path.exists(scratch + "/left/_SUCCESS")
    mt = [os.path.getmtime(f) for f in files]
    p2 = (
        partitioned_join(_ds(L), _ds(R), on="k", num_parts=4, scratch_dir=scratch)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(p1, p2)
    assert [
        os.path.getmtime(f)
        for f in sorted(glob.glob(scratch + "/left/jpart=*/*.parquet"))
    ] == mt  # exchange skipped


def test_crashed_partial_exchange_is_rebuilt(ray_session, tmp_path):
    """A stage dir WITHOUT its _SUCCESS marker (crashed mid-write) must be
    wiped and rewritten, not trusted."""
    scratch = str(tmp_path / "pj")
    os.makedirs(scratch + "/left/jpart=0", exist_ok=True)
    with open(scratch + "/left/jpart=0/garbage.parquet", "w") as f:
        f.write("not parquet")
    got = (
        partitioned_join(_ds(L), _ds(R), on="k", num_parts=4, scratch_dir=scratch)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = L.merge(R, on="k").sort_values(["k", "lv"]).reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert not os.path.exists(scratch + "/left/jpart=0/garbage.parquet")


def test_bad_how_raises(ray_session):
    with pytest.raises(ValueError):
        partitioned_join(_ds(L), _ds(R), on="k", how="cross")


HOT = 7  # the skewed key


def _skewed():
    lk = np.concatenate([np.full(400, HOT), np.arange(100)])
    ls = _pdf(k=lk.astype(np.int64), v=np.arange(len(lk), dtype=np.int64))
    rk = np.array([HOT, HOT, 3, 4, 5], dtype=np.int64)
    rs = _pdf(k=rk, w=np.arange(len(rk), dtype=np.int64) * 10)
    return ls, rs


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_hot_key_salting_matches_unsalted(ray_session, how):
    ls, rs = _skewed()
    plain = (
        partitioned_join(_ds(ls), _ds(rs), on="k", how=how, num_parts=8)
        .to_pandas()
    )
    salted = (
        partitioned_join(
            _ds(ls), _ds(rs), on="k", how=how, num_parts=8,
            hot_keys=[HOT], salt=4,
        )
        .to_pandas()
    )
    cols = list(plain.columns)
    a = plain.sort_values(cols, na_position="last").reset_index(drop=True)
    b = salted[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_hot_key_salting_spreads_partitions(ray_session, tmp_path):
    """The hot key's probe rows must land in `salt` distinct partitions
    (load spread), and build hot rows must be present in each of them."""
    import pyarrow.parquet as pq

    ls, rs = _skewed()
    scratch = str(tmp_path / "pj")
    os.makedirs(scratch)
    got = partitioned_join(
        _ds(ls), _ds(rs), on="k", num_parts=8, hot_keys=[HOT], salt=4,
        scratch_dir=scratch,
    ).to_pandas()
    # 401 hot probe rows (400 planted + k=7 from the arange) x 2 build
    # rows + 3 cold matches (k in {3,4,5})
    assert len(got) == 401 * 2 + 3
    hot_parts = set()
    for d in glob.glob(scratch + "/left/jpart=*"):
        t = pq.read_table(d)
        if (t["k"].to_numpy(zero_copy_only=False) == HOT).any():
            hot_parts.add(os.path.basename(d))
    assert len(hot_parts) == 4
    for p in hot_parts:
        rt = pq.read_table(scratch + f"/right/{p}")
        assert (rt["k"].to_numpy(zero_copy_only=False) == HOT).sum() == 2


AL = _pdf(
    k=[1, 1, 1, 2, 3],
    t=pd.to_datetime([10, 20, 30, 15, 5], unit="s"),
    lv=np.arange(5, dtype=np.int64),
)
AR = _pdf(
    k=[1, 1, 2],
    t=pd.to_datetime([12, 25, 40], unit="s"),
    rv=np.array([100, 200, 300], dtype=np.int64),
)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(ray_session, direction):
    got = (
        asof_join(_ds(AL), _ds(AR), by="k", on="t", direction=direction, num_parts=4)
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        AL.sort_values("t"), AR.sort_values("t"), on="t", by="k",
        direction=direction,
    ).sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[list(want.columns)], want, check_dtype=False)


def test_asof_schema_stable_with_all_miss_partitions(ray_session):
    """A partition whose keys have no right rows must not emit float64
    where matched partitions emit int64 (block schema agreement)."""
    left = _pdf(
        k=np.arange(20, dtype=np.int64),
        t=pd.to_datetime(np.arange(20), unit="s"),
        lv=np.arange(20, dtype=np.int64),
    )
    right = _pdf(  # only key 0 has history
        k=np.zeros(1, dtype=np.int64),
        t=pd.to_datetime([0], unit="s"),
        rv=np.array([7], dtype=np.int64),
    )
    got = asof_join(_ds(left), _ds(right), by="k", on="t", num_parts=8).to_pandas()
    assert len(got) == 20
    assert int(got.loc[got["k"] == 0, "rv"].iloc[0]) == 7
    assert got.loc[got["k"] != 0, "rv"].isna().all()


def test_asof_differing_names_and_exact_match_inclusive(ray_session):
    r2 = AR.rename(columns={"k": "rk", "t": "rt"})
    got = (
        asof_join(
            _ds(AL), _ds(r2), by="k", on="t", right_by="rk", right_on="rt",
            num_parts=4,
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    # left t=12? no — left k=1 t=20 matches right t=12 (backward), and an
    # exact-equal timestamp is inclusive
    assert int(got.loc[got["lv"] == 1, "rv"].iloc[0]) == 100
    exact = asof_join(
        _ds(_pdf(k=[1], t=pd.to_datetime([12], unit="s"), lv=[0])),
        _ds(AR), by="k", on="t", num_parts=2,
    ).to_pandas()
    assert int(exact["rv"].iloc[0]) == 100


def _range_brute(ldf, rdf, lo, hi):
    m = ldf.merge(rdf, on="k", suffixes=("", "_r"))
    m = m[
        (m["t_r"] >= m["t"] + pd.Timedelta(microseconds=lo))
        & (m["t_r"] <= m["t"] + pd.Timedelta(microseconds=hi))
    ]
    return set(zip(m["lv"], m["rv"]))


@pytest.mark.parametrize("lo,hi", [(0, 300_000_000), (-120_000_000, 180_000_000)])
def test_range_join_matches_bruteforce(ray_session, lo, hi):
    rng = np.random.default_rng(11)
    ldf = _pdf(
        k=rng.integers(0, 5, 60),
        t=pd.to_datetime(rng.integers(0, 3000, 60), unit="s"),
        lv=np.arange(60, dtype=np.int64),
    )
    rdf = _pdf(
        k=rng.integers(0, 5, 50),
        t=pd.to_datetime(rng.integers(0, 3000, 50), unit="s"),
        rv=np.arange(50, dtype=np.int64),
    )
    got = range_join(
        _ds(ldf), _ds(rdf), by="k", on="t", lower_us=lo, upper_us=hi, num_parts=4
    ).to_pandas()
    assert set(zip(got["lv"], got["rv"])) == _range_brute(ldf, rdf, lo, hi)


def test_range_join_boundary_inclusive_and_no_dup_pairs(ray_session):
    # exact endpoints are in; a pair never surfaces twice even when the
    # left row straddles two candidate buckets
    ldf = _pdf(k=[1, 1], t=pd.to_datetime([100, 250], unit="s"), lv=np.array([0, 1], np.int64))
    rdf = _pdf(
        k=[1, 1, 1],
        t=pd.to_datetime([100, 400, 550], unit="s"),  # 550 = left1 + exactly 300s
        rv=np.array([0, 1, 2], np.int64),
    )
    got = range_join(
        _ds(ldf), _ds(rdf), by="k", on="t", lower_us=0, upper_us=300_000_000,
        num_parts=4,
    ).to_pandas()
    pairs = list(zip(got["lv"], got["rv"]))
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == {(0, 0), (0, 1), (1, 1), (1, 2)}


def test_range_join_bad_bounds_raise(ray_session):
    with pytest.raises(ValueError):
        range_join(_ds(L), _ds(R), by="k", on="t", lower_us=5, upper_us=5)


def test_asof_bad_direction_raises(ray_session):
    with pytest.raises(ValueError):
        asof_join(_ds(AL), _ds(AR), by="k", on="t", direction="nearest")


def test_hot_key_salting_rejects_unsound_modes(ray_session):
    with pytest.raises(ValueError):
        partitioned_join(_ds(L), _ds(R), on="k", how="full", hot_keys=[2])
    with pytest.raises(ValueError):
        partitioned_join(
            _ds(L), _ds(R), on=["k", "lv"], right_on=["k", "rv"], hot_keys=[2]
        )


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_auto_split_matches_unsplit(ray_session, how):
    """The automatic skew valve (stripe oversized left partitions at join
    time) must be row-invariant vs auto_split=False for every supported
    how, on an input skewed enough to trigger it."""
    rng = np.random.default_rng(3)
    n = 40_000
    k = rng.integers(0, 200, n).astype(np.int64)
    k[: n // 2] = HOT  # half the probe rows on one key
    ls = _pdf(k=k, v=np.arange(n, dtype=np.int64))
    rk = np.arange(150, dtype=np.int64)  # some keys unmatched on purpose
    rs = _pdf(k=rk, w=rk * 10)
    base = partitioned_join(
        _ds(ls), _ds(rs), on="k", how=how, num_parts=8, auto_split=False
    ).to_pandas()
    got = partitioned_join(
        _ds(ls), _ds(rs), on="k", how=how, num_parts=8
    ).to_pandas()
    cols = list(base.columns)
    a = base.sort_values(cols, na_position="last").reset_index(drop=True)
    b = got[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_auto_split_detects_and_stripes(ray_session, tmp_path, monkeypatch):
    """The skewed partition must actually be detected (its join fans out
    into multiple stripe tasks) and cold partitions must stay single-task."""
    import wse_ray.functions.joins as J

    calls = []
    orig = J._stripe_units

    def spy(units, n):
        out = orig(units, n)
        calls.append((units[0][0], len(out)))  # keyed by a fragment path
        return out

    monkeypatch.setattr(J, "_stripe_units", spy)
    rng = np.random.default_rng(4)
    n = 40_000
    k = rng.integers(0, 200, n).astype(np.int64)
    k[: n // 2] = HOT
    ls = _pdf(k=k, v=np.arange(n, dtype=np.int64))
    rs = _pdf(k=np.arange(200, dtype=np.int64), w=np.arange(200, dtype=np.int64))
    got = partitioned_join(
        _ds(ls), _ds(rs), on="k", num_parts=8,
        scratch_dir=str(tmp_path / "pj"),
    ).to_pandas()
    assert len(got) == n  # every probe row joins exactly once
    assert calls, "skewed partition was not detected"
    assert all(nstripes > 1 for _, nstripes in calls)
    assert len({p for p, _ in calls}) <= 2  # only the hot partition(s) split


# --------------------------------------------------------------------------
# r5: bucketed as-of (time-range sub-partitioning + boundary replication)
# --------------------------------------------------------------------------


def _asof_rand(n_left, n_right, n_keys, seed, hot_frac=0.0):
    """Random as-of inputs with globally UNIQUE timestamps (documented tie
    caveat) and an optional hot key holding ``hot_frac`` of all rows."""
    rng = np.random.default_rng(seed)
    ts = rng.permutation(n_left + n_right).astype(np.int64) * 1_000_000
    lk = rng.integers(0, n_keys, n_left).astype(np.int64)
    rk = rng.integers(0, n_keys, n_right).astype(np.int64)
    if hot_frac:
        lk[rng.random(n_left) < hot_frac] = 0
        rk[rng.random(n_right) < hot_frac] = 0
    left = _pdf(
        k=lk,
        t=pd.to_datetime(ts[:n_left], unit="us"),
        lv=np.arange(n_left, dtype=np.int64),
    )
    right = _pdf(
        k=rk,
        t=pd.to_datetime(ts[n_left:], unit="us"),
        rv=np.arange(n_right, dtype=np.int64) * 10,
    )
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("bucket_us", [7_000_000, 60_000_000])
def test_asof_bucketed_matches_pandas(ray_session, direction, bucket_us):
    left, right = _asof_rand(400, 300, 13, seed=5, hot_frac=0.3)
    got = (
        asof_join(
            _ds(left), _ds(right), by="k", on="t", direction=direction,
            num_parts=8, bucket_us=bucket_us,
        )
        .to_pandas()
        .sort_values("lv")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k",
        direction=direction,
    ).sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[list(want.columns)], want, check_dtype=False)


def test_asof_bucketed_equals_default_path(ray_session):
    left, right = _asof_rand(500, 500, 7, seed=9)
    a = (
        asof_join(_ds(left), _ds(right), by="k", on="t", num_parts=6)
        .to_pandas().sort_values("lv").reset_index(drop=True)
    )
    b = (
        asof_join(
            _ds(left), _ds(right), by="k", on="t", num_parts=6,
            bucket_us=11_000_000,
        )
        .to_pandas().sort_values("lv").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_asof_bucketed_single_key_spreads_partitions(ray_session, tmp_path):
    """The point of bucket_us: ONE key's history must not concentrate in
    one exchange partition."""
    import pyarrow.parquet as pq

    left, right = _asof_rand(600, 600, 1, seed=3)  # every row the same key
    scratch = str(tmp_path / "asofb")
    os.makedirs(scratch)
    got = asof_join(
        _ds(left), _ds(right), by="k", on="t", num_parts=8,
        bucket_us=20_000_000, scratch_dir=scratch,
    ).to_pandas()
    used = [
        pq.read_table(d).num_rows
        for d in glob.glob(scratch + "/left/jpart=*")
    ]
    assert len(used) >= 4, f"single key stuck in {len(used)} partitions"
    assert max(used) < 600
    want = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"), on="t", by="k",
        direction="backward",
    )
    g = got.sort_values("lv").reset_index(drop=True)
    w = want.sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(g[list(w.columns)], w, check_dtype=False)


def test_asof_bucketed_empty_right(ray_session):
    left, right = _asof_rand(50, 30, 4, seed=1)
    got = asof_join(
        _ds(left), _ds(right.iloc[:0]), by="k", on="t", num_parts=4,
        bucket_us=10_000_000,
    ).to_pandas()
    assert len(got) == 50
    assert got["rv"].isna().all()
    assert set(got.columns) == {"k", "t", "lv", "rv"}


def test_asof_kernel_hypothesis_matches_bruteforce():
    """Property sweep of the composite-searchsorted backward kernel vs a
    per-row brute force, including duplicate timestamps (tie -> LAST in
    input order) and keys missing from either side."""
    from hypothesis import given, settings, strategies as st

    from wse_ray.functions.joins import _asof_backward_indices

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=40),
        st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=40),
    )
    def check(left, right):
        l_code = np.array([k for k, _ in left], dtype=np.int64)
        l_ts = np.array([t for _, t in left], dtype=np.int64)
        r_code = np.array([k for k, _ in right], dtype=np.int64)
        r_ts = np.array([t for _, t in right], dtype=np.int64)
        got = _asof_backward_indices(l_code, l_ts, r_code, r_ts)
        for i in range(len(left)):
            best = -1
            for j in range(len(right)):  # later j wins ties: last-in-order
                if r_code[j] == l_code[i] and r_ts[j] <= l_ts[i]:
                    if best < 0 or r_ts[j] > r_ts[best] or (
                        r_ts[j] == r_ts[best] and j > best
                    ):
                        best = j
            assert got[i] == best, (i, left, right)

    check()


def test_asof_bucketed_scratch_resume(ray_session, tmp_path):
    """Bucketed as-of with a resume root: the five stage dirs carry
    _SUCCESS markers and a second run reuses them, byte-for-byte."""
    import glob as _glob

    left, right = _asof_rand(300, 300, 9, seed=21)
    scratch = str(tmp_path / "asof_resume")
    os.makedirs(scratch)
    r1 = asof_join(
        _ds(left), _ds(right), by="k", on="t", num_parts=6,
        bucket_us=13_000_000, scratch_dir=scratch,
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    stages = sorted(
        os.path.basename(d)
        for d in _glob.glob(scratch + "/*")
        if os.path.isdir(d)
    )
    assert stages == ["boundary", "left", "left_pairs", "right", "summaries"]
    for s in stages:
        assert os.path.exists(os.path.join(scratch, s, "_SUCCESS")), s
    mt = {
        f: os.path.getmtime(f)
        for f in _glob.glob(scratch + "/*/jpart=*/*.parquet")
    }
    r2 = asof_join(
        _ds(left), _ds(right), by="k", on="t", num_parts=6,
        bucket_us=13_000_000, scratch_dir=scratch,
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    pd.testing.assert_frame_equal(r1, r2)
    assert {
        f: os.path.getmtime(f)
        for f in _glob.glob(scratch + "/*/jpart=*/*.parquet")
    } == mt


def test_asof_bucketed_differing_names_and_suffix(ray_session):
    """Bucketed path with renamed right key/time columns and a colliding
    payload column (suffix applied) — same semantics as the default
    path."""
    left, right = _asof_rand(200, 150, 5, seed=33)
    left = left.assign(x=np.arange(200, dtype=np.int64))
    r2 = right.rename(columns={"k": "rk", "t": "rt"}).assign(
        x=np.arange(150, dtype=np.int64) * 7
    )
    got = (
        asof_join(
            _ds(left), _ds(r2), by="k", on="t", right_by="rk",
            right_on="rt", num_parts=4, bucket_us=9_000_000,
        )
        .to_pandas().sort_values("lv").reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t"),
        r2.rename(columns={"rk": "k", "rt": "t"}).sort_values("t"),
        on="t", by="k", direction="backward", suffixes=("", "_r"),
    ).sort_values("lv").reset_index(drop=True)
    assert "x" in got.columns and "x_r" in got.columns
    pd.testing.assert_frame_equal(got[list(want.columns)], want, check_dtype=False)
