"""Distributed partitioned equi-join — the big-big companion to the
broadcast joins in ``pipelines/relational.py``.

A broadcast join (``q_revenue_by_nation``) is right while the build side
fits every worker's heap; when BOTH sides are large (orders ⋈ lineitem at
TPC-H-100TB) the only scalable shape is to co-partition the two sides by
join key and join each partition independently.  This module implements
that with the repo's storage-is-the-shuffle pattern (measured ~20x faster
than Ray Data's in-memory groupby shuffle on this class of host, see
BASELINE.md):

1. each side hash-partitions on the join key via ``map_batches`` and
   writes hive-partitioned zstd Parquet (``jpart=K/``) — an all-to-all
   exchange whose buffering/spill is the filesystem, resumable via a
   ``_SUCCESS`` marker per side;
2. one task per partition reads its two slices and joins them with
   ``pyarrow.Table.join`` (Arrow's vectorized C++ hash join) — returned as
   a streaming ``ray.data.Dataset``, so downstream aggregation pipelines
   without materializing the joined rows.

Partitioning assumption: rows with equal keys land in the same ``jpart``
on both sides (same mix function, same ``num_parts``).  A pathologically
hot key concentrates its rows in one partition — pre-aggregate before the
join where semantics allow, or salt the hot keys (split one key into
``key×S`` variants on the probe side and replicate the build side S ways).

No reference counterpart: the reference engine has no relational join
(SURVEY.md §2.5 — its four lookups are hash/offset probes).
"""
from __future__ import annotations

import glob as _glob
import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import scratch_base
from .dedup import _fresh_stage, _stage_done, _stage_mark

_HOW_MAP = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "semi": "left semi",
    "anti": "left anti",
}


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: spreads patterned int keys (sequential ids,
    strided fks) uniformly across partitions."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64, copy=True)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _key_hash(t: pa.Table, keys: list[str]) -> np.ndarray:
    """Combined routing hash over one or more key columns.  int-family
    columns hash via splitmix64 on their values; string/binary via the
    buffer-level routing hash (no per-row python objects).  Routing-only:
    collisions just co-locate keys, never mis-join (the join itself
    compares real values)."""
    from ..index.build import _binary_route_hash

    h = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        col = t[k]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False)
            # nulls: route to a fixed lane; SQL join semantics never match
            # them anyway (pyarrow.Table.join follows SQL here)
            v = np.where(np.isnan(v), 0, v) if v.dtype.kind == "f" else v
            hk = _mix64(v.astype(np.int64).astype(np.uint64))
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            hk = _binary_route_hash(col.cast(pa.large_binary()))
        elif pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            hk = _binary_route_hash(col.cast(pa.large_binary()))
        else:
            raise TypeError(f"unsupported join-key type for {k}: {col.type}")
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15) + hk.astype(np.uint64)
    return h


class _AssignJoinPart:
    def __init__(self, keys: list[str], num_parts: int):
        self.keys = keys
        self.num_parts = num_parts

    def __call__(self, t: pa.Table) -> pa.Table:
        part = (_key_hash(t, self.keys) % np.uint64(self.num_parts)).astype(np.int64)
        return t.append_column("jpart", pa.array(part, pa.int64()))


class _AssignJoinPartSalted:
    """Skew valve for a pathologically hot join key.

    A hot key's rows all hash to ONE partition, so that partition's task
    holds the whole hot cluster while its siblings idle.  Salting spreads
    it: PROBE-side hot rows scatter round-robin over ``salt`` derived
    partitions ``(h(k)+i) % P``; BUILD-side hot rows REPLICATE to all
    ``salt`` of them, so every probe row still sees every matching build
    row.  Output is assignment-invariant — only load balance changes.

    Correct for inner/left/semi/anti (each PROBE row is still joined
    exactly once against the full build set).  Unsound for right/full
    outer: an unmatched replicated build row would surface once per
    replica — ``partitioned_join`` rejects that combination.
    """

    def __init__(self, keys, num_parts, hot_keys, salt, role):
        self.keys = keys
        self.num_parts = num_parts
        self.hot = np.asarray(sorted(hot_keys))
        self.salt = salt
        self.role = role  # "probe" (scatter) | "build" (replicate)

    def __call__(self, t: pa.Table) -> pa.Table:
        P = np.uint64(self.num_parts)
        h = _key_hash(t, self.keys)
        base = (h % P).astype(np.int64)
        col = t[self.keys[0]]
        keys = (
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        ).to_numpy(zero_copy_only=False)
        is_hot = np.isin(keys, self.hot)
        if self.role == "probe":
            n_hot = int(is_hot.sum())
            if n_hot:
                spread = np.arange(n_hot, dtype=np.uint64) % np.uint64(self.salt)
                base[is_hot] = ((h[is_hot] + spread) % P).astype(np.int64)
            return t.append_column("jpart", pa.array(base, pa.int64()))
        cold = t.filter(pa.array(~is_hot)).append_column(
            "jpart", pa.array(base[~is_hot], pa.int64())
        )
        hot_t = t.filter(pa.array(is_hot))
        if len(hot_t) == 0:
            return cold
        reps = [
            hot_t.append_column(
                "jpart",
                pa.array(((h[is_hot] + np.uint64(i)) % P).astype(np.int64), pa.int64()),
            )
            for i in range(self.salt)
        ]
        return pa.concat_tables([cold, *reps], promote_options="none")


def _read_part(root: str, part: int, schema: pa.Schema) -> pa.Table:
    d = os.path.join(root, f"jpart={part}")
    if not os.path.isdir(d):
        return schema.empty_table()
    return pq.read_table(d, schema=schema)


def _partition_meta(root: str, num_parts: int) -> tuple[np.ndarray, dict]:
    """(rows-per-partition, {part: [(file, row_group, rows), ...]}) from ONE
    pass over the exchange's parquet footers — free skew telemetry (the
    analog of the index build detecting heavy terms from tokenize partials,
    build.py:127-169).  Rows, not file bytes: a hot key's near-constant key
    column compresses so well under zstd that a 7x row skew can hide inside
    a <4x byte ratio (measured in tools/stress_join.py), while join probe
    cost scales with rows.  One pass: the striper reuses the same footers,
    so a high-latency filesystem is not hit twice per fragment."""
    rows = np.zeros(num_parts, dtype=np.int64)
    units: dict[int, list] = {}
    for i in range(num_parts):
        d = os.path.join(root, f"jpart={i}")
        if not os.path.isdir(d):
            continue
        us = []
        for e in sorted(os.scandir(d), key=lambda e: e.name):
            if not e.name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(e.path).metadata
            rows[i] += md.num_rows
            for rg in range(md.num_row_groups):
                us.append((e.path, rg, md.row_group(rg).num_rows))
        units[i] = us
    return rows, units


def _stripe_units(units: list, n_stripes: int) -> list[list]:
    """Greedy row-balanced (file, row_group) stripes of one partition's
    fragment units.

    Striping the PROBE side at join time replaces key salting for detected
    skew: any disjoint cover of the probe rows joined against the FULL
    build partition unions to the exact join result (each probe row is
    joined exactly once), with no second exchange and no hot-key
    identification — it balances whatever caused the rows, hot key or
    otherwise."""
    units = sorted(units, key=lambda u: -u[2])
    loads = [0] * n_stripes
    stripes: list[list] = [[] for _ in range(n_stripes)]
    for f, rg, n in units:
        i = loads.index(min(loads))
        stripes[i].append([f, rg])
        loads[i] += n
    return [s for s in stripes if s]


def _side_schema(root: str, ds) -> pa.Schema:
    """Schema of a written side: from any fragment if one exists (cheap
    metadata read), else from the Dataset's own schema (fully-empty side)."""
    files = _glob.glob(os.path.join(root, "jpart=*", "*.parquet"))
    if files:
        return pq.read_schema(files[0])
    s = ds.schema()  # ray.data.Schema: arrow types OR numpy dtypes
    flds = []
    for n, t in zip(s.names, s.types):
        if n == "jpart":
            continue
        if not isinstance(t, pa.DataType):
            try:
                t = pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                t = pa.string()  # pandas object column
        flds.append(pa.field(n, t))
    return pa.schema(flds)


def partitioned_join(
    left,
    right,
    on: str | list[str],
    right_on: str | list[str] | None = None,
    how: str = "inner",
    num_parts: int = 32,
    scratch_dir: str | None = None,
    right_suffix: str = "_r",
    hot_keys=None,
    salt: int = 8,
    auto_split: bool = True,
    skew_factor: float = 4.0,
    max_split: int = 16,
):
    """Join two Datasets on equality of key column(s) without broadcasting
    either side.  Returns a streaming ``ray.data.Dataset`` of joined rows.

    ``scratch_dir`` (optional) is a resume root with the same contract as
    the dedup engines: each side's exchange carries a ``_SUCCESS`` marker
    and is skipped when complete; the caller owns input identity.

    **Skew handling is automatic** (``auto_split``, default on, how in
    inner/left/semi/anti): after the exchange, any LEFT partition whose
    footer row count exceeds ``skew_factor`` x the median partition gets its
    join task split into up to ``max_split`` size-balanced row-group
    stripes, each joined against the full right partition — detected from
    the exchange's own file sizes (free metadata, the analog of the index
    build detecting heavy terms from partials), needing no second
    exchange, no hot-key identification, and no caller knob.  Output is
    stripe-invariant: each left row joins exactly once.  Right/full outer
    joins skip the valve (an unmatched right row would surface once per
    stripe); put the skewed side on the left, or pre-aggregate.

    ``hot_keys`` (optional, single-column keys, how in inner/left/semi/
    anti): known pathologically-hot key values to salt over ``salt``
    partitions at EXCHANGE time — probe rows scatter, build rows
    replicate (see ``_AssignJoinPartSalted``).  Auto-split usually makes
    this unnecessary; it remains for when the skewed partition's exchange
    write itself is the bottleneck.
    """
    import ray
    import ray.data

    if how not in _HOW_MAP:
        raise ValueError(f"how={how!r}; expected one of {sorted(_HOW_MAP)}")
    lkeys = [on] if isinstance(on, str) else list(on)
    rkeys = lkeys if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    if len(lkeys) != len(rkeys):
        raise ValueError("on and right_on must name the same number of columns")
    if hot_keys is not None:
        if len(lkeys) != 1:
            raise ValueError("hot_keys salting supports single-column keys only")
        if how in ("right", "full"):
            raise ValueError(
                "hot_keys salting replicates build rows; right/full outer "
                "would emit unmatched build rows once per replica"
            )
        l_assign = _AssignJoinPartSalted(lkeys, num_parts, hot_keys, salt, "probe")
        r_assign = _AssignJoinPartSalted(rkeys, num_parts, hot_keys, salt, "build")
    else:
        l_assign = _AssignJoinPart(lkeys, num_parts)
        r_assign = _AssignJoinPart(rkeys, num_parts)

    owns = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="pjoin_", dir=scratch_base())
    ldir, rdir = os.path.join(scratch, "left"), os.path.join(scratch, "right")
    try:
        if not _stage_done(ldir):
            _fresh_stage(ldir)
            left.map_batches(
                l_assign, batch_format="pyarrow"
            ).write_parquet(ldir, partition_cols=["jpart"], compression="zstd")
            _stage_mark(ldir)
        if not _stage_done(rdir):
            _fresh_stage(rdir)
            right.map_batches(
                r_assign, batch_format="pyarrow"
            ).write_parquet(rdir, partition_cols=["jpart"], compression="zstd")
            _stage_mark(rdir)

        lschema = _side_schema(ldir, left)
        rschema = _side_schema(rdir, right)
        arrow_how = _HOW_MAP[how]

        splits: dict[int, int] = {}
        part_units: dict[int, list] = {}
        if auto_split and how in ("inner", "left", "semi", "anti"):
            rows, part_units = _partition_meta(ldir, num_parts)
            nz = rows[rows > 0]
            med = float(np.median(nz)) if len(nz) else 0.0
            if med > 0:
                for i in range(num_parts):
                    if rows[i] > skew_factor * med:
                        splits[i] = min(max_split, int(np.ceil(rows[i] / med)))

        import json as _json

        specs = []
        for i in range(num_parts):
            n = splits.get(i, 1)
            if n <= 1:
                specs.append({"part": i, "units": ""})
            else:
                for stripe in _stripe_units(part_units[i], n):
                    specs.append({"part": i, "units": _json.dumps(stripe)})

        def join_part(batch: pa.Table) -> pa.Table:
            part = int(batch["part"][0].as_py())
            units = batch["units"][0].as_py()
            if units:  # skew stripe: a disjoint row-group subset of left
                import json as _json2

                pieces = [
                    pq.ParquetFile(f).read_row_group(rg)
                    for f, rg in _json2.loads(units)
                ]
                lt = pa.concat_tables(pieces).cast(lschema)
            else:
                lt = _read_part(ldir, part, lschema)
            rt = _read_part(rdir, part, rschema)
            out = lt.join(
                rt,
                keys=lkeys,
                right_keys=rkeys,
                join_type=arrow_how,
                right_suffix=right_suffix,
            )
            # hive partition values parse back as int32; normalize nothing
            # else — join output schema is constant across partitions
            return out

        joined = ray.data.from_items(specs).map_batches(
            join_part, batch_size=1, batch_format="pyarrow"
        )
        if owns:
            # caller gave no resume root: materialization boundary so the
            # temp exchange can be deleted before returning
            joined = joined.materialize()
        return joined
    finally:
        if owns:
            shutil.rmtree(scratch, ignore_errors=True)


def range_join(
    left,
    right,
    by: str,
    on: str,
    lower_us: int,
    upper_us: int,
    right_by: str | None = None,
    right_on: str | None = None,
    num_parts: int = 32,
    scratch_dir: str | None = None,
    right_suffix: str = "_r",
):
    """Interval join: emit every (left, right) pair of the same ``by`` key
    with ``right.on`` in the closed interval
    ``[left.on + lower_us, left.on + upper_us]`` (timestamps compared at
    microsecond precision; inner semantics — unmatched rows drop).

    Scale shape — composed from the partitioned-join exchange, NOT a
    per-key cross product: with bucket width W = upper_us - lower_us,
    every right row gets ONE time bucket ``floor(t/W)`` and every left
    row lands in AT MOST TWO candidate buckets (the floor of each
    interval endpoint), so an equi-join on ``(key, bucket)`` is a
    superset of the true pairs with bounded blowup (rows per (key,
    bucket), not rows per key) — the exact interval filter then runs
    vectorized on the joined batches.  A (left,right) pair can match in
    only one bucket (the right row has one), so no dedup pass is needed.
    """
    import pyarrow.compute as pc
    import ray.data  # noqa: F401  (partitioned_join inits lazily)

    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    W = upper_us - lower_us
    rby = right_by or by
    ron = right_on or on
    BKT = "__range_bucket"

    def _ts_us(t: pa.Table, col: str) -> np.ndarray:
        c = t[col]
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        return (
            c.cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )

    def explode_left(t: pa.Table) -> pa.Table:
        ts = _ts_us(t, on)
        b1 = (ts + lower_us) // W
        b2 = (ts + upper_us) // W
        n = len(t)
        idx = np.repeat(np.arange(n, dtype=np.int64), 2)
        bkt = np.stack([b1, b2], axis=1).reshape(-1)
        keep = np.ones(2 * n, dtype=bool)
        keep[1::2] = b2 != b1  # second candidate only when distinct
        out = t.take(pa.array(idx[keep]))
        return out.append_column(BKT, pa.array(bkt[keep], pa.int64()))

    def bucket_right(t: pa.Table) -> pa.Table:
        ts = _ts_us(t, ron)
        return t.append_column(BKT, pa.array(ts // W, pa.int64()))

    j = partitioned_join(
        left.map_batches(explode_left, batch_format="pyarrow"),
        right.map_batches(bucket_right, batch_format="pyarrow"),
        on=[by, BKT],
        right_on=[rby, BKT],
        how="inner",
        num_parts=num_parts,
        scratch_dir=scratch_dir,
        right_suffix=right_suffix,
    )
    l_on, r_on = on, (ron if ron != on else on + right_suffix)

    def exact_filter(t: pa.Table) -> pa.Table:
        lt = _ts_us(t, l_on)
        rt = _ts_us(t, r_on)
        mask = (rt >= lt + lower_us) & (rt <= lt + upper_us)
        out = t.filter(pa.array(mask))
        return out.drop_columns([BKT])

    return j.map_batches(exact_filter, batch_format="pyarrow")


def _ts_i64(col) -> np.ndarray:
    """timestamp/int column -> int64 microseconds (vectorized)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(col.type):
        return (
            col.cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _pair_codes(l_key, r_key) -> tuple[np.ndarray, np.ndarray]:
    """Consistent integer codes for the two sides' key columns (any key
    type) via one dictionary-encode over their concatenation."""
    import pyarrow.compute as pc

    la = l_key.combine_chunks() if isinstance(l_key, pa.ChunkedArray) else l_key
    ra = r_key.combine_chunks() if isinstance(r_key, pa.ChunkedArray) else r_key
    if ra.type != la.type:
        ra = ra.cast(la.type)
    enc = pc.dictionary_encode(pa.chunked_array([la, ra]))
    codes = enc.combine_chunks().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return codes[: len(la)], codes[len(la):]


def _asof_backward_indices(
    l_code: np.ndarray, l_ts: np.ndarray, r_code: np.ndarray, r_ts: np.ndarray
) -> np.ndarray:
    """Vectorized backward-as-of probe: for each left row, the index into
    the right arrays of the LATEST right row of the same code with
    ``r_ts <= l_ts`` (ties -> last in input order), or -1 when none.

    One composite-key searchsorted over the whole partition — no per-key
    loop, no pandas: timestamps are rank-compressed against the union of
    both sides' values so ``code * M + rank`` fits int64 for any
    partition under ~3e9 rows (asserted)."""
    nl, nr = len(l_code), len(r_code)
    if nl == 0 or nr == 0:
        return np.full(nl, -1, dtype=np.int64)
    u = np.unique(np.concatenate([l_ts, r_ts]))
    M = np.int64(len(u) + 1)
    assert (nl + nr + 1) < 3_000_000_000, "partition too large for composite"
    l_comp = l_code * M + np.searchsorted(u, l_ts)
    r_comp = r_code * M + np.searchsorted(u, r_ts)
    order = np.argsort(r_comp, kind="stable")
    pos = np.searchsorted(r_comp[order], l_comp, side="right") - 1
    idx = order[np.maximum(pos, 0)]
    valid = (pos >= 0) & (r_code[idx] == l_code)
    return np.where(valid, idx, -1)


def _asof_assemble(
    lt: pa.Table,
    rt: pa.Table,
    idx: np.ndarray,
    drop_left: list[str],
    drop_right: list[str],
    right_suffix: str,
) -> pa.Table:
    """Left columns + gathered right payload (null where idx < 0 — Arrow
    ``take`` with null indices keeps the right columns' REAL types on an
    all-miss partition, where pandas would upgrade ints to float64)."""
    import pyarrow.compute as pc

    ind = pa.array(idx, type=pa.int64(), mask=idx < 0)
    arrays, fields = [], []
    for f in lt.schema:
        if f.name in drop_left:
            continue
        arrays.append(lt[f.name].combine_chunks())
        fields.append(f)
    lnames = {f.name for f in fields}
    for f in rt.schema:
        if f.name in drop_right:
            continue
        name = f.name + right_suffix if f.name in lnames else f.name
        arrays.append(pc.take(rt[f.name].combine_chunks(), ind))
        fields.append(pa.field(name, f.type))
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


_ASOF_TS = "__asof_ts"
_ASOF_BKT = "__asof_bucket"


def asof_join(
    left,
    right,
    by: str,
    on: str,
    right_by: str | None = None,
    right_on: str | None = None,
    direction: str = "backward",
    num_parts: int = 32,
    scratch_dir: str | None = None,
    right_suffix: str = "_r",
    bucket_us: int | None = None,
):
    """As-of join: for each left row, the temporally nearest right row of
    the same ``by`` key (``backward`` = latest right ``on`` <= left ``on``;
    ``forward`` = earliest >=; left rows without a match keep nulls — LEFT
    semantics, like DuckDB's ``ASOF LEFT JOIN``).

    Scale shape, default (``bucket_us=None``): both sides hash-partition
    by the ``by`` key through the same storage exchange as
    ``partitioned_join``, then one task per partition runs the vectorized
    Arrow/numpy composite-searchsorted kernel
    (``_asof_backward_indices`` — no pandas round-trip).  Partition count
    bounds the per-task working set, but a single key's FULL history must
    fit one worker.

    ``bucket_us=W`` lifts that per-key bound with TIME-RANGE
    SUB-PARTITIONING + BOUNDARY REPLICATION: rows co-partition on
    ``(key, floor(ts/W))`` so one task holds one key's W-wide slice, and
    for every left-side (key, bucket) the latest right row from any
    EARLIER bucket is replicated into that bucket as its boundary
    candidate (computed from per-(key,bucket) right summaries — one small
    key-partitioned pass; a summary can serve many target buckets).  Any
    left row's true match is then either in-bucket or its bucket's
    boundary row, both co-located; extra candidates from hash-colliding
    buckets are real same-key rows that never beat the true max.  Forward
    direction runs the same machinery on negated timestamps.

    Tie semantics: equal right timestamps within one key resolve to the
    last row in (``on``, partition-read-order) — same class of behavior
    as pandas ``merge_asof``; engines differ here, so keep right-side
    timestamps unique per key when exact parity with another system
    matters (the bucketed path additionally reduces summary ties
    arbitrarily across batches).
    """
    import ray.data

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction={direction!r}")
    if bucket_us is not None and bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    rby = right_by or by
    ron = right_on or on
    sign = -1 if direction == "forward" else 1

    def prep_right(t: pa.Table) -> pa.Table:
        """Rename right key/time columns to the left's names up front."""
        names = [
            by if c == rby else (on if c == ron else c) for c in t.column_names
        ]
        return t.rename_columns(names)

    def add_ts(t: pa.Table, with_bucket: bool) -> pa.Table:
        ts = sign * _ts_i64(t[on])
        t = t.append_column(_ASOF_TS, pa.array(ts, pa.int64()))
        if with_bucket:
            t = t.append_column(
                _ASOF_BKT, pa.array(ts // bucket_us, pa.int64())
            )
        return t

    owns = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="asof_", dir=scratch_base())
    ldir, rdir = os.path.join(scratch, "left"), os.path.join(scratch, "right")
    bucketed = bucket_us is not None
    part_keys = [by, _ASOF_BKT] if bucketed else [by]
    try:
        if not _stage_done(ldir):
            _fresh_stage(ldir)
            left.map_batches(
                lambda t: add_ts(t, bucketed), batch_format="pyarrow"
            ).map_batches(
                _AssignJoinPart(part_keys, num_parts), batch_format="pyarrow"
            ).write_parquet(ldir, partition_cols=["jpart"], compression="zstd")
            _stage_mark(ldir)
        if not _stage_done(rdir):
            _fresh_stage(rdir)
            right.map_batches(prep_right, batch_format="pyarrow").map_batches(
                lambda t: add_ts(t, bucketed), batch_format="pyarrow"
            ).map_batches(
                _AssignJoinPart(part_keys, num_parts), batch_format="pyarrow"
            ).write_parquet(rdir, partition_cols=["jpart"], compression="zstd")
            _stage_mark(rdir)

        helper_fields = [pa.field(_ASOF_TS, pa.int64())] + (
            [pa.field(_ASOF_BKT, pa.int64())] if bucketed else []
        )
        lschema = _side_schema(ldir, left)
        if _ASOF_TS not in lschema.names:
            # fully-empty side: no fragments, fallback came from the raw
            # Dataset schema — append the helper columns the exchange
            # would have written
            lschema = pa.schema(list(lschema) + helper_fields)
        rschema = _side_schema(rdir, right)
        if _ASOF_TS not in rschema.names:
            flds = [
                pa.field(
                    by if f.name == rby else (on if f.name == ron else f.name),
                    f.type,
                )
                for f in rschema
            ]
            rschema = pa.schema(flds + helper_fields)

        bdir = os.path.join(scratch, "boundary")
        if bucketed:
            _asof_write_boundaries(
                ldir, rdir, bdir, lschema, rschema, by, num_parts, scratch
            )

        helper_cols = [_ASOF_TS] + ([_ASOF_BKT] if bucketed else [])

        def asof_part(batch: pa.Table) -> pa.Table:
            part = int(batch["part"][0].as_py())
            lt = _read_part(ldir, part, lschema)
            rt = _read_part(rdir, part, rschema)
            if bucketed:
                bt = _read_part(bdir, part, rschema)
                if bt.num_rows:
                    rt = pa.concat_tables([rt, bt], promote_options="none")
            l_code, r_code = _pair_codes(lt[by], rt[by]) if (
                lt.num_rows and rt.num_rows
            ) else (np.zeros(lt.num_rows, np.int64), np.zeros(0, np.int64))
            idx = _asof_backward_indices(
                l_code,
                lt[_ASOF_TS].to_numpy(zero_copy_only=False).astype(np.int64)
                if lt.num_rows else np.zeros(0, np.int64),
                r_code,
                rt[_ASOF_TS].to_numpy(zero_copy_only=False).astype(np.int64)
                if rt.num_rows else np.zeros(0, np.int64),
            )
            return _asof_assemble(
                lt, rt, idx,
                drop_left=helper_cols,
                drop_right=[by, on, *helper_cols],
                right_suffix=right_suffix,
            )

        joined = ray.data.from_items(
            [{"part": i} for i in range(num_parts)]
        ).map_batches(asof_part, batch_size=1, batch_format="pyarrow")
        if owns:
            joined = joined.materialize()
        return joined
    finally:
        if owns:
            shutil.rmtree(scratch, ignore_errors=True)


def _asof_write_boundaries(
    ldir: str,
    rdir: str,
    bdir: str,
    lschema: pa.Schema,
    rschema: pa.Schema,
    by: str,
    num_parts: int,
    scratch: str,
) -> None:
    """Bucketed as-of, boundary pass: for every LEFT (key, bucket) emit
    the latest right row from any strictly-earlier bucket of that key,
    re-tagged with the target bucket and exchanged into the target's
    ``(key, bucket)`` partition.

    Small-data pass: per-batch right summaries (argmax-ts row per
    (key, bucket)) and distinct left (key, bucket) pairs hash-partition
    by KEY alone, one task per key-partition reduces summaries exactly
    and probes each left pair against its key's summary buckets with a
    composite searchsorted — rows handled here are bounded by the number
    of distinct (key, bucket) cells, never by event count."""
    import ray.data

    sdir = os.path.join(scratch, "summaries")
    pdir = os.path.join(scratch, "left_pairs")

    def right_summaries(batch: pa.Table) -> pa.Table:
        t = _read_part(rdir, int(batch["part"][0].as_py()), rschema)
        if t.num_rows == 0:
            return rschema.empty_table()
        code, _ = _pair_codes(t[by], t[by].slice(0, 0))
        bkt = t[_ASOF_BKT].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t[_ASOF_TS].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((np.arange(len(code)), ts, bkt, code))
        c, b = code[order], bkt[order]
        last = np.concatenate((c[1:] != c[:-1], [True])) | np.concatenate(
            (b[1:] != b[:-1], [True])
        )
        return t.take(pa.array(order[last], pa.int64()))

    def left_pairs(batch: pa.Table) -> pa.Table:
        t = _read_part(ldir, int(batch["part"][0].as_py()), lschema)
        if t.num_rows == 0:
            return pa.schema(
                [lschema.field(by), pa.field(_ASOF_BKT, pa.int64())]
            ).empty_table()
        code, _ = _pair_codes(t[by], t[by].slice(0, 0))
        bkt = t[_ASOF_BKT].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.stack([code, bkt], axis=1)
        _, first_idx = np.unique(comp, axis=0, return_index=True)
        return t.select([by, _ASOF_BKT]).take(pa.array(first_idx, pa.int64()))

    part_specs = [{"part": i} for i in range(num_parts)]
    if not _stage_done(sdir):
        _fresh_stage(sdir)
        ray.data.from_items(part_specs).map_batches(
            right_summaries, batch_size=1, batch_format="pyarrow"
        ).map_batches(
            _AssignJoinPart([by], num_parts), batch_format="pyarrow"
        ).write_parquet(sdir, partition_cols=["jpart"], compression="zstd")
        _stage_mark(sdir)
    if not _stage_done(pdir):
        _fresh_stage(pdir)
        ray.data.from_items(part_specs).map_batches(
            left_pairs, batch_size=1, batch_format="pyarrow"
        ).map_batches(
            _AssignJoinPart([by], num_parts), batch_format="pyarrow"
        ).write_parquet(pdir, partition_cols=["jpart"], compression="zstd")
        _stage_mark(pdir)

    pschema = pa.schema(
        [rschema.field(by), pa.field(_ASOF_BKT, pa.int64())]
    )

    def boundary_task(batch: pa.Table) -> pa.Table:
        part = int(batch["part"][0].as_py())
        st = _read_part(sdir, part, rschema)
        pt = _read_part(pdir, part, pschema)
        if st.num_rows == 0 or pt.num_rows == 0:
            return rschema.empty_table()
        s_code, p_code = _pair_codes(st[by], pt[by])
        s_bkt = st[_ASOF_BKT].to_numpy(zero_copy_only=False).astype(np.int64)
        s_ts = st[_ASOF_TS].to_numpy(zero_copy_only=False).astype(np.int64)
        p_bkt = pt[_ASOF_BKT].to_numpy(zero_copy_only=False).astype(np.int64)
        # exact cross-batch reduce: last (max-ts) summary per (code, bucket)
        order = np.lexsort((np.arange(len(s_code)), s_ts, s_bkt, s_code))
        c, b = s_code[order], s_bkt[order]
        last = np.concatenate((c[1:] != c[:-1], [True])) | np.concatenate(
            (b[1:] != b[:-1], [True])
        )
        keep = order[last]
        c, b = s_code[keep], s_bkt[keep]
        # probe: greatest summary bucket STRICTLY below each left bucket
        u = np.unique(np.concatenate([b, p_bkt]))
        M = np.int64(len(u) + 1)
        s_comp = c * M + np.searchsorted(u, b)
        p_comp = p_code * M + np.searchsorted(u, p_bkt)
        so = np.argsort(s_comp, kind="stable")
        pos = np.searchsorted(s_comp[so], p_comp, side="left") - 1
        idx = so[np.maximum(pos, 0)]
        valid = (pos >= 0) & (c[idx] == p_code)
        take = keep[idx[valid]]
        out = st.take(pa.array(take, pa.int64()))
        # re-tag with the TARGET bucket so the exchange lands each row in
        # its consumer's (key, bucket) partition
        i = out.schema.get_field_index(_ASOF_BKT)
        out = out.set_column(
            i, _ASOF_BKT, pa.array(p_bkt[valid], pa.int64())
        )
        return out.select(rschema.names)

    if not _stage_done(bdir):
        _fresh_stage(bdir)
        ray.data.from_items(
            [{"part": i} for i in range(num_parts)]
        ).map_batches(
            boundary_task, batch_size=1, batch_format="pyarrow"
        ).map_batches(
            _AssignJoinPart([by, _ASOF_BKT], num_parts), batch_format="pyarrow"
        ).write_parquet(bdir, partition_cols=["jpart"], compression="zstd")
        _stage_mark(bdir)
