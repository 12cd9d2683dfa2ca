"""Generic hash-partitioned storage exchange + partition-wide apply.

The engine's one remaining in-memory all-to-all after round 4 was the
window/sessionization family (``groupby(key).map_groups`` with per-group
pandas frames).  This module gives that family the same
storage-is-the-shuffle shape every other wide operator uses
(``functions/joins.py``, index build): rows hash-partition on a key to
hive-partitioned zstd Parquet (buffering/spill is the filesystem,
resumable via a ``_SUCCESS`` marker), then ONE task per partition reads
its slice and applies a PARTITION-WIDE vectorized kernel — no per-group
frames, no per-group Python.

Partitioning assumption (same as ``asof_join``): all rows of one key land
in one partition, so a single key's rows must fit a worker's heap.  Event
rows are thin (ints + one timestamp), so at 100 TB of events the bound is
per-KEY history, not corpus size; raise ``num_parts`` first.  Skew
telemetry is free from the exchange's parquet footers
(``joins._partition_meta``) if a caller wants to split read-only kernels
by row-group stripes — the session/funnel kernels need whole keys, so
they document the bound instead.

No reference counterpart (the reference has no streaming/window
operators); this is a training-data/analytics addition.
"""
from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable

import pyarrow as pa

from ..config import scratch_base
from .dedup import _fresh_stage, _stage_done, _stage_mark
from .joins import _AssignJoinPart, _read_part, _side_schema


def partition_apply(
    ds,
    keys: str | list[str],
    fn: Callable[[pa.Table], pa.Table],
    num_parts: int = 32,
    scratch_dir: str | None = None,
):
    """Hash-partition ``ds`` by ``keys`` through a storage exchange, then
    apply ``fn`` once per partition (partition-wide Arrow table in, Arrow
    table out).  Returns a streaming ``ray.data.Dataset`` of ``fn``'s
    outputs.

    ``fn`` must be vectorized over the whole partition and return a
    CONSTANT schema (including for an empty partition — missing partition
    dirs are passed to ``fn`` as an empty table of the input schema).
    ``scratch_dir`` is an optional resume root with the usual ``_SUCCESS``
    contract; the caller owns input identity.
    """
    import ray.data

    klist = [keys] if isinstance(keys, str) else list(keys)
    owns = scratch_dir is None
    scratch = scratch_dir or tempfile.mkdtemp(prefix="pexch_", dir=scratch_base())
    xdir = os.path.join(scratch, "exchange")
    try:
        if not _stage_done(xdir):
            _fresh_stage(xdir)
            ds.map_batches(
                _AssignJoinPart(klist, num_parts), batch_format="pyarrow"
            ).write_parquet(xdir, partition_cols=["jpart"], compression="zstd")
            _stage_mark(xdir)
        schema = _side_schema(xdir, ds)

        def apply_part(batch: pa.Table) -> pa.Table:
            part = int(batch["part"][0].as_py())
            return fn(_read_part(xdir, part, schema))

        out = ray.data.from_items(
            [{"part": i} for i in range(num_parts)]
        ).map_batches(apply_part, batch_size=1, batch_format="pyarrow")
        if owns:
            # no resume root given: materialization boundary so the temp
            # exchange can be deleted before returning
            out = out.materialize()
        return out
    finally:
        if owns:
            shutil.rmtree(scratch, ignore_errors=True)
