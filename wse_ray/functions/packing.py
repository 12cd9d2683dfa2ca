"""Sequence packing (concat-and-chunk): map every document onto the fixed
context windows of the GPT-style packed training stream — documents in
corpus order are conceptually concatenated token-wise and sliced into
``window``-token chunks; each doc reports which chunk(s) it lands in.

This needs a GLOBAL token prefix sum, the one genuinely sequential step.
Shape (the same trick as the index builder's docID assignment,
`wse_ray/index/build.py:459`): work units are parquet ROW GROUPS in
pinned file order, so

- pass 1: one task per row group -> its token-count sum (one tiny row
  per row group; the driver prefix-sums a row-group-count-sized list)
- pass 2: one task per row group with its broadcast token base offset ->
  per-doc within-group cumsum + base, all vectorized

Nothing row-sized ever reaches the driver, both passes are embarrassingly
parallel, and task identity is (path, row_group) — stable across retries
and resumes, not dependent on batch boundaries.  Corpus order is file/
row-group order (doc_id order for the testdata tables).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _doc_token_counts(texts: pa.Array) -> np.ndarray:
    from ..stages.vectorized_tokenize import _binary_buffer, _token_spans

    data, doc_off = _binary_buffer(texts)
    _, _, doc_idx = _token_spans(data, doc_off, "simple")
    return np.bincount(doc_idx, minlength=len(doc_off) - 1).astype(np.int64)


def pack_windows(paths: list[str], window: int, text_col: str = "text",
                 id_col: str = "doc_id"):
    """Dataset of (doc_id, tok_start, n_tokens, win_start, win_end) for the
    corpus at ``paths`` packed into ``window``-token chunks.  ``win_end``
    is the last window the doc touches (== win_start for empty docs)."""
    import ray
    import ray.data

    from ..sources.corpus import rowgroup_specs

    specs = rowgroup_specs(list(paths))

    def group_sum(spec: pa.Table) -> pa.Table:
        path = spec["path"][0].as_py()
        rg = spec["row_group"][0].as_py()
        t = pq.ParquetFile(path).read_row_group(rg, columns=[text_col])
        return pa.table(
            {
                "path": spec["path"],
                "row_group": spec["row_group"],
                "tokens": pa.array([int(_doc_token_counts(t[text_col]).sum())]),
            }
        )

    sums = (
        ray.data.from_items(specs)
        .map_batches(group_sum, batch_size=1, batch_format="pyarrow")
        .to_pandas()
    )
    by_key = {
        (r["path"], r["row_group"]): r["tokens"] for _, r in sums.iterrows()
    }
    base = 0
    bases = {}
    for s in specs:  # pinned order = corpus order
        bases[(s["path"], s["row_group"])] = base
        base += by_key[(s["path"], s["row_group"])]
    bref = ray.put(bases)

    def assign(spec: pa.Table) -> pa.Table:
        path = spec["path"][0].as_py()
        rg = spec["row_group"][0].as_py()
        tok_base = ray.get(bref)[(path, rg)]
        t = pq.ParquetFile(path).read_row_group(rg, columns=[id_col, text_col])
        n = _doc_token_counts(t[text_col])
        start = tok_base + np.concatenate(([0], np.cumsum(n)[:-1]))
        win_start = start // window
        last = np.where(n > 0, start + n - 1, start)
        return pa.table(
            {
                id_col: t[id_col],
                "tok_start": pa.array(start),
                "n_tokens": pa.array(n),
                "win_start": pa.array(win_start.astype(np.int64)),
                "win_end": pa.array((last // window).astype(np.int64)),
            }
        )

    return ray.data.from_items(specs).map_batches(
        assign, batch_size=1, batch_format="pyarrow"
    )
