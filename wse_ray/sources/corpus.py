"""Corpus sources with deterministic global docID enumeration.

The reference assigns docIDs sequentially in stream order
(hw2/DataLoader.cpp:78,110).  Distributed equivalent (SURVEY.md §4.2.3):

1. pin a total order on the input: lexicographically sorted file paths, row
   groups in file order, rows in row-group order;
2. driver-side metadata pass: per-row-group row counts from Parquet footers
   (cheap — no data read) -> prefix sums -> base offset per row group;
3. one Ray read task per row group attaches ``docID = base + local_index``.

This never relies on nondeterministic task ordering and scales to any file
count (parallelism = number of row groups, like Ray's own parquet reader).
"""
from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def list_corpus_files(path_or_paths) -> list[str]:
    if isinstance(path_or_paths, str):
        if os.path.isdir(path_or_paths):
            paths = sorted(glob.glob(os.path.join(path_or_paths, "*.parquet")))
        else:
            paths = [path_or_paths]
    else:
        paths = sorted(path_or_paths)
    if not paths:
        raise FileNotFoundError(f"no parquet files under {path_or_paths!r}")
    return paths


def rowgroup_specs(paths: list[str]) -> list[dict]:
    """(path, row_group, base_docid) per row group, in pinned order."""
    specs = []
    base = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            specs.append({"path": p, "row_group": rg, "base": base, "rows": n})
            base += n
    return specs


class _ReadRowGroup:
    """Read task: one spec row -> the row group's table + docID column."""

    def __init__(self, columns: list[str] | None):
        self.columns = columns

    def __call__(self, batch: pa.Table):
        for i in range(batch.num_rows):
            path = batch["path"][i].as_py()
            rg = batch["row_group"][i].as_py()
            base = batch["base"][i].as_py()
            t = pq.ParquetFile(path).read_row_group(rg, columns=self.columns)
            docids = pa.array(
                np.arange(base, base + t.num_rows, dtype=np.uint64), pa.uint64()
            )
            yield t.append_column("docID", docids)


def read_corpus(
    path_or_paths,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Corpus Dataset with a deterministic ``docID`` uint64 column appended.

    ``columns`` prunes at the read (pass only what the stage needs).
    """
    paths = list_corpus_files(path_or_paths)
    specs = rowgroup_specs(paths)
    ds = ray.data.from_items(specs)
    # one spec per task call; each yields one block (the row group)
    return ds.map_batches(
        _ReadRowGroup(columns), batch_size=1, batch_format="pyarrow"
    )


def _assert_dense_doc_ids(path: str) -> None:
    """The engine's zero-padding pool and AssignPartByDoc assume DENSE
    0..N-1 docIDs; a 1-based or sparse doc_id table would silently emit
    nonexistent docIDs as zero-score results and misalign shard ranges.
    Checked for free from the Parquet footer's column statistics."""
    md = pq.ParquetFile(path).metadata
    n = md.num_rows
    idx = md.schema.to_arrow_schema().get_field_index("doc_id")
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return  # no stats -> cannot check cheaply; trust the caller
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    if n and (lo != 0 or hi != n - 1):
        raise ValueError(
            f"documents.doc_id must be dense 0..N-1 (N={n}, got min={lo}, "
            f"max={hi}); re-enumerate before corpus_from_documents_table"
        )


def corpus_from_documents_table(sf_dir: str) -> ray.data.Dataset:
    """Adapter: the testdata ``documents`` table viewed as a corpus.

    doc_id is already a stable unique id -> used directly as docID; url is
    synthesized; text is the body (tokenizer_mode="simple" applies: no
    url first line inside text).
    """
    path = os.path.join(sf_dir, "documents.parquet")
    _assert_dense_doc_ids(path)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text", "source"])

    def to_corpus(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        url = pc.binary_join_element_wise(
            "doc://", pc.cast(t["source"], pa.string()), "/", pc.cast(t["doc_id"], pa.string()), ""
        )
        return pa.table(
            {
                "docID": pc.cast(t["doc_id"], pa.uint64()),
                "url": url,
                "text": t["text"],
            }
        )

    return ds.map_batches(to_corpus, batch_format="pyarrow")
