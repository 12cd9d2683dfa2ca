"""Ray stage: attach snippets to query results.

The reference re-reads raw doc text by byte offset (``gzp`` seek,
hw3/DataLoader.cpp:875-895).  Ray-native equivalent of lookup J3
(SURVEY.md §2.5): the top-k result set is tiny, so we broadcast its docID
set, stream the corpus once with a vectorized filter, and collect only the
matching (docID, text) rows — never materializing the corpus.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tokenizer import tokenize_query
from .snippets import DOC_AVG_LEN, DOC_NUM, generate_snippet


def fetch_doc_texts(corpus_ds, doc_ids: set[int]) -> dict[int, bytes]:
    """Stream the corpus, keep only rows whose docID is in ``doc_ids``."""
    wanted = np.array(sorted(doc_ids), dtype=np.uint64)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["docID"].to_numpy().astype(np.uint64)
        mask = np.isin(ids, wanted)
        return batch.filter(pa.array(mask))

    small = corpus_ds.map_batches(keep, batch_format="pyarrow")
    out: dict[int, bytes] = {}
    for batch in small.iter_batches(batch_format="pyarrow"):
        for did, text in zip(batch["docID"].to_pylist(), batch["text"].to_pylist()):
            out[int(did)] = text if isinstance(text, bytes) else text.encode("utf-8")
    return out


def attach_snippets(
    results: pd.DataFrame,
    engine,
    corpus_ds,
    algo: str = "bm25",
    use_index_stats: bool = False,
) -> pd.DataFrame:
    """Add a ``snippet`` column to (query_id, query, docID, ...) result rows.

    ``use_index_stats=False`` keeps the reference's compile-time constants
    (DOC_AVG_LEN/DOC_NUM, hw3/config.h:60-61) in the snippet scorers;
    True substitutes this index's avgdl/N.
    """
    if results.empty:
        results = results.copy()
        results["snippet"] = pd.Series(dtype=str)
        return results
    texts = fetch_doc_texts(corpus_ds, set(int(d) for d in results["docID"]))
    avgdl = engine.avgdl if use_index_stats else DOC_AVG_LEN
    n_docs = engine.N if use_index_stats else DOC_NUM
    snippets = []
    for _, row in results.iterrows():
        words = tokenize_query(row["query"])
        dfs = [engine.df(w) for w in words]
        text = texts.get(int(row["docID"]), b"")
        # drop the url first line like findSnippets -> extractSnippets
        # (hw3/Result.cpp:49-51: substr from the first newline)
        nl = text.find(b"\n")
        body = text[nl + 1 :] if nl >= 0 else text
        snip = generate_snippet(body, words, dfs, algo, avgdl, n_docs)
        snippets.append(snip.decode("utf-8", "replace"))
    out = results.copy()
    out["snippet"] = snippets
    return out
