"""BM25 query engine over the partitioned index.

``SearchEngine`` reimplements the reference's query path
(hw3/DataLoader.cpp:372-428 TAAT, :547-634 block decode, :636-759 top-k,
:773-864 conjunctive chunk skipping) over the Ray-built index:

* lexicon + doctable load ONCE per process/actor (``__init__``), replacing
  the reference's 158 s per-process startup (hw3/HW 3.docx §Result);
* disjunctive semantics: the reference scores a dense array over ALL N docs
  (hw3/DataLoader.cpp:378), so its top-k pads with zero-score docs and ranks
  negative-score matches BELOW non-matches.  We reproduce those results
  EXACTLY but sparsely: top-k over matching docs merged with the k smallest
  non-matching docIDs at score 0 — no O(N) array, which is what makes the
  same code work at 10^12 docs;
* conjunctive: soft conjunction (candidates = min-df term's postings;
  hw3/DataLoader.cpp:393-428) with chunk skipping via the per-chunk
  last_docid metadata;
* tie-break: (score desc, docID asc) — defined rule, see oracle.py;
* per-posting document lengths come from the index itself (dl stream), so
  scoring never touches the doctable; the doctable is only joined for the
  top-k urls (J2 in SURVEY.md §2.5 becomes a k-row lookup).

``QueryScorer`` wraps it as an actor-pool ``map_batches`` class for batch
query Datasets.
"""
from __future__ import annotations

import glob
import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..codec import decode_posting_list
from ..config import BM25_B, BM25_K1, RESULT_NUM
from ..tokenizer import tokenize_query


class SearchEngine:
    def __init__(
        self,
        index_dir: str,
        parts: list[int] | None = None,
        doc_range: tuple[int, int] | None = None,
    ):
        """``parts``/``doc_range`` restrict this engine to a shard of a
        document-partitioned index (query/sharded.py): it then scores only
        docIDs in [doc_range) and pads zeros within that range, so a
        scatter-gather merge over shards reproduces the global ranking
        exactly."""
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.stats = json.load(f)
        self.N = self.stats["N"]
        self.avgdl = self.stats["avgdl"]
        self.index_dir = index_dir
        self.doc_lo, self.doc_hi = doc_range if doc_range else (0, self.N)
        self._df_global: dict[bytes, int] | None = None
        # a doc-layout extension (index/extend.py) leaves the BASE parts'
        # baked chunk upper bounds stale (idf grows with N) — pruning over
        # them would be unsound, so pruned mode falls back to exhaustive
        # (identical results) until refresh_bounds() re-encodes
        self._stale_ubs = False
        try:
            with open(os.path.join(index_dir, "manifest.json")) as f:
                self._stale_ubs = bool(json.load(f).get("stale_ubs", False))
        except (OSError, ValueError):
            pass
        # tombstones (index/extend.py delete_docs): deleted docs vanish from
        # every result -- postings are filtered at decode and the zero-pad
        # pool skips them -- while N/avgdl/df stay the stored values until a
        # compacting rebuild (Lucene-style delete semantics; the SQL oracle
        # for gate bm25_deleted recomputes exactly this)
        from ..index.extend import load_tombstones

        dd = load_tombstones(index_dir)
        # shard-local slice: per-actor tombstone memory is range-bounded
        self._deleted = dd[(dd >= self.doc_lo) & (dd < self.doc_hi)]

        lex_files = sorted(
            glob.glob(os.path.join(index_dir, "parts", "part=*", "lexicon.parquet"))
        )
        if parts is not None:
            keep = set(parts)
            lex_files = [
                p for p in lex_files
                if int(os.path.basename(os.path.dirname(p)).split("=")[1]) in keep
            ]
        if not lex_files:
            raise FileNotFoundError(f"no lexicon partitions under {index_dir}")
        frames = []
        for p in lex_files:
            t = pq.read_table(p)
            part = int(os.path.basename(os.path.dirname(p)).split("=")[1])
            frames.append(
                t.append_column("part", pa.array([part] * t.num_rows, pa.int64()))
            )
        # Lexicon held as sorted column arrays, not per-row dicts: one
        # sort groups each term's segments contiguously (heavy terms span
        # several docID-range segments; ranges are disjoint by construction)
        # and df per term is a single reduceat — no per-row Python loop, so
        # a web-scale vocab loads at numpy speed.  The GLOBAL df is the sum
        # of segment dfs — exact by construction, no separate global-df
        # pass needed at build time.
        lex = pa.concat_tables(frames).sort_by(
            [("term", "ascending"), ("first_docid", "ascending")]
        )
        self._lex = {
            c: lex[c].to_numpy()
            for c in ("part", "offset", "length", "first_docid", "last_docid", "df_seg")
        }
        # Vocabulary kept as SORTED Arrow buffers probed by binary search,
        # never as per-term python dicts: at web-scale vocab (1e8+ terms)
        # the dict-of-bytes (and the object-array detour building it) is
        # the per-actor memory ceiling, while the Arrow term buffer is just
        # the concatenated bytes + one int64 offset array (the doctable
        # below already works the same way).  Run boundaries come from a
        # vectorized shifted not-equal on the term column — no to_pylist.
        term_col = lex["term"].combine_chunks().cast(pa.large_binary())
        n_seg = len(term_col)
        if n_seg:
            neq = pc.not_equal(
                term_col.slice(1), term_col.slice(0, n_seg - 1)
            ).to_numpy(zero_copy_only=False)
            starts = np.flatnonzero(np.concatenate(([True], neq))).astype(np.int64)
            ends = np.concatenate((starts[1:], [n_seg])).astype(np.int64)
            dfs = np.add.reduceat(self._lex["df_seg"], starts)
        else:
            starts = ends = np.zeros(0, dtype=np.int64)
            dfs = np.zeros(0, dtype=np.int64)
        uniq = term_col.take(pa.array(starts, pa.int64())) if n_seg else term_col
        bufs = uniq.buffers()
        self._ut_offsets = (
            np.frombuffer(
                bufs[1], dtype=np.int64, count=len(uniq) + 1, offset=uniq.offset * 8
            )
            if len(uniq)
            else np.zeros(1, dtype=np.int64)
        )
        self._ut_buf = bufs[2].to_pybytes() if bufs[2] is not None else b""
        self._run_starts, self._run_ends, self._dfs = starts, ends, dfs
        self._seg_lists: dict[bytes, list[dict]] = {}

        # the runs checkpoint doubles as the doctable (SURVEY.md S6); a
        # doc-range shard predicate-pushes its range so per-actor memory is
        # N/P, not N (sharded.py's "doctable per actor is shard-local")
        flt = None
        if doc_range is not None:
            import pyarrow.dataset as pads

            flt = (pads.field("docID") >= self.doc_lo) & (
                pads.field("docID") < self.doc_hi
            )
        dt = pq.read_table(
            os.path.join(index_dir, "runs"),
            columns=["docID", "url"],
            filters=flt,
        ).sort_by("docID")
        self._doc_ids = dt["docID"].to_numpy()
        self._urls = dt["url"]

        self._fh: dict[int, object] = {}
        self._seg_cache: dict[tuple, bytes] = {}
        self._ub_cache: dict[bytes, float] = {}

    def _taken(self, sorted_ids: np.ndarray) -> np.ndarray:
        """Matched ids + tombstones: the ids the zero-pad pool must skip."""
        if not len(self._deleted):
            return sorted_ids
        return np.union1d(sorted_ids, self._deleted)

    @property
    def _pool(self) -> int:
        """Rankable docs in this engine's range (excludes tombstones)."""
        return self.doc_hi - self.doc_lo - len(self._deleted)

    # --- plumbing ------------------------------------------------------------

    _SEG_CACHE_MAX = 1024  # segments; raw bytes only (decoded arrays are not cached)

    def _term_index(self, term: bytes) -> int:
        """Binary search the sorted unique-term Arrow buffers; index into
        the run arrays, or -1 if absent.  O(log V) small slice compares —
        query terms are few, so no per-term dict is ever built."""
        offs, buf = self._ut_offsets, self._ut_buf
        lo, hi = 0, len(offs) - 1
        while lo < hi:
            mid = (lo + hi) >> 1
            if buf[offs[mid] : offs[mid + 1]] < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(offs) - 1 and buf[offs[lo] : offs[lo + 1]] == term:
            return lo
        return -1

    def vocab(self) -> list[bytes]:
        """All unique terms, sorted (materializes the vocabulary — debug /
        test helper, not a query-path API)."""
        offs, buf = self._ut_offsets, self._ut_buf
        return [buf[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]

    def _term_segments(self, term: bytes) -> list[dict] | None:
        """Segment descriptors for ``term``, ordered by first_docid (the load
        sort), materialized lazily per queried term — query terms are few,
        the vocab is not."""
        segs = self._seg_lists.get(term)
        if segs is not None:
            return segs
        i = self._term_index(term)
        if i < 0:
            return None
        s, e = int(self._run_starts[i]), int(self._run_ends[i])
        segs = [
            {k: v[i].item() if hasattr(v[i], "item") else v[i]
             for k, v in self._lex.items()}
            for i in range(s, e)
        ]
        self._seg_lists[term] = segs
        return segs

    def _read_segment(self, seg: dict) -> bytes:
        key = (seg["part"], seg["offset"])
        cached = self._seg_cache.get(key)
        if cached is not None:
            return cached
        fh = self._fh.get(seg["part"])
        if fh is None:
            fh = open(
                os.path.join(
                    self.index_dir, "parts", f"part={seg['part']:05d}", "postings.bin"
                ),
                "rb",
            )
            self._fh[seg["part"]] = fh
        fh.seek(seg["offset"])
        data = fh.read(seg["length"])
        if len(self._seg_cache) >= self._SEG_CACHE_MAX:
            self._seg_cache.pop(next(iter(self._seg_cache)))
        self._seg_cache[key] = data
        return data

    def df(self, term: bytes) -> int:
        """Global document frequency.  In a shard, the coordinator installs
        the cross-shard sums via set_global_dfs (local dfs would skew idf)."""
        if self._df_global is not None:
            return self._df_global.get(term, 0)
        i = self._term_index(term)
        return int(self._dfs[i]) if i >= 0 else 0

    def local_dfs(self, terms: list[bytes]) -> dict[bytes, int]:
        out = {}
        for t in terms:
            i = self._term_index(t)
            out[t] = int(self._dfs[i]) if i >= 0 else 0
        return out

    def set_global_dfs(self, dfs: dict[bytes, int]) -> None:
        self._df_global = dfs

    def postings(
        self, term: bytes, min_docid: int | None = None, max_docid: int | None = None
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decoded (docids, tfs, dls) for a term, segments concatenated in
        docID order; optional range restriction uses chunk skipping."""
        segs = self._term_segments(term)
        if not segs:
            z = np.zeros(0, dtype=np.uint64)
            return z, z.copy(), z.copy()
        parts_d, parts_t, parts_l = [], [], []
        for seg in segs:
            if min_docid is not None and seg["last_docid"] < min_docid:
                continue
            if max_docid is not None and seg["first_docid"] > max_docid:
                continue
            d, t, l = decode_posting_list(
                self._read_segment(seg), min_docid=min_docid, max_docid=max_docid
            )
            parts_d.append(d)
            parts_t.append(t)
            parts_l.append(l)
        if not parts_d:
            z = np.zeros(0, dtype=np.uint64)
            return z, z.copy(), z.copy()
        d = np.concatenate(parts_d)
        t = np.concatenate(parts_t)
        l = np.concatenate(parts_l)
        if len(self._deleted) and len(d):
            pos = np.searchsorted(self._deleted, d)
            pos_c = np.minimum(pos, len(self._deleted) - 1)
            dead = self._deleted[pos_c] == d
            if dead.any():
                keep = ~dead
                d, t, l = d[keep], t[keep], l[keep]
        return d, t, l

    def bm25_vec(self, df: int, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        """Vectorized hw3/DataLoader.cpp:302-314; float64 op order mirrors the
        C++ expression exactly (no clamp — scores may be negative)."""
        k1, b = BM25_K1, BM25_B
        K = k1 * ((1 - b) + b * dls.astype(np.float64) / self.avgdl)
        f = tfs.astype(np.float64)
        idf = math.log((self.N - float(df) + 0.5) / (float(df) + 0.5))
        return idf * (k1 + 1) * f / (K + f)

    def url_of(self, doc_id: int) -> str:
        i = int(np.searchsorted(self._doc_ids, doc_id))
        if i < len(self._doc_ids) and int(self._doc_ids[i]) == doc_id:
            return self._urls[i].as_py()
        return ""

    # --- search --------------------------------------------------------------

    def search(self, query: str, mode: str = "disjunctive", k: int = RESULT_NUM):
        """Returns [(docID, score)] ranked by (score desc, docID asc).

        Modes: "disjunctive" (exhaustive TAAT), "disjunctive_pruned"
        (MaxScore over the per-chunk block-max metadata — identical results,
        skips decoding whole posting lists of low-impact terms), and
        "conjunctive" (soft conjunction)."""
        words = tokenize_query(query)
        if not words:
            return []
        if mode == "disjunctive":
            return self._disjunctive(words, k)
        if mode == "disjunctive_pruned":
            if self._stale_ubs:  # extended index: bounds unsound, see __init__
                return self._disjunctive(words, k)
            return self._disjunctive_pruned(words, k)
        return self._conjunctive(words, k)

    def term_upper_bound(self, term: bytes) -> float:
        """Max possible BM25 contribution of one occurrence of ``term``,
        from the per-chunk upper bounds stored in the index blocks
        (the block-max metadata; valid even for split heavy terms — see
        index/build.py encode_partition docstring)."""
        from ..codec import read_chunk_meta

        cached = self._ub_cache.get(term)
        if cached is not None:
            return cached
        segs = self._term_segments(term)
        if not segs:
            return 0.0
        ub = -math.inf
        for seg in segs:
            _, ubs = read_chunk_meta(self._read_segment(seg))
            if len(ubs):
                ub = max(ub, float(ubs.max()))
        out = ub if ub > -math.inf else 0.0
        self._ub_cache[term] = out
        return out

    def _disjunctive_pruned(self, words: list[bytes], k: int):
        """MaxScore TAAT: terms are processed in descending upper-bound
        order; once the remaining terms' summed upper bounds cannot lift a
        NEW document into the top-k (threshold includes the zero-score
        padding pool, cpp :378 semantics), those terms are scored only for
        existing candidates via chunk-skipped lookups.  Produces results
        IDENTICAL to the exhaustive TAAT mode (tested)."""
        uniq = sorted(set(words), key=lambda t: -self.term_upper_bound(t))
        ubs = np.array(
            [self.term_upper_bound(t) * words.count(t) for t in uniq], dtype=np.float64
        )
        suffix = np.concatenate((np.cumsum(ubs[::-1])[::-1][1:], [0.0]))
        # SAFE pruning floor: the final k-th best score is >= 0 whenever at
        # least k docs end with score exactly 0 (the dense-array zero pool,
        # cpp :378) — statically guaranteed when N - sum(df) >= k.  Candidate
        # scores may DROP from negative-idf pruned terms, so the running
        # k-th candidate score is NOT a sound threshold; the zero floor is.
        # A doc reachable only through the remaining terms tops out at their
        # summed upper bounds; strictly below the floor -> skip decoding
        # those lists entirely (this prunes exactly the negative-idf common
        # terms whose posting lists are the long ones).
        # stored df over-counts matches when tombstones exist -> the zero
        # pool estimate only shrinks: still a sound floor
        pool = self._pool
        zero_pool_ok = (pool - sum(self.df(t) for t in uniq)) >= k
        theta = 0.0 if zero_pool_ok else -math.inf
        prune_from = len(uniq)
        for i in range(1, len(uniq)):
            if ubs[i] + suffix[i] < theta:
                prune_from = i
                break
        processed = set(uniq[:prune_from])
        pruned = [(t, words.count(t)) for t in uniq[prune_from:]]

        # decode processed terms fully; candidates = union of their postings
        plists: dict[bytes, tuple] = {}
        ids_all = np.zeros(0, dtype=np.uint64)
        for term in processed:
            d, t_, l = self.postings(term)
            plists[term] = (d, t_, l)
            ids_all = np.union1d(ids_all, d) if len(ids_all) else d.copy()
        # pruned terms: chunk-skipped candidate lookups only
        if len(ids_all):
            lo, hi = int(ids_all[0]), int(ids_all[-1])
            for term, _m in pruned:
                d, t_, l = self.postings(term, min_docid=lo, max_docid=hi)
                plists[term] = (d, t_, l)

        # accumulate IN QUERY OCCURRENCE ORDER for bit-exact float parity
        # with the exhaustive TAAT loop (per-doc addition order = term order)
        scores_all = np.zeros(len(ids_all), dtype=np.float64)
        for term in words:
            d, t_, l = plists.get(term, (np.zeros(0, np.uint64),) * 3)
            if len(d) == 0 or len(ids_all) == 0:
                continue
            pos = np.searchsorted(ids_all, d)
            pos_c = np.minimum(pos, max(0, len(ids_all) - 1))
            hit = ids_all[pos_c] == d
            s = self.bm25_vec(self.df(term), t_[hit], l[hit])
            scores_all[pos_c[hit]] += s
        top_matched = self._topk(ids_all, scores_all, k)
        if len(top_matched) < k or (top_matched and top_matched[-1][1] <= 0.0):
            # the zero-padding pool must exclude docs matched by ANY term
            # with a nonzero contribution — decode pruned terms only over
            # the low-docID window needed for padding (chunk-skipped); a
            # pruned term with idf exactly 0 contributes exactly 0.0 and its
            # docs stay eligible as padding (tie value + docID break match)
            pad = self._padding_docs(ids_all, pruned, k)
            merged = top_matched + [(int(p), 0.0) for p in pad]
            merged.sort(key=lambda r: (-r[1], r[0]))
            return merged[: min(k, self._pool)]
        return top_matched

    def _padding_docs(self, ids_all: np.ndarray, pruned, k: int) -> np.ndarray:
        window = self.doc_lo + 4 * k + 64
        nonzero_pruned = [
            t for t, _m in pruned
            if self.df(t) > 0
            and math.log((self.N - float(self.df(t)) + 0.5) / (float(self.df(t)) + 0.5)) != 0.0
        ]
        if not nonzero_pruned:
            # exclusion set is already complete — no window expansion needed
            return _first_missing(self._taken(np.sort(ids_all)), self.doc_lo, self.doc_hi, k)
        while True:
            exclude = [np.sort(ids_all)]
            for term in nonzero_pruned:
                d, _t, _l = self.postings(term, min_docid=self.doc_lo, max_docid=window)
                exclude.append(d[d <= window])
            matched = np.unique(np.concatenate(exclude))
            pad = _first_missing(self._taken(matched), self.doc_lo, self.doc_hi, k)
            pad = pad[pad <= window]  # beyond the window, match status unknown
            if len(pad) >= k or window >= self.doc_hi:
                return pad[:k]
            window *= 4

    def _topk(self, doc_ids: np.ndarray, scores: np.ndarray, k: int):
        """Top-k by (score desc, docID asc).  ``doc_ids`` must be ascending
        (all call sites produce sorted candidates), so among equal scores
        the first occurrences are the smallest docIDs — an argpartition
        pre-filter preserves the exact tie-break while avoiding a full sort
        of million-candidate arrays."""
        n = len(doc_ids)
        if n == 0:
            return []
        if n > max(4096, 8 * k) and k < n:
            kth = np.partition(scores, n - k)[n - k]
            strictly = np.flatnonzero(scores > kth)
            need_eq = k - len(strictly)
            eq_idx = np.flatnonzero(scores == kth)[: max(0, need_eq)]
            sel = np.sort(np.concatenate((strictly, eq_idx)))
            doc_ids, scores = doc_ids[sel], scores[sel]
        order = np.lexsort((doc_ids, -scores))[:k]
        return [(int(doc_ids[i]), float(scores[i])) for i in order]

    def _disjunctive(self, words: list[bytes], k: int):
        # accumulate per matching doc, term-at-a-time in query order (float
        # addition order matches the reference's per-term accumulation)
        acc: dict = {}
        ids_all = None
        scores_all = None
        for term in words:  # duplicates double-count, like cpp :380-392
            d, t, l = self.postings(term)
            if len(d) == 0:
                continue
            s = self.bm25_vec(self.df(term), t, l)
            if ids_all is None:
                ids_all, scores_all = d.copy(), s
            else:
                # merge-accumulate: positions of d in ids_all
                ids_all, scores_all = _merge_add(ids_all, scores_all, d, s)
        if ids_all is None:
            ids_all = np.zeros(0, dtype=np.uint64)
            scores_all = np.zeros(0, dtype=np.float64)
        top_matched = self._topk(ids_all, scores_all, k)
        # zero-padding semantics (dense array over all N docs, cpp :378):
        # non-matching docs score 0.0 and fill remaining ranks docID-asc
        # pad needed when fewer than k matches, or when the kth match scores
        # <= 0 (zero-score non-matches outrank negatives and tie-break zeros)
        if len(top_matched) < k or (top_matched and top_matched[-1][1] <= 0.0):
            pad = _first_missing(self._taken(np.sort(ids_all)), self.doc_lo, self.doc_hi, k)
            merged = top_matched + [(int(p), 0.0) for p in pad]
            merged.sort(key=lambda r: (-r[1], r[0]))
            return merged[: min(k, self._pool)]
        return top_matched

    def _conjunctive(self, words: list[bytes], k: int):
        # min-df seed: first term achieving the minimum (strict '<' scan,
        # cpp :396-405); missing terms have df 0 and win -> empty result
        minterm = words[0]
        mindf = self.df(minterm)
        for term in words[1:]:
            if self.df(term) < mindf:
                minterm, mindf = term, self.df(term)
        d0, t0, l0 = self.postings(minterm)
        if len(d0) == 0:
            return []
        cand = d0
        scores = self.bm25_vec(self.df(minterm), t0, l0)
        lo, hi = int(cand[0]), int(cand[-1])
        for term in words:
            if term == minterm:
                continue  # skips ALL copies of the seed (cpp :413)
            d, t, l = self.postings(term, min_docid=lo, max_docid=hi)
            if len(d) == 0:
                continue
            pos = np.searchsorted(d, cand)
            pos_c = np.minimum(pos, len(d) - 1)
            hit = d[pos_c] == cand
            if hit.any():
                s = self.bm25_vec(self.df(term), t[pos_c[hit]], l[pos_c[hit]])
                scores[hit] += s
        return self._topk(cand, scores, k)

    def search_batch(self, queries: list[dict]) -> pd.DataFrame:
        rows = []
        for q in queries:
            res = self.search(q["query"], q.get("mode", "disjunctive"), q.get("k", RESULT_NUM))
            for rank, (doc_id, score) in enumerate(res, 1):
                rows.append(
                    {
                        "query_id": q.get("query_id"),
                        "rank": rank,
                        "docID": doc_id,
                        "score": score,
                        "url": self.url_of(doc_id),
                    }
                )
        return pd.DataFrame(
            rows, columns=["query_id", "rank", "docID", "score", "url"]
        )


def _merge_add(ids_a, sc_a, ids_b, sc_b):
    """Union of two sorted (ids -> score) maps, scores added on overlap.
    b's scores are ADDED AFTER a's (addition-order parity with TAAT)."""
    ids = np.union1d(ids_a, ids_b)
    out = np.zeros(len(ids), dtype=np.float64)
    pa_ = np.searchsorted(ids, ids_a)
    out[pa_] = sc_a
    pb = np.searchsorted(ids, ids_b)
    out[pb] += sc_b
    return ids, out


def _first_missing(sorted_ids: np.ndarray, lo: int, hi: int, k: int) -> np.ndarray:
    """First k docIDs in [lo, hi) absent from sorted_ids (zero-pad pool).
    Vectorized in geometrically growing blocks (the pool may be sparse when
    a common term matches nearly every doc)."""
    out: list[int] = []
    start = lo
    block = max(4 * k, 1024)
    ids = sorted_ids.astype(np.int64)
    while len(out) < k and start < hi:
        end = min(hi, start + block)
        mask = np.ones(end - start, dtype=bool)
        i_l = int(np.searchsorted(ids, start))
        i_r = int(np.searchsorted(ids, end))
        mask[(ids[i_l:i_r] - start)] = False
        found = np.flatnonzero(mask)
        out.extend((found[: k - len(out)] + start).tolist())
        start = end
        block *= 4
    return np.array(out, dtype=np.uint64)


class QueryScorer:
    """Actor-pool map_batches class: a batch of query rows -> result rows.

    Index + lexicon + doctable load once per actor (T2/T3 in SURVEY.md §2.4);
    use ``ds.map_batches(QueryScorer, fn_constructor_args=(index_dir,),
    concurrency=N, batch_format="pandas")``.
    """

    def __init__(self, index_dir: str):
        self.engine = SearchEngine(index_dir)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return self.engine.search_batch(batch.to_dict("records"))
