"""Document-partitioned distributed query serving (scatter-gather).

The serving layout the reference could never have: a ``partition_by="doc"``
index (index/build.py) puts every term's postings for a contiguous docID
range in one shard, so a query fans out to shard actors, each computes
COMPLETE local scores (all terms local — no cross-shard score join), and
the coordinator merges per-shard top-k by (score desc, docID asc).

Exactness: each shard is a ``SearchEngine`` restricted to its docID range
(zero-padding included within the range), and idf uses GLOBAL dfs — the
coordinator sums per-shard dfs once per query's terms and installs them in
every shard, so every per-posting score is bit-identical to a single-node
engine over the whole corpus (tested in tests/test_sharded.py).

At 10^12 docs this is the layer that bounds query latency: shard count
scales with the corpus while per-shard work stays constant; the lexicon
and doctable per actor are shard-local (no 8 TB broadcast).
"""
from __future__ import annotations

import glob
import json
import os

import ray

from ..config import RESULT_NUM
from ..tokenizer import tokenize_query
from .scorer import SearchEngine


@ray.remote
class ShardWorker:
    def __init__(self, index_dir: str, parts: list[int], doc_range: tuple[int, int]):
        self.engine = SearchEngine(index_dir, parts=parts, doc_range=doc_range)

    def local_dfs(self, terms: list[bytes]) -> dict[bytes, int]:
        return self.engine.local_dfs(terms)

    def search_local(
        self, query: str, dfs: dict[bytes, int], mode: str, k: int
    ) -> list[tuple[int, float]]:
        self.engine.set_global_dfs(dfs)
        return self.engine.search(query, mode, k)

    def search_local_batch(
        self, queries: list[dict], dfs: dict[bytes, int]
    ) -> list[list[tuple[int, float]]]:
        self.engine.set_global_dfs(dfs)
        return [
            self.engine.search(q["query"], q.get("mode", "disjunctive"), q.get("k", RESULT_NUM))
            for q in queries
        ]


class ShardedSearchEngine:
    """Coordinator over one ShardWorker actor per index partition."""

    def __init__(self, index_dir: str, num_actors: int | None = None):
        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest["config"].get("partition_by") != "doc":
            raise ValueError(
                "ShardedSearchEngine needs a partition_by='doc' index "
                "(term-partitioned layouts would require a cross-shard "
                "score join per query)"
            )
        with open(os.path.join(index_dir, "stats.json")) as f:
            self.N = json.load(f)["N"]
        part_dirs = sorted(glob.glob(os.path.join(index_dir, "parts", "part=*")))
        parts = [int(os.path.basename(d).split("=")[1]) for d in part_dirs]
        P = manifest["config"]["num_partitions"]
        # an extended index (index/extend.py) appends delta partitions whose
        # ranges don't follow the base formula at the NEW N — the manifest
        # then records every part's range explicitly
        explicit = manifest.get("doc_ranges")
        self.shards = []
        self.doc_ranges: list[tuple[int, int]] = []
        for p in parts:
            if explicit is not None:
                lo, hi = explicit[str(p)]
            else:
                # Exact inverse of AssignPartByDoc's part = docID * P // N:
                # part p owns docIDs in [ceil(p*N/P), ceil((p+1)*N/P)).  A
                # floor here (p*N//P) would claim the boundary doc of shard
                # p-1 when N % P != 0, making that doc a spurious zero-score
                # hit in p.
                lo = (p * self.N + P - 1) // P
                hi = ((p + 1) * self.N + P - 1) // P
            self.doc_ranges.append((lo, hi))
            self.shards.append(
                ShardWorker.remote(index_dir, [p], (lo, hi))
            )
        self._df_cache: dict[bytes, int] = {}

    def _global_dfs(self, terms: list[bytes]) -> dict[bytes, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            partials = ray.get([s.local_dfs.remote(missing) for s in self.shards])
            for t in missing:
                self._df_cache[t] = sum(p[t] for p in partials)
        return {t: self._df_cache[t] for t in terms}

    def search(self, query: str, mode: str = "disjunctive", k: int = RESULT_NUM):
        words = tokenize_query(query)
        if not words:
            return []
        dfs = self._global_dfs(list(set(words)))
        locals_ = ray.get(
            [s.search_local.remote(query, dfs, mode, k) for s in self.shards]
        )
        merged = [r for shard in locals_ for r in shard]
        merged.sort(key=lambda r: (-r[1], r[0]))
        return merged[:k]

    def search_batch(self, queries: list[dict]) -> list[list[tuple[int, float]]]:
        """Batched scatter-gather: ONE df round + ONE search round for the
        whole query batch instead of two actor round-trips per query —
        round-trip latency amortizes across the batch (the per-query path
        is round-trip-bound at interactive shard counts)."""
        all_terms = sorted(
            {t for q in queries for t in tokenize_query(q["query"])}
        )
        dfs = self._global_dfs(all_terms) if all_terms else {}
        nonempty = [q for q in queries if tokenize_query(q["query"])]
        locals_ = ray.get(
            [s.search_local_batch.remote(nonempty, dfs) for s in self.shards]
        )
        merged_by_q = iter(zip(*locals_)) if nonempty else iter(())
        out: list[list[tuple[int, float]]] = []
        for q in queries:
            if not tokenize_query(q["query"]):
                out.append([])
                continue
            shard_results = next(merged_by_q)
            merged = [r for shard in shard_results for r in shard]
            merged.sort(key=lambda r: (-r[1], r[0]))
            out.append(merged[: q.get("k", RESULT_NUM)])
        return out
