"""Engine configuration.

Replaces the reference's compile-time ``config.h`` flags
(/root/reference/hw2/config.h, /root/reference/hw3/config.h) with a runtime
dataclass.  Constants that are rank-identity-critical carry their reference
citation.
"""
from __future__ import annotations

from dataclasses import dataclass, field

# --- tokenizer ---------------------------------------------------------------
# The reference separator string (hw3/config.h:59, hw2/DataLoader.cpp:33) is a
# C byte string scanned per BYTE (``sep.find(text[i])`` with char argument,
# hw2/DataLoader.cpp:38).  Its multibyte UTF-8 characters (· " ： “ ”)
# therefore contribute their individual BYTES to the separator set; any byte
# of the set splits a token.  We replicate that byte-level behavior exactly.
SEPARATOR_STR = " :;,.\t\v\r\n\f[]{}()<>+-=*&^%$#@!~`'\"|\\/?·\"：“”"
SEPARATOR_BYTES: frozenset[int] = frozenset(SEPARATOR_STR.encode("utf-8"))

# Whitespace subset used by snippet generation ("ed" set, hw3/Snippets.cpp:48).
SNIPPET_WS_BYTES: frozenset[int] = frozenset(b"\t\v\r\n\f ")

# --- index format ------------------------------------------------------------
POSTINGS_IN_CHUNK = 64      # POSTINGS_IN_BLOCK, hw3/config.h:41
BLOCK_SIZE = 65536          # hw3/config.h:42 (64 KiB block budget)
INDEX_FORMAT_VERSION = 1

# --- BM25 (hw3/DataLoader.cpp:302-314) --------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75

# --- query -------------------------------------------------------------------
RESULT_NUM = 20             # hw3/config.h:47
CONJUNCTIVE = "conjunctive"
DISJUNCTIVE = "disjunctive"

# --- snippets (hw3/config.h:48-64) ------------------------------------------
SNIPPETS_RANGE = 50
TERM_NUM = 7
MAX_SNIPPETS = 200
MIN_KEYWORD = 2
KEYWORD_PERCENT = 0.25
CLUSTER_SIZE = 2            # hw3/Snippets.cpp:343


@dataclass
class BuildConfig:
    """Configuration of one index build.

    Scale notes: ``num_partitions`` should be sized so one partition's encoded
    segment is a few hundred MB (at 10^12 docs: tens of thousands of
    partitions).  ``heavy_df_threshold``/``heavy_subparts`` control explicit
    skew splitting of heavy-hitter terms (the reference removes no stopwords,
    hw2/DataLoader.cpp:33-57, so the hottest term has df == N).
    """

    num_partitions: int = 16
    # "term": hash(term) partitions with docID-range splitting of heavy
    #         hitters — best for batch index builds (balanced encode work).
    # "doc":  docID-range partitions, every term local to its shard — the
    #         document-partitioned layout query serving wants (scatter a
    #         query to shards, each computes complete local scores, merge
    #         top-k; no term skew by construction).  Both layouts are read
    #         by the same query engine.
    partition_by: str = "term"
    # terms with df > heavy_df_threshold are split by docID range into
    # heavy_subparts sub-segments (each routed to its own shuffle partition).
    # None -> auto: max(64k, 4 * n_docs / num_partitions).
    heavy_df_threshold: int | None = None
    heavy_subparts: int = 4
    tokenize_batch_size: int = 2048
    # "trec": reference semantics (first line = url dropped, trailing token
    #         dropped, byte-level separator set).
    # "simple": no first-line drop, trailing token flushed (used for the
    #           documents-table pipelines so the DuckDB oracle stays exact).
    tokenizer_mode: str = "trec"
    # concurrency knobs (None -> let Ray size stages)
    encode_concurrency: int | None = None
    # postings-exchange compaction: a shuffle partition written by > this
    # many map tasks is rewritten as one file before encode, keeping the
    # stored exchange O(P) files instead of O(map_tasks * P) (at 10^12 docs
    # the latter is filesystem-killing).  0 disables compaction.
    compact_min_fragments: int = 16
    extra: dict = field(default_factory=dict)


def scratch_base() -> str | None:
    """Default root for TRANSIENT storage-shuffle scratch (exchanges,
    checkpoints that are deleted before the operator returns).

    ``$WSE_SCRATCH_BASE`` when set; else the system tempdir (``None`` —
    ``tempfile`` resolves it).  Fast scratch (``/dev/shm``, local NVMe) is
    deliberately OPT-IN: exchanges are corpus-sized (joins carry full rows,
    the curation checkpoint carries the kept corpus TEXT), and a RAM-backed
    tmpfs default — typically capped at 50% of RAM — would turn any
    larger-than-memory input into ENOSPC/OOM precisely where the
    storage-is-the-shuffle pattern is supposed to spill.  Benchmarks and
    stress tools on this sandbox set ``WSE_SCRATCH_BASE=/dev/shm``
    themselves after checking free space (the lone ~65 MB/s disk would
    otherwise measure the disk, not the engine — bench.py documents this);
    a real cluster points it at local-NVMe/shared fast storage.  DURABLE
    scratch (resume roots the caller passes explicitly) is unaffected —
    the caller owns its placement."""
    import os as _os

    return _os.environ.get("WSE_SCRATCH_BASE") or None


def opt_in_fast_scratch(min_free_bytes: int = 4 << 30) -> None:
    """Set ``WSE_SCRATCH_BASE=/dev/shm`` (if unset) when the tmpfs exists
    and has at least ``min_free_bytes`` free — the explicit opt-in bench
    and stress tools use for inputs they KNOW fit in RAM-backed scratch."""
    import os as _os

    if _os.environ.get("WSE_SCRATCH_BASE"):
        return
    if not _os.path.isdir("/dev/shm"):
        return
    st = _os.statvfs("/dev/shm")
    if st.f_bavail * st.f_frsize >= min_free_bytes:
        _os.environ["WSE_SCRATCH_BASE"] = "/dev/shm"
