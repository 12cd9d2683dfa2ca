"""N7 — LLM-generated snippets (hw3/chatgpt/chatgpt.py:1-63) as an
injectable Ray stage.

The reference feeds "query:<q>\\n text:<doc>" (user content truncated to
16,300 chars) to an external chat API with a fixed system prompt asking for
a query-dependent snippet of <= 30 terms / 200 characters, one call per
(query, doc), rate-limited.

This environment has no network, so the LLM callable is INJECTED:
``LLMSnippetStage(llm_fn=...)``.  The default ``deterministic_stub_llm``
honors the same contract (query-dependent selection, <= 30 terms and
<= 200 chars) with a transparent heuristic, so the Ray-side plumbing —
actor pool, per-(query, doc) prompt construction, truncation, batch shape —
is real and tested; swap in an API client in production.
"""
from __future__ import annotations

from typing import Callable

import pandas as pd

SYSTEM_PROMPT = (
    "You are a query dependent snippet generator. You should select snippet "
    "from a given text based on words in query. The snippet should no more "
    "than 30 terms or 200 characters"
)
USER_CONTENT_MAX = 16300  # hw3/chatgpt/chatgpt.py:50 truncation
MAX_TERMS = 30
MAX_CHARS = 200


def build_user_content(query: str, text: str) -> str:
    """The reference's prompt body, including its truncation."""
    return f"query:{query}\n text:{text}"[:USER_CONTENT_MAX]


def deterministic_stub_llm(system: str, user: str) -> str:
    """Offline stand-in for the chat API: return the first window of the
    text that contains a query term, clipped to the prompt's own limits
    (<= MAX_TERMS terms, <= MAX_CHARS chars).  Deterministic."""
    qpart, _, tpart = user.partition("\n text:")
    query = qpart.removeprefix("query:")
    qterms = {w.lower() for w in query.split() if w}
    words = tpart.split()
    start = 0
    for i, w in enumerate(words):
        if w.lower().strip(".,;:!?") in qterms:
            start = max(0, i - 5)
            break
    snippet = " ".join(words[start : start + MAX_TERMS])
    return snippet[:MAX_CHARS]


class LLMSnippetStage:
    """Actor-pool map_batches stage: (query_id, query, doc_id, text) rows ->
    + ``snippet``.  Use ``ds.map_batches(LLMSnippetStage,
    fn_constructor_kwargs={"llm_fn": client}, concurrency=N,
    batch_size=B, batch_format="pandas")`` — the (possibly expensive) LLM
    client is constructed ONCE per actor; each row is one call, so size
    ``concurrency`` to the provider's rate limit, not the cluster."""

    def __init__(self, llm_fn: Callable[[str, str], str] | None = None):
        self.llm_fn = llm_fn or deterministic_stub_llm

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["snippet"] = [
            self.llm_fn(SYSTEM_PROMPT, build_user_content(q, t))
            for q, t in zip(batch["query"], batch["text"])
        ]
        return out
