"""DuckDB oracle SQL for every SQL-expressible queries() entry.

Column names, types, rounding (6 dp for scores/ratios, 4 dp for money sums)
and rank tie-breaks match the Ray pipelines in engine_queries.py /
relational.py EXACTLY — the driver hashes values after sorting columns by
name, so any divergence is a gate failure.

documents.text is lowercase words joined by single spaces (verified), so
the tokenizer oracle splits on ' '; the full byte-level separator semantics
are pinned against the python oracle in pytest (tests/test_build_e2e.py).
"""
from __future__ import annotations

from .engine_queries import ANN_K, ANN_QUERY_IDS, CONJ_QUERIES, DISJ_QUERIES, TOP_K
from ..functions.textstats import STOPWORDS

# shared tokenization CTEs over documents
_TOK = """
tok AS (
  SELECT doc_id, t.term
  FROM documents, unnest(string_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
),
dft AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
),
stats AS (
  SELECT count(*)::BIGINT AS n,
         CAST(floor(sum(length(text))::DOUBLE / count(*)) AS BIGINT) AS avgdl
  FROM documents
)
"""


def _values(rows) -> str:
    return ", ".join(f"({qid}, {ord_}, '{term}')" for qid, ord_, term in rows)


def _query_terms(queries) -> str:
    rows = []
    for qid, q in queries:
        for i, term in enumerate(q.split()):
            rows.append((qid, i, term))
    return _values(rows)


# BM25 per-posting score, exactly the engine expression
# (hw3/DataLoader.cpp:302-314): idf * (k1+1) * tf / (K + tf)
_BM25 = (
    "ln((s.n - dft.df + 0.5) / (dft.df + 0.5)) * 2.2 * tf.tf"
    " / (1.2 * (0.25 + 0.75 * length(d.text) / s.avgdl) + tf.tf)"
)


def sql_postings() -> str:
    return f"WITH {_TOK} SELECT term, doc_id, tf FROM tf ORDER BY term, doc_id"


def sql_doctable() -> str:
    return f"""WITH {_TOK},
wn AS (SELECT doc_id, count(DISTINCT term)::BIGINT AS wordnums FROM tok GROUP BY doc_id)
SELECT d.doc_id, length(d.text)::BIGINT AS data_len,
       coalesce(wn.wordnums, 0)::BIGINT AS wordnums
FROM documents d LEFT JOIN wn USING(doc_id) ORDER BY doc_id"""


def sql_corpus_stats() -> str:
    return f"WITH {_TOK} SELECT n AS n_docs, avgdl FROM stats"


def sql_term_df() -> str:
    return f"""WITH {_TOK}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
FROM tf GROUP BY term ORDER BY term"""


def sql_lexicon_stats() -> str:
    return f"""WITH {_TOK}
SELECT term, df, CAST(ceil(df / 64.0) AS BIGINT) AS n_chunks
FROM dft ORDER BY term"""


def sql_bm25_disjunctive() -> str:
    return f"""WITH {_TOK},
q(query_id, ord, term) AS (VALUES {_query_terms(DISJ_QUERIES)}),
matches AS (
  SELECT q.query_id, tf.doc_id, sum({_BM25}) AS score
  FROM q
  JOIN tf USING (term)
  JOIN dft USING (term)
  JOIN documents d ON d.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
all_docs AS (
  SELECT qq.query_id, d.doc_id, coalesce(m.score, 0.0) AS score
  FROM (SELECT DISTINCT query_id FROM q) qq
  CROSS JOIN documents d
  LEFT JOIN matches m ON m.query_id = qq.query_id AND m.doc_id = d.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM all_docs
)
SELECT query_id, rank, doc_id, score FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank"""


def sql_bm25_deleted() -> str:
    # tombstone semantics (index/extend.py delete_docs): idf/avgdl/N are the
    # STORED full-corpus stats (tf/dft/stats CTEs over ALL docs), but the
    # ranking — matches AND the zero-pad pool — covers only surviving docs
    return f"""WITH {_TOK},
q(query_id, ord, term) AS (VALUES {_query_terms(DISJ_QUERIES)}),
matches AS (
  SELECT q.query_id, tf.doc_id, sum({_BM25}) AS score
  FROM q
  JOIN tf USING (term)
  JOIN dft USING (term)
  JOIN documents d ON d.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.doc_id % 7 <> 0
  GROUP BY q.query_id, tf.doc_id
),
all_docs AS (
  SELECT qq.query_id, d.doc_id, coalesce(m.score, 0.0) AS score
  FROM (SELECT DISTINCT query_id FROM q) qq
  CROSS JOIN (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
  LEFT JOIN matches m ON m.query_id = qq.query_id AND m.doc_id = d.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM all_docs
)
SELECT query_id, rank, doc_id, score FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank"""


def sql_bm25_conjunctive() -> str:
    # soft conjunction: candidates = min-df term's postings (first query term
    # achieving the minimum); other terms add score only where present
    return f"""WITH {_TOK},
q(query_id, ord, term) AS (VALUES {_query_terms(CONJ_QUERIES)}),
qdf AS (
  SELECT q.query_id, q.ord, q.term, coalesce(dft.df, 0) AS df
  FROM q LEFT JOIN dft USING (term)
),
seed AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id ORDER BY df, ord) AS rn
    FROM qdf
  ) WHERE rn = 1
),
cand AS (
  SELECT s.query_id, tf.doc_id FROM seed s JOIN tf ON tf.term = s.term
),
scored AS (
  SELECT c.query_id, c.doc_id, sum({_BM25}) AS score
  FROM cand c
  JOIN q ON q.query_id = c.query_id
  JOIN tf ON tf.term = q.term AND tf.doc_id = c.doc_id
  JOIN dft ON dft.term = q.term
  JOIN documents d ON d.doc_id = c.doc_id
  CROSS JOIN stats s
  GROUP BY c.query_id, c.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank"""


def sql_bm25_trec() -> str:
    # TREC-mode quirks reproduced in SQL: the url first line is dropped
    # (tokens come from the body only), the trailing unflushed token is
    # dropped (i <= len(parts) - 1), and dl = FULL doc bytes including the
    # url line + newline (hw2/DataLoader.cpp:27-70)
    return f"""
WITH docs AS (
  SELECT doc_id, text, 'doc://' || source || '/' || doc_id AS url FROM documents
),
pp AS (SELECT doc_id, string_split(text, ' ') AS parts FROM docs),
tok AS (
  SELECT doc_id, parts[i] AS term
  FROM pp, unnest(generate_series(1, len(parts) - 1)) AS g(i)
  WHERE parts[i] <> ''
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term),
dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, (length(url) + 1 + length(text))::BIGINT AS dl FROM docs),
stats AS (
  SELECT count(*)::BIGINT AS n,
         CAST(floor(sum(dl)::DOUBLE / count(*)) AS BIGINT) AS avgdl
  FROM dl
),
q(query_id, ord, term) AS (VALUES {_query_terms(DISJ_QUERIES)}),
matches AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln((s.n - dft.df + 0.5) / (dft.df + 0.5)) * 2.2 * tf.tf
             / (1.2 * (0.25 + 0.75 * dl.dl / s.avgdl) + tf.tf)) AS score
  FROM q
  JOIN tf USING (term)
  JOIN dft USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
all_docs AS (
  SELECT qq.query_id, d.doc_id, coalesce(m.score, 0.0) AS score
  FROM (SELECT DISTINCT query_id FROM q) qq
  CROSS JOIN docs d
  LEFT JOIN matches m ON m.query_id = qq.query_id AND m.doc_id = d.doc_id
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(score, 6) DESC, doc_id) AS rank,
         doc_id, round(score, 6) AS score
  FROM all_docs
)
SELECT query_id, rank, doc_id, score FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank"""


def sql_token_counts() -> str:
    return f"""WITH {_TOK}
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       count(DISTINCT term)::BIGINT AS n_distinct
FROM tok GROUP BY doc_id ORDER BY doc_id"""


def sql_doc_quality() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""WITH {_TOK},
agg AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_tokens,
         count(DISTINCT term)::BIGINT AS n_distinct,
         sum(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END)::DOUBLE AS n_stop,
         sum(length(term))::DOUBLE AS tok_chars
  FROM tok GROUP BY doc_id
)
SELECT d.doc_id, length(d.text)::BIGINT AS n_chars, a.n_tokens,
       round(a.n_distinct::DOUBLE / a.n_tokens, 6) AS distinct_ratio,
       round(a.n_stop / a.n_tokens, 6) AS stopword_ratio,
       round(a.tok_chars / a.n_tokens, 6) AS mean_token_len
FROM documents d JOIN agg a USING(doc_id) ORDER BY doc_id"""


def sql_fingerprint_md5() -> str:
    return "SELECT doc_id, md5(text) AS text_hash FROM documents ORDER BY doc_id"


def sql_dedup_exact() -> str:
    return """
SELECT min(doc_id)::BIGINT AS doc_id, md5(text) AS text_hash,
       count(*)::BIGINT AS n_copies
FROM documents GROUP BY md5(text) ORDER BY doc_id"""


def sql_doc_keywords() -> str:
    return f"""WITH {_TOK}
SELECT doc_id, term, weight FROM (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(s.n::DOUBLE / dft.df), 6) AS weight,
         row_number() OVER (PARTITION BY tf.doc_id
             ORDER BY tf.tf * ln(s.n::DOUBLE / dft.df) DESC, tf.term) AS rn
  FROM tf JOIN dft USING(term) CROSS JOIN stats s
) WHERE rn <= 3
ORDER BY doc_id, term"""


def sql_top_bigrams() -> str:
    # adjacency over the NON-EMPTY token sequence (separator runs collapse),
    # matching the engine tokenizer's span semantics
    return """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
toks AS (
  SELECT doc_id, unnest(parts) AS term,
         generate_subscripts(parts, 1) AS ord
  FROM docs
),
seq AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
  FROM toks WHERE term <> ''
),
big AS (
  SELECT s.term || ' ' || lead(s.term) OVER (
             PARTITION BY s.doc_id ORDER BY s.pos) AS bigram
  FROM seq s
)
SELECT bigram, count(*)::BIGINT AS cnt
FROM big WHERE bigram IS NOT NULL
GROUP BY bigram
ORDER BY cnt DESC, bigram
LIMIT 20"""


def sql_dedup_normalized() -> str:
    # Same RE2 regex engine on both sides; trim after the collapse only
    # ever strips single spaces, so plain trim() matches utf8_trim(" ").
    return r"""
SELECT min(doc_id)::BIGINT AS doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS text_hash,
       count(*)::BIGINT AS n_copies
FROM documents
GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
ORDER BY doc_id"""


def sql_bpe_token_count() -> str:
    from ..functions.textstats import BPE_PRETOKEN_RE

    return f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{BPE_PRETOKEN_RE}'))::BIGINT
         AS n_bpe_tokens
FROM documents ORDER BY doc_id"""


def sql_lm_score() -> str:
    # corpus-unigram LM recomputation; sum order differs from the Ray
    # side (per-occurrence vs tf-weighted) — identical doubles, 6-dp round
    return f"""WITH {_TOK},
ug AS (SELECT term, count(*)::DOUBLE AS c FROM tok GROUP BY term),
tot AS (SELECT sum(c) AS t FROM ug)
SELECT tok.doc_id, round(sum(ln(g.c / tot.t)) / count(*), 6) AS lm_logprob
FROM tok JOIN ug g USING (term), tot
GROUP BY tok.doc_id ORDER BY tok.doc_id"""


def sql_repetition_stats() -> str:
    # Exact string-gram recomputation of the token-n-gram repetition
    # signals (Ray side hashes grams off the Arrow buffers, 1:1 with
    # string grams modulo 64-bit collisions).  Docs shorter than the
    # window get 0 on both sides.
    return """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS parts
  FROM documents
),
base AS (SELECT doc_id, len(parts) AS n, parts FROM toks),
g2 AS (
  SELECT doc_id, parts[i] || ' ' || parts[i+1] AS g
  FROM base, unnest(generate_series(1, n - 1)) AS t(i) WHERE n >= 2
),
g3 AS (
  SELECT doc_id, array_to_string(parts[i:i+2], ' ') AS g
  FROM base, unnest(generate_series(1, n - 2)) AS t(i) WHERE n >= 3
),
top2 AS (
  SELECT doc_id, max(c) AS m, sum(c) AS tot
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1
),
d3 AS (
  SELECT doc_id, count(DISTINCT g) AS dd, count(*) AS tt FROM g3 GROUP BY 1
)
SELECT b.doc_id,
       round(coalesce(t.m::DOUBLE / t.tot, 0), 6) AS top_bigram_frac,
       round(coalesce(1.0 - d.dd::DOUBLE / d.tt, 0), 6) AS dup_trigram_frac
FROM base b LEFT JOIN top2 t USING (doc_id) LEFT JOIN d3 d USING (doc_id)
ORDER BY b.doc_id"""


def sql_pii_scrub() -> str:
    # Same RE2 patterns VERBATIM as functions/pii.py (both engines are
    # RE2); counts run on the progressively-redacted text in the same
    # email -> ipv4 -> phone order.
    from ..functions.pii import PII_PATTERNS

    sql = "WITH r0 AS (SELECT doc_id, text AS t FROM documents)"
    prev = "r0"
    counts = []
    for i, (name, pat, repl) in enumerate(PII_PATTERNS, start=1):
        carried = ", ".join(f"n_{n}" for n, _, _ in PII_PATTERNS[: i - 1])
        carried = carried + ", " if carried else ""
        sql += f""",
r{i} AS (
  SELECT doc_id, {carried}
         len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{name},
         regexp_replace(t, '{pat}', '{repl}', 'g') AS t
  FROM {prev}
)"""
        prev = f"r{i}"
        counts.append(f"n_{name}")
    sql += f"""
SELECT doc_id, {', '.join(counts)}, md5(t) AS redacted_md5
FROM {prev} ORDER BY doc_id"""
    return sql


def sql_decontam() -> str:
    # Exact string 5-gram recomputation: bench slice = doc_id % 5 == 0,
    # n_hits = DISTINCT grams of a corpus doc found anywhere in the bench
    # slice.  The Ray side counts distinct 64-bit FNV gram hashes off the
    # Arrow buffers — 1:1 with string grams modulo collisions (same
    # contract as sql_dedup_minhash).  Docs with < 5 tokens emit no grams
    # on both sides.
    return """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS parts
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(parts[i:i+4], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(parts) - 4)) AS g(i)
  WHERE len(parts) >= 5
),
dg AS (SELECT DISTINCT doc_id, gram FROM grams),
bench AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 5 = 0)
SELECT d.doc_id, count(*)::BIGINT AS n_hits
FROM dg d JOIN bench b ON d.gram = b.gram
WHERE d.doc_id % 5 <> 0
GROUP BY d.doc_id
ORDER BY d.doc_id"""


def sql_sample_docs() -> str:
    return """
SELECT doc_id FROM documents
WHERE substr(md5(text), 1, 4) < '2000'
ORDER BY doc_id"""


def sql_sample_weighted() -> str:
    # exact recomputation of the A-ES draw: u from the md5(id:salt) hex
    # prefix, key = round(ln(u)/w, 9), top-20 by (key desc, id).  The 9 dp
    # quantization absorbs DuckDB-vs-numpy 1-ulp ln drift (sampling.py
    # weighted_sample docstring).  greatest(w, 1e-300) mirrors the engine's
    # np.maximum clamp so degenerate (<= 0) weights agree on both sides
    # instead of diverging (DuckDB ln(u)/0 vs a finite huge-negative key)
    return """
WITH keyed AS (
  SELECT doc_id, n_chars::DOUBLE AS weight,
         round(ln((CAST('0x' || substr(md5(doc_id || ':ws'), 1, 8) AS UBIGINT)
                   + 0.5) / 4294967296.0)
               / greatest(n_chars::DOUBLE, 1e-300), 9) AS lnkey
  FROM documents
)
SELECT row_number() OVER (ORDER BY lnkey DESC, doc_id)::BIGINT AS rank,
       doc_id, weight, lnkey
FROM keyed ORDER BY lnkey DESC, doc_id LIMIT 20"""


def sql_decontam_bloom() -> str:
    from .goldens import DECONTAM_BLOOM_GOLDEN_SF001

    # pinned-golden oracle: the Bloom bit pattern is not SQL-expressible;
    # the no-false-negative containment vs the EXACT sql_decontam output
    # and the FP envelope are pytest-pinned, this pin gates hash/probe
    # determinism
    return f"""
SELECT doc_id::BIGINT AS doc_id, n_hits::BIGINT AS n_hits
FROM (VALUES {DECONTAM_BLOOM_GOLDEN_SF001}) AS t(doc_id, n_hits)
ORDER BY doc_id"""


def sql_pack_windows() -> str:
    # global token prefix sum in doc_id order (== the row-group corpus
    # order of the testdata files), then integer window arithmetic
    return """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n
  FROM documents
),
c AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS s
  FROM toks
)
SELECT doc_id, s AS tok_start, n AS n_tokens,
       (s // 256)::BIGINT AS win_start,
       (CASE WHEN n > 0 THEN (s + n - 1) // 256 ELSE s // 256 END)::BIGINT AS win_end
FROM c ORDER BY doc_id"""


def sql_training_shuffle() -> str:
    return """
SELECT row_number() OVER (ORDER BY md5(doc_id || ':42')) - 1 AS rank, doc_id
FROM documents
ORDER BY rank LIMIT 100"""


def sql_curate_corpus() -> str:
    # full recomputation of the composed pipeline: quality filter ->
    # min-doc_id exact-dedup survivor -> 5-gram decontamination vs the
    # doc_id%5==0 held-out slice (same thresholds/rounding as the engine)
    return """
WITH toks AS (
  SELECT doc_id, source, text,
         list_filter(string_split(text, ' '), x -> x <> '') AS parts
  FROM documents
),
base AS (SELECT doc_id, source, text, parts, len(parts) AS n FROM toks),
g3 AS (
  SELECT doc_id, array_to_string(parts[i:i+2], ' ') AS g
  FROM base, unnest(generate_series(1, n - 2)) AS t(i) WHERE n >= 3
),
d3 AS (
  SELECT doc_id, count(DISTINCT g)::DOUBLE AS dd, count(*)::DOUBLE AS tt
  FROM g3 GROUP BY doc_id
),
q AS (
  SELECT b.doc_id, b.source, b.text, b.parts, b.n
  FROM base b LEFT JOIN d3 USING (doc_id)
  WHERE b.doc_id % 5 <> 0 AND b.n >= 20
    AND coalesce(round(1 - dd / tt, 6), 0) <= 0.05
),
surv AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
bg AS (
  SELECT DISTINCT array_to_string(parts[i:i+4], ' ') AS g
  FROM base, unnest(generate_series(1, n - 4)) AS t(i)
  WHERE doc_id % 5 = 0 AND n >= 5
),
contam AS (
  SELECT DISTINCT q.doc_id
  FROM q, unnest(generate_series(1, q.n - 4)) AS t(i)
  WHERE array_to_string(q.parts[i:i+4], ' ') IN (SELECT g FROM bg)
)
SELECT q.doc_id, q.source, q.n::BIGINT AS n_tokens
FROM q JOIN surv s ON s.doc_id = q.doc_id
WHERE q.doc_id NOT IN (SELECT doc_id FROM contam)
ORDER BY q.doc_id"""


def sql_rebalance_sources() -> str:
    # same op order as rebalance_sources: (total/nsrc) first, then /n,
    # floor to a 16-bit hex threshold on md5(text)
    return """
WITH n AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY 1),
ns AS (SELECT count(*)::DOUBLE AS k FROM n),
r AS (SELECT source, n, least(1.0, (200.0 / k) / n) AS rate FROM n, ns)
SELECT d.doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE r.rate >= 1.0
   OR substr(md5(d.text), 1, 4)
      < printf('%04x', CAST(floor(65536 * r.rate) AS INT))
ORDER BY d.doc_id"""


def sql_docs_per_source_cap() -> str:
    return """
SELECT doc_id, source FROM (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents
) WHERE rn <= 5
ORDER BY doc_id"""


def sql_dedup_minhash() -> str:
    # INDEPENDENT exact oracle: ground-truth shingle-Jaccard over all pairs.
    # The Ray pipeline goes through MinHash+LSH candidates first; at the
    # gate's threshold (0.5) the planted near-dups all have Jaccard >= 0.9,
    # where 16-band/4-row LSH recall is 1 - (1 - j^4)^16 ~ 1, so the
    # candidate route and the exhaustive oracle agree exactly (verified:
    # identical pairs AND 6-dp jaccard values at sf0.01/sf0.1).
    return """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS parts FROM documents
),
tp AS (
  SELECT doc_id, i, parts[i] AS term, len(parts) AS n
  FROM toks, unnest(generate_series(1, len(parts))) AS g(i)
  WHERE parts[i] <> ''
),
sh3 AS (
  SELECT a.doc_id, a.term || ' ' || b.term || ' ' || c.term AS shingle
  FROM tp a JOIN tp b ON b.doc_id = a.doc_id AND b.i = a.i + 1
            JOIN tp c ON c.doc_id = a.doc_id AND c.i = a.i + 2
  WHERE a.n >= 3
),
shsmall AS (
  SELECT doc_id, string_agg(term, ' ' ORDER BY i) AS shingle
  FROM tp WHERE n < 3 GROUP BY doc_id
),
sh AS (SELECT DISTINCT * FROM (SELECT * FROM sh3 UNION ALL SELECT * FROM shsmall)),
cnt AS (SELECT doc_id, count(*)::BIGINT AS c FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS i
  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT i.a, i.b, round(i.i::DOUBLE / (ca.c + cb.c - i.i), 6) AS jaccard
FROM inter i JOIN cnt ca ON ca.doc_id = i.a JOIN cnt cb ON cb.doc_id = i.b
WHERE i.i::DOUBLE / (ca.c + cb.c - i.i) >= 0.5
ORDER BY a, b"""


def sql_dedup_survivors() -> str:
    # connected components over the exact-Jaccard pair graph via recursive
    # min-label reachability; rep = min doc_id reachable from each doc
    return f"""
WITH RECURSIVE jac AS ({sql_dedup_minhash().replace("ORDER BY a, b", "")}),
edges AS (SELECT a, b FROM jac UNION ALL SELECT b AS a, a AS b FROM jac),
nodes AS (SELECT DISTINCT a AS doc FROM edges),
reach(doc, node) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT r.doc, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT doc AS doc_id, min(node)::BIGINT AS rep_id
FROM reach GROUP BY doc ORDER BY doc_id"""


def sql_dedup_best_survivor() -> str:
    # same recursive components as sql_dedup_survivors, then per-cluster
    # argmax by (whitespace token count DESC, doc_id) — the exact policy of
    # q_dedup_best_survivor (token counts gated separately by token_counts)
    return f"""
WITH RECURSIVE jac AS ({sql_dedup_minhash().replace("ORDER BY a, b", "")}),
edges AS (SELECT a, b FROM jac UNION ALL SELECT b AS a, a AS b FROM jac),
nodes AS (SELECT DISTINCT a AS doc FROM edges),
reach(doc, node) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT r.doc, e.b FROM reach r JOIN edges e ON e.a = r.node
),
comp AS (SELECT doc AS doc_id, min(node) AS rep_id FROM reach GROUP BY doc),
tokc AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens
  FROM (SELECT doc_id, t.term
        FROM documents, unnest(string_split(text, ' ')) AS t(term)
        WHERE t.term <> '')
  GROUP BY doc_id
),
best AS (
  SELECT c.rep_id, c.doc_id, t.n_tokens,
         row_number() OVER (PARTITION BY c.rep_id
                            ORDER BY t.n_tokens DESC, c.doc_id) AS rn
  FROM comp c JOIN tokc t USING (doc_id)
)
SELECT rep_id::BIGINT AS rep_id, doc_id::BIGINT AS survivor_id, n_tokens
FROM best WHERE rn = 1 ORDER BY rep_id"""


def sql_lang_id() -> str:
    from ..functions.textstats import LANG_MARKERS

    marker_rows = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(LANG_MARKERS)
        for w in sorted(LANG_MARKERS[lang])
    )
    # argmax with STRICT > and alphabetical iteration order == order by
    # (score DESC, lang ASC) rank 1; docs with zero marker hits stay 'und'
    return f"""
WITH {_TOK},
markers(lang, term) AS (VALUES {marker_rows}),
tokn AS (SELECT doc_id, count(*)::BIGINT AS nt FROM tok GROUP BY doc_id),
scores AS (
  SELECT t.doc_id, m.lang, count(*)::DOUBLE AS hits
  FROM tok t JOIN markers m ON t.term = m.term GROUP BY 1, 2
),
best AS (
  SELECT s.doc_id, s.lang,
         s.hits / greatest(tn.nt, 1) AS score,
         row_number() OVER (PARTITION BY s.doc_id
                            ORDER BY s.hits / greatest(tn.nt, 1) DESC, s.lang) AS rn
  FROM scores s JOIN tokn tn USING (doc_id)
)
SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang,
       round(coalesce(b.score, 0.0), 6) AS confidence
FROM documents d
LEFT JOIN (SELECT * FROM best WHERE rn = 1 AND score > 0) b USING (doc_id)
ORDER BY doc_id"""


def sql_multimodal_meta() -> str:
    # the stub decoder is pure byte arithmetic over the payload (= utf-8 of
    # documents.text, ASCII in the testdata): w=16+b0%240, h=16+b1%240,
    # c=1+b2%3, byte_mean = mean byte value; decoded=0 when len < 4
    return """
WITH chars AS (
  SELECT doc_id, avg(ascii(text[i]))::DOUBLE AS byte_mean
  FROM documents, unnest(generate_series(1, length(text))) AS g(i)
  GROUP BY doc_id
)
SELECT d.doc_id AS media_id,
       CASE WHEN length(d.text) >= 4 THEN 16 + ascii(d.text[1]) % 240 ELSE 0 END::BIGINT AS width,
       CASE WHEN length(d.text) >= 4 THEN 16 + ascii(d.text[2]) % 240 ELSE 0 END::BIGINT AS height,
       CASE WHEN length(d.text) >= 4 THEN 1 + ascii(d.text[3]) % 3 ELSE 0 END::BIGINT AS channels,
       length(d.text)::BIGINT AS n_bytes,
       CASE WHEN length(d.text) >= 4 THEN round(c.byte_mean, 6) ELSE 0.0 END AS byte_mean,
       (length(d.text) >= 4)::BIGINT AS decoded
FROM documents d LEFT JOIN chars c USING (doc_id)
ORDER BY media_id"""


def sql_dedup_embedding() -> str:
    return """
SELECT a.vec_id::BIGINT AS a, b.vec_id::BIGINT AS b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
ORDER BY a, b"""


def sql_ann_topk() -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id IN ({ids})),
sims AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cosine
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank,
         vec_id, cosine
  FROM sims
)
SELECT query_id, rank, vec_id, cosine FROM ranked
WHERE rank <= {ANN_K} ORDER BY query_id, rank"""


def sql_pricing_summary() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""


def sql_revenue_by_nation() -> str:
    return """
SELECT n.n_name AS nation, round(sum(o.o_totalprice), 4) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY nation"""


def sql_join_priority_revenue() -> str:
    return """
SELECT o.o_orderpriority,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority"""


def sql_funnel() -> str:
    return """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 1::BIGINT AS stage, 'view' AS event_type, count(*)::BIGINT AS n_users FROM v
UNION ALL
SELECT 2::BIGINT, 'click', count(*)::BIGINT FROM c
UNION ALL
SELECT 3::BIGINT, 'purchase', count(*)::BIGINT FROM p
ORDER BY stage"""


def sql_session_assignments() -> str:
    return """
SELECT event_id, user_id,
       sum(CASE WHEN gap THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING)::BIGINT AS session_idx
FROM (
    SELECT event_id, user_id, ts,
           ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               > INTERVAL 30 MINUTE AS gap
    FROM events
)
ORDER BY event_id"""


def sql_price_quantiles() -> str:
    # quantile_disc needs a constant q in DuckDB -> UNION ALL per q.
    # floor(x*100)/100 matches the sketch's cent discretization exactly
    # (floor after IEEE multiply is bit-identical across engines).
    per_q = """
SELECT l_returnflag, CAST({q} AS DOUBLE) AS q,
       quantile_disc(floor(l_extendedprice * 100) / 100, {q}) AS price_q
FROM lineitem GROUP BY l_returnflag"""
    body = "\nUNION ALL".join(per_q.format(q=q) for q in (0.25, 0.5, 0.75, 0.95))
    return body + "\nORDER BY l_returnflag, q"


def sql_click_error_pairs() -> str:
    return """
SELECT l.event_id AS click_id, l.user_id, r.event_id AS error_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') r
  ON r.user_id = l.user_id
 AND r.ts >= l.ts
 AND r.ts <= l.ts + INTERVAL 5 MINUTE
ORDER BY click_id, error_id"""


def sql_events_sliding_window() -> str:
    # 1h windows hopping 15min: event at t belongs to window starts
    # (floor(t/900s) - k) * 900s for k in 0..3 (every one covers t since
    # hop divides size); the cross join enumerates k
    return """
SELECT event_type,
       to_timestamp(((epoch_us(ts) // 900000000) - k.k) * 900)::TIMESTAMP
           AS window_start,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
GROUP BY event_type, window_start
ORDER BY event_type, window_start"""


def sql_events_asof_purchase() -> str:
    return """
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS last_purchase_ts,
       round(r.value, 4) AS last_purchase_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id"""


def sql_events_window() -> str:
    return """
SELECT event_type,
       to_timestamp((epoch_us(ts) // 3600000000) * 3600)::TIMESTAMP AS window_start,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY event_type, window_start
ORDER BY event_type, window_start"""


def sql_top_users() -> str:
    return """
WITH agg AS (
  SELECT user_id, round(sum(value), 4) AS total_value, count(*)::BIGINT AS n_events
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT row_number() OVER (ORDER BY total_value DESC, user_id) AS rank, *
  FROM agg
)
SELECT rank, user_id, total_value, n_events FROM ranked
WHERE rank <= 10 ORDER BY rank"""


def sql_sessionize() -> str:
    return """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id, count(*)::BIGINT AS n_events,
       (1 + sum(CASE WHEN prev IS NOT NULL AND ts - prev > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END))::BIGINT AS n_sessions
FROM e GROUP BY user_id ORDER BY user_id"""


def sql_distinct_users_daily() -> str:
    return """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY day ORDER BY day"""


def sql_customers_without_orders() -> str:
    return """
SELECT c.c_custkey::BIGINT AS c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey"""


def sql_search_snippets() -> str:
    from .goldens import SNIPPETS_GOLDEN_SF001

    # pinned-golden oracle (see goldens.py docstring): algorithm semantics
    # are pytest-pinned; this VALUES table gates end-to-end drift at sf0.01
    return f"""
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, snippet::VARCHAR AS snippet
FROM (VALUES {SNIPPETS_GOLDEN_SF001}) AS t(query_id, rank, doc_id, snippet)
ORDER BY query_id, rank"""


def sql_dedup_simhash() -> str:
    from .goldens import SIMHASH_GOLDEN_SF001

    # pinned-golden oracle: simhash64 folds a 64-bit FNV-1a token hash,
    # which SQL cannot recompute; banding+Hamming are pytest-pinned
    # (golden regenerated 2026-08-17 when the token hash moved from
    # pandas' object hash to the portable buffer-level FNV-1a)
    return f"""
SELECT a::BIGINT AS a, b::BIGINT AS b, hamming::BIGINT AS hamming
FROM (VALUES {SIMHASH_GOLDEN_SF001}) AS t(a, b, hamming)
ORDER BY a, b"""


def sql_ann_ivf() -> str:
    from .goldens import ANN_IVF_GOLDEN_SF001

    # pinned-golden oracle: IVF is approximate by design (recall pinned by
    # pytest vs brute force); the pin gates centroid/probe determinism
    return f"""
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       vec_id::BIGINT AS vec_id, cosine::DOUBLE AS cosine
FROM (VALUES {ANN_IVF_GOLDEN_SF001}) AS t(query_id, rank, vec_id, cosine)
ORDER BY query_id, rank"""


def sql_ann_lsh() -> str:
    from .goldens import ANN_LSH_GOLDEN_SF001

    # pinned-golden oracle: multi-probe LSH is approximate by design
    # (recall vs brute force pinned by pytest, full-probe mode proven
    # identical to the exact scan); the pin gates plane/probe determinism
    return f"""
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       vec_id::BIGINT AS vec_id, cosine::DOUBLE AS cosine
FROM (VALUES {ANN_LSH_GOLDEN_SF001}) AS t(query_id, rank, vec_id, cosine)
ORDER BY query_id, rank"""


# exact all-pairs kNN CTE body (self excluded; DOUBLE cast because
# list_cosine_similarity computes in float32 on float lists), ranked on
# 6-dp rounded cosine with neighbor-id tie-break — the same rule
# ann._merge_topk / _rowwise_topk apply.  SHARED by sql_knn_graph and
# sql_semantic_clusters so the kNN definition cannot drift between gates.
_KNN_CTE = """
sims AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id,
         round(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
knn AS (
  SELECT vec_id, nbr_id, cosine,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cosine DESC, nbr_id) AS rank
  FROM sims
)"""
KNN_K = 5


def sql_knn_graph() -> str:
    return f"""
WITH {_KNN_CTE}
SELECT vec_id, rank::BIGINT AS rank, nbr_id, cosine
FROM knn WHERE rank <= {KNN_K} ORDER BY vec_id, rank"""


def sql_semantic_clusters() -> str:
    from .engine_queries import SEMANTIC_TAU

    # recursive min-label reachability over the SAME exact kNN edges
    # (shared _KNN_CTE) at the pipeline's threshold
    return f"""
WITH RECURSIVE {_KNN_CTE},
qual AS (SELECT vec_id, nbr_id FROM knn WHERE rank <= {KNN_K} AND cosine >= {SEMANTIC_TAU}),
edges AS (SELECT vec_id AS a, nbr_id AS b FROM qual
          UNION ALL SELECT nbr_id, vec_id FROM qual),
nodes AS (SELECT DISTINCT a AS v FROM edges),
reach(v, node) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.v, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT v AS vec_id, min(node)::BIGINT AS cluster_rep
FROM reach GROUP BY v ORDER BY vec_id"""


def sql_embedding_centroid() -> str:
    # exact recomputation: per-dimension mean, then cosine per vector
    return """
WITH d AS (
  SELECT vec_id, i, embedding[i]::DOUBLE AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i)
),
c AS (SELECT i, avg(x) AS m FROM d GROUP BY i),
nm AS (SELECT sqrt(sum(m * m)) AS n FROM c),
dot AS (
  SELECT vec_id, sum(x * m) AS xy, sqrt(sum(x * x)) AS nx
  FROM d JOIN c USING (i) GROUP BY vec_id
)
SELECT vec_id, round(xy / (nx * nm.n), 6) AS cos_centroid
FROM dot, nm ORDER BY vec_id"""


def sql_kmeans_embed() -> str:
    from .goldens import KMEANS_GOLDEN_SF001

    # pinned-golden oracle: iterative Lloyd's state is not SQL-expressible
    # (the pin gates init/iteration determinism; monotone inertia and
    # planted-blob recovery are pytest-pinned)
    return f"""
SELECT vec_id::BIGINT AS vec_id, cluster::BIGINT AS cluster
FROM (VALUES {KMEANS_GOLDEN_SF001}) AS t(vec_id, cluster)
ORDER BY vec_id"""


def sql_hll_users_daily() -> str:
    from .goldens import HLL_GOLDEN_SF001

    # pinned-golden oracle: the estimate is approximate by design (error
    # vs exact pinned by pytest); the pin gates hash/register determinism
    return f"""
SELECT day::VARCHAR AS day, n_users_approx::BIGINT AS n_users_approx
FROM (VALUES {HLL_GOLDEN_SF001}) AS t(day, n_users_approx)
ORDER BY day"""


def sql_crawl_frontier() -> str:
    from .goldens import CRAWL_GOLDEN_SF001

    # pinned-golden oracle: the priority-frontier crawl is iterative state
    # (discovery counts evolve as pages are fetched), not a relational
    # query — but the synthetic web store, the seeds and the round size are
    # all deterministic, so the full fetch log is pinnable.  Filter/score/
    # budget semantics are independently hand-verified in tests/test_crawl.py;
    # this pin upgrades the driver gate from rows-only to hash-matched.
    return f"""
SELECT ord::BIGINT AS ord, round::BIGINT AS round, url::VARCHAR AS url,
       priority::DOUBLE AS priority, status::BIGINT AS status,
       size::BIGINT AS size, lang::VARCHAR AS lang,
       in_sample::BIGINT AS in_sample,
       n_links_enqueued::BIGINT AS n_links_enqueued
FROM (VALUES {CRAWL_GOLDEN_SF001})
  AS t(ord, round, url, priority, status, size, lang, in_sample, n_links_enqueued)
ORDER BY ord"""


def oracle_sql_map() -> dict[str, str]:
    return {
        "postings": sql_postings(),
        "doctable": sql_doctable(),
        "corpus_stats": sql_corpus_stats(),
        "term_df": sql_term_df(),
        "lexicon_stats": sql_lexicon_stats(),
        "bm25_disjunctive": sql_bm25_disjunctive(),
        "bm25_conjunctive": sql_bm25_conjunctive(),
        "bm25_sharded": sql_bm25_disjunctive(),
        "bm25_extend": sql_bm25_disjunctive(),
        "bm25_deleted": sql_bm25_deleted(),
        "bm25_jsonl": sql_bm25_disjunctive(),
        "bm25_trec": sql_bm25_trec(),
        "search_snippets": sql_search_snippets(),
        "dedup_simhash": sql_dedup_simhash(),
        "ann_ivf": sql_ann_ivf(),
        "ann_lsh": sql_ann_lsh(),
        "knn_graph": sql_knn_graph(),
        "semantic_clusters": sql_semantic_clusters(),
        "kmeans_embed": sql_kmeans_embed(),
        "embedding_centroid": sql_embedding_centroid(),
        "hll_users_daily": sql_hll_users_daily(),
        "token_counts": sql_token_counts(),
        "doc_quality": sql_doc_quality(),
        "fingerprint_md5": sql_fingerprint_md5(),
        "dedup_exact": sql_dedup_exact(),
        "dedup_normalized": sql_dedup_normalized(),
        "decontam": sql_decontam(),
        "decontam_bloom": sql_decontam_bloom(),
        "repetition_stats": sql_repetition_stats(),
        "pii_scrub": sql_pii_scrub(),
        "lm_score": sql_lm_score(),
        "bpe_token_count": sql_bpe_token_count(),
        "top_bigrams": sql_top_bigrams(),
        "doc_keywords": sql_doc_keywords(),
        "sample_docs": sql_sample_docs(),
        "sample_weighted": sql_sample_weighted(),
        "rebalance_sources": sql_rebalance_sources(),
        "pack_windows": sql_pack_windows(),
        "training_shuffle": sql_training_shuffle(),
        "curate_corpus": sql_curate_corpus(),
        "docs_per_source_cap": sql_docs_per_source_cap(),
        "dedup_minhash": sql_dedup_minhash(),
        "dedup_ngram": sql_dedup_minhash(),  # exact-Jaccard ground truth, shared
        "dedup_survivors": sql_dedup_survivors(),
        "dedup_best_survivor": sql_dedup_best_survivor(),

        "lang_id": sql_lang_id(),
        "multimodal_meta": sql_multimodal_meta(),
        "dedup_embedding": sql_dedup_embedding(),
        "ann_topk": sql_ann_topk(),
        "pricing_summary": sql_pricing_summary(),
        "revenue_by_nation": sql_revenue_by_nation(),
        "join_priority_revenue": sql_join_priority_revenue(),
        "events_asof_purchase": sql_events_asof_purchase(),
        "events_sliding_window": sql_events_sliding_window(),
        "click_error_pairs": sql_click_error_pairs(),
        "session_assignments": sql_session_assignments(),
        "price_quantiles": sql_price_quantiles(),
        "funnel": sql_funnel(),
        "events_window": sql_events_window(),
        "top_users": sql_top_users(),
        "sessionize": sql_sessionize(),
        "distinct_users_daily": sql_distinct_users_daily(),
        "customers_without_orders": sql_customers_without_orders(),
        "crawl_frontier": sql_crawl_frontier(),
    }
