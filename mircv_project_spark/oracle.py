"""DuckDB oracle SQL — independent ANSI-SQL re-statements of the engine.

The driver runs each ``__spark_entry__.queries()[name]`` AND the matching
SQL here side-by-side on the same parquet tables and compares row count,
schema and an order-insensitive value hash.  The SQL must therefore be a
*fully independent* computation of the same semantics (tokenizer ->
postings -> stats -> scoring -> top-k), not a call into our code.

Scope notes:
- The oracle covers the parse=False pipeline.  T1-T5 are directly
  SQL-expressible.  T6 (run-collapse) needs regex backreferences, which
  DuckDB's RE2 lacks, and Java trim() of control chars is awkward — both
  are NO-OPS on the driver's documents corpus (no 3+ identical-char runs,
  no control chars; guarded by tests/test_oracle_assumptions.py), so the
  SQL omits them and remains an exact oracle for this input.
- parse=True (stopwords + Porter) is not SQL-expressible offline (DuckDB
  fts/stem extension can't be downloaded in the sandbox), so parsed-mode
  queries() entries carry no oracle_sql and are covered by the pytest
  golden fixtures instead (tests/test_tokenizer.py).

The transcript table is derived deterministically from ``documents``
(sources/transcripts.py); the mapping is restated in SQL here so DuckDB
builds the identical table.
"""

from __future__ import annotations

# (qid, text) — fixed retrieval query set over the synthetic corpus
# vocabulary: multi-term, single-term, duplicate-term (q06 — duplicate
# tokens score twice, QueryProcessorMain.getPostingLists has no dedup),
# missing-term (q07 — silently dropped), stopword-only (q08).
QUERY_SET: list[tuple[str, str]] = [
    ("q01", "spark join"),
    ("q02", "hash join merge sort"),
    ("q03", "the fast query"),
    ("q04", "customer order line"),
    ("q05", "vector"),
    ("q06", "spark spark stream"),
    ("q07", "warpcore spark"),
    ("q08", "the a"),
    ("q09", "big data table scan slow"),
    ("q10", "window group agg sort merge filter"),
]

CONJ_QUERY_SET: list[tuple[str, str]] = [
    ("c01", "spark join"),
    ("c02", "hash join merge"),
    ("c03", "warpcore spark"),
    ("c04", "customer window batch"),
    ("c05", "slow fast big small"),
]

TOPK_K = 10

# ---------------------------------------------------------------------------
# shared CTE prefix: documents -> transcripts -> docids -> tokens ->
# doclens / postings / lexicon / stats
# ---------------------------------------------------------------------------

# tokenizer T1-T5 as a DuckDB expression over a text column
_TOKENS_EXPR = (
    "list_filter("
    "string_split(lower(regexp_replace(regexp_replace({col}, '<[^>]+>', ' ', 'g'),"
    " '[!-/:-@\\[-`{{-~]', ' ', 'g')), ' '), "
    "t -> t <> '' AND length(t) < 64 AND NOT regexp_matches(t, '[^\\x00-\\x7F]'))"
)

_PREFIX = f"""
WITH transcripts AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 8, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           text
    FROM documents
),
docs AS (
    SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) AS BIGINT) AS docid,
           conv_id, turn_idx, text
    FROM transcripts
    WHERE text IS NOT NULL AND trim(text) <> ''
),
tokend AS (
    SELECT docid, conv_id, turn_idx,
           {_TOKENS_EXPR.format(col='text')} AS tokens
    FROM docs
),
doclens AS (
    SELECT docid, conv_id, turn_idx, CAST(len(tokens) AS BIGINT) AS doc_len
    FROM tokend
),
postings AS (
    SELECT docid, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
    GROUP BY docid, term
),
lexicon AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf
    FROM postings GROUP BY term
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_len) AS BIGINT) AS sum_doc_len,
           CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
    FROM doclens
)
"""


def _values(queries: list[tuple[str, str]]) -> str:
    rows = ", ".join(
        "('" + qid + "', '" + text.replace("'", "''") + "')" for qid, text in queries
    )
    return f"(VALUES {rows})"


def _query_ctes(queries: list[tuple[str, str]]) -> str:
    return f"""
queries AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qtok AS (
    SELECT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term FROM queries
),
qterms AS (
    SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf FROM qtok GROUP BY qid, term
),
qexist AS (
    SELECT q.qid, q.term, q.qtf, l.df FROM qterms q JOIN lexicon l USING (term)
),
nreq AS (SELECT qid, count(*) AS n_required FROM qexist GROUP BY qid)
"""


_BM25 = (
    "(p.tf / ((1.5 * (0.3 + (0.7 * (dl.doc_len / s.avgdl)))) + p.tf))"
    " * log10(s.n_docs / q.df)"
)
_TFIDF = "(1 + log10(p.tf)) * log10(s.n_docs / q.df)"


def _topk_sql(queries, standard: str, conjunctive: bool, k: int) -> str:
    expr = _BM25 if standard == "bm25" else _TFIDF
    conj_filter = (
        "JOIN nreq r ON sc.qid = r.qid WHERE sc.nmatch = r.n_required"
        if conjunctive
        else ""
    )
    return f"""{_PREFIX}, {_query_ctes(queries)},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({expr})) AS raw_score,
           count(*) AS nmatch
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
ranked AS (
    SELECT sc.qid, sc.docid, round(sc.raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY sc.qid
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS rank
    FROM scored sc
    {conj_filter}
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def oracle_queries() -> dict[str, str]:
    """name -> DuckDB SQL, keys matching __spark_entry__.queries()."""
    out = {
        "doc_index": f"""{_PREFIX}
SELECT d.docid, CAST(d.docid - 1 AS VARCHAR) AS docno,
       d.conv_id, d.turn_idx, d.doc_len
FROM doclens d ORDER BY d.docid
""",
        "collection_stats": f"""{_PREFIX}
SELECT s.n_docs, s.sum_doc_len,
       (SELECT CAST(count(*) AS BIGINT) FROM lexicon) AS n_terms,
       round(s.avgdl, 6) AS avgdl
FROM stats s
""",
        "lexicon": f"""{_PREFIX},
lexagg AS (
    SELECT p.term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(sum(p.tf) AS BIGINT) AS cf,
           max(p.tf / ((1.5 * (0.3 + (0.7 * (dl.doc_len / s.avgdl)))) + p.tf)) AS mbc,
           max(1 + log10(p.tf)) AS mtc
    FROM postings p
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY p.term
)
SELECT a.term, a.df, a.cf,
       round(log10(s.n_docs / a.df), 6) AS idf,
       round(a.mbc * log10(s.n_docs / a.df), 6) AS bm25_ub,
       round(a.mtc * log10(s.n_docs / a.df), 6) AS tfidf_ub
FROM lexagg a CROSS JOIN stats s
ORDER BY a.term
""",
        "bm25_topk": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_topk_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        "tfidf_topk_conjunctive": _topk_sql(CONJ_QUERY_SET, "tfidf", True, TOPK_K),
    }
    return out
