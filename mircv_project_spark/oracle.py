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

import os

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

# exact-phrase gate queries (operators/phrase.py; strings already in
# normalized token form — mixed 2- and 3-token lengths, incl. a
# zero-match phrase at some SFs)
PHRASE_K = 10
PHRASE_SET: list[tuple[str, str]] = [
    ("p01", "table scan"),
    ("p02", "fast query"),
    ("p03", "spark join"),
    ("p04", "value table part"),
    ("p05", "the row"),
    ("p06", "sort merge batch"),
]

# literal substring-search gate patterns (operators/substring.py) —
# RAW-text containment (no tokenization): word pairs, a cross-word
# fragment ("art ba" spans "part batch"), a mid-word overlap, and a
# long fragment that matches nothing at some SFs
SUBSTR_K = 10
SUBSTR_SET: list[tuple[str, str]] = [
    ("s01", "batch batch"),
    ("s02", "merge slow"),
    ("s03", "row vector"),
    ("s04", "art ba"),
    ("s05", "window wind"),
    ("s06", "he fast k"),
]

# regex-search gate patterns (operators/substring.regex_topk) — RAW
# text, case-sensitive; every pattern uses only the regex subset with
# IDENTICAL semantics in Java (Spark) and RE2 (DuckDB): literal chars,
# [..] classes, +, alternation groups.  No backreferences, no \b, no
# lookaround (the pii_scrub / tokenizer-oracle discipline).
REGEX_K = 10
REGEX_SET: list[tuple[str, str]] = [
    ("r01", "tab[a-z]+"),
    ("r02", "qu(ery|ick)"),
    ("r03", "s(low|mall) (join|scan)"),
    ("r04", "me+rge"),
]

# more-like-this gate probes (operators/mlt.py) — docnos (raw doc_id)
# valid at every SF (corpora have >= 500 docs)
MLT_K = 10
MLT_PROBE_DOCNOS: list[int] = [3, 77, 250, 444]

# BFS gate seeds (operators/graph.item_bfs) — item ids (props $.k is
# 0..99 at every SF); isolated seeds still emit their dist-0 row
BFS_SEEDS: list[int] = [0, 7, 13]

# query-time synonym map (operators/queryops.synonym_topk) — two
# in-vocab expansions plus one OOV target ('quick' never tokenizes out
# of this corpus), exercising the OOV-drop rule
SYN_MAP: dict[str, list[str]] = {
    "join": ["merge"],
    "sort": ["order"],
    "fast": ["quick"],
}

# auto-completion gate prefixes (operators/spell.complete_prefix) —
# mixed lengths (the operator branches per distinct length), a
# many-completion prefix ("s" — exercises the k-cut) and a no-match one
COMPLETE_PREFIXES: list[str] = ["s", "ta", "fi", "w", "quer", "zz"]
COMPLETE_TOPK = 5

# fuzzy-retrieval gate queries (operators/fuzzy.py) — typo'd variants
# of the vocabulary (deletions, substitutions, insertions at
# Levenshtein 1), plus an exact term, a term expanding to several
# variants, and an unrecoverable OOV ("warpcore" — dropped)
FUZZY_QUERY_SET: list[tuple[str, str]] = [
    ("f01", "spak join"),
    ("f02", "hash merg sort"),
    ("f03", "vectr"),
    ("f04", "custoner order"),
    ("f05", "the fasst query"),
    ("f06", "warpcore spark"),
]

# boolean-syntax gate queries (operators/boolquery.py): +must / -not /
# should mixes, an OOV MUST (dropped, b05) and an OOV NOT (excludes
# nothing, b04)
BOOLEAN_QUERY_SET: list[tuple[str, str]] = [
    ("b01", "spark +join"),
    ("b02", "query -slow"),
    ("b03", "+hash +merge sort"),
    ("b04", "customer -warpcore"),
    ("b05", "+warpcore spark"),
    ("b06", "-the spark"),
]

# wildcard (prefix*) retrieval queries (operators/fuzzy.prefix_topk) —
# mixed prefix lengths (the operator branches per distinct length), a
# high-fanout single char, and a no-match prefix
# leading-wildcard (*suffix) retrieval queries (fuzzy.suffix_topk) —
# mixed lengths, a high-fanout single char, and a no-match suffix
SUFFIX_QUERY_SET: list[tuple[str, str]] = [
    ("x01", "er"),
    ("x02", "ow"),
    ("x03", "ch"),
    ("x04", "n"),
    ("x05", "zz"),
]

PREFIX_QUERY_SET: list[tuple[str, str]] = [
    ("w01", "sp"),
    ("w02", "que"),
    ("w03", "cust"),
    ("w04", "s"),
    ("w05", "zz"),
]

# infix-wildcard (pre*suf) retrieval queries (fuzzy.wildcard_topk) —
# mixed length pairs (the operator branches per distinct (Lp, Ls)), a
# high-fanout single-char pair, a no-match pattern, and y07 whose
# literal parts could OVERLAP on short terms (the len >= Lp+Ls guard ==
# SQL LIKE semantics is exactly what that case pins)
WILDCARD_QUERY_SET: list[tuple[str, str]] = [
    ("y01", "s*k"),
    ("y02", "qu*y"),
    ("y03", "c*er"),
    ("y04", "s*t"),
    ("y05", "ta*le"),
    ("y06", "w*ore"),
    ("y07", "s*s"),
]

# next-term suggestion seeds (lm.next_term_suggest) — common corpus
# terms, one stopword context, and a no-bigram miss ("zzmissing")
SUGGEST_SEEDS: list[str] = ["spark", "join", "the", "customer", "sort", "zzmissing"]

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
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
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


def _ranked_ctes(queries, standard: str, conjunctive: bool) -> str:
    """WITH-body through the `ranked` CTE (shared by top-k + eval SQL)."""
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
)"""


def _hard_negatives_sql(queries, pool: int, k: int) -> str:
    """operators/ltr.hard_negatives: first k BM25-top-pool docs with
    synthetic-qrels grade <= 1, in rank order (pins restated from
    ltr.py)."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
runk AS (
    SELECT r.qid, r.docid, r.rank, r.score,
           CAST(coalesce(g.grade, 0) AS INTEGER) AS grade
    FROM ranked r
    LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
    WHERE r.rank <= {pool}
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score, grade
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY rank ASC
    ) AS hn
    FROM runk WHERE grade <= 1
) WHERE hn <= {k}
ORDER BY qid, rank
"""


def _topk_sql(queries, standard: str, conjunctive: bool, k: int) -> str:
    return f"""{_ranked_ctes(queries, standard, conjunctive)}
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


# --- parsed-mode (stopwords + Porter) oracle -------------------------------
#
# DuckDB cannot run stem() offline (fts extension is un-downloadable in
# this sandbox), so the parsed token streams are materialized ONCE into
# tests/fixtures/parsed_tokens.parquet by scripts/gen_parsed_fixture.py
# using the engine's own scalar tokenizer — whose semantics are pinned
# byte-for-byte against the reference jars' bundled classes
# (tests/fixtures/tokgold_*, porter_golden).  The fixture is keyed by
# md5(text): parsed tokens are a pure function of the text, so one
# fixture covers every driver SF.  Docs whose text parses to zero
# tokens (all stopwords) still count in n_docs/avgdl with doc_len 0 —
# index_build.tokenize_stage keeps them in doc_index the same way.

_PARSED_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "parsed_tokens.parquet",
)

_PARSED_PREFIX = f"""
WITH transcripts AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
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
ptok AS (
    SELECT d.docid, f.term, f.tf
    FROM docs d
    LEFT JOIN read_parquet('{_PARSED_FIXTURE}') f ON md5(d.text) = f.text_md5
),
doclens AS (
    SELECT docid, CAST(coalesce(sum(tf), 0) AS BIGINT) AS doc_len
    FROM ptok GROUP BY docid
),
postings AS (
    SELECT docid, term, CAST(tf AS BIGINT) AS tf FROM ptok WHERE term IS NOT NULL
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


def _parsed_query_ctes(queries: list[tuple[str, str]]) -> str:
    """qterms for parsed mode: query tokens are parsed PYTHON-side with
    the same golden-pinned tokenizer at SQL-build time and embedded as
    literals (the oracle cannot stem in-engine)."""
    from collections import Counter

    from .functions.tokenizer import tokenize

    rows = []
    for qid, text in queries:
        for term, qtf in sorted(Counter(tokenize(text, parse=True)).items()):
            rows.append(
                "('" + qid + "', '" + term.replace("'", "''") + f"', {qtf})"
            )
    values = ", ".join(rows)
    return f"""
qterms AS (SELECT * FROM (VALUES {values}) q(qid, term, qtf)),
qexist AS (
    SELECT q.qid, q.term, CAST(q.qtf AS BIGINT) AS qtf, l.df
    FROM qterms q JOIN lexicon l USING (term)
)
"""


def _topk_parsed_sql(queries, standard: str, k: int) -> str:
    expr = _BM25 if standard == "bm25" else _TFIDF
    return f"""{_PARSED_PREFIX}, {_parsed_query_ctes(queries)},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({expr})) AS raw_score
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
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _filtered_topk_sql(queries, standard: str, conjunctive: bool, k: int) -> str:
    """Metadata-filtered retrieval (operators/topk.filtered_topk):
    candidates restricted to role='assistant' turns; df/idf/avgdl stay
    corpus-global.  role='assistant' <=> doc_id % 4 == 1 — the
    sources/transcripts._ROLES mapping restated verbatim (same pattern
    as the conv-/lpad derivation in _PREFIX)."""
    expr = _BM25 if standard == "bm25" else _TFIDF
    conj_filter = (
        "JOIN nreq r ON sc.qid = r.qid WHERE sc.nmatch = r.n_required"
        if conjunctive
        else ""
    )
    return f"""{_PREFIX}, {_query_ctes(queries)},
allowed AS (
    SELECT d.docid
    FROM docs d JOIN transcripts t USING (conv_id, turn_idx)
    WHERE t.doc_id % 4 = 1
),
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({expr})) AS raw_score,
           count(*) AS nmatch
    FROM qexist q
    JOIN postings p USING (term)
    JOIN allowed a ON p.docid = a.docid
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


def _filtered_scoped_sql(queries, k: int) -> str:
    """operators/topk.filtered_topk_scoped_stats: the per-VIEW-stats
    design point — df/N/avgdl recomputed over the role='assistant'
    subset (doc_id % 4 == 1); terms absent from the subset drop."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
allowed AS (
    SELECT d.docid
    FROM docs d JOIN transcripts t USING (conv_id, turn_idx)
    WHERE t.doc_id % 4 = 1
),
fstats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl.doc_len) AS DOUBLE) / count(*) AS avgdl
    FROM allowed a JOIN doclens dl ON dl.docid = a.docid
),
fdf AS (
    SELECT p.term, CAST(count(*) AS BIGINT) AS df
    FROM postings p JOIN allowed a ON p.docid = a.docid
    WHERE p.term IN (SELECT term FROM qexist)
    GROUP BY 1
),
fscored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ((p.tf / ((1.5 * (0.3 + (0.7 * (dl.doc_len / s.avgdl))))
                                 + p.tf))
                        * log10(s.n_docs / f.df))) AS raw_score
    FROM qexist q
    JOIN fdf f ON f.term = q.term
    JOIN postings p ON p.term = q.term
    JOIN allowed a ON p.docid = a.docid
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN fstats s
    GROUP BY q.qid, p.docid
),
franked AS (
    SELECT qid, docid, round(raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM fscored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM franked WHERE rank <= {k}
"""


def _qld_topk_sql(queries, k: int, mu: float = 2048.0) -> str:
    """Dirichlet query-likelihood (operators/qld.py): matched-terms
    rank-equivalent form, per-term weight and doc-length part quantized
    to integer micro-log10 BEFORE the per-doc sum (exact BIGINT
    aggregate — shuffle-order-independent).  Pins restated from qld.py:
    mu=2048, (tf_double * C) / (mu * cf_double) parenthesization,
    ranking on the integer micro total desc / docid asc."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
qq AS (
    SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid
),
scored AS (
    SELECT q.qid, p.docid,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(p.tf AS DOUBLE) * s.sum_doc_len)
                   / ({mu} * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum,
           max(dl.doc_len) AS doc_len
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
final AS (
    SELECT sc.qid, sc.docid,
           sc.tsum + qq.q_total * CAST(round(log10(
               {mu} / (sc.doc_len + {mu})
           ) * 1e6) AS BIGINT) AS micro
    FROM scored sc JOIN qq USING (qid)
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM final
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1e6, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _preretrieval_qpp_sql(queries) -> str:
    """Pre-retrieval QPP (operators/qpp.preretrieval_qpp): lexicon-only
    predictors.  Pins restated from qpp.py: per-term micro BIGINT
    quantization of idf/ictf/scq/cq, idf/ictf/scq over DISTINCT
    in-lexicon terms, scs over multiplicity with ql = Σ qtf,
    parenthesizations (qtf_d · C) / (ql_d · cf_d) and
    (1.0 + ln(cf_d)) · ln(1.0 + n_docs_d / df_d); averages/scs round
    sum/n to INTEGER micro first (tiny n lands a one-step round-6 on
    exact 5e-7 halves — qpp.py docstring), then /1e6."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
qlex AS (
    SELECT q.qid, q.qtf, l.df, l.cf
    FROM qexist q JOIN lexicon l USING (term)
),
ql AS (SELECT qid, CAST(sum(qtf) AS BIGINT) AS ql FROM qlex GROUP BY qid),
terms AS (
    SELECT x.qid, x.qtf, q.ql,
           CAST(round(1e6 * log10(CAST(s.n_docs AS DOUBLE)
                                  / CAST(x.df AS DOUBLE))) AS BIGINT) AS idf_u,
           CAST(round(1e6 * log10(CAST(s.sum_doc_len AS DOUBLE)
                                  / CAST(x.cf AS DOUBLE))) AS BIGINT) AS ictf_u,
           CAST(round(1e6 * ((1.0 + ln(CAST(x.cf AS DOUBLE)))
                             * ln(1.0 + CAST(s.n_docs AS DOUBLE)
                                        / CAST(x.df AS DOUBLE)))) AS BIGINT)
               AS scq_u,
           x.qtf * CAST(round(1e6 * log10(
               (CAST(x.qtf AS DOUBLE) * CAST(s.sum_doc_len AS DOUBLE))
               / (CAST(q.ql AS DOUBLE) * CAST(x.cf AS DOUBLE))
           )) AS BIGINT) AS scs_c
    FROM qlex x JOIN ql q USING (qid) CROSS JOIN stats s
)
SELECT qid,
       CAST(count(*) AS BIGINT) AS n_terms,
       max(ql) AS ql,
       round(CAST(CAST(round(CAST(sum(idf_u) AS DOUBLE)
                             / CAST(count(*) AS DOUBLE)) AS BIGINT)
                  AS DOUBLE) / 1e6, 6) AS avg_idf,
       round(CAST(max(idf_u) AS DOUBLE) / 1e6, 6) AS max_idf,
       round(CAST(CAST(round(CAST(sum(ictf_u) AS DOUBLE)
                             / CAST(count(*) AS DOUBLE)) AS BIGINT)
                  AS DOUBLE) / 1e6, 6) AS avg_ictf,
       round(CAST(CAST(round(CAST(sum(scs_c) AS DOUBLE)
                             / CAST(max(ql) AS DOUBLE)) AS BIGINT)
                  AS DOUBLE) / 1e6, 6) AS scs,
       round(CAST(sum(scq_u) AS DOUBLE) / 1e6, 6) AS scq_sum
FROM terms
GROUP BY qid
ORDER BY qid
"""


def _qljm_topk_sql(queries, k: int) -> str:
    """Jelinek-Mercer query likelihood (operators/qld.qljm_topk):
    matched-terms rank-equivalent form, per-(term,doc) weight
    quantized to integer micro-log10 BIGINT before the exact per-doc
    sum.  Pins restated from qld.py: lambda=0.5 so the odds factor is
    exactly 1 (omitted), query-constant part = |q| * (-301030) with
    the literal micro value of log10(0.5), parenthesization
    (tf_double * C) / (dl_double * cf_double), rank (micro desc,
    docid asc)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
qq AS (
    SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid
),
scored AS (
    SELECT q.qid, p.docid,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(p.tf AS DOUBLE) * s.sum_doc_len)
                   / (CAST(dl.doc_len AS DOUBLE) * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
final AS (
    SELECT sc.qid, sc.docid,
           sc.tsum + qq.q_total * CAST(-301030 AS BIGINT) AS micro
    FROM scored sc JOIN qq USING (qid)
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM final
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1e6, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _qlad_topk_sql(queries, k: int) -> str:
    """Absolute-discount query likelihood (operators/qld.qlad_topk):
    matched-terms rank-equivalent form, per-(term,doc) weight and the
    per-doc length part quantized to integer micro-log10 BIGINT before
    the exact per-doc sum.  Pins restated from qld.py: delta = 0.5
    folded into integer forms — inner ratio ((2*tf - 1)_double * C) /
    (du_double * cf_double), length part log10(du_double / (2.0 *
    dl_double)); du = the doc's distinct term count; rank (micro desc,
    docid asc)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
qq AS (
    SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid
),
du AS (
    SELECT docid, CAST(count(*) AS BIGINT) AS du FROM postings GROUP BY 1
),
scored AS (
    SELECT q.qid, p.docid,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(2 * p.tf - 1 AS DOUBLE) * s.sum_doc_len)
                   / (CAST(u.du AS DOUBLE) * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum,
           max(dl.doc_len) AS doc_len,
           max(u.du) AS dun
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    JOIN du u ON p.docid = u.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
final AS (
    SELECT sc.qid, sc.docid,
           sc.tsum + qq.q_total * CAST(round(log10(
               CAST(sc.dun AS DOUBLE) / (2.0 * CAST(sc.doc_len AS DOUBLE))
           ) * 1e6) AS BIGINT) AS micro
    FROM scored sc JOIN qq USING (qid)
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM final
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1e6, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _doc_term_vectors_sql(probe_docnos) -> str:
    """Lucene term-vectors surface (operators/queryops.doc_term_vectors):
    per probe doc every indexed term with in-doc tf + corpus df/cf +
    doc_len; probes addressed by docno = docid - 1 (pinned)."""
    ids = ", ".join(str(int(d) + 1) for d in probe_docnos)
    return f"""{_PREFIX}
SELECT CAST(p.docid - 1 AS VARCHAR) AS docno, p.term,
       CAST(p.tf AS BIGINT) AS tf, l.df, l.cf,
       dl.doc_len
FROM postings p
JOIN lexicon l USING (term)
JOIN doclens dl ON p.docid = dl.docid
WHERE p.docid IN ({ids})
ORDER BY docno, term
"""


def _collapse_sql(queries, k: int, inner: int) -> str:
    """Field collapsing with inner hits (operators/bm25f.
    bm25_topk_collapse).  Pins restated from bm25f.py: inner = 2,
    inner order (round-6 score desc, docid asc), conversation score =
    best inner hit, conv rank (score desc, conv_id asc), k convs."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
hits AS (
    SELECT sc.qid, d.conv_id, sc.docid, round(sc.raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY sc.qid, d.conv_id
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS inner_rank
    FROM scored sc JOIN docs d ON sc.docid = d.docid
),
best AS (
    SELECT qid, conv_id,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, conv_id ASC
           ) AS BIGINT) AS rank
    FROM hits WHERE inner_rank = 1
)
SELECT h.qid, h.conv_id, b.rank, h.inner_rank,
       CAST(h.docid - 1 AS VARCHAR) AS docno, h.score
FROM hits h JOIN best b USING (qid, conv_id)
WHERE h.inner_rank <= {inner} AND b.rank <= {k}
ORDER BY h.qid, b.rank, h.inner_rank
"""


def _pivoted_topk_sql(queries, k: int) -> str:
    """Pivoted length normalization (operators/pivoted.pivoted_topk):
    per-(term,doc) weight micro-quantized BIGINT before the exact
    per-doc sum.  Pins restated from pivoted.py: every ln through
    log10 with the LITERAL LN10 = 2.302585092994046, slope literals
    0.75/0.25 (never 1 - 0.25), parenthesizations ltf = 1.0 +
    (log10(tf_d) * LN10), num = 1.0 + (log10(ltf) * LN10), den =
    0.75 + (0.25 * (dl_d / avgdl)), idfp = log10((N_d + 1.0) / df_d)
    * LN10, w = (num / den) * idfp; rank (micro desc, docid asc)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
feat AS (
    SELECT q.qid, q.qtf, p.docid,
           1.0 + (log10(1.0 + (log10(CAST(p.tf AS DOUBLE))
                               * 2.302585092994046))
                  * 2.302585092994046) AS num,
           0.75 + (0.25 * (CAST(dl.doc_len AS DOUBLE) / s.avgdl)) AS den,
           log10((CAST(s.n_docs AS DOUBLE) + 1.0) / CAST(q.df AS DOUBLE))
           * 2.302585092994046 AS idfp
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
),
wq AS (
    SELECT qid, qtf, docid,
           CAST(round(((num / den) * idfp) * 1e6) AS BIGINT) AS wm
    FROM feat
),
scored AS (
    SELECT qid, docid, CAST(sum(qtf * wm) AS BIGINT) AS micro
    FROM wq GROUP BY qid, docid
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1000000.0, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _bm25_plus_topk_sql(queries, k: int) -> str:
    """BM25+ (operators/pivoted.bm25_plus_topk): the engine's BM25
    coefficient parenthesization lower-bounded by the LITERAL dyadic
    delta 0.5, times log10(N/df); per-(term,doc) weight
    micro-quantized BIGINT before the exact per-doc sum; rank
    (micro desc, docid asc)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
wq AS (
    SELECT q.qid, q.qtf, p.docid,
           CAST(round((((p.tf / ((1.5 * (0.3 + (0.7 * (dl.doc_len
                          / s.avgdl)))) + p.tf)) + 0.5)
                       * log10(s.n_docs / q.df)) * 1e6) AS BIGINT) AS wm
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
),
scored AS (
    SELECT qid, docid, CAST(sum(qtf * wm) AS BIGINT) AS micro
    FROM wq GROUP BY qid, docid
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1000000.0, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _pl2_topk_sql(queries, k: int) -> str:
    """PL2 divergence-from-randomness ranking (operators/dfr.pl2_topk):
    per-(term,doc) weight quantized to integer micro BIGINT before the
    exact per-doc sum.  Pins restated from dfr.py: every log through
    log10 with LITERAL base-conversion constants (L2 =
    0.3010299956639812, LOG2E = 1.4426950408889634, TWO_PI =
    6.283185307179586), c = 1 folded (ratio avgdl / dl_double),
    parenthesizations tfn = (tf_d * g) / L2, term1 = (tfn *
    log10(tfn / lambda)) / L2, term2 = (lambda - tfn) * LOG2E, term3 =
    (0.5 * log10(TWO_PI * tfn)) / L2, w = ((term1 + term2) + term3) /
    (tfn + 1.0), lambda = cf_d / n_docs_d; negative weights kept;
    rank (micro desc, docid asc)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
feat AS (
    SELECT q.qid, q.qtf, p.docid,
           (CAST(p.tf AS DOUBLE)
            * log10(1.0 + s.avgdl / CAST(dl.doc_len AS DOUBLE)))
           / 0.3010299956639812 AS tfn,
           CAST(l.cf AS DOUBLE) / CAST(s.n_docs AS DOUBLE) AS lam
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
),
wq AS (
    SELECT qid, qtf, docid,
           CAST(round((((tfn * log10(tfn / lam)) / 0.3010299956639812
                        + (lam - tfn) * 1.4426950408889634)
                       + (0.5 * log10(6.283185307179586 * tfn))
                         / 0.3010299956639812)
                      / (tfn + 1.0) * 1e6) AS BIGINT) AS wm
    FROM feat
),
scored AS (
    SELECT qid, docid, CAST(sum(qtf * wm) AS BIGINT) AS micro
    FROM wq GROUP BY qid, docid
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1e6, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _dph_topk_sql(queries, k: int) -> str:
    """DPH divergence-from-randomness ranking (operators/dfr.dph_topk):
    the parameter-free DFR model, per-(term,doc) weight quantized to
    integer micro BIGINT before the exact per-doc sum.  Pins restated
    from dfr.dph_weight_col (change both sides or neither): logs
    through log10 with the literal constants, f = tf_d / dl_d, norm =
    ((1 - f) * (1 - f)) / (tf_d + 1), t1 = (tf_d * log10(((tf_d *
    avgdl) / dl_d) * (n_docs_d / cf_d))) / L2, t2 = (0.5 *
    log10((TWO_PI * tf_d) * (1 - f))) / L2, w = norm * (t1 + t2);
    tf = dl pins w = 0; rank (micro desc, docid asc)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
feat AS (
    SELECT q.qid, q.qtf, p.docid, p.tf, dl.doc_len,
           CAST(p.tf AS DOUBLE) AS tf_d,
           CAST(dl.doc_len AS DOUBLE) AS dl_d,
           CAST(l.cf AS DOUBLE) AS cf_d,
           CAST(s.n_docs AS DOUBLE) AS nd_d,
           s.avgdl AS avgdl
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
),
wq AS (
    SELECT qid, qtf, docid,
           CASE WHEN tf = doc_len THEN CAST(0 AS BIGINT)
           ELSE CAST(round(
               (((1.0 - tf_d / dl_d) * (1.0 - tf_d / dl_d))
                / (tf_d + 1.0))
               * (((tf_d * log10(((tf_d * avgdl) / dl_d)
                                 * (nd_d / cf_d)))
                   / 0.3010299956639812)
                  + ((0.5 * log10((6.283185307179586 * tf_d)
                                  * (1.0 - tf_d / dl_d)))
                     / 0.3010299956639812))
               * 1e6) AS BIGINT) END AS wm
    FROM feat
),
scored AS (
    SELECT qid, docid, CAST(sum(qtf * wm) AS BIGINT) AS micro
    FROM wq GROUP BY qid, docid
),
ranked AS (
    SELECT qid, docid, micro,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY micro DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(micro / 1e6, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


CHAMPION_M = 32


_CHAMPION_COEFF = (
    "(p.tf / ((1.5 * (0.3 + (0.7 * (dl.doc_len / s.avgdl)))) + p.tf))"
)

_CHAMPION_CTE = """
champ AS (
    SELECT term, docid, tf FROM (
        SELECT p.term, p.docid, p.tf,
               row_number() OVER (
                   PARTITION BY p.term
                   ORDER BY {coeff} DESC, p.docid ASC
               ) AS rn
        FROM postings p
        JOIN doclens dl ON p.docid = dl.docid
        CROSS JOIN stats s
    ) WHERE rn <= {m}
)"""


def _champion_table_sql(m: int) -> str:
    """Champion lists (operators/champion.py): per-term top-m postings
    under (bm25_coeff desc, docid asc) — pins restated from
    champion.py; the coeff expression is the df-independent factor of
    _BM25, identical parenthesization."""
    cte = _CHAMPION_CTE.format(coeff=_CHAMPION_COEFF, m=m)
    return f"""{_PREFIX}, {cte}
SELECT term, docid, tf FROM champ
ORDER BY term, docid
"""


def _champion_topk_sql(queries, standard: str, k: int, m: int) -> str:
    """Serve path over champion-pruned candidates; df/idf/avgdl stay
    corpus-global (champion.py pin)."""
    expr = _BM25 if standard == "bm25" else _TFIDF
    cte = _CHAMPION_CTE.format(coeff=_CHAMPION_COEFF, m=m)
    return f"""{_PREFIX}, {_query_ctes(queries)}, {cte},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({expr})) AS raw_score
    FROM qexist q
    JOIN champ p USING (term)
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
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _fuzzy_topk_sql(queries, standard: str, k: int) -> str:
    """Fuzzy-term retrieval (operators/fuzzy.py): every lexicon term
    within plain Levenshtein 1 of a query token contributes qtf *
    termscore independently (fuzzy-OR).  The oracle states the direct
    levenshtein join; the engine's deletion-neighborhood equi-join is
    recall-1-equivalent for lev <= 1 (the SymSpell theorem pinned in
    spell.py)."""
    expr = (_BM25 if standard == "bm25" else _TFIDF).replace("q.df", "f.df")
    return f"""{_PREFIX}, {_query_ctes(queries)},
fexp AS (
    SELECT q.qid, q.qtf, l.term, l.df
    FROM qterms q JOIN lexicon l ON levenshtein(q.term, l.term) <= 1
),
scored AS (
    SELECT f.qid, p.docid,
           sum(f.qtf * ({expr})) AS raw_score
    FROM fexp f
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY f.qid, p.docid
),
ranked AS (
    SELECT sc.qid, sc.docid, round(sc.raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY sc.qid
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS rank
    FROM scored sc
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _prefix_topk_sql(queries, standard: str, k: int) -> str:
    """Wildcard (prefix*) retrieval (operators/fuzzy.prefix_topk):
    every lexicon term starting with the prefix contributes termscore
    once (qtf=1 wildcard-OR).  The oracle states the direct
    starts_with join; the engine's per-length substring equi-join is
    trivially equivalent (substr(t, 1, len(p)) == p <=> starts_with)."""
    expr = (_BM25 if standard == "bm25" else _TFIDF).replace("q.df", "f.df")
    rows = ", ".join(f"('{qid}', '{p}')" for qid, p in queries)
    return f"""{_PREFIX},
pq AS (SELECT * FROM (VALUES {rows}) v(qid, prefix)),
fexp AS (
    SELECT q.qid, l.term, l.df
    FROM pq q JOIN lexicon l ON starts_with(l.term, q.prefix)
),
scored AS (
    SELECT f.qid, p.docid,
           sum({expr}) AS raw_score
    FROM fexp f
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY f.qid, p.docid
),
ranked AS (
    SELECT sc.qid, sc.docid, round(sc.raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY sc.qid
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS rank
    FROM scored sc
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _recency_topk_sql(queries, half_life_s: int, k: int) -> str:
    """operators/queryops.recency_topk: boosted = round(score6 ·
    decay_u / 1e6, 6), decay_u = round(1e6 · 2^(−age_s/HL)) BIGINT,
    age over the transcripts ts law (ts_s = 1704067200 + doc_id — the
    conversation_stats pin), max over INDEXED docs; re-rank (boosted
    desc, docid asc)."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
dts AS (
    SELECT d.docid, CAST(1704067200 + t.doc_id AS BIGINT) AS ts_s
    FROM docs d JOIN transcripts t USING (conv_id, turn_idx)
),
mx AS (SELECT max(ts_s) AS m FROM dts),
dec AS (
    SELECT docid,
           CAST(round(1000000.0 * power(2.0,
               -CAST(m - ts_s AS DOUBLE) / {float(half_life_s)}
           )) AS BIGINT) AS decay_u
    FROM dts CROSS JOIN mx
),
boosted AS (
    SELECT r.qid, r.docid,
           round(r.score * CAST(d.decay_u AS DOUBLE) / 1000000.0, 6) AS score
    FROM ranked r JOIN dec d ON d.docid = r.docid
),
rr AS (
    SELECT qid, docid, score,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM boosted
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM rr WHERE rank <= {k}
"""


def _suffix_topk_sql(queries, standard: str, k: int) -> str:
    """Leading-wildcard (*suffix) retrieval (operators/fuzzy.
    suffix_topk): every lexicon term ENDING with the suffix
    contributes once (qtf=1).  The oracle states the direct ends_with
    join; the engine's reversed-term per-length equi-join is trivially
    equivalent (substr(reverse(t), 1, len(s)) == reverse(s))."""
    expr = (_BM25 if standard == "bm25" else _TFIDF).replace("q.df", "f.df")
    rows = ", ".join(f"('{qid}', '{p}')" for qid, p in queries)
    return f"""{_PREFIX},
sq AS (SELECT * FROM (VALUES {rows}) v(qid, suf)),
fexp AS (
    SELECT q.qid, l.term, l.df
    FROM sq q JOIN lexicon l ON ends_with(l.term, q.suf)
),
scored AS (
    SELECT f.qid, p.docid,
           sum({expr}) AS raw_score
    FROM fexp f
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY f.qid, p.docid
),
ranked AS (
    SELECT sc.qid, sc.docid, round(sc.raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY sc.qid
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS rank
    FROM scored sc
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _wildcard_topk_sql(queries, standard: str, k: int) -> str:
    """Infix-wildcard (pre*suf) retrieval (operators/fuzzy.
    wildcard_topk): every lexicon term matching LIKE 'pre%suf'
    contributes once (qtf=1).  The oracle states the direct LIKE join;
    the engine's two-sided per-(Lp, Ls) substring equi-join with the
    len >= Lp+Ls guard is equivalent (LIKE's %-placement requires the
    literal parts not to overlap, which IS the length guard)."""
    expr = (_BM25 if standard == "bm25" else _TFIDF).replace("q.df", "f.df")
    rows = ", ".join(
        f"('{qid}', '{p.split('*')[0]}', '{p.split('*')[1]}')" for qid, p in queries
    )
    return f"""{_PREFIX},
wq AS (SELECT * FROM (VALUES {rows}) v(qid, pre, suf)),
fexp AS (
    SELECT q.qid, l.term, l.df
    FROM wq q JOIN lexicon l ON l.term LIKE q.pre || '%' || q.suf
),
scored AS (
    SELECT f.qid, p.docid,
           sum({expr}) AS raw_score
    FROM fexp f
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY f.qid, p.docid
),
ranked AS (
    SELECT sc.qid, sc.docid, round(sc.raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY sc.qid
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS rank
    FROM scored sc
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _boolean_topk_sql(queries, standard: str, k: int) -> str:
    """Boolean +must/-not/should retrieval (operators/boolquery.py).
    The role parse happens on the RAW whitespace words (the tokenizer
    strips +/- as punctuation, so roles must be peeled first) — the
    same order the engine pins.  OOV terms drop from their role."""
    expr = _BM25 if standard == "bm25" else _TFIDF
    return f"""{_PREFIX},
queries AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
words AS (
    SELECT qid, unnest(string_split(qtext, ' ')) AS word FROM queries
),
roles AS (
    SELECT qid,
           CASE WHEN word LIKE '+%' THEN 'must'
                WHEN word LIKE '-%' THEN 'not'
                ELSE 'should' END AS role,
           CASE WHEN word LIKE '+%' OR word LIKE '-%'
                THEN substr(word, 2) ELSE word END AS raw
    FROM words
),
wtok AS (
    SELECT qid, role, unnest({_TOKENS_EXPR.format(col='raw')}) AS term
    FROM roles
),
sterms AS (
    SELECT w.qid, w.term,
           CAST(count(*) AS BIGINT) AS qtf,
           bool_or(w.role = 'must') AS is_must,
           any_value(l.df) AS df
    FROM wtok w JOIN lexicon l USING (term)
    WHERE w.role IN ('must', 'should')
    GROUP BY w.qid, w.term
),
nmust AS (
    SELECT qid, CAST(count(*) FILTER (is_must) AS BIGINT) AS n_required
    FROM sterms GROUP BY qid
),
nterms AS (
    SELECT DISTINCT w.qid, w.term
    FROM wtok w JOIN lexicon l USING (term)
    WHERE w.role = 'not'
),
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({expr})) AS raw_score,
           CAST(count(*) FILTER (q.is_must) AS BIGINT) AS nm
    FROM sterms q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
kept AS (
    SELECT sc.* FROM scored sc
    JOIN nmust r ON sc.qid = r.qid AND sc.nm = r.n_required
    WHERE NOT EXISTS (
        SELECT 1 FROM nterms n JOIN postings p2 USING (term)
        WHERE n.qid = sc.qid AND p2.docid = sc.docid
    )
),
ranked AS (
    SELECT qid, docid, round(raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM kept
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _ltr_features_sql(queries, pool: int, mu: float = 2048.0) -> str:
    """LTR feature export (operators/ltr.py): BM25 top-pool candidates
    with all three scoring standards + match-shape features in one
    aggregate; qld pins restated from _qld_topk_sql."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
qq AS (
    SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid
),
feat AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS bm25_raw,
           sum(q.qtf * ({_TFIDF})) AS tfidf_raw,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(p.tf AS DOUBLE) * s.sum_doc_len)
                   / ({mu} * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum,
           CAST(count(*) AS BIGINT) AS n_match,
           max(dl.doc_len) AS doc_len
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
final AS (
    SELECT f.*,
           f.tsum + qq.q_total * CAST(round(log10(
               {mu} / (f.doc_len + {mu})
           ) * 1e6) AS BIGINT) AS qld_micro
    FROM feat f JOIN qq USING (qid)
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY round(bm25_raw, 6) DESC, docid ASC
    ) AS rn FROM final
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno,
       round(bm25_raw, 6) AS bm25,
       round(tfidf_raw, 6) AS tfidf,
       round(qld_micro / 1e6, 6) AS qld,
       n_match, CAST(doc_len AS BIGINT) AS doc_len
FROM ranked WHERE rn <= {pool}
ORDER BY qid, rn
"""


def _rm3_sql(
    queries, k: int, fb_docs: int, fb_terms: int, lam: float
) -> str:
    """RM3 pseudo-relevance feedback (operators/rm3.py): first-pass
    BM25 top-fb_docs -> relevance-model term weights (rounded-score *
    tf / dl, per-term sum rounded 6, (w6 desc, term asc) ties) ->
    lam-interpolated weights over in-lexicon original terms -> weighted
    BM25 top-k.  lam = 0.5 is exactly representable; every ranking
    boundary rounds to 6 with the engine's deterministic tie order."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
fb AS (SELECT qid, docid, score FROM ranked WHERE rank <= {fb_docs}),
wexp AS (
    SELECT fb.qid, p.term,
           round(sum(fb.score * p.tf / dl.doc_len), 6) AS w6
    FROM fb
    JOIN postings p ON p.docid = fb.docid
    JOIN doclens dl ON dl.docid = fb.docid
    GROUP BY 1, 2
),
wsel AS (
    SELECT qid, term, w6 FROM (
        SELECT qid, term, w6, row_number() OVER (
            PARTITION BY qid ORDER BY w6 DESC, term ASC) AS trank
        FROM wexp) WHERE trank <= {fb_terms}
),
wnorm AS (SELECT qid, sum(w6) AS wsum FROM wsel GROUP BY 1),
qlen AS (SELECT qid, CAST(sum(qtf) AS DOUBLE) AS ql FROM qexist GROUP BY 1),
qw AS (
    SELECT coalesce(o.qid, e.qid) AS qid, coalesce(o.term, e.term) AS term,
           coalesce({lam} * o.qtf / ql.ql, 0)
               + coalesce({1.0 - lam} * e.w6 / wn.wsum, 0) AS weight
    FROM (SELECT q.qid, q.term, q.qtf FROM qexist q) o
    FULL JOIN wsel e ON o.qid = e.qid AND o.term = e.term
    LEFT JOIN qlen ql ON ql.qid = coalesce(o.qid, e.qid)
    LEFT JOIN wnorm wn ON wn.qid = coalesce(o.qid, e.qid)
),
qwd AS (
    SELECT qw.qid, qw.term, qw.weight, l.df
    FROM qw JOIN lexicon l USING (term)
),
fscored AS (
    SELECT q.qid, p.docid, sum(q.weight * ({_BM25})) AS raw_score
    FROM qwd q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
franked AS (
    SELECT qid, docid, round(raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM fscored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM franked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _eval_sql(queries, standard: str, k: int) -> str:
    """MAP@k / nDCG@k of the top-k run against synthetic qrels
    (grade = least(#distinct query terms in doc, 3))."""
    return f"""{_ranked_ctes(queries, standard, False)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
runk AS (SELECT qid, docid, rank FROM ranked WHERE rank <= {k}),
j AS (
    SELECT r.qid, r.rank, coalesce(g.grade, 0) AS grade
    FROM runk r LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
),
pr AS (
    SELECT qid, rank, grade,
           CASE WHEN grade > 0 THEN 1 ELSE 0 END AS rel,
           sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY qid ORDER BY rank) AS cum_rel
    FROM j
),
agg AS (
    SELECT qid,
           sum(rel * cum_rel / rank) AS ap_num,
           sum((power(2.0, grade) - 1.0) / log2(rank + 1.0)) AS dcg
    FROM pr GROUP BY qid
),
rtot AS (SELECT qid, count(*) AS r_total FROM qrels GROUP BY qid),
ideal AS (
    SELECT qid, sum((power(2.0, grade) - 1.0) / log2(irank + 1.0)) AS idcg
    FROM (
        SELECT qid, grade,
               row_number() OVER (
                   PARTITION BY qid ORDER BY grade DESC, docid
               ) AS irank
        FROM qrels
    )
    WHERE irank <= {k}
    GROUP BY qid
)
SELECT a.qid, round(a.ap_num / t.r_total, 6) AS ap,
       round(a.dcg / i.idcg, 6) AS ndcg
FROM agg a JOIN rtot t ON a.qid = t.qid JOIN ideal i ON a.qid = i.qid
ORDER BY a.qid
"""


def _pr_curve_sql(queries, standard: str, k: int) -> str:
    """operators/evaluation.pr_curve: 11-point interpolated precision
    — recall test cross-multiplied to integers (10·cum >= L·R),
    p_interp = round(max cum/rank, 6) or 0.0, no-relevant queries
    omitted; run/qrels derivations shared with _eval_sql."""
    return f"""{_ranked_ctes(queries, standard, False)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
runk AS (SELECT qid, docid, rank FROM ranked WHERE rank <= {k}),
pr AS (
    SELECT r.qid, r.rank,
           CAST(sum(CASE WHEN coalesce(g.grade, 0) > 0 THEN 1 ELSE 0 END)
               OVER (PARTITION BY r.qid ORDER BY r.rank) AS BIGINT) AS cum
    FROM runk r LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
),
rtot AS (SELECT qid, CAST(count(*) AS BIGINT) AS r_total FROM qrels GROUP BY 1),
lv AS (SELECT CAST(unnest(range(0, 11)) AS BIGINT) AS level),
grid AS (SELECT t.qid, t.r_total, l.level FROM rtot t CROSS JOIN lv l),
qual AS (
    SELECT g.qid, g.level,
           max(CAST(p.cum AS DOUBLE) / CAST(p.rank AS DOUBLE)) AS p
    FROM grid g JOIN pr p ON p.qid = g.qid
    WHERE 10 * p.cum >= g.level * g.r_total
    GROUP BY 1, 2
)
SELECT g.qid, g.level, round(coalesce(q.p, 0.0), 6) AS p_interp
FROM grid g LEFT JOIN qual q ON q.qid = g.qid AND q.level = g.level
"""


def _facet_top_hits_sql(queries, k_inner: int) -> str:
    """operators/facets.facet_top_hits: per-(query, source) bucket
    counts + the bucket's top-k_inner hits from the BM25 ranking.
    Pins restated verbatim: bucket membership = the scored disjunctive
    match set (the ranked CTE), hit order = (round-6 score desc, docid
    asc) — the ranking's total order, n_docs = ALL scored docs in the
    bucket, docno = doc_id = docid - 1."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
fmeta AS (SELECT doc_id, CAST(source AS VARCHAR) AS source FROM documents),
fj AS (
    SELECT r.qid, m.source, r.docid, r.score
    FROM ranked r JOIN fmeta m ON m.doc_id = r.docid - 1
),
fcnt AS (
    SELECT qid, source, CAST(count(*) AS BIGINT) AS n_docs
    FROM fj GROUP BY 1, 2
),
fh AS (
    SELECT qid, source, docid, score,
           row_number() OVER (
               PARTITION BY qid, source ORDER BY score DESC, docid ASC
           ) AS brank
    FROM fj
)
SELECT h.qid, h.source, c.n_docs, CAST(h.brank AS BIGINT) AS bucket_rank,
       CAST(h.docid - 1 AS VARCHAR) AS docno, h.score
FROM fh h JOIN fcnt c ON h.qid = c.qid AND h.source = c.source
WHERE h.brank <= {k_inner}
"""


def _source_quota_sql(queries, k: int, quota: int) -> str:
    """operators/queryops.source_quota_topk: at most `quota` results
    per source, survivors re-ranked densely.  Pins restated verbatim:
    both windows use the ranking's total order (round-6 score desc,
    docid asc), docno = doc_id, k applies AFTER the re-rank."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
qmeta AS (SELECT doc_id, CAST(source AS VARCHAR) AS source FROM documents),
qj AS (
    SELECT r.qid, r.docid, m.source, r.score
    FROM ranked r JOIN qmeta m ON m.doc_id = r.docid - 1
),
qkept AS (
    SELECT qid, docid, source, score,
           row_number() OVER (
               PARTITION BY qid, source ORDER BY score DESC, docid ASC
           ) AS sr
    FROM qj
),
qre AS (
    SELECT qid, docid, source, score,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM qkept WHERE sr <= {quota}
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, source, rank, score
FROM qre WHERE rank <= {k}
"""


def _bpref_sql(queries, standard: str, k: int) -> str:
    """operators/evaluation.bpref_metrics: binary preference with the
    pinned judged split (relevant = grade >= 2, judged nonrel = grade
    1).  Pins restated verbatim: n_above = window count of judged-
    nonrel results above each rank, per-result penalty
    round(1e6 * min(n_above, R) / min(R, N)) BIGINT before the
    per-query sum (0 when N = 0), bpref = (n_rel_ret*1e6 - sum_pen) /
    (R*1e6) round 6, R = 0 queries omitted; run/qrels derivations
    shared with _eval_sql."""
    return f"""{_ranked_ctes(queries, standard, False)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
pools AS (
    SELECT qid,
           CAST(sum(CASE WHEN grade >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS r_total,
           CAST(sum(CASE WHEN grade = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_total
    FROM qrels GROUP BY 1
    HAVING sum(CASE WHEN grade >= 2 THEN 1 ELSE 0 END) > 0
),
jg AS (
    SELECT r.qid, r.rank, CAST(coalesce(g.grade, 0) AS INTEGER) AS grade
    FROM (SELECT qid, docid, rank FROM ranked WHERE rank <= {k}) r
    LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
),
above AS (
    SELECT qid, rank, grade,
           coalesce(sum(CASE WHEN grade = 1 THEN 1 ELSE 0 END) OVER (
               PARTITION BY qid ORDER BY rank
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS n_above
    FROM jg
),
bsc AS (
    SELECT a.qid,
           CAST(count(*) AS BIGINT) AS n_rel_ret,
           CAST(sum(CASE WHEN p.n_total > 0 THEN CAST(round(
               1000000.0 * CAST(least(a.n_above, p.r_total) AS DOUBLE)
               / CAST(least(p.r_total, p.n_total) AS DOUBLE)) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS pen
    FROM above a JOIN pools p ON a.qid = p.qid
    WHERE a.grade >= 2
    GROUP BY 1
)
SELECT p.qid, p.r_total, p.n_total,
       CAST(coalesce(b.n_rel_ret, 0) AS BIGINT) AS n_rel_ret,
       round(CAST(coalesce(b.n_rel_ret, 0) * 1000000
                  - coalesce(b.pen, 0) AS DOUBLE)
             / (CAST(p.r_total AS DOUBLE) * 1000000.0), 6) AS bpref
FROM pools p LEFT JOIN bsc b ON p.qid = b.qid
"""


def _cori_sql(queries, n_shards: int) -> str:
    """operators/federation.cori_shard_scores: CORI resource selection
    (Callan et al. 1995) over the docid-parity shard layout.  Pins
    restated verbatim (change both sides or neither): shard =
    (docid - 1) % n_shards (the shard_index rule), constants 50 / 150 /
    0.4 + 0.6 * (T * I) with 0.6 a LITERAL (1 - 0.4 is one ulp off),
    T's denominator (150.0 * cw_double) / avg_cw, I = log10((NS+0.5)/cf)
    / log10(NS+1.0), DISTINCT query terms, corpus-OOV terms dropped,
    belief micro-quantized BIGINT before the per-shard sum, score =
    sum/1e6 (the mean's 1/|q| is a per-query constant), rank (micro
    desc, shard asc)."""
    ns = int(n_shards)
    return f"""{_PREFIX}, {_query_ctes(queries)},
sdf AS (
    SELECT CAST((docid - 1) % {ns} AS INTEGER) AS shard, term,
           CAST(count(*) AS BIGINT) AS df
    FROM postings GROUP BY 1, 2
),
scw AS (
    SELECT CAST((docid - 1) % {ns} AS INTEGER) AS shard,
           CAST(sum(doc_len) AS BIGINT) AS cw
    FROM doclens GROUP BY 1
),
acw AS (SELECT CAST(sum(cw) AS DOUBLE) / {ns}.0 AS avgcw FROM scw),
cfs AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM sdf GROUP BY term),
qterm AS (
    SELECT DISTINCT q.qid, q.term FROM qterms q JOIN cfs USING (term)
),
grid AS (
    SELECT q.qid, q.term, s.shard, s.cw FROM qterm q CROSS JOIN scw s
),
bel AS (
    SELECT g.qid, g.shard,
           CAST(round((0.4 + 0.6 * (
               (CAST(coalesce(d.df, 0) AS DOUBLE)
                / (CAST(coalesce(d.df, 0) AS DOUBLE) + 50.0
                   + (150.0 * CAST(g.cw AS DOUBLE)) / a.avgcw))
               * (log10(({ns}.0 + 0.5) / CAST(c.cf AS DOUBLE))
                  / log10({ns}.0 + 1.0))
           )) * 1000000.0) AS BIGINT) AS micro
    FROM grid g CROSS JOIN acw a
    JOIN cfs c ON c.term = g.term
    LEFT JOIN sdf d ON d.term = g.term AND d.shard = g.shard
),
agg AS (
    SELECT qid, shard, CAST(sum(micro) AS BIGINT) AS m
    FROM bel GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY m DESC, shard ASC
    ) AS rn
    FROM agg
)
SELECT qid, shard, round(CAST(m AS DOUBLE) / 1000000.0, 6) AS score,
       CAST(rn AS BIGINT) AS rank
FROM ranked
"""


def _explain_sql(queries, standard: str) -> str:
    """operators/topk.explain_topdoc: per-term score breakdown of each
    query's rank-1 doc.  Pins: contrib = round(qtf * term_score, 6)
    per row, total = round-6 of the RAW sum (the ranking's score, NOT
    the sum of rounded contribs), rank-1 chosen by the ranking's
    (round-6 score desc, docid asc) order."""
    expr = _BM25 if standard == "bm25" else _TFIDF
    return f"""{_ranked_ctes(queries, standard, False)},
top1 AS (SELECT qid, docid, score FROM ranked WHERE rank = 1)
SELECT t.qid, CAST(t.docid - 1 AS VARCHAR) AS docno, q.term,
       CAST(p.tf AS BIGINT) AS tf, CAST(dl.doc_len AS BIGINT) AS doc_len,
       CAST(q.df AS BIGINT) AS df,
       round(q.qtf * ({expr}), 6) AS contrib,
       t.score AS total
FROM top1 t
JOIN qexist q ON q.qid = t.qid
JOIN postings p ON p.term = q.term AND p.docid = t.docid
JOIN doclens dl ON dl.docid = t.docid
CROSS JOIN stats s
"""


def _mrr_sql(queries, standard: str, k: int) -> str:
    """operators/evaluation.mrr_metrics: reciprocal rank / recall@k /
    success@k — first-rank and hit counts integer, rr and recall ONE
    double division each rounded 6, rr = 0.0 / success = 0 when no
    relevant in top-k, no-relevant queries omitted; run/qrels
    derivations shared with _eval_sql."""
    return f"""{_ranked_ctes(queries, standard, False)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
runk AS (SELECT qid, docid, rank FROM ranked WHERE rank <= {k}),
hitq AS (
    SELECT r.qid, CAST(min(r.rank) AS BIGINT) AS frank,
           CAST(count(*) AS BIGINT) AS hits
    FROM runk r JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
    WHERE g.grade > 0
    GROUP BY r.qid
),
rtot AS (SELECT qid, CAST(count(*) AS BIGINT) AS r_total FROM qrels GROUP BY 1)
SELECT t.qid,
       round(CASE WHEN h.frank IS NOT NULL
                  THEN 1.0 / CAST(h.frank AS DOUBLE) ELSE 0.0 END, 6) AS rr,
       round(CAST(coalesce(h.hits, 0) AS DOUBLE)
             / CAST(t.r_total AS DOUBLE), 6) AS recall,
       CAST(CASE WHEN h.frank IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
         AS success
FROM rtot t LEFT JOIN hitq h ON h.qid = t.qid
"""


def _rbp_err_sql(queries, standard: str, k: int) -> str:
    """operators/evaluation.rbp_err_metrics: RBP (p = 1/2) + ERR
    (gmax = 3).  Pins restated verbatim: rbp = sum_r rel_r * 2^-r
    (distinct binary digits — exact double sum); ERR stop-prob prefix
    = (8^n0 * 7^n1 * 5^n2)/8^(r-1) with n_G the CUMULATIVE count of
    grade-G results above rank r (window sums), per-rank contribution
    micro-quantized round(1e6 * (2^g - 1) * prefix_num / (r * 8^r))
    BIGINT before the per-query sum, err = sum/1e6 round 6; every qid
    in the run emits a row (no R normalization)."""
    return f"""{_ranked_ctes(queries, standard, False)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
jg AS (
    SELECT r.qid, r.rank, CAST(coalesce(g.grade, 0) AS INTEGER) AS grade
    FROM (SELECT qid, docid, rank FROM ranked WHERE rank <= {k}) r
    LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
),
pfx AS (
    SELECT qid, rank, grade,
           coalesce(sum(CASE WHEN grade = 0 THEN 1 ELSE 0 END) OVER w, 0) AS n0,
           coalesce(sum(CASE WHEN grade = 1 THEN 1 ELSE 0 END) OVER w, 0) AS n1,
           coalesce(sum(CASE WHEN grade = 2 THEN 1 ELSE 0 END) OVER w, 0) AS n2
    FROM jg
    WINDOW w AS (PARTITION BY qid ORDER BY rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
terms AS (
    SELECT qid,
           CASE WHEN grade > 0 THEN 1.0 ELSE 0.0 END / power(2.0, rank)
               AS rbp_term,
           CAST(round(
               1000000.0
               * CAST(((1 << grade) - 1)
                      * CAST(power(8.0, n0) * power(7.0, n1)
                             * power(5.0, n2) AS BIGINT) AS DOUBLE)
               / CAST(CAST(rank * power(8.0, rank) AS BIGINT) AS DOUBLE),
               0) AS BIGINT) AS err_micro
    FROM pfx
)
SELECT qid, round(sum(rbp_term), 6) AS rbp,
       round(CAST(sum(err_micro) AS DOUBLE) / 1000000.0, 6) AS err
FROM terms GROUP BY qid ORDER BY qid
"""


def _ranker_cmp_sql(queries, k: int, mu: float = 2048.0) -> str:
    """operators/evaluation.ranker_comparison: per-query AP@k of BM25
    vs QLD (both rankings and the qrels derivation restated with
    renamed CTEs), winner by the ROUND-6 APs, no-relevant queries
    omitted."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
dterm AS (
    SELECT DISTINCT docid, term
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
),
qrels AS (
    SELECT q.qid, d.docid, least(count(*), 3) AS grade
    FROM (SELECT DISTINCT qid, term FROM qterms) q
    JOIN dterm d USING (term)
    GROUP BY 1, 2
),
rtot AS (SELECT qid, count(*) AS r_total FROM qrels GROUP BY qid),
bsc AS (
    SELECT q.qid, p.docid, sum(q.qtf * ({_BM25})) AS raw
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
brk AS (
    SELECT qid, docid, row_number() OVER (
        PARTITION BY qid ORDER BY round(raw, 6) DESC, docid ASC
    ) AS rank
    FROM bsc
),
qq AS (SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid),
qsc AS (
    SELECT q.qid, p.docid,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(p.tf AS DOUBLE) * s.sum_doc_len)
                   / ({mu} * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum,
           max(dl.doc_len) AS doc_len
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
qfin AS (
    SELECT sc.qid, sc.docid,
           sc.tsum + qq.q_total * CAST(round(log10(
               {mu} / (sc.doc_len + {mu})
           ) * 1e6) AS BIGINT) AS micro
    FROM qsc sc JOIN qq USING (qid)
),
qrk AS (
    SELECT qid, docid, row_number() OVER (
        PARTITION BY qid ORDER BY micro DESC, docid ASC
    ) AS rank
    FROM qfin
),
bap AS (
    SELECT j.qid, round(sum(j.rel * j.cum / j.rank) / t.r_total, 6) AS ap
    FROM (
        SELECT r.qid, r.rank,
               CASE WHEN coalesce(g.grade, 0) > 0 THEN 1 ELSE 0 END AS rel,
               sum(CASE WHEN coalesce(g.grade, 0) > 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY r.qid ORDER BY r.rank) AS cum
        FROM brk r LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
        WHERE r.rank <= {k}
    ) j JOIN rtot t ON t.qid = j.qid
    GROUP BY j.qid, t.r_total
),
qap AS (
    SELECT j.qid, round(sum(j.rel * j.cum / j.rank) / t.r_total, 6) AS ap
    FROM (
        SELECT r.qid, r.rank,
               CASE WHEN coalesce(g.grade, 0) > 0 THEN 1 ELSE 0 END AS rel,
               sum(CASE WHEN coalesce(g.grade, 0) > 0 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY r.qid ORDER BY r.rank) AS cum
        FROM qrk r LEFT JOIN qrels g ON r.qid = g.qid AND r.docid = g.docid
        WHERE r.rank <= {k}
    ) j JOIN rtot t ON t.qid = j.qid
    GROUP BY j.qid, t.r_total
)
SELECT b.qid, b.ap AS ap_bm25, q.ap AS ap_qld,
       CASE WHEN b.ap > q.ap THEN 'bm25'
            WHEN b.ap < q.ap THEN 'qld'
            ELSE 'tie' END AS winner
FROM bap b JOIN qap q ON q.qid = b.qid
"""


def _ranker_tau_sql(queries, k: int, mu: float = 2048.0) -> str:
    """operators/evaluation.ranker_tau: Kendall tau-a between the BM25
    and QLD top-k per query over their COMMON docids (both rankings
    restated — the _ranker_cmp_sql CTEs; ranks are distinct so tau-a
    applies).  Pins: pairs docid_a < docid_b, concordant = positive
    rank-difference product, tau = round((C-D)/(n(n-1)/2), 6),
    n_common < 2 emits no row."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
bsc AS (
    SELECT q.qid, p.docid, sum(q.qtf * ({_BM25})) AS raw
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
brk AS (
    SELECT qid, docid, row_number() OVER (
        PARTITION BY qid ORDER BY round(raw, 6) DESC, docid ASC
    ) AS rank
    FROM bsc
),
qq AS (SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid),
qsc AS (
    SELECT q.qid, p.docid,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(p.tf AS DOUBLE) * s.sum_doc_len)
                   / ({mu} * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum,
           max(dl.doc_len) AS doc_len
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
qfin AS (
    SELECT sc.qid, sc.docid,
           sc.tsum + qq.q_total * CAST(round(log10(
               {mu} / (sc.doc_len + {mu})
           ) * 1e6) AS BIGINT) AS micro
    FROM qsc sc JOIN qq USING (qid)
),
qrk AS (
    SELECT qid, docid, row_number() OVER (
        PARTITION BY qid ORDER BY micro DESC, docid ASC
    ) AS rank
    FROM qfin
),
com AS (
    SELECT b.qid, b.docid, b.rank AS ra, q.rank AS rb
    FROM brk b JOIN qrk q ON q.qid = b.qid AND q.docid = b.docid
    WHERE b.rank <= {k} AND q.rank <= {k}
),
cnt AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_common FROM com GROUP BY qid),
prs AS (
    SELECT x.qid,
           CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
           CAST(sum(CASE WHEN (x.ra - y.ra) * (x.rb - y.rb) > 0
                         THEN 0 ELSE 1 END) AS BIGINT) AS discordant
    FROM com x JOIN com y ON y.qid = x.qid AND x.docid < y.docid
    GROUP BY x.qid
)
SELECT c.qid, c.n_common, p.concordant, p.discordant,
       round(CAST(p.concordant - p.discordant AS DOUBLE)
             / (CAST(c.n_common AS DOUBLE)
                * (CAST(c.n_common AS DOUBLE) - 1.0) / 2.0), 6) AS tau
FROM cnt c JOIN prs p USING (qid)
WHERE c.n_common >= 2
ORDER BY c.qid
"""


def _sign_test_sql(queries, k: int) -> str:
    """operators/evaluation.ranker_sign_test: exact two-sided
    binomial sign test over the comparison's winners (the cmp SQL
    wrapped; factorial-exact coefficients, overlapping-middle tail
    form capped at 1; n_eff = 0 pins p_micro = 1e6)."""
    return f"""WITH cmp AS ({_ranker_cmp_sql(queries, k)}),
agg AS (
    SELECT CAST(coalesce(sum(CASE WHEN winner = 'bm25' THEN 1 END), 0)
                AS BIGINT) AS wins_bm25,
           CAST(coalesce(sum(CASE WHEN winner = 'qld' THEN 1 END), 0)
                AS BIGINT) AS wins_qld,
           CAST(coalesce(sum(CASE WHEN winner = 'tie' THEN 1 END), 0)
                AS BIGINT) AS ties
    FROM cmp
),
base AS (
    SELECT *, wins_bm25 + wins_qld AS n_eff,
           least(wins_bm25, wins_qld) AS kmin
    FROM agg
),
tails AS (
    SELECT wins_bm25, wins_qld, ties, n_eff,
           CAST(sum(CAST(factorial(CAST(n_eff AS INTEGER))
                         // (factorial(CAST(j AS INTEGER))
                             * factorial(CAST(n_eff - j AS INTEGER)))
                    AS BIGINT)) AS BIGINT) AS num
    FROM base, unnest(generate_series(0, base.n_eff)) t(j)
    WHERE j <= kmin OR j >= n_eff - kmin
    GROUP BY 1, 2, 3, 4
)
SELECT wins_bm25, wins_qld, ties, CAST(n_eff AS BIGINT) AS n_eff,
       CAST(least(1000000, round(1e6 * CAST(num AS DOUBLE)
                                 / pow(2.0, CAST(n_eff AS DOUBLE))))
            AS BIGINT) AS p_micro
FROM tails
"""


def _ranker_rbo_sql(queries, k: int, mu: float = 2048.0) -> str:
    """operators/evaluation.ranker_rbo: truncated depth-k rank-biased
    overlap (p = 1/2) between the BM25 and QLD top-k per query (both
    rankings restated — the _ranker_tau_sql CTEs).  Pins: X_d = common
    docs with greatest(ra, rb) <= d, per-depth contribution
    round(((X_d_d * pow(0.5, d)) * 1e6) / d_d) BIGINT before the
    per-query sum, rbo = round(micro/1e6, 6), every in-lexicon query
    emits (zero overlap -> 0.0)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
bsc AS (
    SELECT q.qid, p.docid, sum(q.qtf * ({_BM25})) AS raw
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
brk AS (
    SELECT qid, docid, row_number() OVER (
        PARTITION BY qid ORDER BY round(raw, 6) DESC, docid ASC
    ) AS rank
    FROM bsc
),
qq AS (SELECT qid, CAST(sum(qtf) AS BIGINT) AS q_total FROM qexist GROUP BY qid),
qsc AS (
    SELECT q.qid, p.docid,
           CAST(sum(q.qtf * CAST(round(log10(
               1 + (CAST(p.tf AS DOUBLE) * s.sum_doc_len)
                   / ({mu} * CAST(l.cf AS DOUBLE))
           ) * 1e6) AS BIGINT)) AS BIGINT) AS tsum,
           max(dl.doc_len) AS doc_len
    FROM qexist q
    JOIN lexicon l USING (term)
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY 1, 2
),
qfin AS (
    SELECT sc.qid, sc.docid,
           sc.tsum + qq.q_total * CAST(round(log10(
               {mu} / (sc.doc_len + {mu})
           ) * 1e6) AS BIGINT) AS micro
    FROM qsc sc JOIN qq USING (qid)
),
qrk AS (
    SELECT qid, docid, row_number() OVER (
        PARTITION BY qid ORDER BY micro DESC, docid ASC
    ) AS rank
    FROM qfin
),
com AS (
    SELECT b.qid, b.docid, b.rank AS ra, q.rank AS rb
    FROM brk b JOIN qrk q ON q.qid = b.qid AND q.docid = b.docid
    WHERE b.rank <= {k} AND q.rank <= {k}
),
cnt AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_common FROM com GROUP BY qid),
qd AS (
    SELECT q.qid, ds.dep
    FROM (SELECT DISTINCT qid FROM qexist) q
    CROSS JOIN (SELECT unnest(generate_series(1, {k})) AS dep) ds
),
xd AS (
    SELECT q.qid, q.dep,
           CAST(sum(CASE WHEN greatest(c.ra, c.rb) <= q.dep
                         THEN 1 ELSE 0 END) AS BIGINT) AS x
    FROM qd q LEFT JOIN com c ON c.qid = q.qid
    GROUP BY 1, 2
),
agg AS (
    SELECT qid,
           CAST(sum(CAST(round(((CAST(x AS DOUBLE)
                                 * pow(0.5, CAST(dep AS DOUBLE))) * 1e6)
                               / CAST(dep AS DOUBLE)) AS BIGINT))
                AS BIGINT) AS micro
    FROM xd GROUP BY 1
)
SELECT a.qid, coalesce(c.n_common, CAST(0 AS BIGINT)) AS n_common,
       round(a.micro / 1e6, 6) AS rbo
FROM agg a LEFT JOIN cnt c USING (qid)
ORDER BY a.qid
"""


def _rocchio_sql(queries, k: int, fb_docs: int, fb_terms: int) -> str:
    """Rocchio feedback (operators/rocchio.py): integer-scaled
    vector-space expansion — all five pinned stages restated (stage-1
    rounded BM25 ranking, micro-quantized tf-idf doc vectors, exact
    centroid sums, 2*fb_docs-scaled weights, integer final scores)."""
    wq = (
        "CAST(round(1000000.0 * (1 + log10(p.tf))"
        " * log10(s.n_docs / l.df)) AS BIGINT)"
    )
    return f"""{_ranked_ctes(queries, "bm25", False)},
fb AS (SELECT qid, docid FROM ranked WHERE rank <= {fb_docs}),
fbt AS (
    SELECT f.qid, p.term, {wq} AS wq
    FROM fb f
    JOIN postings p ON p.docid = f.docid
    JOIN lexicon l USING (term)
    CROSS JOIN stats s
),
cent AS (
    SELECT qid, term, CAST(sum(wq) AS BIGINT) AS cs
    FROM fbt GROUP BY qid, term
),
qw_orig AS (
    SELECT q.qid, q.term,
           {fb_docs} * q.qtf * 1000000 + coalesce(c.cs, 0) AS qw
    FROM qexist q LEFT JOIN cent c ON q.qid = c.qid AND q.term = c.term
),
qw_exp AS (
    SELECT qid, term, cs AS qw FROM (
        SELECT c.*, row_number() OVER (
            PARTITION BY c.qid ORDER BY c.cs DESC, c.term ASC
        ) AS er
        FROM cent c
        WHERE NOT EXISTS (
            SELECT 1 FROM qexist q
            WHERE q.qid = c.qid AND q.term = c.term
        )
    ) WHERE er <= {fb_terms}
),
sel AS (SELECT * FROM qw_orig UNION ALL SELECT * FROM qw_exp),
fscored AS (
    SELECT w.qid, p.docid, CAST(sum(w.qw * {wq}) AS BIGINT) AS scaled
    FROM sel w
    JOIN postings p USING (term)
    JOIN lexicon l USING (term)
    CROSS JOIN stats s
    GROUP BY w.qid, p.docid
),
franked AS (
    SELECT qid, docid, scaled,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY scaled DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM fscored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       round(scaled / 1e12, 6) AS score
FROM franked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _triplets_sql(queries, n_pos: int, n_neg: int) -> str:
    """Contrastive training triplets (operators/ltr.training_triplets):
    over the full BM25 candidate ranking, positives = first n_pos
    FULL-conjunctive matches by rank, hard negatives = first n_neg
    PARTIAL matches by rank (no pool cut — pins restated from
    ltr.py)."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score,
           CAST(count(*) AS BIGINT) AS nmatch
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
pooled AS (
    SELECT sc.qid, sc.docid, sc.nmatch,
           sc.nmatch = r.n_required AS is_full,
           CAST(row_number() OVER (
               PARTITION BY sc.qid
               ORDER BY round(sc.raw_score, 6) DESC, sc.docid ASC
           ) AS BIGINT) AS rank
    FROM scored sc JOIN nreq r ON sc.qid = r.qid
),
sided AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid, is_full ORDER BY rank ASC
    ) AS sr
    FROM pooled
)
SELECT p.qid,
       CAST(p.docid - 1 AS VARCHAR) AS pos_docno,
       CAST(p.nmatch AS INTEGER) AS pos_grade,
       CAST(n.docid - 1 AS VARCHAR) AS neg_docno,
       n.rank AS neg_rank
FROM sided p JOIN sided n ON p.qid = n.qid
WHERE p.is_full AND p.sr <= {n_pos}
  AND NOT n.is_full AND n.sr <= {n_neg}
ORDER BY p.qid, pos_docno, neg_docno
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
        # vocabulary drift epoch 0 -> epoch 1: prefix split pinned to the
        # streaming feed (conv_id < 'conv-000000000032' == batch 0);
        # status: 'new' (df_a=0), 'grown' (cf_b > cf_a), else 'stable'
        "lexicon_diff": f"""WITH transcripts AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           text
    FROM documents
),
docs AS (
    SELECT doc_id, conv_id, text FROM transcripts
    WHERE text IS NOT NULL AND trim(text) <> ''
),
tok_all AS (
    SELECT doc_id, conv_id, {_TOKENS_EXPR.format(col='text')} AS tokens
    FROM docs
),
posts AS (
    SELECT doc_id, conv_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (
        SELECT doc_id, conv_id, unnest(tokens) AS term FROM tok_all
    )
    GROUP BY doc_id, conv_id, term
),
la AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df_a,
           CAST(sum(tf) AS BIGINT) AS cf_a
    FROM posts WHERE conv_id < 'conv-000000000032' GROUP BY term
),
lb AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df_b,
           CAST(sum(tf) AS BIGINT) AS cf_b
    FROM posts GROUP BY term
)
SELECT b.term,
       CAST(coalesce(a.df_a, 0) AS BIGINT) AS df_a,
       CAST(coalesce(a.cf_a, 0) AS BIGINT) AS cf_a,
       b.df_b, b.cf_b,
       CASE WHEN coalesce(a.df_a, 0) = 0 THEN 'new'
            WHEN b.cf_b > coalesce(a.cf_a, 0) THEN 'grown'
            ELSE 'stable' END AS status
FROM lb b LEFT JOIN la a USING (term)
""",
        # time-travel read: the lexicon AS OF epoch 0 == the lexicon
        # over the pinned first-micro-batch prefix (conv_id <
        # 'conv-000000000032', the same split the streaming gate feeds)
        "lexicon_asof": f"""WITH transcripts AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           text
    FROM documents
),
docs AS (
    SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) AS BIGINT) AS docid,
           conv_id, turn_idx, text
    FROM transcripts
    WHERE text IS NOT NULL AND trim(text) <> ''
      AND conv_id < 'conv-000000000032'
),
tokend AS (
    SELECT docid, {_TOKENS_EXPR.format(col='text')} AS tokens FROM docs
),
doclens AS (
    SELECT docid, CAST(len(tokens) AS BIGINT) AS doc_len FROM tokend
),
postings AS (
    SELECT docid, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT docid, unnest(tokens) AS term FROM tokend)
    GROUP BY docid, term
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_len) AS DOUBLE) / count(*) AS avgdl
    FROM doclens
),
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
        # build-level observability integers (all exact counts)
        "index_stats": f"""{_PREFIX}
SELECT (SELECT CAST(count(*) AS BIGINT) FROM doclens) AS n_docs,
       (SELECT CAST(sum(doc_len) AS BIGINT) FROM doclens) AS sum_doc_len,
       (SELECT CAST(count(*) AS BIGINT) FROM lexicon) AS n_terms,
       (SELECT CAST(max(df) AS BIGINT) FROM lexicon) AS max_df,
       (SELECT CAST(count(*) AS BIGINT) FROM postings) AS n_postings,
       (SELECT CAST(sum(tf) AS BIGINT) FROM postings) AS n_occurrences,
       (SELECT CAST(min(doc_len) AS BIGINT) FROM doclens) AS min_dl,
       (SELECT CAST(max(doc_len) AS BIGINT) FROM doclens) AS max_dl
""",
        "bm25_topk": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        # parsed mode (stopwords + Porter): tokens come from the
        # committed fixture parquet (scripts/gen_parsed_fixture.py) —
        # the one derivation DuckDB cannot restate offline (no stem());
        # fixture generated by the jar-golden-pinned tokenizer, joined
        # on md5(text) so one fixture serves every SF
        "bm25_topk_parsed": _topk_parsed_sql(QUERY_SET, "bm25", TOPK_K),
        "tfidf_topk_parsed": _topk_parsed_sql(QUERY_SET, "tfidf", TOPK_K),
        # metadata-filtered retrieval (candidates restricted to
        # role='assistant'; corpus-global stats — see _filtered_topk_sql)
        "bm25_topk_filtered": _filtered_topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # the per-view-stats design point (df/N/avgdl over the subset)
        "bm25_topk_scoped_stats": _filtered_scoped_sql(QUERY_SET, TOPK_K),
        "bm25_filtered_conjunctive": _filtered_topk_sql(
            CONJ_QUERY_SET, "bm25", True, TOPK_K
        ),
        # Dirichlet query-likelihood — third scoring standard (qld.py)
        "qld_topk": _qld_topk_sql(QUERY_SET, TOPK_K),
        # Jelinek-Mercer LM — the other classic smoothing (qld.qljm_topk)
        "qljm_topk": _qljm_topk_sql(QUERY_SET, TOPK_K),
        "qlad_topk": _qlad_topk_sql(QUERY_SET, TOPK_K),
        "pl2_topk": _pl2_topk_sql(QUERY_SET, TOPK_K),
        "pivoted_topk": _pivoted_topk_sql(QUERY_SET, TOPK_K),
        "bm25_plus_topk": _bm25_plus_topk_sql(QUERY_SET, TOPK_K),
        "dph_topk": _dph_topk_sql(QUERY_SET, TOPK_K),
        "doc_term_vectors": _doc_term_vectors_sql(MLT_PROBE_DOCNOS),
        "bm25_topk_collapse": _collapse_sql(QUERY_SET, TOPK_K, 2),
        # lexicon-only pre-retrieval QPP predictors (qpp.preretrieval_qpp)
        "preretrieval_qpp": _preretrieval_qpp_sql(QUERY_SET),
        # QLD over the persisted store via the term-pruned flat view
        "qld_topk_stored": _qld_topk_sql(QUERY_SET, TOPK_K),
        # hybrid BM25 + cosine with RRF fusion (probe doc = query)
        "hybrid_rrf_topk": _hybrid_rrf_sql(PROBE_IDS, 10, 20),
        "hybrid_combmnz_topk": _hybrid_combmnz_sql(PROBE_IDS, 10, 20),
        # Borda-count fusion — integer positional voting, same legs
        "hybrid_borda_topk": _hybrid_borda_sql(PROBE_IDS, 10, 20),
        # post-retrieval QPP from the run's score distribution (WIG/NQC)
        "postretrieval_qpp": _postretrieval_qpp_sql(QUERY_SET, "bm25", TOPK_K),
        # impact-ordered (score-at-a-time) retrieval, 8-bit global quant
        "impact_ordered_topk": _impact_topk_sql(QUERY_SET, TOPK_K),
        # cascade shares the EXHAUSTIVE BM25 oracle: the pinned pool
        # (impact.CASCADE_POOL = 100) provably contains the true top-k
        # on the driver corpora (measured at sf0.001/0.01/0.1)
        "bm25_cascade_topk": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # deletes: query-time mask (stats pre-delete) and physical
        # vacuum (stats recomputed, original docids preserved)
        "bm25_topk_deleted": _topk_deleted_sql(QUERY_SET, "bm25", TOPK_K),
        "bm25_topk_vacuumed": _topk_vacuumed_sql(QUERY_SET, TOPK_K),
        # reverse search + result-set aggregations
        "percolate": _percolate_sql(QUERY_SET),
        "percolate_scored": _percolate_scored_sql(QUERY_SET),
        # per-doc match decision => streaming == batch BY DESIGN
        "streaming_percolate": _percolate_sql(QUERY_SET),
        "facet_counts": _facets_sql(QUERY_SET),
        "facet_histogram": _facet_histogram_sql(QUERY_SET),
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        # streaming twin shares the batch oracle VERBATIM (bottom-k
        # merge + (h, id) replay dedup; pos re-derived at read time)
        "streaming_ssample": _STRATIFIED_SAMPLE_SQL,
        # significant-terms discovery facet (JLH, micro-exact)
        "significant_terms": _SIGTERMS_SQL,
        # Efraimidis-Spirakis weighted sampling (deterministic coin)
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        # query-DSL completeness (params pinned to operators/queryops)
        "bm25_topk_msm": _msm_sql(QUERY_SET, 2, TOPK_K),
        "bm25_topk_synonyms": _synonym_sql(QUERY_SET, SYN_MAP, TOPK_K),
        # cursor pagination: page 2 == global ranks 11..20
        "bm25_topk_page2": _search_after_sql(QUERY_SET, 2, TOPK_K),
        # max-passage long-document pooling
        "conv_maxp_topk": _conv_maxp_sql(QUERY_SET, TOPK_K),
        # fuzzy-term retrieval (Levenshtein-1 expansion, fuzzy-OR)
        "bm25_topk_fuzzy": _fuzzy_topk_sql(FUZZY_QUERY_SET, "bm25", TOPK_K),
        # wildcard (prefix*) retrieval — qtf=1 wildcard-OR
        "bm25_topk_prefix": _prefix_topk_sql(PREFIX_QUERY_SET, "bm25", TOPK_K),
        "bm25_topk_suffix": _suffix_topk_sql(SUFFIX_QUERY_SET, "bm25", TOPK_K),
        "bm25_topk_wildcard": _wildcard_topk_sql(WILDCARD_QUERY_SET, "bm25", TOPK_K),
        # recency-boosted ranking (half-life 1024 s, micro decay)
        "bm25_topk_recency": _recency_topk_sql(QUERY_SET, 1024, TOPK_K),
        # boolean +must/-not/should syntax
        "bm25_topk_boolean": _boolean_topk_sql(BOOLEAN_QUERY_SET, "bm25", TOPK_K),
        # LTR feature export over BM25 top-20 candidates
        "ltr_features": _ltr_features_sql(QUERY_SET, 20),
        "hard_negatives": _hard_negatives_sql(QUERY_SET, 20, 5),
        # contrastive (positive, hard-negative) training pairs
        "training_triplets": _triplets_sql(QUERY_SET, 2, 3),
        # champion lists: static per-term top-m pruning + its serve path
        "champion_lists": _champion_table_sql(CHAMPION_M),
        "bm25_topk_champion": _champion_topk_sql(
            QUERY_SET, "bm25", TOPK_K, CHAMPION_M
        ),
        "bm25_topk_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        "tfidf_topk_conjunctive": _topk_sql(CONJ_QUERY_SET, "tfidf", True, TOPK_K),
        # alternate execution paths, same semantics -> same oracle:
        # compressed block-store scan and driver-side MaxScore pruning
        "bm25_topk_compressed": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "bm25_topk_compressed_pfor": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "bm25_topk_compressed_s8b": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk_compressed": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_topk_maxscore": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk_maxscore": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_maxscore_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        # Block-Max WAND (operators/bmw.py) — rank-safe pruning, so the
        # exhaustive ranking is its oracle too
        # plain WAND shares the exhaustive oracle (rank-safe pruning)
        "bm25_topk_wand": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk_wand": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_wand_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        # unbounded TAAT shares the exhaustive oracle (every posting
        # accumulates; acc_cap=None by construction)
        "bm25_topk_taat": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk_taat": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_taat_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        "bm25_topk_bmw": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk_bmw": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_bmw_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        "tfidf_bmw_conjunctive": _topk_sql(CONJ_QUERY_SET, "tfidf", True, TOPK_K),
        # BMW over the PERSISTED store: block metadata round-trips through
        # write_index / from_dir and must still prune rank-identically
        "bm25_bmw_stored": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # persisted bucketed store read back via IndexReader.from_dir
        # (both standards + the driver-side MaxScore DAAT over the store)
        "bm25_topk_stored": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # federation with global-stat merge is rank-identical to the
        # unsharded store BY CONSTRUCTION — same oracle by design
        "bm25_topk_sharded": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # NRT view (committed generations + un-compacted fresh epochs,
        # global stats) is exact by construction — batch oracle shared
        "bm25_topk_nrt": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # CORI resource selection over the 2-shard layout
        "shard_selection": _cori_sql(QUERY_SET, 2),
        "tfidf_topk_stored": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        "bm25_maxscore_stored": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # block-max pruned distributed scan (skips never-candidate blocks)
        "bm25_topk_pruned": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        "tfidf_topk_pruned": _topk_sql(QUERY_SET, "tfidf", False, TOPK_K),
        # conjunctive mode on the pruned path: rarest-list candidates
        "bm25_pruned_conjunctive": _topk_sql(CONJ_QUERY_SET, "bm25", True, TOPK_K),
        "tfidf_pruned_conjunctive": _topk_sql(CONJ_QUERY_SET, "tfidf", True, TOPK_K),
        # RM3 pseudo-relevance feedback (params pinned to operators/rm3.py)
        "rocchio_topk": _rocchio_sql(QUERY_SET, TOPK_K, 10, 5),
        "bm25_rm3_topk": _rm3_sql(QUERY_SET, TOPK_K, 10, 5, 0.5),
        # Elias-Fano-coded store (reference byte layout) end-to-end
        "bm25_topk_compressed_ef": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # trec_eval stage: MAP@k / nDCG@k of the BM25 run vs synthetic qrels
        "bm25_eval_metrics": _eval_sql(QUERY_SET, "bm25", TOPK_K),
        "bm25_pr_curve": _pr_curve_sql(QUERY_SET, "bm25", TOPK_K),
        "bm25_mrr_metrics": _mrr_sql(QUERY_SET, "bm25", TOPK_K),
        # RBP(p=1/2) + ERR(gmax=3) of the same BM25 run (graded-user
        # models; params pinned to evaluation.rbp_err_metrics)
        "bm25_rbp_err_metrics": _rbp_err_sql(QUERY_SET, "bm25", TOPK_K),
        "bm25_bpref_metrics": _bpref_sql(QUERY_SET, "bm25", TOPK_K),
        "facet_top_hits": _facet_top_hits_sql(QUERY_SET, 3),
        "bm25_topk_source_quota": _source_quota_sql(QUERY_SET, TOPK_K, 2),
        # Lucene-style explain: per-term breakdown of the rank-1 doc
        "bm25_explain": _explain_sql(QUERY_SET, "bm25"),
        # the spark.sql() front end runs the SAME ranking (same oracle)
        "bm25_topk_sparksql": _topk_sql(QUERY_SET, "bm25", False, TOPK_K),
        # paired BM25-vs-QLD AP comparison (sign-test contingency row)
        "ranker_comparison": _ranker_cmp_sql(QUERY_SET, TOPK_K),
        # Kendall tau agreement between the two ranking families
        "ranker_tau": _ranker_tau_sql(QUERY_SET, TOPK_K),
        "ranker_rbo": _ranker_rbo_sql(QUERY_SET, TOPK_K),
        "ranker_sign_test": _sign_test_sql(QUERY_SET, TOPK_K),
    }
    # streaming-ingestion compaction must yield the batch lexicon
    out["lexicon_streaming"] = out["lexicon"]
    # custom stateful streaming operator (applyInPandasWithState
    # sessionization) vs an independent gaps-and-islands restatement;
    # the gate entry thins turns where epoch%5==3 so real gaps exist,
    # and emits epoch-second longs (UTC session tz) — restated here
    out["conversation_sessions"] = _SESSIONS_SQL
    # watermarked tumbling-window aggregation (append mode): a window
    # emits exactly once, after the watermark (max event time − 10 s)
    # passes its end — the cutoff is restated as a plain predicate
    out["turns_per_window"] = _WINDOW_AGG_SQL
    out.update(pipeline_oracles())
    return out


_SESSIONS_SQL = """
WITH turns AS (
    SELECT 'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT)
               + CAST(doc_id AS BIGINT) AS ts_s,
           length(text) AS chars
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
),
thinned AS (
    SELECT * FROM turns WHERE ts_s % 5 <> 3
),
g AS (
    SELECT conv_id, ts_s, chars,
           CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY conv_id ORDER BY ts_s) > 1
                THEN 1 ELSE 0 END AS brk
    FROM thinned
),
s AS (
    SELECT conv_id, ts_s, chars,
           SUM(brk) OVER (PARTITION BY conv_id ORDER BY ts_s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
    FROM g
)
SELECT conv_id,
       CAST(session_idx AS INTEGER) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(min(ts_s) AS BIGINT) AS start_s,
       CAST(max(ts_s) AS BIGINT) AS end_s,
       CAST(sum(chars) AS BIGINT) AS chars
FROM s
GROUP BY conv_id, session_idx
ORDER BY conv_id, session_idx
"""


# Tumbling 30 s windows align to the unix epoch (Spark's F.window
# convention; epoch('2024-01-01') is a multiple of 30), so window
# arithmetic is integer division on epoch seconds.  The 10 s watermark
# cutoff never lands on a window boundary for the driver corpora
# (max offsets 499/4999), so <= vs < emission is unambiguous.
_WINDOW_AGG_SQL = """
WITH turns AS (
    SELECT CAST(epoch(TIMESTAMP '2024-01-01 00:00:00') AS BIGINT)
               + CAST(doc_id AS BIGINT) AS ts_s,
           CASE CAST(doc_id % 4 AS INTEGER)
                WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
                WHEN 2 THEN 'system' ELSE 'tool' END AS role
    FROM documents
),
agg AS (
    SELECT CAST((ts_s // 30) * 30 AS BIGINT) AS window_start_s,
           CAST((ts_s // 30) * 30 + 30 AS BIGINT) AS window_end_s,
           role,
           CAST(count(*) AS BIGINT) AS turns
    FROM turns
    GROUP BY 1, 2, 3
)
SELECT a.window_start_s, a.window_end_s, a.role, a.turns
FROM agg a, (SELECT max(ts_s) - 10 AS wm FROM turns) w
WHERE a.window_end_s <= w.wm
ORDER BY a.window_start_s, a.role
"""


# ===========================================================================
# training-data pipeline oracles (operators/dedup.py, textstats.py,
# similarity.py) — run directly over the `documents` / `embeddings` views
# ===========================================================================

JACCARD_THRESHOLD = 0.8
PROBE_IDS = list(range(10))
ANN_K = 5
COSINE_DUP_THRESHOLD = 0.42
N_PPM_MEDIA = 64  # rows in the ppm_image_features gate table
N_WAV_MEDIA = 64  # rows in the wav_audio_features gate table
N_Y4M_MEDIA = 32  # rows in the y4m_frame_stats gate table

_DOC_TOKENS = f"""
doctoks AS (
    SELECT doc_id, {_TOKENS_EXPR.format(col='text')} AS tokens FROM documents
)"""

# RAG chunker (operators/curation.doc_chunks).  Pins restated verbatim
# (change both sides or neither): tokens = the oracle-side pipeline,
# starts 0, S, .. while start < n (final partial chunk kept), chunk =
# 1-based slice [start+1 .. start+W] clamped, chunk_text space-joined,
# zero-token docs emit nothing, chunk_idx = start / S.
_DOC_CHUNKS_SQL_TMPL = """WITH {doctoks},
base AS (
    SELECT doc_id, tokens, len(tokens) AS n FROM doctoks
    WHERE len(tokens) > 0
),
st AS (
    SELECT doc_id, tokens, n,
           unnest(generate_series(0, n - 1, {stride})) AS start_tok
    FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(start_tok // {stride} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(list_slice(tokens, start_tok + 1, start_tok + {window}))
            AS BIGINT) AS n_toks,
       array_to_string(
           list_slice(tokens, start_tok + 1, start_tok + {window}), ' '
       ) AS chunk_text
FROM st
"""

_SHINGLES = """
shingled AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(0, greatest(len(tokens) - 2, 0)),
               i -> tokens[i+1] || ' ' || tokens[i+2] || ' ' || tokens[i+3]
           )) AS shingles
    FROM doctoks
),
sh AS (SELECT doc_id AS id, unnest(shingles) AS shingle FROM shingled),
shsizes AS (SELECT id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY id)"""

_JACCARD_PAIRS_SQL = f"""WITH {_DOC_TOKENS}, {_SHINGLES},
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(i.inter / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
FROM inter i
JOIN shsizes sa ON i.id_a = sa.id
JOIN shsizes sb ON i.id_b = sb.id
WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= {JACCARD_THRESHOLD}
"""


# end-to-end dedup decision: connected components over the (exhaustive)
# jaccard pair graph via recursive transitive closure, survivor = min id
_DEDUP_KEEP_SQL = f"""WITH RECURSIVE {_DOC_TOKENS}, {_SHINGLES},
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY 1, 2
),
dup_pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN shsizes sa ON i.id_a = sa.id
    JOIN shsizes sb ON i.id_b = sb.id
    WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM dup_pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM dup_pairs
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
    SELECT src AS id, least(src, min(dst)) AS component
    FROM reach GROUP BY src
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
       coalesce(c.component, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""


def _conversation_stats_sql() -> str:
    """Per-conversation rollup (textstats.conversation_stats).  The
    transcripts derivation (conv/turn/role/tool/ts from doc_id) is
    restated verbatim from sources/transcripts.load_transcripts; ts =
    2024-01-01T00:00Z + doc_id seconds -> epoch micros (session tz is
    UTC, session.py pin)."""
    return f"""
WITH t AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           list_extract(['user', 'assistant', 'system', 'tool'],
                        CAST(doc_id % 4 AS INTEGER) + 1) AS role,
           CASE WHEN doc_id % 4 = 3 THEN 'grep' END AS tool,
           1704067200000000 + doc_id * 1000000 AS us,
           text
    FROM documents
),
per AS (
    SELECT conv_id,
           CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS is_asst,
           CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS has_tool,
           len({_TOKENS_EXPR.format(col='text')}) AS ntok,
           us
    FROM t
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(is_asst) AS BIGINT) AS n_assistant,
       CAST(sum(has_tool) AS BIGINT) AS n_tool,
       CAST(coalesce(sum(ntok), 0) AS BIGINT) AS n_tokens,
       CAST(min(us) AS BIGINT) AS first_us,
       CAST(max(us) AS BIGINT) AS last_us
FROM per GROUP BY conv_id
ORDER BY conv_id
"""


_DIALOGUE_T = """
WITH t AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           list_extract(['user', 'assistant', 'system', 'tool'],
                        CAST(doc_id % 4 AS INTEGER) + 1) AS role,
           text
    FROM documents
)"""


def _turn_windows_sql(w: int) -> str:
    """Sliding contiguous turn windows (operators/dialogue.turn_windows)
    — contiguity restated as lead(turn_idx, j) == turn_idx + j;
    concat_ws skips NULL turns in both engines (pinned)."""
    leads = ", ".join(
        f"lead(text, {j}) OVER w AS t{j}, lead(turn_idx, {j}) OVER w AS i{j}"
        for j in range(1, w)
    )
    conds = " AND ".join(f"i{j} = start_turn + {j}" for j in range(1, w))
    texts = ", ".join(f"t{j}" for j in range(w))
    return f"""{_DIALOGUE_T},
led AS (
    SELECT conv_id, turn_idx AS start_turn, text AS t0, {leads}
    FROM t
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx ASC)
)
SELECT conv_id, start_turn, concat_ws(chr(10), {texts}) AS text
FROM led WHERE {conds}
ORDER BY conv_id, start_turn
"""


def _assistant_spans_sql() -> str:
    """Loss-mask token spans (operators/dialogue.assistant_token_spans):
    exact integer prefix sums of T1-T5 token counts, NULL text counts 0
    (coalesced BEFORE the running sum)."""
    return f"""{_DIALOGUE_T},
per AS (
    SELECT conv_id, turn_idx,
           CAST(coalesce(len({_TOKENS_EXPR.format(col='text')}), 0) AS BIGINT)
               AS ntok,
           role = 'assistant' AS is_target
    FROM t
)
SELECT conv_id, turn_idx,
       CAST(sum(ntok) OVER w - ntok AS BIGINT) AS start_tok,
       CAST(sum(ntok) OVER w AS BIGINT) AS end_tok,
       is_target
FROM per
WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx ASC
             ROWS UNBOUNDED PRECEDING)
ORDER BY conv_id, turn_idx
"""


_CDC_FEED_CTES = """WITH t AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           list_extract(['user', 'assistant', 'system', 'tool'],
                        CAST(doc_id % 4 AS INTEGER) + 1) AS role,
           CASE WHEN doc_id % 4 = 3 THEN 'grep' END AS tool,
           1704067200000000 + doc_id * 1000000 AS us,
           text
    FROM documents
),
base AS (SELECT conv_id, turn_idx, role, text, tool, us FROM t),
changes AS (
    SELECT conv_id, turn_idx, 'assistant' AS role,
           'upd1-' || CAST(doc_id AS VARCHAR) AS text,
           CAST(NULL AS VARCHAR) AS tool, CAST(1 AS BIGINT) AS us,
           'U' AS op, CAST(1 AS BIGINT) AS seq
    FROM t WHERE doc_id % 10 = 3
    UNION ALL
    SELECT conv_id, turn_idx, 'assistant',
           'upd2-' || CAST(doc_id AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(2 AS BIGINT), 'U', CAST(2 AS BIGINT)
    FROM t WHERE doc_id % 20 = 3
    UNION ALL
    SELECT conv_id, turn_idx, CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), 'D', CAST(1 AS BIGINT)
    FROM t WHERE doc_id % 10 = 7
    UNION ALL
    SELECT conv_id, CAST(8 AS INTEGER), 'assistant',
           'ins-' || CAST(doc_id AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(3 AS BIGINT), 'U', CAST(1 AS BIGINT)
    FROM t WHERE doc_id % 40 = 1
    UNION ALL
    SELECT conv_id, CAST(9 AS INTEGER), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT), 'D', CAST(1 AS BIGINT)
    FROM t WHERE doc_id % 40 = 21
)"""


def _cdc_apply_sql() -> str:
    """CDC apply / MERGE INTO analog (operators/cdc.apply_changes).
    The change feed is derived deterministically from documents —
    restated verbatim on both sides (change both or neither):
    upd1 = doc_id%10==3 (seq 1), upd2 = doc_id%20==3 (seq 2 — the
    last-wins test, a subset of upd1), delete = doc_id%10==7, insert =
    doc_id%40==1 at turn_idx 8 (absent from base), no-op delete =
    doc_id%40==21 at turn_idx 9.  Winner = highest seq per key; 'D'
    removes; payload rows replace whole rows."""
    return """
""" + _CDC_FEED_CTES + """,
latest AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY seq DESC
        ) AS rn FROM changes
    ) WHERE rn = 1
),
kept AS (
    SELECT b.* FROM base b
    WHERE NOT EXISTS (
        SELECT 1 FROM latest l
        WHERE l.conv_id = b.conv_id AND l.turn_idx = b.turn_idx
    )
)
SELECT conv_id, turn_idx, role, text, tool, us FROM kept
UNION ALL
SELECT conv_id, turn_idx, role, text, tool, us FROM latest WHERE op <> 'D'
ORDER BY conv_id, turn_idx
"""



# SFT instruction/response pairs (operators/dialogue.instruction_pairs).
# Pins restated verbatim via the documents->transcripts id law (change
# both sides or neither): strict adjacency (prev turn_idx ==
# turn_idx - 1, same conv) AND prev role 'user'; turn_idx = the
# assistant turn's; ntok = the T1-T5 token pipeline.
_INSTRUCTION_PAIRS_SQL = f"""WITH t AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR),
                           12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           list_extract(['user', 'assistant', 'system', 'tool'],
                        CAST(doc_id % 4 AS INTEGER) + 1) AS role,
           text
    FROM documents
)
SELECT a.conv_id, a.turn_idx,
       u.text AS prompt, a.text AS response,
       CAST(len({_TOKENS_EXPR.format(col='u.text')}) AS BIGINT)
           AS prompt_ntok,
       CAST(len({_TOKENS_EXPR.format(col='a.text')}) AS BIGINT)
           AS response_ntok
FROM t a
JOIN t u ON u.conv_id = a.conv_id AND u.turn_idx = a.turn_idx - 1
WHERE a.role = 'assistant' AND u.role = 'user'
"""


# Conversation-level best-of-n preference pairs
# (operators/dialogue.preference_pairs).  Pins restated verbatim
# (change both sides or neither): quality = textstats.quality_expr
# (the ONE shared round-6 formula, restated below over the turn
# tokens); chosen = first under (quality desc, turn_idx asc),
# rejected = first under (quality asc, turn_idx DESC); only convs
# with >= 2 assistant turns emit; margin_micro = CAST(round((cq - rq)
# * 1e6) AS BIGINT).
_PREFERENCE_PAIRS_SQL = f"""WITH {_DOC_TOKENS},
m AS (
    SELECT doc_id AS id,
           CAST(len(tokens) AS BIGINT) AS n,
           coalesce(list_sum(list_transform(tokens, t -> length(t))), 0) AS tok_chars,
           coalesce(list_sum(list_transform(tokens,
               t -> length(regexp_replace(t, '[^0-9]', '', 'g')))), 0) AS digit_chars,
           len(list_filter(tokens, t -> t IN (__QS_STOPS__))) AS stop_hits
    FROM doctoks
),
r AS (
    SELECT id, n,
           CASE WHEN n > 0 THEN tok_chars / CAST(n AS DOUBLE) ELSE 0.0 END AS mean_len,
           CASE WHEN tok_chars > 0 THEN digit_chars / CAST(tok_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
           CASE WHEN n > 0 THEN stop_hits / CAST(n AS DOUBLE) ELSE 0.0 END AS stop_ratio
    FROM m
),
q AS (
    SELECT id,
           round(0.4 * least(CAST(n AS DOUBLE) / 20.0, 1.0)
               + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1.0 ELSE 0.0 END)
               + 0.2 * (1.0 - digit_ratio)
               + 0.2 * least(stop_ratio * 5.0, 1.0), 6) AS quality
    FROM r
),
a AS (
    SELECT 'conv-' || lpad(CAST(CAST(d.doc_id // 8 AS BIGINT) AS VARCHAR),
                           12, '0') AS conv_id,
           CAST(d.doc_id % 8 AS INTEGER) AS turn_idx,
           q.quality
    FROM documents d JOIN q ON q.id = d.doc_id
    WHERE d.doc_id % 4 = 1
),
ranked AS (
    SELECT conv_id, turn_idx, quality,
           row_number() OVER (
               PARTITION BY conv_id ORDER BY quality DESC, turn_idx ASC
           ) AS rc,
           row_number() OVER (
               PARTITION BY conv_id ORDER BY quality ASC, turn_idx DESC
           ) AS rr,
           count(*) OVER (PARTITION BY conv_id) AS na
    FROM a
)
SELECT c.conv_id,
       c.turn_idx AS chosen_turn,
       j.turn_idx AS rejected_turn,
       c.quality AS chosen_quality,
       j.quality AS rejected_quality,
       CAST(round((c.quality - j.quality) * 1000000.0) AS BIGINT)
           AS margin_micro
FROM (SELECT * FROM ranked WHERE rc = 1 AND na >= 2) c
JOIN (SELECT * FROM ranked WHERE rr = 1 AND na >= 2) j USING (conv_id)
"""


def _scd2_sql() -> str:
    """SCD type-2 history (operators/cdc.scd2_history) over the SAME
    pinned change feed as cdc_apply: per key ordered by seq asc,
    valid_to_seq = lead(seq) (NULL on the latest), is_current =
    latest AND op <> 'D'."""
    return """
""" + _CDC_FEED_CTES + """
SELECT conv_id, turn_idx, role, text, tool, us, op, seq,
       CAST(lead(seq) OVER (
           PARTITION BY conv_id, turn_idx ORDER BY seq ASC
       ) AS BIGINT) AS valid_to_seq,
       (lead(seq) OVER (
           PARTITION BY conv_id, turn_idx ORDER BY seq ASC
       ) IS NULL AND op <> 'D') AS is_current
FROM changes
ORDER BY conv_id, turn_idx, seq
"""


# bigram continuation suggestions (lm.next_term_suggest); a function
# because _grams_expr is defined further down the module
def _term_suggest_sql() -> str:
    return f"""WITH toks AS (
    SELECT {_TOKENS_EXPR.format(col='text')} AS t FROM documents
),
grams AS (
    SELECT unnest({_grams_expr('t', 2)}) AS gram FROM toks
),
cnt AS (
    SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM grams GROUP BY gram
),
pairs AS (
    SELECT string_split(gram, ' ')[1] AS ctx,
           string_split(gram, ' ')[2] AS suggestion, cnt
    FROM cnt
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY ctx ORDER BY cnt DESC, suggestion ASC
    ) AS BIGINT) AS srank
    FROM pairs
    WHERE ctx IN ('spark', 'join', 'the', 'customer', 'sort', 'zzmissing')
)
SELECT ctx, suggestion, cnt, srank FROM ranked WHERE srank <= 3
ORDER BY ctx, srank
"""


def _simhash_sql(bits: int = 60) -> str:
    bit_sums = ",\n           ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN tf ELSE -tf END) AS s{b}"
        for b in range(bits)
    )
    val = " + ".join(f"CASE WHEN s{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END" for b in range(bits))
    return f"""WITH {_DOC_TOKENS},
tf AS (
    SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(tokens) AS term FROM doctoks)
    GROUP BY 1, 2
),
hashed AS (
    SELECT id, tf, CAST(('0x' || substr(md5(term), 1, 15))::UBIGINT AS BIGINT) AS h
    FROM tf
),
bitsums AS (
    SELECT id,
           {bit_sums}
    FROM hashed GROUP BY id
)
SELECT id, {val} AS simhash FROM bitsums
"""


_LANGS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"],
}
_LANG_ORDER = ["en", "de", "es", "fr"]


def _lang_id_sql() -> str:
    hits = ",\n           ".join(
        "CAST(len(list_filter(tokens, t -> t IN ({}))) AS BIGINT) AS h_{}".format(
            ", ".join(f"'{w}'" for w in _LANGS[lg]), lg
        )
        for lg in _LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in _LANG_ORDER) + ")"
    pred = "CASE WHEN {b} = 0 THEN 'unknown' ".format(b=best) + " ".join(
        f"WHEN h_{lg} = {best} THEN '{lg}'" for lg in _LANG_ORDER
    ) + " END"
    return f"""WITH {_DOC_TOKENS},
hits AS (SELECT doc_id AS id, {hits} FROM doctoks)
SELECT id, {pred} AS lang_pred, {best} AS lang_hits FROM hits
"""


_QS_STOPS_SQL = ", ".join(f"'{w}'" for w in _LANGS["en"])

_QUALITY_SQL = f"""WITH {_DOC_TOKENS},
m AS (
    SELECT doc_id AS id,
           CAST(len(tokens) AS BIGINT) AS n,
           coalesce(list_sum(list_transform(tokens, t -> length(t))), 0) AS tok_chars,
           coalesce(list_sum(list_transform(tokens,
               t -> length(regexp_replace(t, '[^0-9]', '', 'g')))), 0) AS digit_chars,
           len(list_filter(tokens, t -> t IN ({_QS_STOPS_SQL}))) AS stop_hits
    FROM doctoks
),
r AS (
    SELECT id, n,
           CASE WHEN n > 0 THEN tok_chars / CAST(n AS DOUBLE) ELSE 0.0 END AS mean_len,
           CASE WHEN tok_chars > 0 THEN digit_chars / CAST(tok_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
           CASE WHEN n > 0 THEN stop_hits / CAST(n AS DOUBLE) ELSE 0.0 END AS stop_ratio
    FROM m
)
SELECT id, n AS n_tokens,
       round(mean_len, 6) AS mean_token_len,
       round(digit_ratio, 6) AS digit_ratio,
       round(stop_ratio, 6) AS stopword_ratio,
       round(0.4 * least(CAST(n AS DOUBLE) / 20.0, 1.0)
           + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (1.0 - digit_ratio)
           + 0.2 * least(stop_ratio * 5.0, 1.0), 6) AS quality
FROM r
"""

# per-domain adaptive quality calibration: keep iff quality >= the
# domain's interpolated median rounded to 6 (Spark percentile <->
# DuckDB quantile_cont, the event_props_rollup precedent); quality
# restates textstats.quality_score verbatim
_ADAPTIVE_QUALITY_SQL = f"""WITH {_DOC_TOKENS},
m AS (
    SELECT doc_id AS id,
           CAST(len(tokens) AS BIGINT) AS n,
           coalesce(list_sum(list_transform(tokens, t -> length(t))), 0) AS tok_chars,
           coalesce(list_sum(list_transform(tokens,
               t -> length(regexp_replace(t, '[^0-9]', '', 'g')))), 0) AS digit_chars,
           len(list_filter(tokens, t -> t IN ({_QS_STOPS_SQL}))) AS stop_hits
    FROM doctoks
),
r AS (
    SELECT id, n,
           CASE WHEN n > 0 THEN tok_chars / CAST(n AS DOUBLE) ELSE 0.0 END AS mean_len,
           CASE WHEN tok_chars > 0 THEN digit_chars / CAST(tok_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
           CASE WHEN n > 0 THEN stop_hits / CAST(n AS DOUBLE) ELSE 0.0 END AS stop_ratio
    FROM m
),
q AS (
    SELECT r.id, d.source AS domain,
           round(0.4 * least(CAST(n AS DOUBLE) / 20.0, 1.0)
               + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1.0 ELSE 0.0 END)
               + 0.2 * (1.0 - digit_ratio)
               + 0.2 * least(stop_ratio * 5.0, 1.0), 6) AS quality
    FROM r JOIN documents d ON r.id = d.doc_id
),
thr AS (
    SELECT domain,
           round(CAST(quantile_cont(quality, 0.5) AS DOUBLE), 6) AS domain_p50
    FROM q GROUP BY domain
)
SELECT CAST(q.id AS BIGINT) AS id, q.domain, q.quality, t.domain_p50,
       (q.quality >= t.domain_p50) AS keep
FROM q JOIN thr t USING (domain)
"""

# Signed feature hashing (textstats.feature_hashing).  Pins restated
# verbatim (change both sides or neither): dim = 1024, idx =
# hash60('fh-' || t) % 1024, sign = +1 iff hash60('fhs-' || t) even,
# occurrence stream (duplicates KEPT), exact signed BIGINT sums,
# val != 0 rows only.
_FEATURE_HASHING_SQL = f"""WITH {_DOC_TOKENS},
occ AS (
    SELECT doc_id AS id, unnest(tokens) AS t FROM doctoks
)
SELECT CAST(id AS BIGINT) AS id,
       CAST((('0x' || substr(md5('fh-' || t), 1, 15))::UBIGINT % 1024)
           AS BIGINT) AS idx,
       CAST(sum(CASE WHEN (('0x' || substr(md5('fhs-' || t), 1, 15))::UBIGINT
                           % 2) = 0 THEN 1 ELSE -1 END) AS BIGINT) AS val
FROM occ
GROUP BY 1, 2
HAVING sum(CASE WHEN (('0x' || substr(md5('fhs-' || t), 1, 15))::UBIGINT
                      % 2) = 0 THEN 1 ELSE -1 END) <> 0
"""


# Per-source Tukey-fence length outliers (textstats.length_outliers).
# Pins restated verbatim (change both sides or neither): q1/q3 =
# linear-interpolated quartiles rounded 6 BEFORE the fence
# arithmetic, fences = q1 -+ 0.75*iqr rounded 6 (0.75, not the
# textbook 1.5: the synthetic length law's thin tails flag 0 rows at
# 1.5 — see textstats.OUTLIER_FENCE_K),
# outlier iff v < lo OR v > hi STRICT, side = 'low'/'high'.
_LENGTH_OUTLIERS_SQL = """WITH qs AS (
    SELECT source,
           round(CAST(quantile_cont(n_chars, 0.25) AS DOUBLE), 6) AS q1,
           round(CAST(quantile_cont(n_chars, 0.75) AS DOUBLE), 6) AS q3
    FROM documents GROUP BY 1
),
fences AS (
    SELECT source,
           round(q1 - 0.75 * (q3 - q1), 6) AS lo_fence,
           round(q3 + 0.75 * (q3 - q1), 6) AS hi_fence
    FROM qs
)
SELECT d.source, CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(d.n_chars AS BIGINT) AS n_chars,
       f.lo_fence, f.hi_fence,
       CASE WHEN d.n_chars < f.lo_fence THEN 'low' ELSE 'high' END AS side
FROM documents d JOIN fences f USING (source)
WHERE d.n_chars < f.lo_fence OR d.n_chars > f.hi_fence
"""


_TOKEN_COUNTS_SQL = f"""WITH {_DOC_TOKENS},
ws AS (
    SELECT doc_id AS id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens
    FROM documents
)
SELECT t.doc_id AS id, w.ws_tokens,
       CAST(len(t.tokens) AS BIGINT) AS norm_tokens,
       CAST(coalesce(list_sum(list_transform(t.tokens,
            x -> CAST(ceil(length(x) / 4) AS INTEGER))), 0) AS BIGINT) AS bpe_est
FROM doctoks t JOIN ws w ON t.doc_id = w.id
"""

# Per-source Flesch Reading Ease (operators/textstats.readability_scores):
# words = the token_counts whitespace formula, sentences =
# greatest(#[.!?]+ runs, 1), syllables = #[aeiouy]+ runs on the
# lowercased text, per-source exact sums, fre = round(206.835 - 1.015
# * (w_d / s_d) - 84.6 * (syl_d / w_d), 6).
_READABILITY_SQL = """SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS n_words,
       CAST(sum(s) AS BIGINT) AS n_sents,
       CAST(sum(y) AS BIGINT) AS n_syll,
       round(206.835
             - 1.015 * (CAST(sum(w) AS DOUBLE) / CAST(sum(s) AS DOUBLE))
             - 84.6 * (CAST(sum(y) AS DOUBLE) / CAST(sum(w) AS DOUBLE)),
             6) AS fre
FROM (
    SELECT source,
           len(list_filter(string_split_regex(text, '\\s+'),
                           t -> t <> '')) AS w,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
           len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
    FROM documents
)
GROUP BY 1
"""

# Per-source corpus manifest (operators/textstats.corpus_manifest):
# per-doc digest h = hash60('mf-' || doc_id || '-' || md5(text)),
# xor_h = bit_xor aggregate, min/max doc_id audit columns.
_CORPUS_MANIFEST_SQL = """SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(bit_xor(CAST(('0x' || substr(md5(
           'mf-' || CAST(doc_id AS VARCHAR) || '-' || md5(text)
       ), 1, 15))::UBIGINT AS BIGINT)) AS BIGINT) AS xor_h,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM documents
GROUP BY 1
"""

# Per-source tokenizer fertility (operators/textstats.token_fertility):
# token_counts' ws/bpe formulas verbatim, fert_micro = (2*1e6*bpe +
# ws) DIV (2*ws) integer round-half-away.
_TOKEN_FERTILITY_SQL = f"""WITH {_DOC_TOKENS},
ws AS (
    SELECT doc_id AS id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS ws_tokens
    FROM documents
),
pd AS (
    SELECT t.doc_id AS id, w.ws_tokens,
           CAST(coalesce(list_sum(list_transform(t.tokens,
                x -> CAST(ceil(length(x) / 4) AS INTEGER))), 0) AS BIGINT)
               AS bpe_est
    FROM doctoks t JOIN ws w ON t.doc_id = w.id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(pd.ws_tokens) AS BIGINT) AS ws_total,
       CAST(sum(pd.bpe_est) AS BIGINT) AS bpe_total,
       CAST((2 * 1000000 * sum(pd.bpe_est) + sum(pd.ws_tokens))
            // (2 * sum(pd.ws_tokens)) AS BIGINT) AS fert_micro
FROM pd JOIN documents d ON pd.id = d.doc_id
GROUP BY 1
"""

_FINGERPRINT_SQL = f"""WITH {_DOC_TOKENS}
SELECT doc_id AS id, md5(array_to_string(tokens, ' ')) AS fp FROM doctoks
"""

def _winnow_sql(k: int, w: int) -> str:
    """textstats.winnow_fingerprints (MOSS winnowing): gram hash
    h = hash60('win-'||gram) % 2^40, packed key K = h*2^20 +
    (2^20-1-pos) so ONE window min yields (min h, rightmost-tie pos);
    starts pos <= n_grams - w, docs with < w grams emit no rows, all
    arithmetic BIGINT (k-gram/window params pinned to
    textstats.WINNOW_K/WINNOW_W — change both sides or neither)."""
    return f"""WITH {_DOC_TOKENS},
gp AS (
    SELECT doc_id AS id,
           unnest(list_transform(
               range(0, greatest(len(tokens) - {k - 1}, 0)),
               i -> list_aggregate(tokens[i+1:i+{k}], 'string_agg', ' ')
           )) AS gram,
           CAST(generate_subscripts(list_transform(
               range(0, greatest(len(tokens) - {k - 1}, 0)), i -> i), 1)
               AS BIGINT) - 1 AS pos
    FROM doctoks
),
keyed AS (
    SELECT id, pos,
           (CAST(CAST('0x' || substr(md5('win-' || gram), 1, 15) AS UBIGINT)
                 AS BIGINT) % 1099511627776) * 1048576
           + (1048575 - pos) AS kk
    FROM gp
),
sel AS (
    SELECT DISTINCT id, mk FROM (
        SELECT id, pos,
               count(*) OVER (PARTITION BY id) AS n,
               min(kk) OVER (
                   PARTITION BY id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING
               ) AS mk
        FROM keyed
    ) WHERE pos <= n - {w}
)
SELECT id, CAST(1048575 - (mk % 1048576) AS BIGINT) AS pos,
       CAST(mk // 1048576 AS BIGINT) AS fp
FROM sel
ORDER BY id, pos
"""


def _winnow_pairs_sql(k: int, w: int) -> str:
    """textstats.winnow_pairs (the MOSS report stage): distinct
    (id, fp) from the pinned winnowing selection, fingerprints in
    > 10 docs dropped BEFORE pairing, pairs id_a < id_b with
    n_shared >= 2."""
    base = _winnow_sql(k, w).rsplit("ORDER BY", 1)[0]
    return f"""WITH wf AS ({base}),
fps AS (SELECT DISTINCT id, fp FROM wf),
fdf AS (SELECT fp, count(*) AS d FROM fps GROUP BY 1),
kept AS (
    SELECT fps.id, fps.fp FROM fps JOIN fdf USING (fp) WHERE fdf.d <= 10
)
SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


_EXACT_DEDUP_SQL = f"""WITH {_DOC_TOKENS}
SELECT md5(array_to_string(tokens, ' ')) AS text_hash,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS dup_count
FROM doctoks GROUP BY 1
"""

_COSINE_TOPK_SQL = f"""WITH pr AS (
    SELECT vec_id AS pid, embedding AS pe FROM embeddings
    WHERE vec_id IN ({', '.join(str(i) for i in PROBE_IDS)})
),
cand AS (
    SELECT pr.pid, e.vec_id AS nid,
           round(
             list_sum(list_transform(range(1, len(pr.pe) + 1),
                 i -> CAST(pr.pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(pr.pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cos
    FROM pr, embeddings e
    WHERE e.vec_id <> pr.pid
),
ranked AS (
    SELECT pid, nid, cos,
           CAST(row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
    FROM cand
)
SELECT CAST(pid AS BIGINT) AS probe_id, CAST(nid AS BIGINT) AS neighbor_id, rank, cos
FROM ranked WHERE rank <= {ANN_K}
"""


# Embedding first/second moments (operators/clustering.embedding_moments):
# micro-quantized components, exact BIGINT sums over the upper
# triangle i <= j (1-based dims) — the PCA/whitening prep pass.
_EMB_MOMENTS_SQL = """WITH q AS (
    SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
    FROM embeddings
),
d1 AS (
    SELECT generate_subscripts(qv, 1) AS i, unnest(qv) AS vi, qv
    FROM q
),
d2 AS (
    SELECT i, vi, generate_subscripts(qv, 1) AS j, unnest(qv) AS vj
    FROM d1
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(vi) AS BIGINT) AS sum_i,
       CAST(sum(vj) AS BIGINT) AS sum_j,
       CAST(sum(vi * vj) AS BIGINT) AS sum_ij
FROM d2 WHERE i <= j
GROUP BY 1, 2
"""


# Mean-pooled conversation embeddings
# (operators/clustering.conv_mean_embeddings): k-means integer
# discipline — micro components, exact per-(conv, dim) sums, mean =
# sign-aware round-half-away division, array rebuilt in dim order;
# conv = the transcripts id law on vector ids (vec_id // 8).
_CONV_MEAN_EMB_SQL = """WITH q AS (
    SELECT 'conv-' || lpad(CAST(vec_id // 8 AS VARCHAR), 12, '0')
               AS conv_id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
    FROM embeddings
),
m AS (
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_members
    FROM q GROUP BY 1
),
dims AS (
    SELECT conv_id, generate_subscripts(qv, 1) AS dim, unnest(qv) AS v
    FROM q
),
agg AS (
    SELECT conv_id, dim, CAST(sum(v) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM dims GROUP BY 1, 2
),
cp AS (
    SELECT conv_id, dim,
           CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                ELSE -(((-2) * s + n) // (2 * n)) END AS c
    FROM agg
)
SELECT m.conv_id, m.n_members, CAST(cp.dim AS BIGINT) AS dim,
       CAST(cp.c AS BIGINT) AS c
FROM m JOIN cp USING (conv_id)
"""


# Nearest-centroid (Rocchio) classification
# (operators/clustering.nearest_centroid_classify): k-means integer
# discipline — micro-quantized components, per-(label, dim) centroid =
# sign-aware round-half-away division of the exact sum, probe d2 =
# exact BIGINT squared L2, centroids over ALL vectors, argmin tie ->
# lowest label.
_NEAREST_CENTROID_SQL = f"""WITH q AS (
    SELECT vec_id AS id, CAST(label AS BIGINT) AS lbl,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
    FROM embeddings
),
dims AS (
    SELECT lbl, generate_subscripts(qv, 1) AS dim, unnest(qv) AS v FROM q
),
cent AS (
    SELECT lbl, dim,
           CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                ELSE -(((-2) * s + n) // (2 * n)) END AS c
    FROM (
        SELECT lbl, dim, CAST(sum(v) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM dims GROUP BY 1, 2
    )
),
pd AS (
    SELECT id AS pid, lbl AS true_label,
           generate_subscripts(qv, 1) AS dim, unnest(qv) AS pv
    FROM q WHERE id IN ({', '.join(str(i) for i in PROBE_IDS)})
),
d2 AS (
    SELECT p.pid, p.true_label, c.lbl,
           CAST(sum((p.pv - c.c) * (p.pv - c.c)) AS BIGINT) AS d2
    FROM pd p JOIN cent c ON c.dim = p.dim
    GROUP BY 1, 2, 3
)
SELECT CAST(pid AS BIGINT) AS probe_id, true_label,
       lbl AS pred_label, d2
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY pid ORDER BY d2 ASC, lbl ASC
    ) AS rn
    FROM d2
) WHERE rn = 1
"""


# k-NN majority-vote classification (operators/similarity.knn_classify):
# pool = cosine_topk's exact pool (shared round-6 cosine, (cos desc,
# nid asc) rank, self excluded), vote winner (votes desc, label asc),
# votes = the winning label's count; true_label rides beside.
_KNN_CLASSIFY_SQL = f"""WITH pr AS (
    SELECT vec_id AS pid, embedding AS pe, CAST(label AS BIGINT) AS true_label
    FROM embeddings
    WHERE vec_id IN ({', '.join(str(i) for i in PROBE_IDS)})
),
cand AS (
    SELECT pr.pid, pr.true_label, e.vec_id AS nid,
           CAST(e.label AS BIGINT) AS lbl,
           round(
             list_sum(list_transform(range(1, len(pr.pe) + 1),
                 i -> CAST(pr.pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(pr.pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cos
    FROM pr, embeddings e
    WHERE e.vec_id <> pr.pid
),
pool AS (
    SELECT pid, true_label, lbl FROM (
        SELECT pid, true_label, nid, lbl,
               row_number() OVER (
                   PARTITION BY pid ORDER BY cos DESC, nid ASC
               ) AS rank
        FROM cand
    ) WHERE rank <= {ANN_K}
),
votes AS (
    SELECT pid, true_label, lbl, CAST(count(*) AS BIGINT) AS n
    FROM pool GROUP BY 1, 2, 3
)
SELECT CAST(pid AS BIGINT) AS probe_id, true_label,
       lbl AS pred_label, n AS votes
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY pid ORDER BY n DESC, lbl ASC
    ) AS vr
    FROM votes
) WHERE vr = 1
"""


# Attribute-filtered exact cosine top-k: candidates share the probe's
# label (the filter is the equi-join key), self excluded, shared
# round-6 cosine, k = ANN_K
_COSINE_FILTERED_SQL = f"""WITH pr AS (
    SELECT vec_id AS pid, embedding AS pe, label AS plabel FROM embeddings
    WHERE vec_id IN ({', '.join(str(i) for i in PROBE_IDS)})
),
cand AS (
    SELECT pr.pid, e.vec_id AS nid, CAST(e.label AS BIGINT) AS label,
           round(
             list_sum(list_transform(range(1, len(pr.pe) + 1),
                 i -> CAST(pr.pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(pr.pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cos
    FROM pr JOIN embeddings e ON e.label = pr.plabel AND e.vec_id <> pr.pid
),
ranked AS (
    SELECT pid, nid, label, cos,
           CAST(row_number() OVER (PARTITION BY pid ORDER BY cos DESC, nid ASC) AS BIGINT) AS rank
    FROM cand
)
SELECT CAST(pid AS BIGINT) AS probe_id, CAST(nid AS BIGINT) AS neighbor_id,
       label, rank, cos
FROM ranked WHERE rank <= {ANN_K}
"""


# Dense max-passage conversation retrieval: conv = the corpus id law
# applied to vector ids ('conv-' || lpad(id // 8, 12, '0')), probe's
# own vector excluded, best turn (round-6 cos desc, id asc), conv rank
# (best cos desc, conv_id asc), k = ANN_K
_DENSE_MAXP_SQL = f"""WITH pr AS (
    SELECT vec_id AS pid, embedding AS pe FROM embeddings
    WHERE vec_id IN ({', '.join(str(i) for i in PROBE_IDS)})
),
cand AS (
    SELECT pr.pid, e.vec_id AS nid,
           'conv-' || lpad(CAST(CAST(e.vec_id // 8 AS BIGINT) AS VARCHAR),
                           12, '0') AS conv_id,
           round(
             list_sum(list_transform(range(1, len(pr.pe) + 1),
                 i -> CAST(pr.pe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(pr.pe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
             6) AS cos
    FROM pr, embeddings e
    WHERE e.vec_id <> pr.pid
),
best AS (
    SELECT pid, nid, conv_id, cos,
           row_number() OVER (
               PARTITION BY pid, conv_id ORDER BY cos DESC, nid ASC
           ) AS tr
    FROM cand
),
ranked AS (
    SELECT pid, nid, conv_id, cos,
           CAST(row_number() OVER (
               PARTITION BY pid ORDER BY cos DESC, conv_id ASC
           ) AS BIGINT) AS rank
    FROM best WHERE tr = 1
)
SELECT CAST(pid AS BIGINT) AS probe_id, conv_id,
       CAST(nid AS BIGINT) AS best_id, rank, cos AS score
FROM ranked WHERE rank <= {ANN_K}
"""


# ColBERT-style late-interaction conversation retrieval
# (similarity.conv_maxsim_topk).  Pins restated verbatim (change both
# sides or neither): conv = the transcripts id law on vector ids
# (vec_id // 8, 12-digit pad); probe convs = DISTINCT convs of
# PROBE_IDS, self conv excluded; per-(query-vector, candidate-conv)
# similarity micro-quantized CAST(round(cos * 1e6) AS BIGINT) BEFORE
# the max and the exact integer sum (multiplication binds AFTER the
# one division); rank (maxsim_micro desc, conv_id asc), k = 5.
_MAXSIM_PROBE_CONVS = ", ".join(
    f"'conv-{c:012d}'" for c in sorted({p // 8 for p in PROBE_IDS})
)

_CONV_MAXSIM_SQL = f"""WITH v AS (
    SELECT vec_id AS nid,
           'conv-' || lpad(CAST(CAST(vec_id // 8 AS BIGINT) AS VARCHAR),
                           12, '0') AS conv_id,
           embedding AS e
    FROM embeddings
),
pr AS (
    SELECT conv_id AS probe_conv, nid AS qid, e AS qe FROM v
    WHERE conv_id IN ({_MAXSIM_PROBE_CONVS})
),
pair AS (
    SELECT pr.probe_conv, pr.qid, v.conv_id,
           CAST(round((list_sum(list_transform(range(1, len(pr.qe) + 1),
                   i -> CAST(pr.qe[i] AS DOUBLE) * CAST(v.e[i] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(pr.qe,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(v.e,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))
               * 1000000.0) AS BIGINT) AS m
    FROM pr, v
    WHERE v.conv_id <> pr.probe_conv
),
perq AS (
    SELECT probe_conv, qid, conv_id, max(m) AS mq
    FROM pair GROUP BY 1, 2, 3
),
scored AS (
    SELECT probe_conv, conv_id, CAST(sum(mq) AS BIGINT) AS maxsim_micro
    FROM perq GROUP BY 1, 2
),
ranked AS (
    SELECT probe_conv, conv_id, maxsim_micro,
           CAST(row_number() OVER (
               PARTITION BY probe_conv
               ORDER BY maxsim_micro DESC, conv_id ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT probe_conv, conv_id, rank, maxsim_micro,
       round(maxsim_micro / 1000000.0, 6) AS score
FROM ranked WHERE rank <= 5
"""


def _cos6(a: str, b: str) -> str:
    """round-6 cosine between two embedding lists (the one formula
    every similarity oracle shares)."""
    return (
        f"round(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
        f" / (sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        f" * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)"
    )


# Exact kNN self-join (similarity.knn_join_exact): every vector's
# top-3 cosine neighbors, rank (cos6 desc, nid asc) — the direct
# all-pairs restatement; the Spark side's chunked partial top-k with
# the _KNN_EPS pad provably contains it.
_KNN_JOIN_SQL = f"""WITH base AS (
    SELECT vec_id AS id, embedding AS v FROM embeddings
),
pairs AS (
    SELECT a.id AS id, b.id AS nid, {_cos6('a.v', 'b.v')} AS cos6
    FROM base a JOIN base b ON a.id <> b.id
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY id ORDER BY cos6 DESC, nid ASC
    ) AS rn
    FROM pairs
)
SELECT CAST(id AS BIGINT) AS id, CAST(nid AS BIGINT) AS nid, cos6,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 3
"""


def _hybrid_rrf_sql(probe_ids, k: int, pool: int, c: int = 60) -> str:
    """Hybrid BM25 + cosine retrieval fused by RRF
    (operators/hybrid.py).  Pins restated: probe doc text = lexical
    query, probe embedding = dense query, probe doc excluded from both
    legs, per-system contribution round(1e6/(c+rank)) BIGINT, fusion
    ties (fused desc, doc asc)."""
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""{_PREFIX},
pq AS (
    SELECT CAST(doc_id AS VARCHAR) AS qid, text AS qtext
    FROM documents WHERE doc_id IN ({ids})
),
qtok AS (
    SELECT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term FROM pq
),
qterms AS (
    SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf FROM qtok GROUP BY qid, term
),
qexist AS (
    SELECT q.qid, q.term, q.qtf, l.df FROM qterms q JOIN lexicon l USING (term)
),
lscored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
lexr AS (
    SELECT qid, docid - 1 AS doc,
           row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS rn
    FROM lscored
    WHERE docid <> CAST(qid AS BIGINT) + 1
),
lexp AS (
    SELECT qid, doc, CAST(round(1000000.0 / ({c} + rn)) AS BIGINT) AS cl
    FROM lexr WHERE rn <= {pool}
),
dns AS (
    SELECT CAST(p.vec_id AS VARCHAR) AS qid, b.vec_id AS doc,
           {_cos6('p.embedding', 'b.embedding')} AS cos6
    FROM embeddings p JOIN embeddings b ON b.vec_id <> p.vec_id
    WHERE p.vec_id IN ({ids})
),
dnsr AS (
    SELECT qid, doc,
           row_number() OVER (
               PARTITION BY qid ORDER BY cos6 DESC, doc ASC
           ) AS rn
    FROM dns
),
dnsp AS (
    SELECT qid, doc, CAST(round(1000000.0 / ({c} + rn)) AS BIGINT) AS cd
    FROM dnsr WHERE rn <= {pool}
),
fused AS (
    SELECT coalesce(l.qid, d.qid) AS qid,
           coalesce(l.doc, d.doc) AS doc,
           coalesce(l.cl, 0) + coalesce(d.cd, 0) AS fm
    FROM lexp l FULL OUTER JOIN dnsp d
        ON l.qid = d.qid AND l.doc = d.doc
),
ranked AS (
    SELECT qid, doc, fm,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY fm DESC, doc ASC
           ) AS BIGINT) AS rank
    FROM fused
)
SELECT qid, CAST(doc AS VARCHAR) AS docno, rank,
       round(fm / 1000000.0, 6) AS score
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _mmr_sql(probe_ids, k: int, pool: int, lam: float) -> str:
    """MMR diversified top-k (operators/similarity.mmr_topk): the
    inherently-sequential greedy selection UNROLLED into k chained
    CTEs — step 1 takes the top-cos candidate, step i maximizes
    round(lam*cos - (1-lam)*max sim to selected, 6) with nid-asc ties
    over the not-yet-selected pool."""
    ids = ", ".join(str(i) for i in probe_ids)
    parts = [
        f"""WITH pr AS (
    SELECT vec_id AS pid, embedding AS pe FROM embeddings
    WHERE vec_id IN ({ids})
),
cand0 AS (
    SELECT pr.pid, e.vec_id AS nid, {_cos6('pr.pe', 'e.embedding')} AS cos
    FROM pr, embeddings e WHERE e.vec_id <> pr.pid
),
crank AS (
    SELECT *, row_number() OVER (
        PARTITION BY pid ORDER BY cos DESC, nid ASC) AS crk
    FROM cand0
),
pool AS (SELECT pid, nid, cos, crk FROM crank WHERE crk <= {pool}),
pv AS (
    SELECT p.pid, p.nid, e.embedding AS v
    FROM pool p JOIN embeddings e ON e.vec_id = p.nid
),
csim AS (
    SELECT a.pid, a.nid AS ida, b.nid AS idb, {_cos6('a.v', 'b.v')} AS sim
    FROM pv a JOIN pv b ON a.pid = b.pid AND a.nid <> b.nid
),
sel1 AS (
    SELECT pid, nid, round({lam} * cos, 6) AS obj, 1 AS rank
    FROM pool WHERE crk = 1
),
su1 AS (SELECT pid, nid FROM sel1)"""
    ]
    for i in range(2, int(k) + 1):
        parts.append(
            f""",
obj{i} AS (
    SELECT p.pid, p.nid, round({lam} * p.cos - {1.0 - lam} * max(cs.sim), 6) AS obj
    FROM pool p
    LEFT JOIN su{i - 1} ex ON ex.pid = p.pid AND ex.nid = p.nid
    JOIN csim cs ON cs.pid = p.pid AND cs.ida = p.nid
    JOIN su{i - 1} s ON s.pid = cs.pid AND s.nid = cs.idb
    WHERE ex.nid IS NULL
    GROUP BY p.pid, p.nid, p.cos
),
sel{i} AS (
    SELECT pid, nid, obj, {i} AS rank FROM (
        SELECT *, row_number() OVER (
            PARTITION BY pid ORDER BY obj DESC, nid ASC) AS r
        FROM obj{i}) WHERE r = 1
),
su{i} AS (SELECT pid, nid FROM su{i - 1} UNION ALL SELECT pid, nid FROM sel{i})"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM sel{i}" for i in range(1, int(k) + 1)
    )
    parts.append(
        f"""
SELECT CAST(pid AS BIGINT) AS probe_id, CAST(nid AS BIGINT) AS neighbor_id,
       CAST(rank AS BIGINT) AS rank, obj
FROM ({union})
"""
    )
    return "".join(parts)


# Relational OLAP suite (operators/relational.py): per-row measures
# quantized to exact integers BEFORE the sums (float sums are shuffle-
# order-dependent at round 6); multiplication order pinned —
# (price * (1 - disc)) then * (1 + tax); cutoffs/segment/k pinned to
# the module constants; averages derived from the integer sums.
_TPCH_Q1_SQL = """WITH base AS (
    SELECT l_returnflag, l_linestatus,
           CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c,
           CAST(round(l_discount * 1000000.0) AS BIGINT) AS disc_u,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0)
                AS BIGINT) AS disc_price_u,
           CAST(round(((l_extendedprice * (1.0 - l_discount))
                       * (1.0 + l_tax)) * 1000000.0) AS BIGINT) AS charge_u
    FROM lineitem
    WHERE epoch_us(l_shipdate) <= 904694400000000
)
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS count_order,
       CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
       CAST(sum(price_c) AS BIGINT) AS sum_base_c,
       CAST(sum(disc_price_u) AS BIGINT) AS sum_disc_price_u,
       CAST(sum(charge_u) AS BIGINT) AS sum_charge_u,
       round(sum(qty_c) / (count(*) * 100.0), 6) AS avg_qty,
       round(sum(price_c) / (count(*) * 100.0), 6) AS avg_price,
       round(sum(disc_u) / (count(*) * 1000000.0), 6) AS avg_disc
FROM base
GROUP BY l_returnflag, l_linestatus
"""

_TPCH_Q3_SQL = """WITH lines AS (
    SELECT l_orderkey,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0)
                AS BIGINT) AS rev_u
    FROM lineitem WHERE epoch_us(l_shipdate) > 883612800000000
),
ords AS (
    SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS orderdate_us,
           o_orderpriority
    FROM orders WHERE epoch_us(o_orderdate) < 883612800000000
),
cust AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
j AS (
    SELECT o.o_orderkey, o.orderdate_us, o.o_orderpriority,
           CAST(sum(l.rev_u) AS BIGINT) AS revenue_u
    FROM lines l
    JOIN ords o ON l.l_orderkey = o.o_orderkey
    JOIN cust c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2, 3
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, revenue_u,
       CAST(orderdate_us AS BIGINT) AS orderdate_us, o_orderpriority
FROM j ORDER BY revenue_u DESC, o_orderkey ASC LIMIT 10
"""

_TPCH_Q5_SQL = """SELECT n_name,
       CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount))
                           * 1000000.0) AS BIGINT)) AS BIGINT) AS revenue_u
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND epoch_us(o_orderdate) >= 820454400000000
  AND epoch_us(o_orderdate) < 852076800000000
GROUP BY n_name
"""

# Q6: one pushed-down scan, one global integer sum; discount bounds on
# the RAW parquet double (identical bytes both engines)
_TPCH_Q6_SQL = """SELECT
    CAST(sum(CAST(round((l_extendedprice * l_discount) * 1000000.0)
                  AS BIGINT)) AS BIGINT) AS revenue_u,
    CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE epoch_us(l_shipdate) >= 820454400000000
  AND epoch_us(l_shipdate) < 852076800000000
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0
"""

# Q10: returned-item revenue per customer, top-20 (revenue desc,
# custkey asc); order window [1996-01-01, 1996-07-01) as naive epochs
_TPCH_Q10_SQL = """WITH ords AS (
    SELECT o_orderkey, o_custkey FROM orders
    WHERE epoch_us(o_orderdate) >= 820454400000000
      AND epoch_us(o_orderdate) < 836179200000000
),
lines AS (
    SELECT l_orderkey,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0)
                AS BIGINT) AS rev_u
    FROM lineitem WHERE l_returnflag = 'R'
),
cust AS (
    SELECT c_custkey, c_name, n_name,
           CAST(round(c_acctbal * 100.0) AS BIGINT) AS acctbal_c
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, n_name,
       acctbal_c, CAST(sum(rev_u) AS BIGINT) AS revenue_u
FROM lines
JOIN ords ON lines.l_orderkey = ords.o_orderkey
JOIN cust ON ords.o_custkey = cust.c_custkey
GROUP BY 1, 2, 3, 4
ORDER BY revenue_u DESC, c_custkey ASC
LIMIT 20
"""

# Q14: promo share of one ship-month's revenue — integer sums, the
# share is ONE double division round 6; p_type equality pinned
_TPCH_Q14_SQL = """WITH lines AS (
    SELECT l_partkey,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0)
                AS BIGINT) AS rev_u
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= 820454400000000
      AND epoch_us(l_shipdate) < 823132800000000
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END)
            AS BIGINT) AS promo_revenue_u,
       CAST(sum(rev_u) AS BIGINT) AS total_revenue_u,
       round(100.0
             * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev_u ELSE 0 END)
                    AS DOUBLE)
             / CAST(sum(rev_u) AS DOUBLE), 6) AS promo_share
FROM lines JOIN part ON l_partkey = p_partkey
"""


# Q13 shape (relational.customer_order_distribution): zero-order
# customers counted via the left join; all-integer.
_TPCH_Q13_SQL = """WITH per_cust AS (
    SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# Q18 shape (relational.large_volume_orders): threshold compare in
# exact cents (> 20000), ties (totalprice_c desc, o_orderkey asc).
_TPCH_Q18_SQL = """WITH qty AS (
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
               AS sum_qty_c
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT)) > 20000
)
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       epoch_us(o.o_orderdate) AS orderdate_us,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS totalprice_c,
       q.sum_qty_c
FROM qty q
JOIN orders o ON q.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY totalprice_c DESC, o_orderkey ASC
LIMIT 10
"""


# Q19 shape (relational.discounted_revenue): three (brand, size,
# quantity) bands OR'd; quantity compared on the raw doubles (Q6 pin),
# endpoints inclusive.
_TPCH_Q19_SQL = """SELECT
    CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0)
                  AS BIGINT)) AS BIGINT) AS revenue_u,
    CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 1.0 AND 15.0)
   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10.0 AND 30.0)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 40
       AND l_quantity BETWEEN 20.0 AND 45.0)
"""

_TPCH_Q4_SQL = """SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND epoch_us(l.l_shipdate) > epoch_us(o.o_orderdate))
GROUP BY 1
"""

# Q7: volume between NATION_3 and NATION_8 (both directions) per ship
# year in [1995-01-01, 1997-01-01); year() on the naive timestamp is
# tz-free calendar math on both engines
_TPCH_Q7_SQL = """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount))
                           * 1000000.0) AS BIGINT)) AS BIGINT) AS revenue_u
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE epoch_us(l_shipdate) >= 788918400000000
  AND epoch_us(l_shipdate) < 852076800000000
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
       OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""

# Q8: NATION_8 suppliers' share of ASIA customers' PROMO-part revenue
# per order year in [1995-01-01, 1997-01-01); integer sums, one double
# division round 6
_TPCH_Q8_SQL = """WITH j AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           n1.n_name AS supp_nation,
           CAST(round((l_extendedprice * (1.0 - l_discount)) * 1000000.0)
                AS BIGINT) AS rev_u
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE p_type = 'PROMO' AND r_name = 'ASIA'
      AND epoch_us(o_orderdate) >= 788918400000000
      AND epoch_us(o_orderdate) < 852076800000000
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_8' THEN rev_u ELSE 0 END)
            AS BIGINT) AS nation_u,
       CAST(sum(rev_u) AS BIGINT) AS total_u,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_8' THEN rev_u
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(rev_u) AS DOUBLE), 6) AS mkt_share
FROM j GROUP BY 1
"""

# Q9 (adapted — no partsupp in the synthetic schema, p_retailprice
# stands in for ps_supplycost): per-row amount quantized to micro
# BEFORE the sum; parts whose name contains 'widget'
_TPCH_Q9_SQL = """SELECT n_name,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)
                            - p_retailprice * l_quantity) * 1000000.0)
                     AS BIGINT)) AS BIGINT) AS profit_u
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE contains(p_name, 'widget')
GROUP BY 1, 2
"""

# Derived partsupp for the Q2/Q11/Q16/Q20 shapes (no partsupp in the
# synthetic schema).  The law is pinned in
# operators/relational.derived_partsupp and restated VERBATIM here
# (change both sides or neither): m = greatest(n_suppliers // 4, 1),
# membership (p_partkey % m) == (s_suppkey % m), availqty =
# (p*7 + s*11) % 9999 + 1, supplycost CENTS = (p*13 + s*17) % 100000
# + 100.
_PARTSUPP_CTE = """partsupp AS (
    SELECT p.p_partkey AS ps_partkey, s.s_suppkey AS ps_suppkey,
           CAST((p.p_partkey*7 + s.s_suppkey*11) % 9999 + 1 AS BIGINT)
               AS ps_availqty,
           CAST((p.p_partkey*13 + s.s_suppkey*17) % 100000 + 100 AS BIGINT)
               AS ps_supplycost_c
    FROM part p JOIN supplier s
      ON p.p_partkey % greatest((SELECT count(*) FROM supplier) // 4, 1)
       = s.s_suppkey % greatest((SELECT count(*) FROM supplier) // 4, 1)
)"""

# Q2: min-cost EUROPE supplier per ECONOMY part with size % 10 == 0;
# ALL min-tied suppliers emit, top 100 by (acctbal_c desc, n_name,
# s_name, p_partkey); acctbal exact cents.
_TPCH_Q2_SQL = f"""WITH {_PARTSUPP_CTE},
sups AS (
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(round(s.s_acctbal * 100.0) AS BIGINT) AS acctbal_c
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
),
joined AS (
    SELECT ps.ps_partkey, p.p_brand, su.s_name, su.n_name, su.acctbal_c,
           ps.ps_supplycost_c,
           min(ps.ps_supplycost_c) OVER (PARTITION BY ps.ps_partkey)
               AS min_cost_c
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    JOIN sups su ON ps.ps_suppkey = su.s_suppkey
    WHERE p.p_type = 'ECONOMY' AND p.p_size % 10 = 0
)
SELECT CAST(ps_partkey AS BIGINT) AS p_partkey, p_brand, s_name, n_name,
       acctbal_c, ps_supplycost_c AS cost_c
FROM joined WHERE ps_supplycost_c = min_cost_c
ORDER BY acctbal_c DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""

# Q11: per-part NATION_3 stock value (exact BIGINT supplycost_c x
# availqty); keep value_c * 1e4 > total_c (fraction 0.0001
# cross-multiplied in integers).
_TPCH_Q11_SQL = f"""WITH {_PARTSUPP_CTE},
vals AS (
    SELECT ps.ps_partkey,
           CAST(sum(ps.ps_supplycost_c * ps.ps_availqty) AS BIGINT)
               AS value_c
    FROM partsupp ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY 1
)
SELECT CAST(ps_partkey AS BIGINT) AS ps_partkey, value_c
FROM vals
WHERE value_c * 10000 > (SELECT CAST(sum(value_c) AS BIGINT) FROM vals)
ORDER BY value_c DESC, ps_partkey ASC
"""

# Q16: distinct supplier count per (brand, type, size) over the pinned
# size list, excluding Brand#2/ECONOMY parts and complaint suppliers
# (adapted law s_suppkey % 13 == 2).
_TPCH_Q16_SQL = f"""WITH {_PARTSUPP_CTE}
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON ps.ps_partkey = p.p_partkey
WHERE NOT (p.p_brand = 'Brand#2' AND p.p_type = 'ECONOMY')
  AND p.p_size IN (5, 11, 17, 23, 29, 35, 41, 47)
  AND ps.ps_suppkey % 13 <> 2
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

# Q20: ASIA-region suppliers with a 'red'-part ps row whose availqty
# exceeds half their 1995 shipped quantity of that part —
# 200 * availqty > sum(qty cents), cross-multiplied; ship window
# [1995-01-01, 1996-01-01) as naive epochs.
_TPCH_Q20_SQL = f"""WITH {_PARTSUPP_CTE},
shipped AS (
    SELECT l_partkey, l_suppkey,
           CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
               AS sum_qty_c
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= 788918400000000
      AND epoch_us(l_shipdate) < 820454400000000
    GROUP BY 1, 2
),
hits AS (
    SELECT DISTINCT ps.ps_suppkey
    FROM partsupp ps
    JOIN part p ON ps.ps_partkey = p.p_partkey
    JOIN shipped sh
      ON ps.ps_partkey = sh.l_partkey AND ps.ps_suppkey = sh.l_suppkey
    WHERE p.p_name LIKE 'red%' AND ps.ps_availqty * 200 > sh.sum_qty_c
)
SELECT CAST(h.ps_suppkey AS BIGINT) AS s_suppkey, s.s_name
FROM hits h
JOIN supplier s ON h.ps_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
ORDER BY s.s_name ASC
"""

# Q15: every supplier tied at the max quarterly revenue (integer-exact
# max/equality); ship window [1996-01-01, 1996-04-01)
_TPCH_Q15_SQL = """WITH rev AS (
    SELECT l_suppkey,
           CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount))
                               * 1000000.0) AS BIGINT)) AS BIGINT) AS revenue_u
    FROM lineitem
    WHERE epoch_us(l_shipdate) >= 820454400000000
      AND epoch_us(l_shipdate) < 828316800000000
    GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, revenue_u
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_u = (SELECT max(revenue_u) FROM rev)
"""

# Q17: Brand#11 lines with quantity below 20% of the part's average —
# threshold cross-multiplied to integers (qty_c * 5 * cnt < sum_qty_c)
_TPCH_Q17_SQL = """WITH l AS (
    SELECT l_partkey AS pk,
           CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#11'
),
stats AS (
    SELECT pk, CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
           CAST(count(*) AS BIGINT) AS cnt
    FROM l GROUP BY 1
)
SELECT round(CAST(coalesce(sum(price_c), 0) AS DOUBLE) / 700.0, 6)
           AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_lines
FROM l JOIN stats USING (pk)
WHERE qty_c * 5 * cnt < sum_qty_c
"""

# Q12 (adapted — no shipmode/commit/receipt dates: l_linestatus is the
# grouping, "late" = shipped >365 d after the order date): high/low
# priority line counts over 1996 shipments; all-integer
_TPCH_Q12_SQL = """SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE epoch_us(l_shipdate) >= 820454400000000
  AND epoch_us(l_shipdate) < 852076800000000
  AND epoch_us(l_shipdate) - epoch_us(o_orderdate) > 31536000000000
GROUP BY 1
"""

# Q21 (adapted — "kept the order waiting" = the only supplier whose
# line shipped >365 d after the order date on a finished multi-supplier
# order): exists / not-exists restated literally; top-100 by
# (numwait desc, s_name asc)
_TPCH_Q21_SQL = """WITH j AS (
    SELECT l_orderkey, l_suppkey,
           (epoch_us(l_shipdate) - epoch_us(o_orderdate)
            > 31536000000000) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
late AS (SELECT l_orderkey, l_suppkey FROM j WHERE late)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM j l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY 1
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""

# Q22 (adapted — no c_phone; per-nation rollup; "idle" = no orders
# since 1999-01-01, the literal no-orders-ever test being vacuous on
# the synthetic order law): above-average positive balance
# cross-multiplied to integers, anti-join on the date-pruned orders
_TPCH_Q22_SQL = """WITH c AS (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100.0) AS BIGINT) AS acctbal_c
    FROM customer
),
pos AS (
    SELECT CAST(sum(acctbal_c) AS BIGINT) AS sum_pos_c,
           CAST(count(*) AS BIGINT) AS cnt_pos
    FROM c WHERE acctbal_c > 0
)
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(acctbal_c) AS BIGINT) AS totacctbal_c
FROM c CROSS JOIN pos
JOIN nation ON c_nationkey = n_nationkey
WHERE acctbal_c * cnt_pos > sum_pos_c
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND epoch_us(o.o_orderdate) >= 915148800000000)
GROUP BY 1
"""


# Adamic-Adar item-item affinity: per-user contribution micro-quantized
# round(1e6/log10(deg_u)) BIGINT before the pair sum; deg_u = distinct
# items per user; rank (micro desc, neighbor asc) top-3 per item
_ITEM_AA_SQL = """WITH ui AS (
    SELECT DISTINCT user_id AS u,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
),
udeg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM ui GROUP BY 1),
pairs AS (
    SELECT a.item AS item, b.item AS neighbor,
           CAST(count(*) AS BIGINT) AS n_common,
           CAST(sum(CAST(round(1000000.0 / log10(CAST(ud.d AS DOUBLE)))
                         AS BIGINT)) AS BIGINT) AS micro
    FROM ui a
    JOIN ui b ON a.u = b.u AND a.item <> b.item
    JOIN udeg ud ON ud.u = a.u
    GROUP BY 1, 2
),
ranked AS (
    SELECT item, neighbor, n_common, micro,
           CAST(row_number() OVER (
               PARTITION BY item ORDER BY micro DESC, neighbor ASC
           ) AS BIGINT) AS rank
    FROM pairs
)
SELECT item, neighbor, n_common,
       round(CAST(micro AS DOUBLE) / 1000000.0, 6) AS score, rank
FROM ranked WHERE rank <= 3
"""


def _item_hits_sql(iters: int = 3) -> str:
    """graph.item_hits: HITS hubs & authorities over the directed
    user->item incidence — integer L-infinity normalization (rha by
    the current max), auth-then-hub update order, hub_0 = 1e6, iters
    pinned.  CTEs stay MATERIALIZED (the item_pagerank pin)."""
    its = []
    prev_h = "h0"
    for i in range(1, iters + 1):
        its.append(f"""
ra{i} AS MATERIALIZED (
    SELECT ui.item, CAST(sum(p.h) AS BIGINT) AS ra
    FROM ui JOIN {prev_h} p ON p.u = ui.u
    GROUP BY 1
),
a{i} AS MATERIALIZED (
    SELECT item,
           CAST((2 * 1000000 * ra + m.m) // (2 * m.m) AS BIGINT) AS a
    FROM ra{i} CROSS JOIN (SELECT max(ra) AS m FROM ra{i}) m
),
rh{i} AS MATERIALIZED (
    SELECT ui.u, CAST(sum(p.a) AS BIGINT) AS rh
    FROM ui JOIN a{i} p ON p.item = ui.item
    GROUP BY 1
),
h{i} AS MATERIALIZED (
    SELECT u,
           CAST((2 * 1000000 * rh + m.m) // (2 * m.m) AS BIGINT) AS h
    FROM rh{i} CROSS JOIN (SELECT max(rh) AS m FROM rh{i}) m
)""")
        prev_h = f"h{i}"
    chain = ",".join(its)
    return f"""WITH ui AS MATERIALIZED (
    SELECT DISTINCT user_id AS u,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
),
h0 AS MATERIALIZED (
    SELECT DISTINCT u, CAST(1000000 AS BIGINT) AS h FROM ui
),{chain}
SELECT 'auth' AS kind, item AS id, a AS score_micro FROM a{iters}
UNION ALL
SELECT 'hub' AS kind, u AS id, h AS score_micro FROM h{iters}
"""


# Association rules (operators/graph.item_assoc_rules).  Pins restated
# verbatim (change both sides or neither): ORDERED pairs a != b, floor
# supp_pair >= 5, conf_micro = (2*1e6*supp_pair + supp_a) DIV
# (2*supp_a) exact BIGINT round-half-away, lift = (pair_d * N_d) /
# (sa_d * sb_d) with factors cast to DOUBLE before multiplying (round
# 6, reported not ranked), rank per antecedent (conf_micro desc,
# item_b asc) top 3.
_ASSOC_SQL = """WITH ui AS (
    SELECT DISTINCT user_id AS u,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
),
nu AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n FROM ui),
supp AS (SELECT item, CAST(count(*) AS BIGINT) AS s FROM ui GROUP BY 1),
pairs AS (
    SELECT a.item AS item_a, b.item AS item_b,
           CAST(count(*) AS BIGINT) AS supp_pair
    FROM ui a JOIN ui b ON a.u = b.u AND a.item <> b.item
    GROUP BY 1, 2
    HAVING count(*) >= 5
),
ranked AS (
    SELECT p.item_a, p.item_b, p.supp_pair,
           sa.s AS supp_a, sb.s AS supp_b,
           CAST((2 * 1000000 * p.supp_pair + sa.s) // (2 * sa.s)
                AS BIGINT) AS conf_micro,
           round((CAST(p.supp_pair AS DOUBLE) * CAST(nu.n AS DOUBLE))
                 / (CAST(sa.s AS DOUBLE) * CAST(sb.s AS DOUBLE)),
                 6) AS lift
    FROM pairs p
    JOIN supp sa ON sa.item = p.item_a
    JOIN supp sb ON sb.item = p.item_b
    CROSS JOIN nu
)
SELECT item_a, item_b, supp_pair, supp_a, supp_b, conf_micro, lift,
       CAST(rank AS BIGINT) AS rank
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY item_a ORDER BY conf_micro DESC, item_b ASC
    ) AS rank
    FROM ranked
)
WHERE rank <= 3
"""


_ITEM_SIMILARITY_SQL = """WITH ui AS (
    SELECT DISTINCT user_id AS u,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
),
deg AS (SELECT item, CAST(count(*) AS BIGINT) AS d FROM ui GROUP BY 1),
common AS (
    SELECT a.item AS item, b.item AS nb, CAST(count(*) AS BIGINT) AS n_common
    FROM ui a JOIN ui b ON a.u = b.u AND a.item <> b.item
    GROUP BY 1, 2
),
scored AS (
    SELECT c.item, c.nb, c.n_common,
           round(CAST(c.n_common AS DOUBLE)
                 / sqrt(CAST(da.d AS DOUBLE) * CAST(db.d AS DOUBLE)),
                 6) AS sim
    FROM common c
    JOIN deg da ON da.item = c.item
    JOIN deg db ON db.item = c.nb
),
ranked AS (
    SELECT item, nb AS neighbor, n_common, sim,
           CAST(row_number() OVER (
               PARTITION BY item ORDER BY sim DESC, nb ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT item, neighbor, n_common, sim, rank
FROM ranked WHERE rank <= 3
"""


def _item_bfs_sql(seeds: list[int], max_hops: int) -> str:
    """operators/graph.item_bfs: min-hop BFS over the strong
    co-visitation edges — edge derivation and ceil(q99 − 1e-6)
    threshold restated from item_communities; levels unrolled
    (MATERIALIZED — the unrolled-chain pin), level k = neighbors of
    level k−1 not seen earlier; seeds always emit dist 0."""
    vals = ", ".join(f"({int(s)})" for s in seeds)
    parts = [
        f"""WITH ui AS MATERIALIZED (
    SELECT DISTINCT user_id AS u,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
),
e AS MATERIALIZED (
    SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS w
    FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
    GROUP BY 1, 2
),
thr AS (SELECT CAST(ceil(quantile_cont(w, 0.99) - 1e-6) AS BIGINT) AS t FROM e),
se AS MATERIALIZED (SELECT ia, ib FROM e CROSS JOIN thr WHERE w >= t),
edges AS MATERIALIZED (
    SELECT ia, ib FROM se UNION ALL SELECT ib AS ia, ia AS ib FROM se
),
d0 AS MATERIALIZED (
    SELECT CAST(seed AS BIGINT) AS seed, CAST(seed AS BIGINT) AS item,
           CAST(0 AS BIGINT) AS dist
    FROM (VALUES {vals}) s(seed)
),
a0 AS MATERIALIZED (SELECT seed, item FROM d0)"""
    ]
    for h in range(1, int(max_hops) + 1):
        parts.append(
            f""",
d{h} AS MATERIALIZED (
    SELECT f.seed, f.item, CAST({h} AS BIGINT) AS dist FROM (
        SELECT DISTINCT d.seed, e.ib AS item
        FROM d{h - 1} d JOIN edges e ON d.item = e.ia
    ) f
    WHERE NOT EXISTS (
        SELECT 1 FROM a{h - 1} p WHERE p.seed = f.seed AND p.item = f.item
    )
),
a{h} AS MATERIALIZED (
    SELECT seed, item FROM a{h - 1}
    UNION ALL SELECT seed, item FROM d{h}
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM d{h}" for h in range(0, int(max_hops) + 1)
    )
    parts.append(f"\n{union}\n")
    return "".join(parts)


# time-decayed item popularity: weight = 2^-age_days quantized to
# integer micro units per event BEFORE the sum (a float sum of powers
# is shuffle-order-dependent); day = floor(epoch_us/86400e6) (the
# cohort pin); rank (pop_u desc, item asc) top 10
_ITEM_POPULARITY_SQL = """WITH b AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
           CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
),
mx AS (SELECT max(day) AS m FROM b),
c AS (
    SELECT item,
           CAST(round(1000000.0 * power(2.0, -CAST(m - day AS DOUBLE)))
                AS BIGINT) AS cu
    FROM b CROSS JOIN mx
),
agg AS (
    SELECT item, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(cu) AS BIGINT) AS pop_u
    FROM c GROUP BY 1
)
SELECT item, n_events, pop_u,
       CAST(row_number() OVER (ORDER BY pop_u DESC, item ASC) AS BIGINT)
           AS rank
FROM agg
QUALIFY rank <= 10
"""

_EVENT_ANOMALIES_SQL = """WITH b AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h
    FROM events
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
hours AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds),
grid AS (SELECT t.event_type, hrs.h
         FROM (SELECT DISTINCT event_type FROM b) t CROSS JOIN hours hrs),
cnts AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
         FROM b GROUP BY 1, 2),
dense AS (
    SELECT g.event_type, g.h, coalesce(c.c, 0) AS c
    FROM grid g LEFT JOIN cnts c ON g.event_type = c.event_type AND g.h = c.h
),
st AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS hh,
           CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
    FROM dense GROUP BY 1
)
SELECT d.event_type, CAST(d.h AS BIGINT) AS hour_h, CAST(d.c AS BIGINT) AS cnt,
       round((CAST(st.hh AS DOUBLE) * CAST(d.c AS DOUBLE) - CAST(st.s AS DOUBLE))
             * (CAST(st.hh AS DOUBLE) * CAST(d.c AS DOUBLE) - CAST(st.s AS DOUBLE))
             / (CAST(st.hh AS DOUBLE) * CAST(st.q AS DOUBLE)
                - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)), 6) AS z2
FROM dense d JOIN st USING (event_type)
WHERE (CAST(st.hh AS DOUBLE) * CAST(d.c AS DOUBLE) - CAST(st.s AS DOUBLE))
      * (CAST(st.hh AS DOUBLE) * CAST(d.c AS DOUBLE) - CAST(st.s AS DOUBLE))
      > 4.0 * (CAST(st.hh AS DOUBLE) * CAST(st.q AS DOUBLE)
               - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE))
"""


# Per-type OLS hourly trend (operators/events.event_trend).  Pins
# restated verbatim (change both sides or neither): the SAME dense
# hour grid as event_anomalies (global [min,max] span, zero hours
# included), x = h - h0, exact BIGINT sums, slope_micro = SIGN-AWARE
# round-half-away of 1e6*(n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) (the k-means
# centroid division rule), mean_micro = rha(1e6*Sy, n), types with
# fewer than 2 grid hours excluded; the raw sums ride as audit
# columns in the gate hash.
_EVENT_TREND_SQL = """WITH b AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h
    FROM events
),
bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM b),
hours AS (SELECT unnest(range(h0, h1 + 1)) AS h FROM bounds),
grid AS (SELECT t.event_type, hrs.h
         FROM (SELECT DISTINCT event_type FROM b) t CROSS JOIN hours hrs),
cnts AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS c
         FROM b GROUP BY 1, 2),
dense AS (
    SELECT g.event_type, g.h - (SELECT h0 FROM bounds) AS x,
           coalesce(c.c, 0) AS y
    FROM grid g LEFT JOIN cnts c ON g.event_type = c.event_type AND g.h = c.h
),
st AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM dense GROUP BY 1
    HAVING count(*) >= 2
)
SELECT event_type, n_hours, sx, sy, sxy, sxx,
       CAST(CASE WHEN (n_hours*sxy - sx*sy) >= 0
            THEN (2*1000000*(n_hours*sxy - sx*sy) + (n_hours*sxx - sx*sx))
                 // (2*(n_hours*sxx - sx*sx))
            ELSE -((2*1000000*(sx*sy - n_hours*sxy) + (n_hours*sxx - sx*sx))
                 // (2*(n_hours*sxx - sx*sx))) END AS BIGINT) AS slope_micro,
       CAST((2*1000000*sy + n_hours) // (2*n_hours) AS BIGINT) AS mean_micro
FROM st
"""


# Session entry/exit types (operators/events.session_entry_exit).
# Inherits event_sessions' pins verbatim (gap 28800 s STRICT >, order
# (us, event_id) NULLS LAST — and NULLS LAST explicitly on the DESC
# window too: DuckDB defaults NULLS FIRST on DESC where Spark defaults
# last); entry/exit = first/last event's type under that total order;
# duration_s = (end - start) integer-DIV 1e6.
_SESSION_ENTRY_EXIT_SQL = """WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           epoch_us(ts) AS us,
           CAST(event_id AS BIGINT) AS eid,
           event_type AS etype
    FROM events
),
flagged AS (
    SELECT *,
           CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 28800000000
                THEN 1 ELSE 0 END AS is_new
    FROM e
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY us ASC NULLS LAST, eid ASC NULLS LAST)
),
marked AS (
    SELECT *,
           CAST(sum(is_new) OVER (
               PARTITION BY user_id
               ORDER BY us ASC NULLS LAST, eid ASC NULLS LAST
               ROWS UNBOUNDED PRECEDING
           ) - 1 AS BIGINT) AS session_idx
    FROM flagged
),
ranked AS (
    SELECT *,
           row_number() OVER (
               PARTITION BY user_id, session_idx
               ORDER BY us ASC NULLS LAST, eid ASC NULLS LAST
           ) AS ra,
           row_number() OVER (
               PARTITION BY user_id, session_idx
               ORDER BY us DESC NULLS LAST, eid DESC NULLS LAST
           ) AS rd
    FROM marked
)
SELECT user_id, session_idx,
       max(CASE WHEN ra = 1 THEN etype END) AS entry_type,
       max(CASE WHEN rd = 1 THEN etype END) AS exit_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_s
FROM ranked GROUP BY 1, 2
"""


_WEIGHTED_SAMPLE_SQL = """WITH base AS (
    SELECT source, CAST(doc_id AS BIGINT) AS id,
           CAST(n_chars AS DOUBLE) AS w
    FROM documents WHERE n_chars > 0
),
keyed AS (
    SELECT source, id, w,
           CAST(round(1000000000000.0 * ln(
               (CAST(CAST(('0x' || substr(md5('wsample-' || CAST(id AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT) AS DOUBLE) + 1.0)
               / 1152921504606846976.0
           ) / w) AS BIGINT) AS key_q
    FROM base
),
ranked AS (
    SELECT source, id, w, key_q,
           CAST(row_number() OVER (
               PARTITION BY source ORDER BY key_q DESC, id ASC
           ) AS BIGINT) AS rank
    FROM keyed
)
SELECT source, id, w, key_q, rank FROM ranked WHERE rank <= 20
"""


def _msm_sql(queries, m: int, k: int) -> str:
    """operators/queryops.msm_topk: min-should-match — a doc qualifies
    with >= least(m, n_required) matching in-lexicon terms (the Lucene
    clamp); scoring/rank = the standard BM25 path."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score,
           count(*) AS nmatch
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
msm AS (
    SELECT sc.* FROM scored sc JOIN nreq r ON sc.qid = r.qid
    WHERE sc.nmatch >= least({m}, r.n_required)
),
ranked AS (
    SELECT qid, docid, round(raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM msm
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
"""


def _synonym_sql(queries, syn_map: dict, k: int) -> str:
    """operators/queryops.synonym_topk: each original term expands to
    itself plus SYN_MAP[t] at its weight; colliding expansions SUM
    their weights; OOV expansions drop like OOV originals."""
    pairs = ", ".join(
        f"('{s}', '{d}')" for s, ds in sorted(syn_map.items()) for d in ds
    )
    return f"""{_PREFIX}, {_query_ctes(queries)},
syn AS (SELECT * FROM (VALUES {pairs}) s(src, dst)),
qexp AS (
    SELECT qid, term, CAST(sum(qtf) AS BIGINT) AS qtf FROM (
        SELECT qid, term, qtf FROM qterms
        UNION ALL
        SELECT qt.qid, s.dst AS term, qt.qtf FROM qterms qt
        JOIN syn s ON qt.term = s.src
    ) GROUP BY 1, 2
),
qx AS (
    SELECT e.qid, e.term, e.qtf, l.df FROM qexp e JOIN lexicon l USING (term)
),
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score
    FROM qx q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
ranked AS (
    SELECT qid, docid, round(raw_score, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
"""


def _conv_maxp_sql(queries, k: int) -> str:
    """operators/bm25f.conv_maxp_topk: max-passage pooling — conv
    score = max member turn's round-6 BM25, best turn = the engine's
    turn-order winner (score desc, docid asc), conv rank (score desc,
    conv_id asc)."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
withconv AS (
    SELECT r.qid, r.docid, r.score, d.conv_id
    FROM ranked r JOIN docs d ON d.docid = r.docid
),
best AS (
    SELECT qid, conv_id, docid, score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid, conv_id ORDER BY score DESC, docid ASC
        ) AS brn FROM withconv
    ) WHERE brn = 1
),
cr AS (
    SELECT qid, conv_id, docid, score,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, conv_id ASC
           ) AS BIGINT) AS rank
    FROM best
)
SELECT qid, conv_id, CAST(docid - 1 AS VARCHAR) AS best_docno, rank, score
FROM cr WHERE rank <= {k}
"""


def _search_after_sql(queries, page: int, k: int) -> str:
    """operators/queryops.search_after_topk: the cursor recursion must
    equal the plain global ranking sliced to the page — the oracle IS
    that slice."""
    lo, hi = (page - 1) * k + 1, page * k
    return f"""{_ranked_ctes(queries, "bm25", False)}
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank BETWEEN {lo} AND {hi}
"""


def _percolate_sql(queries) -> str:
    """operators/percolate.percolate: a stored query matches a doc iff
    EVERY distinct normalized query term occurs in it (conjunctive
    containment in reverse); (doc_id, qid, n_terms) per match."""
    return f"""WITH {_DOC_TOKENS},
q AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qinv AS (
    SELECT DISTINCT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term
    FROM q
),
need AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_terms FROM qinv GROUP BY 1),
dt AS (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM doctoks
),
hit AS (
    SELECT d.doc_id, i.qid, CAST(count(*) AS BIGINT) AS n_have
    FROM dt d JOIN qinv i USING (term)
    GROUP BY 1, 2
)
SELECT CAST(h.doc_id AS BIGINT) AS doc_id, h.qid, n.n_terms
FROM hit h JOIN need n ON n.qid = h.qid
WHERE h.n_have = n.n_terms
"""


def _percolate_scored_sql(queries, k: int = 3) -> str:
    """operators/percolate.percolate_scored: percolate's conjunctive
    containment VERBATIM, matched queries ranked per doc by the exact
    BM25 sum over the DOCUMENTS-corpus stats (N = all docs, avgdl =
    sum(dl)/N, df over the oracle token pipeline); score = sum over
    distinct query terms of qtf * bm25(tf, dl, df), round 6; rank
    (score desc, qid asc) top k = 3."""
    return f"""WITH {_DOC_TOKENS},
q AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qtok AS (
    SELECT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term FROM q
),
qterms AS (
    SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf
    FROM qtok GROUP BY 1, 2
),
need AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_terms FROM qterms GROUP BY 1),
dls AS (
    SELECT doc_id, CAST(len(tokens) AS BIGINT) AS dl FROM doctoks
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
    FROM dls
),
flat AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(tokens) AS term FROM doctoks)
    GROUP BY 1, 2
),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM flat GROUP BY 1),
hit AS (
    SELECT f.doc_id, qt.qid, CAST(count(*) AS BIGINT) AS n_have
    FROM flat f JOIN qterms qt USING (term)
    GROUP BY 1, 2
),
matched AS (
    SELECT h.doc_id, h.qid
    FROM hit h JOIN need n ON n.qid = h.qid
    WHERE h.n_have = n.n_terms
),
scored AS (
    SELECT f.doc_id, qt.qid,
           round(sum(qt.qtf * (
               (f.tf / ((1.5 * (0.3 + (0.7 * (d.dl / s.avgdl)))) + f.tf))
               * log10(s.n_docs / x.df)
           )), 6) AS score
    FROM flat f
    JOIN qterms qt USING (term)
    JOIN dfs x USING (term)
    JOIN dls d ON d.doc_id = f.doc_id
    CROSS JOIN stats s
    JOIN matched m ON m.doc_id = f.doc_id AND m.qid = qt.qid
    GROUP BY 1, 2
)
SELECT doc_id, qid, rank, score FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id, qid,
           CAST(row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, qid ASC
           ) AS BIGINT) AS rank,
           score
    FROM scored
) WHERE rank <= {k}
"""


def _facets_sql(queries) -> str:
    """operators/facets.facet_counts: disjunctive match set (>= 1
    query term in the doc) faceted over source and lang; empty
    buckets emit nothing."""
    return f"""WITH {_DOC_TOKENS},
q AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qinv AS (
    SELECT DISTINCT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term
    FROM q
),
dt AS (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM doctoks
),
matched AS (
    SELECT DISTINCT i.qid, d.doc_id
    FROM dt d JOIN qinv i USING (term)
),
j AS (
    SELECT m.qid, doc.source, doc.lang
    FROM matched m JOIN documents doc ON doc.doc_id = m.doc_id
)
SELECT qid, 'source' AS facet, source AS value,
       CAST(count(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1, 3
UNION ALL
SELECT qid, 'lang' AS facet, lang AS value,
       CAST(count(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1, 3
"""


def _facet_histogram_sql(queries, bin_width: int = 200) -> str:
    """operators/facets.facet_histogram: the numeric range facet.
    Pins restated verbatim (change both sides or neither): match set
    = facet_counts' DISJUNCTIVE rule, bucket = n_chars integer-DIV
    200 (non-negative), empty buckets absent."""
    return f"""WITH {_DOC_TOKENS},
q AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qinv AS (
    SELECT DISTINCT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term
    FROM q
),
dt AS (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM doctoks
),
matched AS (
    SELECT DISTINCT i.qid, d.doc_id
    FROM dt d JOIN qinv i USING (term)
)
SELECT m.qid, CAST(doc.n_chars // {int(bin_width)} AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM matched m JOIN documents doc ON doc.doc_id = m.doc_id
GROUP BY 1, 2
"""


# Stratified per-source sample (operators/curation.stratified_sample).
# Pins restated verbatim (change both sides or neither): key =
# hash60('ssamp-' || doc_id), k = 20 smallest keys per source, pos =
# row_number under (h asc, doc_id asc).
_STRATIFIED_SAMPLE_SQL = """WITH keyed AS (
    SELECT source, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(('0x' || substr(md5('ssamp-' || CAST(doc_id AS VARCHAR)),
                 1, 15))::UBIGINT AS BIGINT) AS h
    FROM documents
),
ranked AS (
    SELECT source, doc_id, h,
           CAST(row_number() OVER (
               PARTITION BY source ORDER BY h ASC, doc_id ASC
           ) AS BIGINT) AS pos
    FROM keyed
)
SELECT source, doc_id, h, pos FROM ranked WHERE pos <= 20
"""


SIGTERMS_K = 10


def _sigterms_sql(queries, k: int) -> str:
    """operators/facets.significant_terms: JLH-scored discovery facet.
    Pins restated verbatim: foreground = the disjunctive match set
    (facet rule), candidates exclude the query's own distinct terms,
    fp = fg_df/F and bp = bg_df/N as ONE double division each, score =
    (fp - bp) * (fp / bp) micro-quantized BIGINT before ranking, only
    micro > 0 rows, N = count(*) over documents, rank (micro desc,
    term asc) top k."""
    return f"""WITH {_DOC_TOKENS},
q AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qinv AS (
    SELECT DISTINCT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term
    FROM q
),
dt AS (
    SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM doctoks
),
bg AS (SELECT term, CAST(count(*) AS BIGINT) AS bg_df FROM dt GROUP BY term),
nstat AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
matched AS (
    SELECT DISTINCT i.qid, d.doc_id
    FROM dt d JOIN qinv i USING (term)
),
fsize AS (SELECT qid, CAST(count(*) AS BIGINT) AS fg_n FROM matched GROUP BY qid),
fg AS (
    SELECT m.qid, d.term, CAST(count(*) AS BIGINT) AS fg_df
    FROM matched m
    JOIN dt d ON d.doc_id = m.doc_id
    WHERE NOT EXISTS (
        SELECT 1 FROM qinv i WHERE i.qid = m.qid AND i.term = d.term
    )
    GROUP BY 1, 2
),
scored AS (
    SELECT f.qid, f.term, f.fg_df, b.bg_df,
           CAST(round((
               (CAST(f.fg_df AS DOUBLE) / CAST(s.fg_n AS DOUBLE)
                - CAST(b.bg_df AS DOUBLE) / t.n)
               * ((CAST(f.fg_df AS DOUBLE) / CAST(s.fg_n AS DOUBLE))
                  / (CAST(b.bg_df AS DOUBLE) / t.n))
           ) * 1000000.0) AS BIGINT) AS micro
    FROM fg f
    JOIN bg b USING (term)
    JOIN fsize s ON s.qid = f.qid
    CROSS JOIN nstat t
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY micro DESC, term ASC
    ) AS rn
    FROM scored WHERE micro > 0
)
SELECT qid, term, fg_df, bg_df,
       round(CAST(micro AS DOUBLE) / 1000000.0, 6) AS score,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {k}
"""


_SIGTERMS_SQL = _sigterms_sql(QUERY_SET, SIGTERMS_K)


# delete-gate rule: docs with docno % 10 == 3 are tombstoned — i.e.
# (docid - 1) % 10 == 3 in the oracle's docid space; restated verbatim
# by the two gate entries (change both sides or neither)
DELETE_MOD, DELETE_REM = 10, 3


def _topk_deleted_sql(queries, standard: str, k: int) -> str:
    """index_store.masked_index_view semantics (Lucene liveDocs):
    deleted docs vanish from candidates/results, every surviving doc's
    SCORE is unchanged (corpus stats stay pre-delete) — so the oracle
    filters the full ranking and re-ranks by the same rounded-score
    tie rule."""
    return f"""{_ranked_ctes(queries, standard, False)},
kept AS (
    SELECT qid, docid, score FROM ranked
    WHERE (docid - 1) % {DELETE_MOD} <> {DELETE_REM}
),
rr AS (
    SELECT qid, docid, score,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM kept
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM rr WHERE rank <= {k}
"""


def _topk_vacuumed_sql(queries, k: int) -> str:
    """index_store.vacuum_index semantics: deleted docs physically
    gone — docids keep their ORIGINAL assignment (no renumber), but
    df/N/avgdl/scores all recompute over the survivors."""
    return f"""
WITH transcripts AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           text
    FROM documents
),
docs0 AS (
    SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) AS BIGINT) AS docid,
           conv_id, turn_idx, text
    FROM transcripts
    WHERE text IS NOT NULL AND trim(text) <> ''
),
docs AS (
    SELECT * FROM docs0 WHERE (docid - 1) % {DELETE_MOD} <> {DELETE_REM}
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
), {_query_ctes(queries)},
scored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score
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
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM ranked WHERE rank <= {k}
"""


def _hybrid_combmnz_sql(probe_ids, k: int, pool: int) -> str:
    """operators/hybrid.hybrid_combmnz_topk: CombMNZ over the same two
    legs as RRF — per-system pool min-max normalization quantized to
    integer micro units (constant pool -> 1e6 for every member), fused
    = n_systems × Σ norm_u, ties (fused desc, doc asc)."""
    ids = ", ".join(str(i) for i in probe_ids)
    norm = (
        "CASE WHEN mx = mn THEN CAST(1000000 AS BIGINT) "
        "ELSE CAST(round(1000000.0 * (s6 - mn) / (mx - mn)) AS BIGINT) END"
    )
    return f"""{_PREFIX},
pq AS (
    SELECT CAST(doc_id AS VARCHAR) AS qid, text AS qtext
    FROM documents WHERE doc_id IN ({ids})
),
qtok AS (
    SELECT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term FROM pq
),
qterms AS (
    SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf FROM qtok GROUP BY qid, term
),
qexist AS (
    SELECT q.qid, q.term, q.qtf, l.df FROM qterms q JOIN lexicon l USING (term)
),
lscored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
lexr AS (
    SELECT qid, docid - 1 AS doc, round(raw_score, 6) AS s6,
           row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS rn
    FROM lscored
    WHERE docid <> CAST(qid AS BIGINT) + 1
),
lexpool AS (SELECT qid, doc, s6 FROM lexr WHERE rn <= {pool}),
lexp AS (
    SELECT qid, doc, {norm} AS cu FROM (
        SELECT qid, doc, s6,
               min(s6) OVER (PARTITION BY qid) AS mn,
               max(s6) OVER (PARTITION BY qid) AS mx
        FROM lexpool
    )
),
dns AS (
    SELECT CAST(p.vec_id AS VARCHAR) AS qid, b.vec_id AS doc,
           {_cos6('p.embedding', 'b.embedding')} AS s6
    FROM embeddings p JOIN embeddings b ON b.vec_id <> p.vec_id
    WHERE p.vec_id IN ({ids})
),
dnsr AS (
    SELECT qid, doc, s6,
           row_number() OVER (
               PARTITION BY qid ORDER BY s6 DESC, doc ASC
           ) AS rn
    FROM dns
),
dnspool AS (SELECT qid, doc, s6 FROM dnsr WHERE rn <= {pool}),
dnsp AS (
    SELECT qid, doc, {norm} AS cu FROM (
        SELECT qid, doc, s6,
               min(s6) OVER (PARTITION BY qid) AS mn,
               max(s6) OVER (PARTITION BY qid) AS mx
        FROM dnspool
    )
),
fused AS (
    SELECT qid, doc,
           CAST(count(*) * sum(cu) AS BIGINT) AS fm
    FROM (SELECT * FROM lexp UNION ALL SELECT * FROM dnsp)
    GROUP BY 1, 2
),
ranked AS (
    SELECT qid, doc, fm,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY fm DESC, doc ASC
           ) AS BIGINT) AS rank
    FROM fused
)
SELECT qid, CAST(doc AS VARCHAR) AS docno, rank,
       round(fm / 1000000.0, 6) AS score
FROM ranked WHERE rank <= {k}
"""


def _clarity_sql(queries, fb_docs: int) -> str:
    """operators/qpp.clarity_scores: Clarity QPP — relevance model
    micro-quantized to BIGINT (wq >= 1 kept), W exact integer
    normalizer, per-term KL contribution in integer micro-log10 units
    with the (wq·CF)/(W·cf) parenthesization (factors to DOUBLE before
    multiplying), S = Σ wq·cq exact, clarity = round(S/(W·1e6), 6)."""
    return f"""{_ranked_ctes(queries, "bm25", False)},
fb AS (SELECT qid, docid, score FROM ranked WHERE rank <= {fb_docs}),
wraw AS (
    SELECT fb.qid, p.term, sum(fb.score * p.tf / dl.doc_len) AS w
    FROM fb
    JOIN postings p ON p.docid = fb.docid
    JOIN doclens dl ON dl.docid = fb.docid
    GROUP BY 1, 2
),
wq AS (
    SELECT * FROM (
        SELECT qid, term, CAST(round(1000000.0 * w) AS BIGINT) AS wq
        FROM wraw
    ) WHERE wq >= 1
),
wtot AS (
    SELECT qid, CAST(sum(wq) AS BIGINT) AS w_total,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM wq GROUP BY 1
),
cft AS (SELECT CAST(sum(cf) AS BIGINT) AS cf_total FROM lexicon),
contrib AS (
    SELECT w.qid,
           w.wq * CAST(round(1000000.0 * log10(
               (CAST(w.wq AS DOUBLE) * CAST(c.cf_total AS DOUBLE))
               / (CAST(t.w_total AS DOUBLE) * CAST(l.cf AS DOUBLE))
           )) AS BIGINT) AS c
    FROM wq w
    JOIN lexicon l USING (term)
    JOIN wtot t ON t.qid = w.qid
    CROSS JOIN cft c
)
SELECT s.qid, t.n_terms, t.w_total,
       round(CAST(s.s AS DOUBLE)
             / (CAST(t.w_total AS DOUBLE) * 1000000.0), 6) AS clarity
FROM (SELECT qid, CAST(sum(c) AS BIGINT) AS s FROM contrib GROUP BY 1) s
JOIN wtot t ON t.qid = s.qid
"""


def _vsm_topk_sql(queries, k: int) -> str:
    """operators/mlt.vsm_cosine_topk: classic VSM cosine — query AND
    doc tf-idf vectors micro-quantized with the rocchio weight form
    (query side tf = qtf), exact BIGINT dots, one IEEE sqrt per norm,
    score = round(dot / (qnrm * dnrm), 6), rank (score desc, docid
    asc), OOV query terms dropped via the lexicon join."""
    return f"""{_PREFIX}, {_query_ctes(queries)},
qv AS (
    SELECT q.qid, q.term,
           CAST(round(1000000.0 * (1 + log10(q.qtf))
                      * log10(s.n_docs / l.df)) AS BIGINT) AS wq
    FROM qexist q JOIN lexicon l USING (term) CROSS JOIN stats s
),
qn AS (
    SELECT qid, sqrt(CAST(sum(wq * wq) AS DOUBLE)) AS qnrm
    FROM qv GROUP BY 1
),
dv AS (
    SELECT p.docid, p.term,
           CAST(round(1000000.0 * (1 + log10(p.tf))
                      * log10(s.n_docs / l.df)) AS BIGINT) AS wd
    FROM postings p JOIN lexicon l USING (term) CROSS JOIN stats s
),
dn AS (
    SELECT docid, sqrt(CAST(sum(wd * wd) AS DOUBLE)) AS dnrm
    FROM dv GROUP BY 1
),
dots AS (
    SELECT q.qid, d.docid, CAST(sum(d.wd * q.wq) AS BIGINT) AS dot
    FROM dv d JOIN qv q USING (term)
    GROUP BY 1, 2
),
vscored AS (
    SELECT t.qid, t.docid,
           round(CAST(t.dot AS DOUBLE) / (qn.qnrm * dn.dnrm), 6) AS score
    FROM dots t
    JOIN qn ON qn.qid = t.qid
    JOIN dn ON dn.docid = t.docid
),
vranked AS (
    SELECT qid, docid, score,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM vscored
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank, score
FROM vranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _mlt_sql(probe_docnos: list[int], k: int) -> str:
    """operators/mlt.more_like_this: lexical tf-idf cosine — vectors
    micro-quantized per (doc, term) exactly like rocchio (BIGINT dot
    products), norms one IEEE sqrt per doc, cos = dot/(pn·n) round 6,
    probe excluded, rank (cos desc, docid asc)."""
    pids = ", ".join(str(int(d) + 1) for d in probe_docnos)
    return f"""{_PREFIX},
vec AS (
    SELECT p.docid, p.term,
           CAST(round(1000000.0 * (1 + log10(p.tf))
                      * log10(s.n_docs / l.df)) AS BIGINT) AS wq
    FROM postings p JOIN lexicon l USING (term) CROSS JOIN stats s
),
norms AS (
    SELECT docid, sqrt(CAST(sum(wq * wq) AS DOUBLE)) AS nrm
    FROM vec GROUP BY 1
),
probes AS (
    SELECT docid AS pid, term, wq AS pwq FROM vec WHERE docid IN ({pids})
),
dots AS (
    SELECT pr.pid, v.docid, CAST(sum(v.wq * pr.pwq) AS BIGINT) AS dot
    FROM vec v JOIN probes pr USING (term)
    WHERE v.docid <> pr.pid
    GROUP BY 1, 2
),
mscored AS (
    SELECT d.pid, d.docid,
           round(CAST(d.dot AS DOUBLE) / (pn.nrm * n.nrm), 6) AS cos
    FROM dots d
    JOIN norms pn ON pn.docid = d.pid
    JOIN norms n ON n.docid = d.docid
),
mranked AS (
    SELECT pid, docid, cos,
           CAST(row_number() OVER (
               PARTITION BY pid ORDER BY cos DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM mscored
)
SELECT CAST(pid - 1 AS VARCHAR) AS probe_docno,
       CAST(docid - 1 AS VARCHAR) AS docno, rank, cos
FROM mranked WHERE rank <= {k}
"""


def _bm25f_sql(queries, k: int) -> str:
    """operators/bm25f.bm25f_topk: field-weighted PASSAGE BM25 —
    passages = contiguous 3-turn windows (starts 0..5; a start exists
    iff ≥1 member turn exists), tfw/dlw are exact integer
    field-weighted sums (w=2 for assistant turns, doc_id%4==1, the
    transcripts-source law), the saturation restates scoring.BM25's
    exact parenthesization on passage stats (df = passages containing
    the term, N = passage count, avgdl = Σ dlw / N); rank (round 6
    desc, conv_id asc, w_start asc)."""
    return f"""WITH transcripts AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           text
    FROM documents
),
docs AS (
    SELECT doc_id, conv_id, turn_idx, text FROM transcripts
    WHERE text IS NOT NULL AND trim(text) <> ''
),
wtok AS (
    SELECT conv_id, turn_idx,
           CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS w,
           {_TOKENS_EXPR.format(col='text')} AS tokens
    FROM docs
),
member AS (
    SELECT conv_id, w, tokens,
           unnest(range(greatest(0, turn_idx - 2),
                        least(5, turn_idx) + 1)) AS ws
    FROM wtok
),
plen AS (
    SELECT conv_id, ws, CAST(sum(w * len(tokens)) AS BIGINT) AS dlw
    FROM member GROUP BY 1, 2
),
ppost AS (
    SELECT conv_id, ws, term, CAST(sum(w) AS BIGINT) AS tfw
    FROM (SELECT conv_id, ws, w, unnest(tokens) AS term FROM member)
    GROUP BY 1, 2, 3
),
plex AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM ppost GROUP BY 1),
pstats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_pass,
           CAST(sum(dlw) AS DOUBLE) / count(*) AS avgdlw
    FROM plen
),
queries AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qtok AS (
    SELECT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term FROM queries
),
qterms AS (
    SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf FROM qtok GROUP BY 1, 2
),
qexist AS (
    SELECT q.qid, q.term, q.qtf, l.df FROM qterms q JOIN plex l USING (term)
),
scored AS (
    SELECT q.qid, p.conv_id, p.ws,
           sum(q.qtf * ((p.tfw / ((1.5 * (0.3 + (0.7 * (dl.dlw / s.avgdlw))))
                                  + p.tfw))
                        * log10(s.n_pass / q.df))) AS raw
    FROM qexist q
    JOIN ppost p USING (term)
    JOIN plen dl ON p.conv_id = dl.conv_id AND p.ws = dl.ws
    CROSS JOIN pstats s
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT qid, conv_id, CAST(ws AS BIGINT) AS w_start,
           round(raw, 6) AS score,
           CAST(row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw, 6) DESC, conv_id ASC, ws ASC
           ) AS BIGINT) AS rank
    FROM scored
)
SELECT qid, conv_id, w_start, rank, score FROM ranked WHERE rank <= {k}
"""


def _regex_topk_sql(patterns: list[tuple[str, str]], k: int) -> str:
    """operators/substring.regex_topk: n_hits = len(regexp_extract_all)
    — both engines count non-overlapping left-to-right matches; the
    pattern set (oracle.REGEX_SET) stays inside the Java/RE2-common
    subset; rank (n_hits desc, id asc)."""
    branches = "\n    UNION ALL\n    ".join(
        f"SELECT '{qid}' AS qid, doc_id AS id,"
        f" CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_hits"
        f" FROM documents"
        for qid, pat in patterns
    )
    return f"""WITH m AS (
    {branches}
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY n_hits DESC, id ASC
    ) AS rn
    FROM m WHERE n_hits >= 1
)
SELECT qid, CAST(id AS BIGINT) AS id, n_hits, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {k}
"""


def _substring_topk_sql(patterns: list[tuple[str, str]], k: int) -> str:
    """operators/substring.substring_topk: literal RAW-text containment
    ranked by NON-overlapping occurrence count ((len − len(replace)) /
    len(pat) — identical arithmetic on both engines); rank = (n_hits
    desc, id asc), top k.  The oracle is the direct contains() scan —
    the engine's rarest-trigram candidate prune is exact by
    construction (containment implies containing every trigram), so no
    prune parameter appears here."""
    branches = []
    for qid, pat in patterns:
        esc = pat.replace("'", "''")
        branches.append(
            f"""    SELECT '{qid}' AS qid, CAST(doc_id AS BIGINT) AS id,
           CAST((len(text) - len(replace(text, '{esc}', '')))
                // {len(pat)} AS BIGINT) AS n_hits
    FROM documents WHERE contains(text, '{esc}')"""
        )
    union = "\n    UNION ALL\n".join(branches)
    return f"""WITH m AS (
{union}
)
SELECT qid, id, n_hits,
       CAST(row_number() OVER (
           PARTITION BY qid ORDER BY n_hits DESC, id ASC) AS BIGINT) AS rank
FROM m
QUALIFY rank <= {k}
"""


def _phrase_topk_sql(phrases: list[tuple[str, str]], k: int) -> str:
    """operators/phrase.phrase_topk: exact (overlap-counting) phrase
    occurrence counts via n-gram equality, one branch per distinct
    phrase length; rank = (n_hits desc, id asc), top k.  The phrase
    list is pinned HERE (oracle.PHRASE_SET, beside QUERY_SET/PROBE_IDS;
    strings already normalized) and passed to both engines."""
    by_n: dict[int, list[tuple[str, str]]] = {}
    for qid, p in phrases:
        toks = p.split(" ")
        by_n.setdefault(len(toks), []).append((qid, p))
    ctes, branches = [], []
    for n, plist in sorted(by_n.items()):
        ctes.append(
            f"""g{n} AS (
    SELECT doc_id AS id,
           unnest(list_transform(
               range(0, greatest(len(tokens) - {n - 1}, 0)),
               i -> list_aggregate(tokens[i+1:i+{n}], 'string_agg', ' ')
           )) AS gram
    FROM doctoks
)"""
        )
        branches.append(
            f"""SELECT p.qid, g.id, CAST(count(*) AS BIGINT) AS n_hits
    FROM g{n} g JOIN {_values(plist)} p(qid, gram) ON g.gram = p.gram
    GROUP BY 1, 2"""
        )
    union = "\n    UNION ALL\n    ".join(branches)
    return f"""WITH {_DOC_TOKENS},
{', '.join(ctes)},
m AS (
    {union}
)
SELECT qid, CAST(id AS BIGINT) AS id, n_hits,
       CAST(row_number() OVER (
           PARTITION BY qid ORDER BY n_hits DESC, id ASC) AS BIGINT) AS rank
FROM m
QUALIFY rank <= {k}
"""


def _dup_spans_sql(n: int) -> str:
    """dedup.dup_span_stats: a position is duplicated iff its n-gram
    window occurs >= 2 times corpus-wide (every position counted,
    within-doc repeats included); overlapping/adjacent windows merge
    into maximal spans (island break ONLY on a strict gap,
    pos > prev_max_end + 1).  n pinned to dedup.DUPSPAN_N — change
    both sides or neither.  Zero-token docs emit no row; docs shorter
    than n emit zero spans."""
    return f"""WITH {_DOC_TOKENS},
gp AS (
    SELECT doc_id AS id,
           unnest(list_transform(
               range(0, greatest(len(tokens) - {n - 1}, 0)),
               i -> list_aggregate(tokens[i+1:i+{n}], 'string_agg', ' ')
           )) AS gram,
           generate_subscripts(list_transform(
               range(0, greatest(len(tokens) - {n - 1}, 0)), i -> i), 1)
               AS pos
    FROM doctoks
),
dup AS (SELECT gram FROM gp GROUP BY gram HAVING count(*) >= 2),
hits AS (
    SELECT id, pos, pos + {n} - 1 AS e
    FROM gp JOIN dup USING (gram)
),
isl AS (
    SELECT id, pos, e,
           CASE WHEN pos > coalesce(max(e) OVER (
                    PARTITION BY id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                THEN 1 ELSE 0 END AS brk
    FROM hits
),
grp AS (
    SELECT id, pos, e,
           sum(brk) OVER (PARTITION BY id ORDER BY pos) AS g
    FROM isl
),
spans AS (SELECT id, g, min(pos) AS s, max(e) AS e FROM grp GROUP BY id, g),
perdoc AS (
    SELECT id, CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY id
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       CAST(len(d.tokens) AS BIGINT) AS n_tokens,
       coalesce(p.n_spans, 0) AS n_spans,
       coalesce(p.dup_tokens, 0) AS dup_tokens,
       round(coalesce(p.dup_tokens, 0) / CAST(len(d.tokens) AS DOUBLE), 6)
           AS dup_ratio
FROM doctoks d LEFT JOIN perdoc p ON d.doc_id = p.id
WHERE len(d.tokens) > 0
"""


def _kmeans_ctes(k: int, iters: int, micro: int) -> str:
    """Unrolled Lloyd iterations for operators/clustering.kmeans_assign
    — all-integer state, restating the operator's pinned rules verbatim
    (change both sides or neither): micro-quantized components
    (round(x*1e6) as BIGINT — a float32 times 1e6 can never land
    exactly on .5, so half-away here and HALF_UP in Spark agree),
    init = k lowest-id vectors with cid = ascending-id index, exact
    BIGINT squared distances, argmin tie -> lowest cid, centroid update
    = sign-aware round-half-away integer division, empty cluster ->
    centroid unchanged."""
    parts = [
        f"""WITH q AS (
    SELECT vec_id AS id,
           list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {micro}) AS BIGINT)) AS qv
    FROM embeddings
),
c0 AS (
    SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS BIGINT) AS cid, qv AS cv
    FROM q ORDER BY id LIMIT {k}
)"""
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(
            f""",
a{i} AS (
    SELECT id, cid, d2 FROM (
        SELECT q.id, {prev}.cid,
               list_sum(list_transform(range(1, len(q.qv) + 1),
                   j -> (q.qv[j] - {prev}.cv[j]) * (q.qv[j] - {prev}.cv[j])))
                   AS d2
        FROM q CROSS JOIN {prev}
    ) QUALIFY row_number() OVER (PARTITION BY id ORDER BY d2, cid) = 1
)"""
        )
        if i < iters:
            parts.append(
                f""",
s{i} AS (
    SELECT cid, j, CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT a.cid, unnest(q.qv) AS v, generate_subscripts(q.qv, 1) AS j
        FROM a{i} a JOIN q ON a.id = q.id
    ) GROUP BY 1, 2
),
u{i} AS (
    SELECT cid,
           list(CASE WHEN s >= 0 THEN (2 * s + n) // (2 * n)
                     ELSE -((-2 * s + n) // (2 * n)) END
                ORDER BY j) AS cv
    FROM s{i} GROUP BY cid
),
c{i} AS (
    SELECT p.cid, coalesce(u.cv, p.cv) AS cv
    FROM {prev} p LEFT JOIN u{i} u ON p.cid = u.cid
)"""
            )
    return "".join(parts)


def _kmeans_sql(k: int, iters: int, micro: int) -> str:
    return (
        _kmeans_ctes(k, iters, micro)
        + f"""
SELECT CAST(id AS BIGINT) AS id, CAST(cid AS BIGINT) AS cluster,
       CAST(d2 AS BIGINT) AS d2
FROM a{iters}
"""
    )


def _semdedup_sql(k: int, iters: int, micro: int, tau: float) -> str:
    """clustering.semdedup_keep: drop id iff a LOWER id in the SAME
    final cluster has cos6 >= tau with it; cos6 is the shared round-6
    cosine, so boundary ties agree by construction."""
    return (
        _kmeans_ctes(k, iters, micro)
        + f""",
fin AS (SELECT id, cid FROM a{iters}),
dropped AS (
    SELECT DISTINCT b.id AS id
    FROM fin a JOIN fin b ON a.cid = b.cid AND a.id < b.id
    JOIN embeddings ea ON ea.vec_id = a.id
    JOIN embeddings eb ON eb.vec_id = b.id
    WHERE {_cos6('ea.embedding', 'eb.embedding')} >= {tau}
)
SELECT CAST(f.id AS BIGINT) AS id, CAST(f.cid AS BIGINT) AS cluster,
       (d.id IS NULL) AS keep
FROM fin f LEFT JOIN dropped d ON f.id = d.id
"""
    )


_EMBED_NEAR_DUP_SQL = f"""WITH base AS (
    SELECT vec_id AS id, embedding AS v,
           sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
    FROM embeddings
)
SELECT a.id AS id_a, b.id AS id_b,
       round(
         list_sum(list_transform(range(1, len(a.v) + 1),
             i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
         / (a.n * b.n), 6) AS cos
FROM base a JOIN base b ON a.id < b.id
WHERE round(
          list_sum(list_transform(range(1, len(a.v) + 1),
              i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))
          / (a.n * b.n), 6) >= {COSINE_DUP_THRESHOLD}
"""


# Streaming exact dedup: restate the gate entry's deterministic dup
# injection (every 3rd non-blank turn -> one of 5 seed strings), the
# normalized-md5 fingerprint, and the winner rule (minimum doc key per
# fingerprint — batch-boundary-invariant because the harness feeds
# conv-ordered epochs; see streaming/dedup_stream.py determinism
# contract).
_STREAMING_DEDUP_SQL = f"""WITH base AS (
    SELECT doc_id,
           'conv-' || lpad(CAST(CAST(doc_id // 8 AS BIGINT) AS VARCHAR), 12, '0') AS conv_id,
           CAST(doc_id % 8 AS INTEGER) AS turn_idx,
           CASE WHEN doc_id % 3 = 1
                THEN 'duplicate seed text number ' || CAST(doc_id % 5 AS VARCHAR)
                ELSE text END AS text
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
),
f AS (
    SELECT doc_id, conv_id, turn_idx,
           md5(array_to_string({_TOKENS_EXPR.format(col='text')}, ' ')) AS fp
    FROM base
)
SELECT conv_id, turn_idx, fp,
       doc_id > min(doc_id) OVER (PARTITION BY fp) AS is_dup
FROM f
"""


TRAINING_QUALITY_FLOOR = 0.8
TRAINING_KEEP_LANG = "en"


def _training_corpus_sql() -> str:
    """Composite pipeline verdict: dedup keep-list (recursive-CTE
    closure over the exhaustive jaccard pair graph — the same
    exhaustive restatement the minhash/keep-list entries use), language
    pred, quality score, and BPE estimate joined per doc, with the
    duplicate > language > quality drop priority."""
    hits = ",\n           ".join(
        "CAST(len(list_filter(tokens, t -> t IN ({}))) AS BIGINT) AS h_{}".format(
            ", ".join(f"'{w}'" for w in _LANGS[lg]), lg
        )
        for lg in _LANG_ORDER
    )
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in _LANG_ORDER) + ")"
    pred = "CASE WHEN {b} = 0 THEN 'unknown' ".format(b=best) + " ".join(
        f"WHEN h_{lg} = {best} THEN '{lg}'" for lg in _LANG_ORDER
    ) + " END"
    return f"""WITH RECURSIVE {_DOC_TOKENS}, {_SHINGLES},
inter AS (
    SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
    GROUP BY 1, 2
),
dup_pairs AS (
    SELECT i.id_a, i.id_b
    FROM inter i
    JOIN shsizes sa ON i.id_a = sa.id
    JOIN shsizes sb ON i.id_b = sb.id
    WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= {JACCARD_THRESHOLD}
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM dup_pairs
    UNION
    SELECT id_b AS src, id_a AS dst FROM dup_pairs
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
    SELECT src AS id, least(src, min(dst)) AS component
    FROM reach GROUP BY src
),
keepl AS (
    SELECT CAST(d.doc_id AS BIGINT) AS id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS component,
           coalesce(c.component, d.doc_id) = d.doc_id AS keep
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
),
langp AS (
    SELECT id, {pred} AS lang_pred
    FROM (SELECT doc_id AS id, {hits} FROM doctoks)
),
qm AS (
    SELECT doc_id AS id,
           CAST(len(tokens) AS BIGINT) AS n,
           coalesce(list_sum(list_transform(tokens, t -> length(t))), 0) AS tok_chars,
           coalesce(list_sum(list_transform(tokens,
               t -> length(regexp_replace(t, '[^0-9]', '', 'g')))), 0) AS digit_chars,
           len(list_filter(tokens, t -> t IN ({_QS_STOPS_SQL}))) AS stop_hits,
           CAST(coalesce(list_sum(list_transform(tokens,
               x -> CAST(ceil(length(x) / 4) AS INTEGER))), 0) AS BIGINT) AS bpe_est
    FROM doctoks
),
qr AS (
    SELECT id, bpe_est,
           CASE WHEN n > 0 THEN tok_chars / CAST(n AS DOUBLE) ELSE 0.0 END AS mean_len,
           CASE WHEN tok_chars > 0 THEN digit_chars / CAST(tok_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
           CASE WHEN n > 0 THEN stop_hits / CAST(n AS DOUBLE) ELSE 0.0 END AS stop_ratio,
           n
    FROM qm
),
qs AS (
    SELECT id, bpe_est,
           round(0.4 * least(CAST(n AS DOUBLE) / 20.0, 1.0)
               + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1.0 ELSE 0.0 END)
               + 0.2 * (1.0 - digit_ratio)
               + 0.2 * least(stop_ratio * 5.0, 1.0), 6) AS quality
    FROM qr
),
verdict AS (
    SELECT k.id, k.component, l.lang_pred, q.quality, q.bpe_est,
           CASE WHEN NOT k.keep THEN 'duplicate'
                WHEN l.lang_pred <> '{TRAINING_KEEP_LANG}' THEN 'language'
                WHEN q.quality < {TRAINING_QUALITY_FLOOR} THEN 'quality'
                ELSE 'ok' END AS status
    FROM keepl k JOIN langp l ON k.id = l.id JOIN qs q ON k.id = q.id
)
SELECT id, component, lang_pred, quality, bpe_est, status,
       status = 'ok' AS kept
FROM verdict
"""


# ---------------------------------------------------------------------------
# curation operators (operators/curation.py): decontamination,
# repetition stats, PII scrubbing, domain-mix sampling
# ---------------------------------------------------------------------------

DECON_BENCH_MOD = 29  # benchmark docs: doc_id % 29 == 5
DECON_BENCH_SEL = 5
DECON_SLICE_START = 11  # 1-based token slice [11..22] feeds the benchmark
DECON_SLICE_LEN = 12


def _grams_expr(tokens: str, n: int) -> str:
    """DuckDB expression for the ORDERED word n-gram list over a token
    list column (duplicates kept) — mirrors textnorm.grams_col."""
    parts = " || ' ' || ".join(f"{tokens}[i+{j + 1}]" for j in range(n))
    return (
        f"list_transform(range(0, greatest(len({tokens}) - {n - 1}, 0)), "
        f"i -> {parts})"
    )


# decontamination: benchmark = token slice [11..22] of every doc with
# doc_id % 29 == 5 (the gate entry derives the same probe set);
# contaminated = any shared distinct 8-gram with any benchmark text
_DECONTAMINATE_SQL = f"""WITH {_DOC_TOKENS},
bench AS (
    SELECT tokens[{DECON_SLICE_START}:{DECON_SLICE_START + DECON_SLICE_LEN - 1}] AS btoks
    FROM doctoks WHERE doc_id % {DECON_BENCH_MOD} = {DECON_BENCH_SEL}
),
bsh AS (
    SELECT DISTINCT unnest({_grams_expr('btoks', 8)}) AS gram FROM bench
),
dsh AS (
    SELECT doc_id AS id, unnest(list_distinct({_grams_expr('tokens', 8)})) AS gram
    FROM doctoks
),
hits AS (
    SELECT id, CAST(count(*) AS BIGINT) AS contam_hits
    FROM dsh JOIN bsh USING (gram) GROUP BY id
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       coalesce(h.contam_hits, 0) AS contam_hits,
       coalesce(h.contam_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.id
"""


# Gopher repetition filters: top-bigram occupancy + repeated-trigram
# fraction; zero-gram docs report 0.0 (same guards as the Spark op)
_REPETITION_SQL = f"""WITH {_DOC_TOKENS},
g2 AS (
    SELECT doc_id, unnest({_grams_expr('tokens', 2)}) AS gram FROM doctoks
),
cnt2 AS (SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY 1, 2),
agg2 AS (
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS total2, max(c) AS top2
    FROM cnt2 GROUP BY doc_id
),
t3 AS (
    SELECT doc_id,
           len({_grams_expr('tokens', 3)}) AS total3,
           len(list_distinct({_grams_expr('tokens', 3)})) AS d3
    FROM doctoks
)
SELECT CAST(t.doc_id AS BIGINT) AS id,
       coalesce(a.total2, 0) AS n_2grams,
       round(CASE WHEN coalesce(a.total2, 0) > 0
                  THEN a.top2 / CAST(a.total2 AS DOUBLE) ELSE 0.0 END, 6) AS top_2gram_frac,
       round(CASE WHEN t3.total3 > 0
                  THEN 1.0 - t3.d3 / CAST(t3.total3 AS DOUBLE) ELSE 0.0 END, 6) AS dup_3gram_frac
FROM doctoks t
LEFT JOIN agg2 a ON t.doc_id = a.doc_id
JOIN t3 ON t.doc_id = t3.doc_id
"""


# PII scrub: the gate entry injects deterministic PII (restated verbatim
# below — change both sides or neither); patterns are RE2-safe and
# applied in the same order (email -> IP -> phone), counts measured on
# the pre-scrub text.  Pattern strings MUST stay identical to
# operators/curation.PII_STAGES.
_PII_EMAIL_SQL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IPV4_SQL = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
_PII_PHONE_SQL = "\\+[0-9]{8,15}"

_PII_SCRUB_SQL = f"""WITH injected AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 7 = 2
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                   ELSE '' END
           || CASE WHEN doc_id % 11 = 3
                   THEN ' call +1415555' || CAST(doc_id % 1000 AS VARCHAR)
                   ELSE '' END
           || CASE WHEN doc_id % 13 = 4
                   THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 up'
                   ELSE '' END AS text
    FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL_SQL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_IPV4_SQL}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE_SQL}')) AS BIGINT) AS n_phones,
       regexp_replace(
           regexp_replace(
               regexp_replace(text, '{_PII_EMAIL_SQL}', '<EMAIL>', 'g'),
               '{_PII_IPV4_SQL}', '<IP>', 'g'),
           '{_PII_PHONE_SQL}', '<PHONE>', 'g') AS clean_text
FROM injected
"""


# domain-mix sampling: rate(srcK) = (K % 5) / 4 — the gate entry derives
# the same dict from the distinct sources; keep iff the md5-derived
# 60-bit key mod 1e6 clears the per-domain bar
_DOMAIN_MIX_SQL = """SELECT
    CAST(doc_id AS BIGINT) AS id,
    source AS domain,
    round((CAST(substr(source, 4) AS INT) % 5) / 4.0, 6) AS rate,
    CAST(('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
         AS BIGINT) % 1000000 AS sample_key,
    CAST(('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
         AS BIGINT) % 1000000
      < CAST(round(((CAST(substr(source, 4) AS INT) % 5) / 4.0) * 1000000) AS BIGINT)
      AS kept
FROM documents
"""


# Real-decode multimodal gate: restate generate_ppm_media's md5 byte
# stream (48 chunks of 16 bytes keyed 'ppm-<id>-<seed>-<chunk>') and
# recompute each 8th-strip byte sum directly from the hex digits.  The
# Spark side decodes the SAME bytes through the binary P6 parser in
# mapInPandas and maps each float32 strip mean back to its integer sum
# (sum = feature * 96 * 255 is injective at float32 precision), so a
# header mis-parse, strip-axis mixup, or channel reorder breaks the
# hash.  Constants pinned to multimodal.py: 16x16 RGB -> 768 raster
# bytes, 13-byte header, FEATURE_DIM=8 strips of 96 bytes.
_PPM_FEATURES_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('ppm-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_PPM_MEDIA}) ids CROSS JOIN range(48) r
),
bytes AS (
    SELECT id, (r * 16 + b.range) AS pos,
           16 * (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 1 AS INTEGER), 1)) - 1)
              + (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 2 AS INTEGER), 1)) - 1)
           AS val
    FROM chunks CROSS JOIN range(16) b
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(781 AS BIGINT) AS n_bytes,
       CAST(pos // 96 AS INTEGER) AS strip,
       CAST(sum(val) AS BIGINT) AS strip_sum
FROM bytes
GROUP BY id, pos // 96
ORDER BY media_id, strip
"""


# Per-channel color histogram (operators/multimodal.ppm_color_histogram).
# Pins restated verbatim (change both sides or neither): channel =
# raster byte pos % 3 (RGB order), bucket = value DIV 32 (8 buckets),
# exact counts, empty buckets absent.
_PPM_HIST_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('ppm-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_PPM_MEDIA}) ids CROSS JOIN range(48) r
),
bytes AS (
    SELECT id, (r * 16 + b.range) AS pos,
           16 * (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 1 AS INTEGER), 1)) - 1)
              + (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 2 AS INTEGER), 1)) - 1)
           AS val
    FROM chunks CROSS JOIN range(16) b
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(pos % 3 AS INTEGER) AS channel,
       CAST(val // 32 AS INTEGER) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM bytes
GROUP BY 1, 2, 3
"""


# Perceptual average-hash image near-dup pairs
# (operators/multimodal.image_ahash_pairs).  Pins restated verbatim
# (change both sides or neither): per-pixel RGB byte sum, 8x8 cell
# grid over the 16x16 matrix (cell = (row//2)*8 + col//2, row-major),
# bit rule 64 * cell_sum > total STRICT, signature split (hi, lo)
# 32-bit halves, pairs id_a < id_b with hamming dist <= 7.
_AHASH_PAIRS_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('ppm-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_PPM_MEDIA}) ids CROSS JOIN range(48) r
    UNION ALL
    SELECT 1000 + ids.range, r.range,
           CASE WHEN r.range = 0
                THEN md5('ppm-mut-' || ids.range || '-42-' || r.range)
                ELSE md5('ppm-' || ids.range || '-42-' || r.range) END
    FROM range({N_PPM_MEDIA}) ids CROSS JOIN range(48) r
),
bytes AS (
    SELECT id, (r * 16 + b.range) AS pos,
           16 * (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 1 AS INTEGER), 1)) - 1)
              + (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 2 AS INTEGER), 1)) - 1)
           AS val
    FROM chunks CROSS JOIN range(16) b
),
cells AS (
    SELECT id,
           ((pos // 3) // 16) // 2 * 8 + ((pos // 3) % 16) // 2 AS cell,
           val
    FROM bytes
),
cs AS (
    SELECT id, cell, CAST(sum(val) AS BIGINT) AS s
    FROM cells GROUP BY 1, 2
),
tot AS (SELECT id, CAST(sum(val) AS BIGINT) AS t FROM bytes GROUP BY 1),
bits AS (
    SELECT cs.id, cs.cell,
           CASE WHEN 64 * cs.s > tot.t THEN 1 ELSE 0 END AS b
    FROM cs JOIN tot USING (id)
),
sigs AS (
    SELECT id,
           CAST(sum(CASE WHEN cell >= 32
                         THEN CAST(b AS BIGINT) << CAST(cell - 32 AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CASE WHEN cell < 32
                         THEN CAST(b AS BIGINT) << CAST(cell AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS lo
    FROM bits GROUP BY 1
)
SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
            AS BIGINT) AS dist
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 7
"""


_PPM_RESIZE_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('ppm-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_PPM_MEDIA}) ids CROSS JOIN range(48) r
),
bytes AS (
    SELECT id, (r * 16 + b.range) AS pos,
           16 * (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 1 AS INTEGER), 1)) - 1)
              + (strpos('0123456789abcdef', substr(hx, CAST(2 * b.range + 2 AS INTEGER), 1)) - 1)
           AS val
    FROM chunks CROSS JOIN range(16) b
),
kept AS (
    SELECT id, pos % 3 AS chan, val
    FROM bytes
    WHERE ((pos // 3) // 16) % 2 = 0 AND ((pos // 3) % 16) % 2 = 0
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
       CAST(sum(CASE WHEN chan = 0 THEN val ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN chan = 1 THEN val ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN chan = 2 THEN val ELSE 0 END) AS BIGINT) AS sum_b
FROM kept GROUP BY id
"""


# Real audio-decode gate: restate generate_wav_media's md5 PCM stream
# (64 chunks of 16 bytes keyed 'wav-<id>-<seed>-<chunk>' = 512 s16le
# mono samples) and recompute each 8th-strip SIGNED sample sum from the
# hex digits (little-endian pair, two's complement).  The Spark side
# decodes the SAME bytes through the real RIFF walker in mapInPandas
# and maps each float32 strip mean back to its integer sum
# (sum = mean*64*32768; /2^21 is exact at float32 over 64-sample
# strips), so a chunk-walk bug, endianness flip, or sign mistake breaks
# the hash.  Constants pinned to multimodal.py: WAV_SAMPLES=512,
# 44-byte header, FEATURE_DIM=8 strips of 64 samples.
def _hexbyte(hx: str, pos1: str) -> str:
    """SQL for the byte value at 1-based hex-digit position `pos1`."""
    return (
        f"16 * (strpos('0123456789abcdef', substr({hx}, CAST({pos1} AS INTEGER), 1)) - 1)"
        f" + (strpos('0123456789abcdef', substr({hx}, CAST({pos1} + 1 AS INTEGER), 1)) - 1)"
    )


_WAV_FEATURES_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('wav-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_WAV_MEDIA}) ids CROSS JOIN range(64) r
),
samples AS (
    SELECT id, (r * 8 + s.range) AS pos,
           ({_hexbyte('hx', '4 * s.range + 1')})
           + 256 * ({_hexbyte('hx', '4 * s.range + 3')}) AS uval
    FROM chunks CROSS JOIN range(8) s
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(1068 AS BIGINT) AS n_bytes,
       CAST(pos // 64 AS INTEGER) AS strip,
       CAST(sum(CASE WHEN uval >= 32768 THEN uval - 65536 ELSE uval END) AS BIGINT)
           AS strip_sum
FROM samples
GROUP BY id, pos // 64
ORDER BY media_id, strip
"""


# Voice-activity segmentation (operators/multimodal.wav_energy_segments).
# Pins restated verbatim (change both sides or neither): energy frames
# = the fingerprint gate's 16-sample |.| sums, active iff e > 250000
# STRICT, segments = maximal runs of consecutive active frames,
# seg_idx 1-based by start, energy_sum exact BIGINT.
_WAV_SEGMENTS_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('wav-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_WAV_MEDIA}) ids CROSS JOIN range(64) r
),
samples AS (
    SELECT id, (r * 8 + s.range) AS pos,
           ({_hexbyte('hx', '4 * s.range + 1')})
           + 256 * ({_hexbyte('hx', '4 * s.range + 3')}) AS uval
    FROM chunks CROSS JOIN range(8) s
),
fe AS (
    SELECT id, pos // 16 AS frame,
           CAST(sum(abs(CASE WHEN uval >= 32768 THEN uval - 65536
                             ELSE uval END)) AS BIGINT) AS e
    FROM samples GROUP BY 1, 2
),
act AS (
    SELECT id, frame, e FROM fe WHERE e > 250000
),
isl AS (
    SELECT id, frame, e,
           CASE WHEN frame > coalesce(
                    lag(frame) OVER (PARTITION BY id ORDER BY frame), -2
                ) + 1 THEN 1 ELSE 0 END AS brk
    FROM act
),
grp AS (
    SELECT id, frame, e,
           sum(brk) OVER (
               PARTITION BY id ORDER BY frame ROWS UNBOUNDED PRECEDING
           ) AS g
    FROM isl
),
segs AS (
    SELECT id, g,
           CAST(min(frame) AS BIGINT) AS start_frame,
           CAST(max(frame) AS BIGINT) AS end_frame,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(e) AS BIGINT) AS energy_sum
    FROM grp GROUP BY 1, 2
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(row_number() OVER (
           PARTITION BY id ORDER BY start_frame
       ) AS BIGINT) AS seg_idx,
       start_frame, end_frame, n_frames, energy_sum
FROM segs
"""


# Audio energy-delta fingerprint near-dup pairs
# (operators/multimodal.audio_fingerprint_pairs).  Pins restated
# verbatim (change both sides or neither): 16-sample integer
# |.|-energy frames over the decoded int16 PCM, bit i = energy[i+1] >
# energy[i] STRICT, 31-bit signature, pairs id_a < id_b with hamming
# dist <= 3; corpus = originals + 'wav-mut' chunk-0 mutants.
_AUDIO_FP_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, r.range AS r,
           md5('wav-' || ids.range || '-42-' || r.range) AS hx
    FROM range({N_WAV_MEDIA}) ids CROSS JOIN range(64) r
    UNION ALL
    SELECT 1000 + ids.range, r.range,
           CASE WHEN r.range = 0
                THEN md5('wav-mut-' || ids.range || '-42-' || r.range)
                ELSE md5('wav-' || ids.range || '-42-' || r.range) END
    FROM range({N_WAV_MEDIA}) ids CROSS JOIN range(64) r
),
samples AS (
    SELECT id, (r * 8 + s.range) AS pos,
           ({_hexbyte('hx', '4 * s.range + 1')})
           + 256 * ({_hexbyte('hx', '4 * s.range + 3')}) AS uval
    FROM chunks CROSS JOIN range(8) s
),
fe AS (
    SELECT id, pos // 16 AS frame,
           CAST(sum(abs(CASE WHEN uval >= 32768 THEN uval - 65536
                             ELSE uval END)) AS BIGINT) AS e
    FROM samples GROUP BY 1, 2
),
db AS (
    SELECT id, frame,
           CASE WHEN lead(e) OVER (PARTITION BY id ORDER BY frame) > e
                THEN 1 ELSE 0 END AS b
    FROM fe
),
sigs AS (
    SELECT id,
           CAST(sum(CASE WHEN frame < 31
                         THEN CAST(b AS BIGINT) << CAST(frame AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS sig
    FROM db GROUP BY 1
)
SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS dist
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


# Video per-frame Y-plane aHash near-dup pairs
# (operators/multimodal.video_fingerprint_pairs).  Pins restated
# verbatim (change both sides or neither): bit p = 64 * Y[p] >
# plane_sum STRICT (row-major over the 8x8 Y plane), (hi, lo) 32-bit
# split per frame, dist = TOTAL hamming over the 6 aligned frames,
# pairs id_a < id_b with dist <= 5; corpus = originals + mutants
# whose frame-0 chunk-0 hex starts '00' (Y pixel (0,0) zeroed).
_VIDEO_FP_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, c.range AS c,
           md5('y4m-' || ids.range || '-42-' || c.range) AS hx
    FROM range({N_Y4M_MEDIA}) ids CROSS JOIN range(72) c
    UNION ALL
    SELECT 1000 + ids.range, c.range,
           CASE WHEN c.range = 0
                THEN '00' || substr(md5('y4m-' || ids.range || '-42-'
                                        || c.range), 3, 30)
                ELSE md5('y4m-' || ids.range || '-42-' || c.range) END
    FROM range({N_Y4M_MEDIA}) ids CROSS JOIN range(72) c
),
bytes AS (
    SELECT id, (c * 16 + b.range) AS pos,
           {_hexbyte('hx', '2 * b.range + 1')} AS val
    FROM chunks CROSS JOIN range(16) b
),
ybytes AS (
    SELECT id, pos // 192 AS frame, pos % 192 AS pixel, val
    FROM bytes WHERE pos % 192 < 64
),
ysum AS (
    SELECT id, frame, CAST(sum(val) AS BIGINT) AS t
    FROM ybytes GROUP BY 1, 2
),
bits AS (
    SELECT y.id, y.frame, y.pixel,
           CASE WHEN 64 * y.val > s.t THEN 1 ELSE 0 END AS b
    FROM ybytes y JOIN ysum s ON s.id = y.id AND s.frame = y.frame
),
fsigs AS (
    SELECT id, frame,
           CAST(sum(CASE WHEN pixel >= 32
                         THEN CAST(b AS BIGINT) << CAST(pixel - 32 AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS hi,
           CAST(sum(CASE WHEN pixel < 32
                         THEN CAST(b AS BIGINT) << CAST(pixel AS INTEGER)
                         ELSE 0 END) AS BIGINT) AS lo
    FROM bits GROUP BY 1, 2
),
pd AS (
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(sum(bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo))) AS BIGINT) AS dist
    FROM fsigs a JOIN fsigs b ON a.id < b.id AND a.frame = b.frame
    GROUP BY 1, 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b, dist
FROM pd WHERE dist <= 5
"""


# Real video-decode gate: restate generate_y4m_media's md5 plane stream
# (6 frames x 12 chunks keyed 'y4m-<id>-<seed>-<globalchunk>', each
# frame = 64-byte Y, U, V planes in C444 order) and recompute per-frame
# per-plane byte sums.  The Spark side iterates real FRAME markers and
# carves planes by the parsed colorspace; plane means map back to exact
# sums via round(mean*64*255).  Constants pinned to multimodal.py:
# Y4M_W=Y4M_H=8, Y4M_FRAMES=6, 192 bytes/frame.
_Y4M_STATS_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, c.range AS c,
           md5('y4m-' || ids.range || '-42-' || c.range) AS hx
    FROM range({N_Y4M_MEDIA}) ids CROSS JOIN range(72) c
),
bytes AS (
    SELECT id, (c * 16 + b.range) AS pos,
           {_hexbyte('hx', '2 * b.range + 1')} AS val
    FROM chunks CROSS JOIN range(16) b
)
SELECT CAST(id AS BIGINT) AS media_id,
       CAST(pos // 192 AS INTEGER) AS frame_idx,
       CAST(sum(CASE WHEN (pos % 192) // 64 = 0 THEN val ELSE 0 END) AS BIGINT) AS y_sum,
       CAST(sum(CASE WHEN (pos % 192) // 64 = 1 THEN val ELSE 0 END) AS BIGINT) AS u_sum,
       CAST(sum(CASE WHEN (pos % 192) // 64 = 2 THEN val ELSE 0 END) AS BIGINT) AS v_sum
FROM bytes
GROUP BY id, pos // 192
ORDER BY media_id, frame_idx
"""


# Scene-cut detection (operators/multimodal.y4m_scene_cuts).  Pins
# restated verbatim (change both sides or neither): Y plane only, SAD
# = exact BIGINT sum of |Y_f[p] - Y_{f-1}[p]| over the 64 pixels,
# frame_idx = the LATER frame (1..5), cut iff sad > 2000 STRICT.
_Y4M_SCENE_SQL = f"""WITH chunks AS (
    SELECT ids.range AS id, c.range AS c,
           md5('y4m-' || ids.range || '-42-' || c.range) AS hx
    FROM range({N_Y4M_MEDIA}) ids CROSS JOIN range(72) c
),
bytes AS (
    SELECT id, (c * 16 + b.range) AS pos,
           {_hexbyte('hx', '2 * b.range + 1')} AS val
    FROM chunks CROSS JOIN range(16) b
),
yb AS (
    SELECT id, pos // 192 AS frame, pos % 192 AS pixel, val
    FROM bytes WHERE pos % 192 < 64
),
sad AS (
    SELECT a.id, b.frame AS frame_idx,
           CAST(sum(abs(a.val - b.val)) AS BIGINT) AS sad
    FROM yb a JOIN yb b
      ON a.id = b.id AND b.frame = a.frame + 1 AND a.pixel = b.pixel
    GROUP BY 1, 2
)
SELECT CAST(id AS BIGINT) AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       sad, sad > 2000 AS is_cut
FROM sad
"""


# Bigram-LM gates (operators/lm.py): both engines quantize every
# per-bigram log10 probability to integer MICRO units BEFORE the
# per-document sum, so the aggregate is exact integer arithmetic —
# order-independent across shuffles and engines (a float sum of logs
# would not be).  Pinned on both sides (change both or neither):
# alpha = 0.5, micro = 1e6, P(w2|w1) = (c2 + 0.5) / (c1 + 0.5*V) with
# c1 = bigram occurrences whose context is w1 and V = distinct
# normalized tokens corpus-wide; docs with < 2 tokens emit no row.
_LM_COMMON = f"""WITH {_DOC_TOKENS},
grams AS (
    SELECT doc_id AS id,
           list_transform(
               range(0, greatest(len(tokens) - 1, 0)),
               i -> tokens[i+1] || ' ' || tokens[i+2]
           ) AS gs
    FROM doctoks
),
bgd AS (
    SELECT id, gram, CAST(count(*) AS BIGINT) AS c
    FROM (SELECT id, unnest(gs) AS gram FROM grams)
    GROUP BY 1, 2
),
bgc AS (SELECT gram, CAST(sum(c) AS BIGINT) AS c2 FROM bgd GROUP BY 1),
ctx AS (
    SELECT split_part(gram, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
    FROM bgc GROUP BY 1
),
vocab AS (
    SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
    FROM (SELECT unnest(tokens) AS t FROM doctoks)
),
w_bg AS (
    SELECT gram,
           CAST(round(log10((c2 + 0.5) / (c1 + 0.5 * v)) * 1e6) AS BIGINT)
               AS w_micro
    FROM bgc JOIN ctx ON split_part(bgc.gram, ' ', 1) = ctx.w1
    CROSS JOIN vocab
)"""

_BIGRAM_LM_PPL_SQL = f"""{_LM_COMMON}
SELECT CAST(id AS BIGINT) AS id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(sum(c * w_micro) AS BIGINT) AS logp_micro,
       round(pow(10, -CAST(sum(c * w_micro) AS DOUBLE)
                      / (CAST(sum(c) AS DOUBLE) * 1e6)), 6) AS ppl
FROM bgd JOIN w_bg USING (gram)
GROUP BY id
"""

# target domain = sources whose trailing number is divisible by 5
# (lm.TARGET_SOURCE_MOD); target LM shares the corpus vocabulary and is
# evaluated over the BACKGROUND gram set (zero counts where unseen)
_LM_IMPORTANCE_SQL = f"""{_LM_COMMON},
tdocs AS (
    SELECT doc_id AS id
    FROM documents
    -- TRY_CAST: a source without trailing digits extracts '' and must
    -- read as non-target (NULL), matching Spark's cast-to-NULL
    WHERE TRY_CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 5 = 0
),
bgc_t AS (
    SELECT gram, CAST(sum(c) AS BIGINT) AS c2t
    FROM bgd JOIN tdocs USING (id) GROUP BY 1
),
ctx_t AS (
    SELECT split_part(gram, ' ', 1) AS w1, CAST(sum(c2t) AS BIGINT) AS c1t
    FROM bgc_t GROUP BY 1
),
w_t AS (
    SELECT w_bg.gram,
           CAST(round(log10((coalesce(c2t, 0) + 0.5)
                            / (coalesce(c1t, 0) + 0.5 * v)) * 1e6) AS BIGINT)
               AS wt_micro
    FROM w_bg
    LEFT JOIN bgc_t ON w_bg.gram = bgc_t.gram
    LEFT JOIN ctx_t ON split_part(w_bg.gram, ' ', 1) = ctx_t.w1
    CROSS JOIN vocab
)
SELECT CAST(id AS BIGINT) AS id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(sum(c * (wt_micro - w_micro)) AS BIGINT) AS imp_micro
FROM bgd
JOIN w_t USING (gram)
JOIN w_bg USING (gram)
GROUP BY id
"""

# PMI collocations (lm.pmi_collocations).  Pins restated verbatim
# (change both sides or neither): count floor 5, top-50 by
# (pmi_micro desc, gram asc) — a deterministic total order so the
# k-cut is engine-independent — and the EXACT double expression
# ((c2*U)*U) / ((N*cu1)*cu2), every factor cast to double BEFORE the
# multiplies with this parenthesization, feeding ONE log10 then the
# micro quantizer.
_PMI_COLLOCATIONS_SQL = f"""WITH {_DOC_TOKENS},
toks AS (SELECT unnest(tokens) AS t FROM doctoks),
uni AS (SELECT t, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY 1),
gramocc AS (
    SELECT unnest(list_transform(
        range(0, greatest(len(tokens) - 1, 0)),
        i -> tokens[i+1] || ' ' || tokens[i+2]
    )) AS gram
    FROM doctoks
),
bgc AS (
    SELECT gram, CAST(count(*) AS BIGINT) AS c2 FROM gramocc GROUP BY 1
),
tot AS (
    SELECT CAST((SELECT sum(cu) FROM uni) AS DOUBLE) AS u_tot,
           CAST((SELECT count(*) FROM gramocc) AS DOUBLE) AS n_tot
)
SELECT bgc.gram AS gram, c2,
       CAST(round(log10(((CAST(c2 AS DOUBLE) * u_tot) * u_tot)
                        / ((n_tot * CAST(u1.cu AS DOUBLE))
                           * CAST(u2.cu AS DOUBLE)))
                  * 1e6) AS BIGINT) AS pmi_micro
FROM bgc
JOIN uni u1 ON split_part(bgc.gram, ' ', 1) = u1.t
JOIN uni u2 ON split_part(bgc.gram, ' ', 2) = u2.t
CROSS JOIN tot
WHERE c2 >= 5
ORDER BY pmi_micro DESC, gram ASC
LIMIT 50
"""

def _segment_queries_sql(queries) -> str:
    """lm.segment_queries: adjacent query tokens merge when their
    bigram is a positive-PMI collocation (floor 5, the
    pmi_collocations formula VERBATIM, no k-cut); break flags +
    running sum express the greedy rule as a window."""
    return f"""WITH {_DOC_TOKENS},
toks AS (SELECT unnest(tokens) AS t FROM doctoks),
uni AS (SELECT t, CAST(count(*) AS BIGINT) AS cu FROM toks GROUP BY 1),
gramocc AS (
    SELECT unnest(list_transform(
        range(0, greatest(len(tokens) - 1, 0)),
        i -> tokens[i+1] || ' ' || tokens[i+2]
    )) AS gram
    FROM doctoks
),
bgc AS (
    SELECT gram, CAST(count(*) AS BIGINT) AS c2 FROM gramocc GROUP BY 1
),
tot AS (
    SELECT CAST((SELECT sum(cu) FROM uni) AS DOUBLE) AS u_tot,
           CAST((SELECT count(*) FROM gramocc) AS DOUBLE) AS n_tot
),
colls AS (
    SELECT bgc.gram
    FROM bgc
    JOIN uni u1 ON split_part(bgc.gram, ' ', 1) = u1.t
    JOIN uni u2 ON split_part(bgc.gram, ' ', 2) = u2.t
    CROSS JOIN tot
    WHERE c2 >= 5
      AND CAST(round(log10(((CAST(c2 AS DOUBLE) * u_tot) * u_tot)
                           / ((n_tot * CAST(u1.cu AS DOUBLE))
                              * CAST(u2.cu AS DOUBLE)))
                     * 1e6) AS BIGINT) > 0
),
qq AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qt AS (
    SELECT qid,
           CAST(generate_subscripts(toks2, 1) AS BIGINT) - 1 AS pos,
           unnest(toks2) AS term
    FROM (SELECT qid, {_TOKENS_EXPR.format(col='qtext')} AS toks2 FROM qq)
),
fl AS (
    SELECT qid, pos, term,
           CASE WHEN pos = 0
                     OR (lag(term) OVER (PARTITION BY qid ORDER BY pos)
                         || ' ' || term) NOT IN (SELECT gram FROM colls)
                THEN 1 ELSE 0 END AS brk
    FROM qt
),
seg AS (
    SELECT qid, pos, term,
           sum(brk) OVER (PARTITION BY qid ORDER BY pos) - 1 AS seg_idx
    FROM fl
)
SELECT qid, CAST(seg_idx AS BIGINT) AS seg_idx,
       array_to_string(list(term ORDER BY pos), ' ') AS segment
FROM seg GROUP BY 1, 2
"""


# Vocabulary KL drift (operators/lm.vocab_kl_drift).  Pins restated
# verbatim: halves at count(*)//2 by doc_id, T1-T5 token occurrences,
# union vocab, add-one smoothing both sides, cq = round(1e6 * log10(
# ((cn+1)_d * (N_old+V)_d) / ((co+1)_d * (N_new+V)_d) )) BIGINT with
# double-before-multiply factors, S = sum (cn+1)*cq exact, kl =
# round(S / ((N_new+V)*1e6), 6).
_VOCAB_KL_SQL = f"""WITH {_DOC_TOKENS},
sp AS (SELECT CAST(count(*) // 2 AS BIGINT) AS split FROM documents),
occ AS (
    SELECT d.doc_id < sp.split AS old, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
    CROSS JOIN sp
),
counts AS (
    SELECT t,
           CAST(sum(CASE WHEN old THEN 1 ELSE 0 END) AS BIGINT) AS co,
           CAST(sum(CASE WHEN old THEN 0 ELSE 1 END) AS BIGINT) AS cn
    FROM occ GROUP BY 1
),
tot AS (
    SELECT CAST(count(*) AS BIGINT) AS v,
           CAST(sum(co) AS BIGINT) AS n_old,
           CAST(sum(cn) AS BIGINT) AS n_new
    FROM counts
),
contrib AS (
    SELECT c.cn, tot.v, tot.n_old, tot.n_new,
           CAST(round(log10(
               (CAST(c.cn + 1 AS DOUBLE) * CAST(tot.n_old + tot.v AS DOUBLE))
               / (CAST(c.co + 1 AS DOUBLE)
                  * CAST(tot.n_new + tot.v AS DOUBLE))
           ) * 1e6) AS BIGINT) AS cq
    FROM counts c CROSS JOIN tot
)
SELECT max(v) AS v, max(n_old) AS n_old, max(n_new) AS n_new,
       CAST(sum((cn + 1) * cq) AS BIGINT) AS s_micro,
       round(CAST(sum((cn + 1) * cq) AS DOUBLE)
             / (CAST(max(n_new) + max(v) AS DOUBLE) * 1e6), 6) AS kl
FROM contrib
"""


# Spell correction (operators/spell.py).  The Spark side finds
# candidates via the SymSpell deletion-neighborhood equi-join (recall 1
# for Levenshtein <= 1 by construction) then exact-filters; the oracle
# is the DIRECT form — a cross join with the levenshtein predicate —
# which the equi-join + filter provably equals.  Pins restated verbatim
# (change both sides or neither): queries = distinct middle-character
# deletions (1-based position (len+1)//2) of vocab terms with
# length >= 5; plain Levenshtein (NOT Damerau) <= 1; rank
# (dist asc, cnt desc, term asc), top 3 per query.
_SPELL_CORRECT_SQL = f"""WITH {_DOC_TOKENS},
vocab AS (
    SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(tokens) AS t FROM doctoks) GROUP BY 1
),
typos AS (
    SELECT DISTINCT
        substr(term, 1, ((length(term) + 1) // 2) - 1)
        || substr(term, ((length(term) + 1) // 2) + 1) AS qterm
    FROM vocab WHERE length(term) >= 5
),
cand AS (
    SELECT qterm, term, cnt,
           CAST(levenshtein(qterm, term) AS INTEGER) AS dist
    FROM typos CROSS JOIN vocab
    WHERE levenshtein(qterm, term) <= 1
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qterm ORDER BY dist ASC, cnt DESC, term ASC
    ) AS rn
    FROM cand
)
SELECT qterm, term, dist, cnt FROM ranked WHERE rn <= 3
"""


# Query auto-completion (spell.complete_prefix).  The Spark side
# equi-joins on per-length substring keys (the columnar range-scan
# analog); the oracle is the direct starts_with form — identical
# completion sets.  Pins: COMPLETE_PREFIXES / COMPLETE_TOPK above,
# rank (cnt desc, term asc).
def _complete_prefix_sql(prefixes: list[str], k: int) -> str:
    vals = ", ".join(f"('{p}')" for p in sorted(set(prefixes)) if p)
    return f"""WITH {_DOC_TOKENS},
vocab AS (
    SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(tokens) AS t FROM doctoks) GROUP BY 1
),
cand AS (
    SELECT p.prefix, v.term, v.cnt
    FROM (VALUES {vals}) p(prefix)
    JOIN vocab v ON starts_with(v.term, p.prefix)
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY prefix ORDER BY cnt DESC, term ASC
    ) AS rn
    FROM cand
)
SELECT prefix, term, cnt, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {k}
"""


_COMPLETE_PREFIX_SQL = _complete_prefix_sql(COMPLETE_PREFIXES, COMPLETE_TOPK)


PROX_SLOP = 3
PROX_K = 10


def _proximity_sql(
    phrases: list[tuple[str, str]], slop: int, k: int
) -> str:
    """positional.proximity_topk_positional: sloppy-phrase matching
    with FULL existential chain semantics (greedy minimal-next is NOT
    equivalent — see the operator docstring's counterexample), the
    nested EXISTS restated as nested list_filter lambdas.  n_hits =
    first-term positions beginning an ordered within-slop chain; rank
    (n_hits desc, id asc) top k; phrases reuse PHRASE_SET."""
    branches = []
    for qid, p in phrases:
        toks = p.split(" ")
        n = len(toks)
        if n < 2:
            continue

        def inner(i: int) -> str:
            cond = f"p{i} > p{i - 1} AND p{i} <= p{i - 1} + {slop}"
            if i == n - 1:
                return (
                    f"len(list_filter(a{i}.ps, p{i} -> {cond})) > 0"
                )
            return (
                f"len(list_filter(a{i}.ps, p{i} -> {cond} "
                f"AND {inner(i + 1)})) > 0"
            )

        froms = "parr a0 " + " ".join(
            f"JOIN parr a{i} ON a0.id = a{i}.id" for i in range(1, n)
        )
        where = " AND ".join(f"a{i}.term = '{toks[i]}'" for i in range(n))
        hits = f"len(list_filter(a0.ps, p0 -> {inner(1)}))"
        branches.append(
            f"SELECT '{qid}' AS qid, a0.id AS id,"
            f" CAST({hits} AS BIGINT) AS n_hits\n    FROM {froms}"
            f"\n    WHERE {where}"
        )
    union = "\n    UNION ALL\n    ".join(branches)
    return f"""WITH {_DOC_TOKENS},
posx AS (
    SELECT doc_id AS id, unnest(tokens) AS term,
           unnest(range(len(tokens))) AS pos
    FROM doctoks
),
parr AS (
    SELECT id, term, list(pos ORDER BY pos) AS ps
    FROM posx GROUP BY id, term
),
m AS (
    {union}
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY n_hits DESC, id ASC
    ) AS rn
    FROM m WHERE n_hits >= 1
)
SELECT qid, CAST(id AS BIGINT) AS id, n_hits, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {k}
"""


_PROXIMITY_SQL = _proximity_sql(PHRASE_SET, PROX_SLOP, PROX_K)

UW_WIDTH = 6


def _uw_proximity_sql(
    phrases: list[tuple[str, str]], width: int, k: int
) -> str:
    """positional.uw_proximity_topk_positional: unordered-window
    matching — n_hits = FIRST-term anchor positions p with every other
    term having a position in [p-(W-1), p+(W-1)], any order; flat
    per-term existentials (no chain); rank (n_hits desc, id asc)."""
    w = int(width) - 1
    branches = []
    for qid, p in phrases:
        toks = p.split(" ")
        n = len(toks)
        if n < 2:
            continue
        others = " AND ".join(
            f"len(list_filter(a{i}.ps, q -> q >= p0 - {w} AND q <= p0 + {w})) > 0"
            for i in range(1, n)
        )
        froms = "parr a0 " + " ".join(
            f"JOIN parr a{i} ON a0.id = a{i}.id" for i in range(1, n)
        )
        where = " AND ".join(f"a{i}.term = '{toks[i]}'" for i in range(n))
        hits = f"len(list_filter(a0.ps, p0 -> {others}))"
        branches.append(
            f"SELECT '{qid}' AS qid, a0.id AS id,"
            f" CAST({hits} AS BIGINT) AS n_hits\n    FROM {froms}"
            f"\n    WHERE {where}"
        )
    union = "\n    UNION ALL\n    ".join(branches)
    return f"""WITH {_DOC_TOKENS},
posx AS (
    SELECT doc_id AS id, unnest(tokens) AS term,
           unnest(range(len(tokens))) AS pos
    FROM doctoks
),
parr AS (
    SELECT id, term, list(pos ORDER BY pos) AS ps
    FROM posx GROUP BY id, term
),
m AS (
    {union}
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY n_hits DESC, id ASC
    ) AS rn
    FROM m WHERE n_hits >= 1
)
SELECT qid, CAST(id AS BIGINT) AS id, n_hits, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {k}
"""


_UW_PROXIMITY_SQL = _uw_proximity_sql(PHRASE_SET, UW_WIDTH, PROX_K)

SDM_MU = 2048.0
SDM_W = 8
SDM_K = 10


def _sdm_sql(
    queries: list[tuple[str, str]], k: int, mu: float = SDM_MU, width: int = SDM_W
) -> str:
    """operators/sdm.sdm_topk: Sequential Dependence Model ranking —
    Dirichlet-smoothed unigram + ordered-bigram (#1) + unordered-window
    (#uw8) features, each micro-quantized BIGINT before the sum, lambda
    triple applied as integers (6, 1, 1) with one final /8.  Pins
    restated verbatim from sdm.py (change both sides or neither):
    mu=2048 dyadic, W=8, smoothing parenthesization (tf_double +
    (mu*cf_double)/C) / (dl_double + mu), OOV unigrams dropped via the
    lex join, zero-cf bigram features contribute 0, candidates = docs
    matching >= 1 in-lexicon unigram, rank (micro desc, id asc)."""
    qt_rows: list[tuple[str, str, int]] = []
    qb_rows: list[tuple[str, str, str, int]] = []
    for qid, text in queries:
        toks = text.split(" ")
        ucounts: dict[str, int] = {}
        for t in toks:
            ucounts[t] = ucounts.get(t, 0) + 1
        for t, qtf in sorted(ucounts.items()):
            qt_rows.append((qid, t, qtf))
        bcounts: dict[tuple[str, str], int] = {}
        for a, b in zip(toks, toks[1:]):
            bcounts[(a, b)] = bcounts.get((a, b), 0) + 1
        for (a, b), btf in sorted(bcounts.items()):
            qb_rows.append((qid, a, b, btf))
    qt_vals = ", ".join(f"('{q}', '{t}', {n})" for q, t, n in qt_rows)
    qb_vals = ", ".join(
        f"('{q}', '{a}', '{b}', {n})" for q, a, b, n in qb_rows
    )
    w = int(width) - 1
    mu_lit = f"{mu:.1f}"

    def feat(tf: str, cfx: str) -> str:
        return (
            f"CAST(round(log10((CAST({tf} AS DOUBLE)"
            f" + ({mu_lit} * CAST({cfx} AS DOUBLE)) / s.c)"
            f" / (CAST(c.dl AS DOUBLE) + {mu_lit})) * 1000000.0) AS BIGINT)"
        )

    return f"""WITH {_DOC_TOKENS},
posx AS (
    SELECT doc_id AS id, unnest(tokens) AS term,
           unnest(range(len(tokens))) AS pos
    FROM doctoks
),
parr AS (
    SELECT id, term, list(pos ORDER BY pos) AS ps
    FROM posx GROUP BY id, term
),
lex AS (SELECT term, CAST(sum(len(ps)) AS BIGINT) AS cf FROM parr GROUP BY term),
dl AS (SELECT id, CAST(sum(len(ps)) AS BIGINT) AS dl FROM parr GROUP BY id),
stats AS (SELECT CAST(sum(len(ps)) AS DOUBLE) AS c FROM parr),
qt AS (
    SELECT q.qid, q.term, CAST(q.qtf AS BIGINT) AS qtf, l.cf
    FROM (VALUES {qt_vals}) q(qid, term, qtf) JOIN lex l USING (term)
),
qb AS (
    SELECT qid, t1, t2, CAST(btf AS BIGINT) AS btf
    FROM (VALUES {qb_vals}) b(qid, t1, t2, btf)
),
cdl AS (
    SELECT x.qid, x.id, d.dl FROM (
        SELECT DISTINCT q.qid, p.id FROM qt q JOIN parr p USING (term)
    ) x JOIN dl d USING (id)
),
tsum AS (
    SELECT c.qid, c.id,
           CAST(sum(q.qtf * {feat('coalesce(len(p.ps), 0)', 'q.cf')}) AS BIGINT)
             AS t_micro
    FROM cdl c CROSS JOIN stats s
    JOIN qt q ON q.qid = c.qid
    LEFT JOIN parr p ON p.term = q.term AND p.id = c.id
    GROUP BY c.qid, c.id
),
bdoc AS (
    SELECT b.t1, b.t2, p1.id,
           CAST(len(list_filter(p1.ps,
                p -> len(list_filter(p2.ps, q -> q = p + 1)) > 0))
             AS BIGINT) AS o_tf,
           CAST(coalesce(list_sum(list_transform(p1.ps,
                p -> len(list_filter(p2.ps,
                     q -> q <> p AND abs(q - p) <= {w})))), 0)
             AS BIGINT) AS u_tf
    FROM (SELECT DISTINCT t1, t2 FROM qb) b
    JOIN parr p1 ON p1.term = b.t1
    JOIN parr p2 ON p2.term = b.t2 AND p2.id = p1.id
),
bcf AS (
    SELECT t1, t2, CAST(sum(o_tf) AS BIGINT) AS o_cf,
           CAST(sum(u_tf) AS BIGINT) AS u_cf
    FROM bdoc GROUP BY t1, t2
),
qbc AS (
    SELECT b.qid, b.t1, b.t2, b.btf,
           CAST(coalesce(f.o_cf, 0) AS BIGINT) AS o_cf,
           CAST(coalesce(f.u_cf, 0) AS BIGINT) AS u_cf
    FROM qb b LEFT JOIN bcf f USING (t1, t2)
),
bsum AS (
    SELECT c.qid, c.id,
           CAST(sum(b.btf * CASE WHEN b.o_cf > 0
                THEN {feat('coalesce(d.o_tf, 0)', 'b.o_cf')}
                ELSE 0 END) AS BIGINT) AS o_micro,
           CAST(sum(b.btf * CASE WHEN b.u_cf > 0
                THEN {feat('coalesce(d.u_tf, 0)', 'b.u_cf')}
                ELSE 0 END) AS BIGINT) AS u_micro
    FROM cdl c CROSS JOIN stats s
    JOIN qbc b ON b.qid = c.qid
    LEFT JOIN bdoc d ON d.t1 = b.t1 AND d.t2 = b.t2 AND d.id = c.id
    GROUP BY c.qid, c.id
),
tot AS (
    SELECT t.qid, t.id,
           6 * t.t_micro + coalesce(b.o_micro, 0) + coalesce(b.u_micro, 0)
             AS micro
    FROM tsum t LEFT JOIN bsum b ON b.qid = t.qid AND b.id = t.id
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY micro DESC, id ASC
    ) AS rn
    FROM tot
)
SELECT qid, CAST(id AS BIGINT) AS id, CAST(rn AS BIGINT) AS rank,
       round(CAST(micro AS DOUBLE) / 1000000.0, 6) AS score
FROM ranked WHERE rn <= {k}
"""


_SDM_SQL = _sdm_sql(PHRASE_SET, SDM_K)


TEXTRANK_K = 3


def _textrank_sql(k: int, iters: int = 3) -> str:
    """graph.textrank_keywords: per-doc TextRank over adjacent-term
    co-occurrence graphs — item_pagerank's integer discipline keyed by
    doc (rha(a/b) = (2a+b)//(2b), damping 7/8, micro BIGINT state,
    pr0 = rha(1e6/N_d), base = rha(1e6/(8 N_d)), per-edge inflow
    quantized before the sum, isolated terms base-only).  CTEs stay
    MATERIALIZED (the item_pagerank pin: inlining re-expands the
    iteration chain exponentially)."""
    its = []
    prev = "pr0"
    for i in range(1, iters + 1):
        its.append(f"""
infl{i} AS MATERIALIZED (
    SELECT e.id, e.b AS term,
           CAST(sum((2 * p.pr * e.w + e.ow) // (2 * e.ow)) AS BIGINT)
             AS infl
    FROM ew e JOIN {prev} p ON p.id = e.id AND p.term = e.a
    GROUP BY 1, 2
),
pr{i} AS MATERIALIZED (
    SELECT n.id, n.term,
           CAST((2 * 1000000 + 8 * d.n) // (2 * 8 * d.n)
                + coalesce((2 * 7 * i.infl + 8) // (2 * 8), 0)
             AS BIGINT) AS pr
    FROM nodes n JOIN nd d USING (id)
    LEFT JOIN infl{i} i ON i.id = n.id AND i.term = n.term
)""")
        prev = f"pr{i}"
    chain = ",".join(its)
    return f"""WITH {_DOC_TOKENS},
posx AS (
    SELECT doc_id AS id, unnest(tokens) AS term,
           unnest(range(len(tokens))) AS pos
    FROM doctoks
),
nodes AS MATERIALIZED (SELECT DISTINCT id, term FROM posx),
nd AS MATERIALIZED (
    SELECT id, CAST(count(*) AS BIGINT) AS n FROM nodes GROUP BY id
),
adj AS (
    SELECT p1.id, p1.term AS a, p2.term AS b
    FROM posx p1
    JOIN posx p2 ON p2.id = p1.id AND p2.pos = p1.pos + 1
    WHERE p1.term <> p2.term
),
und AS MATERIALIZED (
    SELECT id, a, b, CAST(count(*) AS BIGINT) AS w FROM (
        SELECT id, a, b FROM adj
        UNION ALL
        SELECT id, b AS a, a AS b FROM adj
    )
    GROUP BY 1, 2, 3
),
outw AS MATERIALIZED (
    SELECT id, a, CAST(sum(w) AS BIGINT) AS ow FROM und GROUP BY 1, 2
),
ew AS MATERIALIZED (
    SELECT u.id, u.a, u.b, u.w, o.ow
    FROM und u JOIN outw o ON o.id = u.id AND o.a = u.a
),
pr0 AS MATERIALIZED (
    SELECT n.id, n.term,
           CAST((2 * 1000000 + d.n) // (2 * d.n) AS BIGINT) AS pr
    FROM nodes n JOIN nd d USING (id)
),{chain},
ranked AS (
    SELECT id, term, pr, row_number() OVER (
        PARTITION BY id ORDER BY pr DESC, term ASC
    ) AS rn
    FROM {prev}
)
SELECT CAST(id AS BIGINT) AS id, term, CAST(pr AS BIGINT) AS pr_micro,
       CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= {k}
"""


_TEXTRANK_SQL = _textrank_sql(TEXTRANK_K)


# Item communities (graph.item_communities): connected components over
# the strong co-visitation edges.  Pins restated verbatim: edges
# (a < b) weighted by distinct co-visiting users, threshold =
# ceil(quantile_cont(w, 0.99) - 1e-6) (the epsilon keeps a sub-round-6
# interpolation difference from flipping integer boundary weights),
# closure = recursive reachability, community = min reachable id,
# weak/isolated items label themselves.
_ITEM_COMMUNITIES_SQL = """WITH RECURSIVE ui AS (
    SELECT DISTINCT user_id AS u,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
e AS (
    SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS w
    FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
    GROUP BY 1, 2
),
thr AS (
    SELECT CAST(ceil(quantile_cont(w, 0.99) - 0.000001) AS BIGINT) AS t
    FROM e
),
strong AS (SELECT ia, ib FROM e CROSS JOIN thr WHERE w >= t),
edges AS (
    SELECT ia AS src, ib AS dst FROM strong
    UNION
    SELECT ib AS src, ia AS dst FROM strong
),
reach(src, dst) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.src, e2.dst FROM reach r JOIN edges e2 ON r.dst = e2.src
),
comp AS (
    SELECT src AS id, least(src, min(dst)) AS community
    FROM reach GROUP BY src
),
nodes AS (SELECT DISTINCT item FROM ui)
SELECT CAST(nodes.item AS BIGINT) AS item,
       CAST(coalesce(comp.community, nodes.item) AS BIGINT) AS community
FROM nodes LEFT JOIN comp ON nodes.item = comp.id
"""


# Per-item triangle counts (graph.triangle_counts) over the unweighted
# co-visitation graph.  The oracle enumerates triangles in plain id
# order (a < b < c); the engine's degree orientation finds the same
# set — output is orientation-independent.  Items in no triangle emit
# n_tri = 0.
_TRIANGLE_COUNTS_SQL = """WITH ui AS MATERIALIZED (
    SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
ed AS MATERIALIZED (
    SELECT DISTINCT a.item AS x, b.item AS y
    FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
),
tri AS MATERIALIZED (
    SELECT e1.x AS a, e1.y AS b, e2.y AS c
    FROM ed e1
    JOIN ed e2 ON e2.x = e1.y
    JOIN ed e3 ON e3.x = e1.x AND e3.y = e2.y
),
members AS (
    SELECT a AS item FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
),
nodes AS (SELECT DISTINCT item FROM ui)
SELECT n.item, CAST(count(m.item) AS BIGINT) AS n_tri
FROM nodes n LEFT JOIN members m ON m.item = n.item
GROUP BY n.item
ORDER BY n.item
"""


# Session path mining (events.session_paths).  Pins restated verbatim:
# event_sessions' boundary rule (strict > 28800 s on (us, event_id)
# NULLS LAST order), paths = overlapping 3-step event-type windows
# WITHIN one session, rank (cnt desc, path asc) top 10.
_SESSION_PATHS_SQL = """WITH base AS (
    SELECT user_id, epoch_us(ts) AS us, event_id AS eid,
           event_type AS etype
    FROM events
),
flagged AS (
    SELECT *, CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > 28800000000
                   THEN 1 ELSE 0 END AS is_new
    FROM base
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY us ASC NULLS LAST, eid ASC NULLS LAST)
),
marked AS (
    SELECT *, sum(is_new) OVER (
        PARTITION BY user_id
        ORDER BY us ASC NULLS LAST, eid ASC NULLS LAST
        ROWS UNBOUNDED PRECEDING) - 1 AS sess
    FROM flagged
),
trip AS (
    SELECT etype, lead(etype, 1) OVER w AS t1, lead(etype, 2) OVER w AS t2,
           sess, lead(sess, 1) OVER w AS s1, lead(sess, 2) OVER w AS s2
    FROM marked
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY us ASC NULLS LAST, eid ASC NULLS LAST)
),
counts AS (
    SELECT etype || '>' || t1 || '>' || t2 AS path,
           CAST(count(*) AS BIGINT) AS cnt
    FROM trip
    WHERE t2 IS NOT NULL AND s1 = sess AND s2 = sess
    GROUP BY 1
)
SELECT path, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, path ASC) AS BIGINT)
           AS rank
FROM counts ORDER BY cnt DESC, path ASC LIMIT 10
"""


# Next-item transitions (events.item_transitions).  Pins restated
# verbatim: items = TRY_CAST props '$.k' with NULLs dropped BEFORE
# pairing, per-user order (us, event_id), self-transitions kept,
# rank (cnt desc, next asc) top 3.
_ITEM_TRANSITIONS_SQL = """WITH base AS (
    SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
pairs AS (
    SELECT item AS cur,
           lead(item) OVER (PARTITION BY u ORDER BY us, eid) AS next_item
    FROM base
),
cnts AS (
    SELECT cur, next_item, CAST(count(*) AS BIGINT) AS cnt
    FROM pairs WHERE next_item IS NOT NULL
    GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY cur ORDER BY cnt DESC, next_item ASC
    ) AS rn
    FROM cnts
)
SELECT CAST(cur AS BIGINT) AS cur, CAST(next_item AS BIGINT) AS next_item,
       cnt, CAST(rn AS BIGINT) AS rank
FROM ranked WHERE rn <= 3
"""


def _pagerank_sql(iters: int) -> str:
    """Integer-state weighted PageRank over the item co-visitation
    graph (operators/graph.py), unrolled into `iters` CTE steps.  Pins
    restated verbatim (change both sides or neither): items =
    TRY_CAST of props '$.k' (NULL dropped), edges = distinct-user
    co-visitation counts both directions, micro = 1e6, damping 7/8,
    pr0 = rha(1e6/N), inflow contribution rha(pr*w/outw) per edge,
    pr' = rha(1e6/(8N)) + rha(7*inflow/8), where rha(a/b) =
    (2a + b) // (2b) — pure BIGINT round-half-away division, so the
    iterative state is exact on both engines.  Step CTEs MATERIALIZED
    (the BPE-oracle inlining lesson)."""
    parts = [
        """WITH ui AS MATERIALIZED (
    SELECT DISTINCT user_id AS u,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
nodes AS MATERIALIZED (SELECT DISTINCT item FROM ui),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
edges AS MATERIALIZED (
    SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS w
    FROM ui a JOIN ui b ON a.u = b.u AND a.item <> b.item
    GROUP BY 1, 2
),
outw AS MATERIALIZED (
    SELECT ia AS item, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1
),
pr0 AS MATERIALIZED (
    SELECT item, (2 * 1000000 + n) // (2 * n) AS pr
    FROM nodes CROSS JOIN nn
)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
c{k} AS (
    SELECT e.ib AS item,
           CAST(sum((2 * p.pr * e.w + o.ow) // (2 * o.ow)) AS BIGINT)
               AS infl
    FROM edges e
    JOIN pr{k - 1} p ON e.ia = p.item
    JOIN outw o ON e.ia = o.item
    GROUP BY 1
),
pr{k} AS MATERIALIZED (
    SELECT nodes.item,
           ((2 * 1000000 + 8 * n) // (16 * n))
           + coalesce((2 * 7 * infl + 8) // 16, 0) AS pr
    FROM nodes CROSS JOIN nn
    LEFT JOIN c{k} ON nodes.item = c{k}.item
)""")
    parts.append(
        f"""
SELECT CAST(item AS BIGINT) AS item, CAST(pr AS BIGINT) AS pr_micro
FROM pr{iters}
"""
    )
    return "".join(parts)


# Synchronous label-propagation communities (graph.item_lpa).  Pins
# restated verbatim (change both sides or neither): incidence/edges =
# item_pagerank's derivation (distinct (u, item), directed pairs
# a <> b, w = common users), label_0 = item id, 3 SYNCHRONOUS
# iterations, new label = neighbor label with max incident weight sum
# (ties weight desc / label asc), isolated items keep their label, no
# self vote; iteration CTEs stay MATERIALIZED (the pagerank pin).
_ITEM_LPA_SQL = """WITH ui AS MATERIALIZED (
    SELECT DISTINCT user_id AS u,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
nodes AS MATERIALIZED (SELECT DISTINCT item FROM ui),
edges AS MATERIALIZED (
    SELECT a.item AS src, b.item AS dst, CAST(count(*) AS BIGINT) AS w
    FROM ui a JOIN ui b ON a.u = b.u AND a.item <> b.item
    GROUP BY 1, 2
),
l0 AS MATERIALIZED (SELECT item, item AS label FROM nodes),
v1 AS MATERIALIZED (
    SELECT e.src, l.label, CAST(sum(e.w) AS BIGINT) AS ws
    FROM edges e JOIN l0 l ON e.dst = l.item
    GROUP BY 1, 2
),
n1 AS MATERIALIZED (
    SELECT src AS item, label FROM (
        SELECT *, row_number() OVER (
            PARTITION BY src ORDER BY ws DESC, label ASC
        ) AS rn FROM v1
    ) WHERE rn = 1
),
l1 AS MATERIALIZED (
    SELECT i.item, coalesce(n.label, i.item) AS label
    FROM nodes i LEFT JOIN n1 n USING (item)
),
v2 AS MATERIALIZED (
    SELECT e.src, l.label, CAST(sum(e.w) AS BIGINT) AS ws
    FROM edges e JOIN l1 l ON e.dst = l.item
    GROUP BY 1, 2
),
n2 AS MATERIALIZED (
    SELECT src AS item, label FROM (
        SELECT *, row_number() OVER (
            PARTITION BY src ORDER BY ws DESC, label ASC
        ) AS rn FROM v2
    ) WHERE rn = 1
),
l2 AS MATERIALIZED (
    SELECT i.item, coalesce(n.label, i.item) AS label
    FROM nodes i LEFT JOIN n2 n USING (item)
),
v3 AS MATERIALIZED (
    SELECT e.src, l.label, CAST(sum(e.w) AS BIGINT) AS ws
    FROM edges e JOIN l2 l ON e.dst = l.item
    GROUP BY 1, 2
),
n3 AS MATERIALIZED (
    SELECT src AS item, label FROM (
        SELECT *, row_number() OVER (
            PARTITION BY src ORDER BY ws DESC, label ASC
        ) AS rn FROM v3
    ) WHERE rn = 1
),
l3 AS MATERIALIZED (
    SELECT i.item, coalesce(n.label, i.item) AS label
    FROM nodes i LEFT JOIN n3 n USING (item)
)
SELECT CAST(item AS BIGINT) AS item, CAST(label AS BIGINT) AS label
FROM l3
"""


_ITEM_PAGERANK_SQL = _pagerank_sql(3)


def _ppr_sql(iters: int, seeds: list[int]) -> str:
    """graph.item_personalized_pagerank: item_pagerank's integer pins
    VERBATIM (rha, 7/8 damping, micro state, MATERIALIZED step CTEs)
    with the ONE semantic change: pr0 = rha(1e6/|S|) and the teleport
    base rha(1e6/(8|S|)) are paid ONLY to the pinned seeds; non-seeds
    hold pure damped inflow.  |S| counts the PINNED list whether or
    not every seed appears in the graph; all nodes emit a row."""
    ns = len(seeds)
    sl = ", ".join(str(int(s)) for s in seeds)
    parts = [
        f"""WITH ui AS MATERIALIZED (
    SELECT DISTINCT user_id AS u,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
),
nodes AS MATERIALIZED (SELECT DISTINCT item FROM ui),
edges AS MATERIALIZED (
    SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS w
    FROM ui a JOIN ui b ON a.u = b.u AND a.item <> b.item
    GROUP BY 1, 2
),
outw AS MATERIALIZED (
    SELECT ia AS item, CAST(sum(w) AS BIGINT) AS ow FROM edges GROUP BY 1
),
pr0 AS MATERIALIZED (
    SELECT item,
           CASE WHEN item IN ({sl})
                THEN (2 * 1000000 + {ns}) // (2 * {ns})
                ELSE 0 END AS pr
    FROM nodes
)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
c{k} AS (
    SELECT e.ib AS item,
           CAST(sum((2 * p.pr * e.w + o.ow) // (2 * o.ow)) AS BIGINT)
               AS infl
    FROM edges e
    JOIN pr{k - 1} p ON e.ia = p.item
    JOIN outw o ON e.ia = o.item
    GROUP BY 1
),
pr{k} AS MATERIALIZED (
    SELECT nodes.item,
           CASE WHEN nodes.item IN ({sl})
                THEN (2 * 1000000 + 8 * {ns}) // (16 * {ns})
                ELSE 0 END
           + coalesce((2 * 7 * infl + 8) // 16, 0) AS pr
    FROM nodes
    LEFT JOIN c{k} ON nodes.item = c{k}.item
)""")
    parts.append(
        f"""
SELECT CAST(item AS BIGINT) AS item, CAST(pr AS BIGINT) AS pr_micro
FROM pr{iters}
"""
    )
    return "".join(parts)


_ITEM_PPR_SQL = _ppr_sql(3, BFS_SEEDS)


def _bpe_ctes(n_merges: int) -> str:
    """BPE merge learning (operators/bpe.py) unrolled into n CTE steps
    (merge k+1's pair counts depend on merge k — same unrolling as the
    kmeans/mmr oracles; n changes regenerate automatically).  Pins
    restated verbatim from bpe.py (change both sides or neither):
    vocab = occurrence-counted normalized tokens; initial symbol state
    = single-space-joined characters; pair counts weight every adjacent
    POSITION by word count; winner = (count desc, pair asc); merge
    application = the doubled-space left-to-right literal replace.

    Every step CTE is MATERIALIZED and b{{k}} (one row) joins in via a
    CROSS JOIN — with DuckDB's default inlining, w{{k}}'s multiple
    references to the previous step re-expand the whole chain
    exponentially (5^n scans of the base table)."""
    parts = [
        f"WITH {_DOC_TOKENS},",
        r"""
vocab AS (
    SELECT t AS term, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(tokens) AS t FROM doctoks) GROUP BY 1
),
w0 AS MATERIALIZED (
    SELECT term AS word, cnt,
           trim(regexp_replace(term, '(.)', '\1 ', 'g')) AS sym
    FROM vocab
)""",
    ]
    for k in range(1, n_merges + 1):
        parts.append(f""",
p{k} AS (
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS c
    FROM (
        SELECT cnt, unnest(list_transform(
            range(0, greatest(len(toks) - 1, 0)),
            i -> toks[i+1] || ' ' || toks[i+2]
        )) AS pair
        FROM (SELECT cnt, string_split(sym, ' ') AS toks FROM w{k - 1})
    )
    GROUP BY pair
),
b{k} AS MATERIALIZED (
    SELECT split_part(pair, ' ', 1) AS lhs,
           split_part(pair, ' ', 2) AS rhs, c
    FROM p{k} ORDER BY c DESC, pair ASC LIMIT 1
),
w{k} AS MATERIALIZED (
    SELECT word, cnt,
           trim(regexp_replace(
               replace(' ' || replace(sym, ' ', '  ') || ' ',
                       ' ' || lhs || '  ' || rhs || ' ',
                       ' ' || lhs || rhs || ' '),
               ' +', ' ', 'g')) AS sym
    FROM w{k - 1} CROSS JOIN b{k}
)""")
    return "".join(parts)


def _bpe_sql(n_merges: int) -> str:
    selects = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS step, lhs, rhs,"
        f" CAST(c AS BIGINT) AS cnt FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges) + "\n" + selects


def _bpe_segment_sql(n_merges: int) -> str:
    """bpe.bpe_segment_corpus: the final symbol state IS the last step
    CTE of the training chain — segmentation is the trainer's serve
    path, so the oracle reads w{n} directly."""
    return (
        _bpe_ctes(n_merges)
        + f"""
SELECT word, cnt, sym,
       CAST(len(string_split(sym, ' ')) AS INTEGER) AS n_sym
FROM w{n_merges}
"""
    )


_BPE_MERGES_SQL = _bpe_sql(8)
_BPE_SEGMENT_SQL = _bpe_segment_sql(8)


# KMV distinct-count sketch (operators/sketches.py).  Gateable because
# the hash is the deterministic md5-derived hash60 (salt 'kmv-').
# Pins restated verbatim (change both sides or neither): k = 16;
# est = round((15.0 * 2^60) / double(kth smallest DISTINCT hash), 6),
# exact sketch size when fewer than k distinct hashes; exact
# n_distinct carried beside as the verification column.
# quantile sketch, exact regime: QSK_K >= every per-source group at
# every SF, so the bottom-k-by-hash sample is the whole group and the
# estimate equals the plain linear-interpolated quantile (Spark
# percentile == DuckDB quantile_cont at round 6, the props-rollup pin)
_QUANTILE_SKETCH_SQL = """SELECT source,
       CAST(count(*) AS BIGINT) AS n_sample,
       round(quantile_cont(n_chars, 0.25), 6) AS q25,
       round(quantile_cont(n_chars, 0.5), 6) AS q50,
       round(quantile_cont(n_chars, 0.75), 6) AS q75,
       round(quantile_cont(n_chars, 0.9), 6) AS q90
FROM documents GROUP BY 1
"""

_KMV_DISTINCT_SQL = f"""WITH {_DOC_TOKENS},
dt AS (
    SELECT DISTINCT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
hh AS (
    SELECT DISTINCT source,
           CAST(('0x' || substr(md5('kmv-' || t), 1, 15))::UBIGINT
                AS BIGINT) AS h
    FROM dt
),
rk AS (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hh
),
sk AS (
    SELECT source, max(h) AS kth_hash, CAST(count(*) AS BIGINT) AS n_sketch
    FROM rk WHERE rn <= 16 GROUP BY source
),
ex AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
    FROM dt GROUP BY source
)
SELECT ex.source AS source, n_distinct, kth_hash,
       CASE WHEN n_sketch < 16 THEN CAST(n_sketch AS DOUBLE)
            ELSE round((15.0 * 1152921504606846976.0)
                       / CAST(kth_hash AS DOUBLE), 6)
       END AS est
FROM ex JOIN sk USING (source)
"""

# T5 span-corruption mask selection (operators/curation.span_corruption).
# Pins restated verbatim (change both sides or neither): tokens = the
# oracle-side pipeline, 0-based positions, coin = hash60('span-' || id
# || '-' || pos) % 1e6 < 150000, window [p, min(p+2, n-1)] (SPAN_LEN
# 3), islands break ONLY on a strict gap (m > prev + 1 — adjacent
# windows merge, the dup_spans rule), span_idx 1-based by start; docs
# with no fired coin emit nothing.
_SPAN_CORRUPTION_SQL = f"""WITH {_DOC_TOKENS},
posx AS (
    SELECT doc_id AS id, unnest(range(len(tokens))) AS p,
           len(tokens) AS n
    FROM doctoks WHERE len(tokens) > 0
),
fired AS (
    SELECT id, p, n FROM posx
    WHERE (('0x' || substr(md5('span-' || CAST(id AS VARCHAR) || '-'
            || CAST(p AS VARCHAR)), 1, 15))::UBIGINT % 1000000) < 150000
),
masked AS (
    SELECT DISTINCT id, m FROM (
        SELECT id, unnest(range(p, least(p + 3, n))) AS m FROM fired
    )
),
isl AS (
    SELECT id, m,
           CASE WHEN m > coalesce(
                    lag(m) OVER (PARTITION BY id ORDER BY m), -2) + 1
                THEN 1 ELSE 0 END AS brk
    FROM masked
),
grp AS (
    SELECT id, m,
           sum(brk) OVER (
               PARTITION BY id ORDER BY m ROWS UNBOUNDED PRECEDING
           ) AS g
    FROM isl
),
spans AS (
    SELECT id, g, CAST(min(m) AS BIGINT) AS start_pos,
           CAST(max(m) AS BIGINT) AS end_pos,
           CAST(count(*) AS BIGINT) AS span_len
    FROM grp GROUP BY id, g
)
SELECT id,
       CAST(row_number() OVER (
           PARTITION BY id ORDER BY start_pos
       ) AS BIGINT) AS span_idx,
       start_pos, end_pos, span_len
FROM spans
"""

# AMS F2 tug-of-war sketch (operators/sketches.ams_f2_tokens).  Pins
# restated verbatim (change both sides or neither): R = 5 rows, salts
# 'ams0-'..'ams4-', sign = +1 iff hash60(salt || term) even else -1,
# Z_r = exact BIGINT sum over the occurrence stream (duplicates KEPT),
# f2_est = middle element of the sorted 5 squares (odd R — exact
# median, no interpolation), exact f2_true rides beside.
def _ams_sign_sql(r: int) -> str:
    return (
        "CASE WHEN (('0x' || substr(md5('ams"
        + str(r)
        + "-' || t), 1, 15))::UBIGINT % 2) = 0 THEN 1 ELSE -1 END"
    )


_AMS_F2_SQL = f"""WITH {_DOC_TOKENS},
occ AS (
    SELECT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
zs AS (
    SELECT source,
           {', '.join(
               f'CAST(sum({_ams_sign_sql(r)}) AS BIGINT) AS z{r}'
               for r in range(5)
           )}
    FROM occ GROUP BY source
),
f2 AS (
    SELECT source, CAST(sum(c * c) AS BIGINT) AS f2_true
    FROM (
        SELECT source, t, CAST(count(*) AS BIGINT) AS c
        FROM occ GROUP BY 1, 2
    ) GROUP BY source
)
SELECT zs.source AS source, z0, z1, z2, z3, z4,
       CAST(list_sort([z0*z0, z1*z1, z2*z2, z3*z3, z4*z4])[3] AS BIGINT)
           AS f2_est,
       f2_true
FROM zs JOIN f2 USING (source)
"""

# streaming AMS shares the batch sketch oracle minus f2_true (signed
# integer addition is commutative/associative — final state after ANY
# micro-batch split equals the batch sketch, test-pinned); the stream's
# read view derives the estimate through sketches.ams_est_col, the ONE
# shared expression.
_STREAMING_AMS_SQL = f"""WITH {_DOC_TOKENS},
occ AS (
    SELECT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
zs AS (
    SELECT source,
           {', '.join(
               f'CAST(sum({_ams_sign_sql(r)}) AS BIGINT) AS z{r}'
               for r in range(5)
           )}
    FROM occ GROUP BY source
)
SELECT source, z0, z1, z2, z3, z4,
       CAST(list_sort([z0*z0, z1*z1, z2*z2, z3*z3, z4*z4])[3] AS BIGINT)
           AS f2_est
FROM zs
"""

# HyperLogLog distinct sketch (operators/sketches.hll_distinct_tokens).
# Pins restated verbatim (change both sides or neither): salt 'hll-',
# p = 8 / m = 256, bucket = h % 256, w = h >> 8, rho = bit_count((w &
# -w) - 1) + 1 capped at 52 (w = 0 -> 52), registers = per-bucket max,
# z_scaled = exact BIGINT sum of 2^(52 - M_j) over ALL 256 registers
# (empty -> 2^52), est = round(alpha_m2_252 / double(z_scaled), 6) with
# alpha_256 the pinned literal 0.7182725932495458 and the numerator
# built by exact power-of-two scaling; RAW estimator, no small-range
# correction; exact n_distinct rides beside as the verification column.
_HLL_NUM = 0.7182725932495458 * 65536.0 * 4503599627370496.0
_HLL_DISTINCT_SQL = f"""WITH {_DOC_TOKENS},
dt AS (
    SELECT DISTINCT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
hh AS (
    SELECT source,
           CAST(('0x' || substr(md5('hll-' || t), 1, 15))::UBIGINT
                AS BIGINT) AS h
    FROM dt
),
rr AS (
    SELECT source, h % 256 AS bucket,
           CASE WHEN (h >> 8) = 0 THEN 52
                ELSE least(bit_count(((h >> 8) & -(h >> 8)) - 1) + 1, 52)
           END AS rho
    FROM hh
),
regs AS (SELECT source, bucket, max(rho) AS m FROM rr GROUP BY 1, 2),
hagg AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_nonzero,
           CAST(sum(m) AS BIGINT) AS reg_sum,
           CAST(sum(CAST(1 AS BIGINT) << CAST(52 - m AS INTEGER))
                AS BIGINT) AS znz
    FROM regs GROUP BY 1
),
ex AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_distinct
    FROM dt GROUP BY 1
)
SELECT ex.source AS source, n_distinct, n_nonzero, reg_sum,
       CAST((256 - n_nonzero) * 4503599627370496 + znz AS BIGINT)
           AS z_scaled,
       round({_HLL_NUM!r}
             / CAST((256 - n_nonzero) * 4503599627370496 + znz AS DOUBLE),
             6) AS est
FROM ex JOIN hagg USING (source)
"""

# Bloom-filter term membership (operators/sketches.bloom_term_filter).
# Pins restated verbatim (change both sides or neither): k = 4 salts
# 'bloom0-'..'bloom3-', position = hash60 % 15360, 60-bit words (word =
# p DIV 60, mask = 1 << (p % 60) — bit 63 would wrap negative), filter
# = bit_or over the source's distinct normalized tokens, in_filter =
# every probe bit set, exact `present` beside it, n_set = total set
# bits.  Probes are pinned NORMALIZED tokens (BLOOM_PROBES).
BLOOM_PROBES = ("spark", "join", "vector", "merge", "warpcore", "bloomfake")
_BLOOM_SALT_ROWS = ", ".join(f"('bloom{i}-')" for i in range(4))
_BLOOM_PROBE_ROWS = ", ".join(f"('{t}')" for t in BLOOM_PROBES)
_BLOOM_SQL = f"""WITH {_DOC_TOKENS},
dt AS (
    SELECT DISTINCT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
salts AS (SELECT * FROM (VALUES {_BLOOM_SALT_ROWS}) s(salt)),
pos AS (
    SELECT source,
           CAST(('0x' || substr(md5(salt || t), 1, 15))::UBIGINT AS BIGINT)
               % 15360 AS p
    FROM dt CROSS JOIN salts
),
words AS (
    SELECT source, p // 60 AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 60 AS INTEGER)) AS w
    FROM pos GROUP BY 1, 2
),
nset AS (
    SELECT source, CAST(sum(bit_count(w)) AS BIGINT) AS n_set
    FROM words GROUP BY 1
),
pr AS (SELECT * FROM (VALUES {_BLOOM_PROBE_ROWS}) p(term)),
pw AS (
    SELECT term, p // 60 AS word,
           CAST(1 AS BIGINT) << CAST(p % 60 AS INTEGER) AS mask
    FROM (
        SELECT term,
               CAST(('0x' || substr(md5(salt || term), 1, 15))::UBIGINT
                    AS BIGINT) % 15360 AS p
        FROM pr CROSS JOIN salts
    )
),
srcs AS (SELECT DISTINCT source FROM documents),
hits AS (
    SELECT s.source, pw.term,
           CASE WHEN (coalesce(w.w, 0) & pw.mask) = pw.mask
                THEN 1 ELSE 0 END AS hit
    FROM srcs s CROSS JOIN pw
    LEFT JOIN words w ON w.source = s.source AND w.word = pw.word
),
cont AS (
    SELECT source, term, CAST(min(hit) AS INTEGER) AS in_filter
    FROM hits GROUP BY 1, 2
),
pres AS (
    SELECT s.source, p.term,
           CAST(CASE WHEN EXISTS (
               SELECT 1 FROM dt
               WHERE dt.source = s.source AND dt.t = p.term
           ) THEN 1 ELSE 0 END AS INTEGER) AS present
    FROM srcs s CROSS JOIN pr p
)
SELECT pres.source AS source, pres.term AS term, pres.present,
       cont.in_filter, nset.n_set
FROM pres
JOIN cont ON cont.source = pres.source AND cont.term = pres.term
JOIN nset ON nset.source = pres.source
"""

# streaming Bloom shares the batch filter computation (bitwise OR is
# commutative/associative/IDEMPOTENT — final state after any
# micro-batch split, even with replays, equals the batch filter); the
# final state can't know exact presence, so this variant outputs
# (source, term, in_filter, n_set)
_BLOOM_STREAM_SQL = f"""WITH {_DOC_TOKENS},
dt AS (
    SELECT DISTINCT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
salts AS (SELECT * FROM (VALUES {_BLOOM_SALT_ROWS}) s(salt)),
pos AS (
    SELECT source,
           CAST(('0x' || substr(md5(salt || t), 1, 15))::UBIGINT AS BIGINT)
               % 15360 AS p
    FROM dt CROSS JOIN salts
),
words AS (
    SELECT source, p // 60 AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 60 AS INTEGER)) AS w
    FROM pos GROUP BY 1, 2
),
nset AS (
    SELECT source, CAST(sum(bit_count(w)) AS BIGINT) AS n_set
    FROM words GROUP BY 1
),
pr AS (SELECT * FROM (VALUES {_BLOOM_PROBE_ROWS}) p(term)),
pw AS (
    SELECT term, p // 60 AS word,
           CAST(1 AS BIGINT) << CAST(p % 60 AS INTEGER) AS mask
    FROM (
        SELECT term,
               CAST(('0x' || substr(md5(salt || term), 1, 15))::UBIGINT
                    AS BIGINT) % 15360 AS p
        FROM pr CROSS JOIN salts
    )
),
srcs AS (SELECT DISTINCT source FROM documents),
hits AS (
    SELECT s.source, pw.term,
           CASE WHEN (coalesce(w.w, 0) & pw.mask) = pw.mask
                THEN 1 ELSE 0 END AS hit
    FROM srcs s CROSS JOIN pw
    LEFT JOIN words w ON w.source = s.source AND w.word = pw.word
),
cont AS (
    SELECT source, term, CAST(min(hit) AS INTEGER) AS in_filter
    FROM hits GROUP BY 1, 2
)
SELECT cont.source AS source, cont.term AS term, cont.in_filter,
       nset.n_set
FROM cont JOIN nset ON nset.source = cont.source
"""

# streaming HLL shares the batch register computation (integer max is
# commutative/associative/IDEMPOTENT — final registers after any
# micro-batch split, even with replays, equal the batch sketch); the
# final registers can't know the exact distinct count, so this variant
# outputs (source, n_nonzero, reg_sum, z_scaled, est)
_HLL_STREAM_SQL = f"""WITH {_DOC_TOKENS},
dt AS (
    SELECT DISTINCT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
hh AS (
    SELECT source,
           CAST(('0x' || substr(md5('hll-' || t), 1, 15))::UBIGINT
                AS BIGINT) AS h
    FROM dt
),
rr AS (
    SELECT source, h % 256 AS bucket,
           CASE WHEN (h >> 8) = 0 THEN 52
                ELSE least(bit_count(((h >> 8) & -(h >> 8)) - 1) + 1, 52)
           END AS rho
    FROM hh
),
regs AS (SELECT source, bucket, max(rho) AS m FROM rr GROUP BY 1, 2),
hagg AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_nonzero,
           CAST(sum(m) AS BIGINT) AS reg_sum,
           CAST(sum(CAST(1 AS BIGINT) << CAST(52 - m AS INTEGER))
                AS BIGINT) AS znz
    FROM regs GROUP BY 1
)
SELECT source, n_nonzero, reg_sum,
       CAST((256 - n_nonzero) * 4503599627370496 + znz AS BIGINT)
           AS z_scaled,
       round({_HLL_NUM!r}
             / CAST((256 - n_nonzero) * 4503599627370496 + znz AS DOUBLE),
             6) AS est
FROM hagg
"""

# streaming CMS shares the batch counter computation (integer addition
# is commutative/associative, so the final state after any micro-batch
# split equals the batch sketch with NO ordering contract — the
# streaming_kmv discipline); the stream can't know the exact
# true_count, so this variant outputs (source, term, est, n_cells)
_CMS_STREAM_SQL = f"""WITH {_DOC_TOKENS},
ts AS (
    SELECT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
salts AS (SELECT * FROM (VALUES (0, 'cms0-'), (1, 'cms1-'), (2, 'cms2-'),
                                (3, 'cms3-')) s(row_i, salt)),
cells AS (
    SELECT source, row_i,
           CAST(('0x' || substr(md5(salt || t), 1, 15))::UBIGINT AS BIGINT)
               % 1024 AS col_i
    FROM ts CROSS JOIN salts
),
counters AS (
    SELECT source, row_i, col_i, CAST(count(*) AS BIGINT) AS n
    FROM cells GROUP BY 1, 2, 3
),
ncells AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_cells
    FROM counters GROUP BY 1
),
pr AS (SELECT * FROM (VALUES {_BLOOM_PROBE_ROWS}) p(term)),
pcells AS (
    SELECT term, row_i,
           CAST(('0x' || substr(md5(salt || term), 1, 15))::UBIGINT
                AS BIGINT) % 1024 AS col_i
    FROM pr CROSS JOIN salts
),
srcs AS (SELECT DISTINCT source FROM documents),
est AS (
    SELECT s.source, pc.term, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS est
    FROM srcs s CROSS JOIN pcells pc
    LEFT JOIN counters c ON c.source = s.source AND c.row_i = pc.row_i
                        AND c.col_i = pc.col_i
    GROUP BY 1, 2
)
SELECT est.source AS source, est.term AS term, est.est, ncells.n_cells
FROM est JOIN ncells ON ncells.source = est.source
"""

# Asymmetric containment pairs (operators/dedup.containment_pairs):
# containment(a in b) = inter / n_a over the SHARED 3-gram shingle
# derivation; ORDERED pairs a != b; threshold 4/5 compared in
# cross-multiplied integers (5 * inter >= 4 * n_a)
_CONTAINMENT_SQL = f"""WITH {_DOC_TOKENS}, {_SHINGLES},
cinter AS (
    SELECT a.id AS id_a, b.id AS id_b, CAST(count(*) AS BIGINT) AS inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id <> b.id
    GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter,
       CAST(sa.n_sh AS BIGINT) AS n_a,
       round(CAST(i.inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE), 6)
           AS containment
FROM cinter i
JOIN shsizes sa ON i.id_a = sa.id
WHERE 5 * i.inter >= 4 * sa.n_sh
"""

# Count-min sketch term counts (operators/sketches.cms_term_counts).
# Pins restated verbatim (change both sides or neither): d = 4 salts
# 'cms0-'..'cms3-', w = 1024 (cell = hash60 % 1024), counters = exact
# BIGINT occurrence counts over the token stream (duplicates KEPT),
# est = min over rows (untouched cell -> 0), probes = BLOOM_PROBES (the
# membership and frequency sketches share the probe pin), exact
# true_count beside, n_cells = nonzero cells.
_CMS_SQL = f"""WITH {_DOC_TOKENS},
ts AS (
    SELECT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
salts AS (SELECT * FROM (VALUES (0, 'cms0-'), (1, 'cms1-'), (2, 'cms2-'),
                                (3, 'cms3-')) s(row_i, salt)),
cells AS (
    SELECT source, row_i,
           CAST(('0x' || substr(md5(salt || t), 1, 15))::UBIGINT AS BIGINT)
               % 1024 AS col_i
    FROM ts CROSS JOIN salts
),
counters AS (
    SELECT source, row_i, col_i, CAST(count(*) AS BIGINT) AS n
    FROM cells GROUP BY 1, 2, 3
),
ncells AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_cells
    FROM counters GROUP BY 1
),
pr AS (SELECT * FROM (VALUES {_BLOOM_PROBE_ROWS}) p(term)),
pcells AS (
    SELECT term, row_i,
           CAST(('0x' || substr(md5(salt || term), 1, 15))::UBIGINT
                AS BIGINT) % 1024 AS col_i
    FROM pr CROSS JOIN salts
),
srcs AS (SELECT DISTINCT source FROM documents),
est AS (
    SELECT s.source, pc.term, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS est
    FROM srcs s CROSS JOIN pcells pc
    LEFT JOIN counters c ON c.source = s.source AND c.row_i = pc.row_i
                        AND c.col_i = pc.col_i
    GROUP BY 1, 2
),
tc AS (
    SELECT s.source, p.term,
           CAST(coalesce((SELECT count(*) FROM ts
                          WHERE ts.source = s.source AND ts.t = p.term),
                         0) AS BIGINT) AS true_count
    FROM srcs s CROSS JOIN pr p
)
SELECT tc.source AS source, tc.term AS term, tc.true_count, est.est,
       ncells.n_cells
FROM tc
JOIN est ON est.source = tc.source AND est.term = tc.term
JOIN ncells ON ncells.source = tc.source
"""

# streaming KMV shares the batch sketch computation (k-min merge is
# commutative/associative/idempotent, so the final streaming state ==
# the batch sketch with NO ordering contract); the stream can't know
# the exact n_distinct, so this variant outputs the sketch fields only
_KMV_STREAM_SQL = f"""WITH {_DOC_TOKENS},
dt AS (
    SELECT DISTINCT d.source AS source, x.t AS t
    FROM (SELECT doc_id, unnest(tokens) AS t FROM doctoks) x
    JOIN documents d ON x.doc_id = d.doc_id
),
hh AS (
    SELECT DISTINCT source,
           CAST(('0x' || substr(md5('kmv-' || t), 1, 15))::UBIGINT
                AS BIGINT) AS h
    FROM dt
),
rk AS (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM hh
)
SELECT source, CAST(count(*) AS BIGINT) AS n_sketch,
       max(h) AS kth_hash,
       CASE WHEN count(*) < 16 THEN CAST(count(*) AS DOUBLE)
            ELSE round((15.0 * 1152921504606846976.0)
                       / CAST(max(h) AS DOUBLE), 6)
       END AS est
FROM rk WHERE rn <= 16 GROUP BY source
"""


# cross-doc boilerplate: 3-grams occurring in >= 3 distinct docs
# (params pinned to curation.BOILER_NGRAM / BOILER_MIN_DOCS — change
# both sides or neither); per-doc distinct-gram counts + boiler ratio
_BOILER_NGRAM = 3
_BOILER_MIN_DOCS = 3


def _boilerplate_sql() -> str:
    g = _grams_expr("tokens", _BOILER_NGRAM)
    return f"""WITH {_DOC_TOKENS},
dg AS (
    SELECT doc_id AS id, unnest(list_distinct({g})) AS gram FROM doctoks
),
c AS (SELECT gram, count(*) AS nd FROM dg GROUP BY 1),
per AS (
    SELECT id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN c.nd >= {_BOILER_MIN_DOCS} THEN 1 ELSE 0 END) AS BIGINT)
               AS boiler_grams
    FROM dg JOIN c USING (gram) GROUP BY id
)
SELECT CAST(d.doc_id AS BIGINT) AS id,
       coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.boiler_grams, 0) AS boiler_grams,
       round(CASE WHEN coalesce(p.n_grams, 0) > 0
                  THEN coalesce(p.boiler_grams, 0) / CAST(p.n_grams AS DOUBLE)
                  ELSE 0.0 END, 6) AS boiler_frac
FROM documents d LEFT JOIN per p ON d.doc_id = p.id
"""


# budget_pack: per-domain cumulative BPE-token budget in (quality desc,
# id asc) order; quality/bpe CTEs restate textstats verbatim (same
# qm/qr/qs chain as _training_corpus_sql); budget pinned to
# curation.PACK_BUDGET
_PACK_BUDGET = 1000


def _budget_pack_sql() -> str:
    return f"""WITH {_DOC_TOKENS},
qm AS (
    SELECT doc_id AS id,
           CAST(len(tokens) AS BIGINT) AS n,
           coalesce(list_sum(list_transform(tokens, t -> length(t))), 0) AS tok_chars,
           coalesce(list_sum(list_transform(tokens,
               t -> length(regexp_replace(t, '[^0-9]', '', 'g')))), 0) AS digit_chars,
           len(list_filter(tokens, t -> t IN ({_QS_STOPS_SQL}))) AS stop_hits,
           CAST(coalesce(list_sum(list_transform(tokens,
               x -> CAST(ceil(length(x) / 4) AS INTEGER))), 0) AS BIGINT) AS bpe_est
    FROM doctoks
),
qr AS (
    SELECT id, bpe_est,
           CASE WHEN n > 0 THEN tok_chars / CAST(n AS DOUBLE) ELSE 0.0 END AS mean_len,
           CASE WHEN tok_chars > 0 THEN digit_chars / CAST(tok_chars AS DOUBLE) ELSE 0.0 END AS digit_ratio,
           CASE WHEN n > 0 THEN stop_hits / CAST(n AS DOUBLE) ELSE 0.0 END AS stop_ratio,
           n
    FROM qm
),
qs AS (
    SELECT id, bpe_est,
           round(0.4 * least(CAST(n AS DOUBLE) / 20.0, 1.0)
               + 0.2 * (CASE WHEN mean_len >= 2.0 AND mean_len <= 12.0 THEN 1.0 ELSE 0.0 END)
               + 0.2 * (1.0 - digit_ratio)
               + 0.2 * least(stop_ratio * 5.0, 1.0), 6) AS quality
    FROM qr
),
j AS (
    SELECT q.id, d.source AS domain, q.quality, q.bpe_est
    FROM qs q JOIN documents d ON q.id = d.doc_id
),
c AS (
    SELECT id, domain, quality, bpe_est,
           CAST(sum(bpe_est) OVER (
               PARTITION BY domain ORDER BY quality DESC, id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_bpe
    FROM j
)
SELECT id, domain, quality, bpe_est, cum_bpe,
       cum_bpe <= {_PACK_BUDGET} AS kept
FROM c
"""


# per-doc TF-IDF keyword extraction: top-3 terms by tf*log10(N/df),
# ranked on the ROUND-6 score with term-asc tie-break (k pinned to
# textstats.KEYWORDS_K)
_KEYWORDS_K = 3


def _top_keywords_sql() -> str:
    return f"""WITH {_DOC_TOKENS},
tf AS (
    SELECT doc_id AS id, term, CAST(count(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, unnest(tokens) AS term FROM doctoks)
    GROUP BY 1, 2
),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
scored AS (
    SELECT tf.id, tf.term, tf.tf,
           round(tf.tf * log10(nd.n / dft.df), 6) AS score
    FROM tf JOIN dft USING (term) CROSS JOIN nd
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY id ORDER BY score DESC, term ASC) AS krank
    FROM scored
)
SELECT CAST(id AS BIGINT) AS id, term, tf, score,
       CAST(krank AS BIGINT) AS krank
FROM r WHERE krank <= {_KEYWORDS_K}
"""


# ordered funnel over the events table: step k = min event time of its
# type STRICTLY after step k-1; converted = all steps present within
# the horizon.  Steps/horizon pinned to operators/events.FUNNEL_STEPS /
# FUNNEL_HORIZON_S; timestamps compared as epoch MICROSECONDS
# (epoch_us <-> unix_micros).
_FUNNEL_HORIZON_US = 86_400 * 1_000_000

_EVENT_FUNNEL_SQL = f"""WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS etype,
           epoch_us(ts) AS us
    FROM events
),
s0 AS (
    SELECT user_id, min(us) AS t_view FROM e WHERE etype = 'view' GROUP BY 1
),
s1 AS (
    SELECT s0.user_id, t_view,
           min(CASE WHEN e.us > t_view THEN e.us END) AS t_click
    FROM s0 LEFT JOIN e ON e.user_id = s0.user_id AND e.etype = 'click'
    GROUP BY 1, 2
),
s2 AS (
    SELECT s1.user_id, t_view, t_click,
           min(CASE WHEN e.us > t_click THEN e.us END) AS t_purchase
    FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.etype = 'purchase'
    GROUP BY 1, 2, 3
)
SELECT user_id, t_view, t_click, t_purchase,
       t_purchase IS NOT NULL
           AND (t_purchase - t_view) <= {_FUNNEL_HORIZON_US} AS converted
FROM s2
"""


# Funnel aggregate readout (operators/events.funnel_summary): the
# event_funnel CTEs verbatim + one global aggregate; med = linear-
# interpolated percentile over converted users' us deltas, reported
# round(med_us / 1e6, 6) seconds, NULL when nobody converts.
_FUNNEL_SUMMARY_SQL = f"""WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS etype,
           epoch_us(ts) AS us
    FROM events
),
s0 AS (
    SELECT user_id, min(us) AS t_view FROM e WHERE etype = 'view' GROUP BY 1
),
s1 AS (
    SELECT s0.user_id, t_view,
           min(CASE WHEN e.us > t_view THEN e.us END) AS t_click
    FROM s0 LEFT JOIN e ON e.user_id = s0.user_id AND e.etype = 'click'
    GROUP BY 1, 2
),
s2 AS (
    SELECT s1.user_id, t_view, t_click,
           min(CASE WHEN e.us > t_click THEN e.us END) AS t_purchase
    FROM s1 LEFT JOIN e ON e.user_id = s1.user_id AND e.etype = 'purchase'
    GROUP BY 1, 2, 3
),
fz AS (
    SELECT *,
           t_purchase IS NOT NULL
               AND (t_purchase - t_view) <= {_FUNNEL_HORIZON_US} AS converted
    FROM s2
)
SELECT CAST(count(*) AS BIGINT) AS n_entered,
       CAST(count(t_click) AS BIGINT) AS n_step2,
       CAST(count(t_purchase) AS BIGINT) AS n_step3,
       CAST(sum(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT)
           AS n_converted,
       round(quantile_cont(CASE WHEN converted
                                THEN t_purchase - t_view END, 0.5)
             / 1e6, 6) AS med_convert_s
FROM fz
"""


# batch gaps-and-islands sessionization over events: break when the
# inter-event gap STRICTLY exceeds the threshold; order (ts, event_id);
# gap pinned to operators/events.SESSION_GAP_S
_SESSION_GAP_US = 28_800 * 1_000_000

_EVENT_SESSIONS_SQL = f"""WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS us,
           CAST(event_id AS BIGINT) AS eid, CAST(value AS DOUBLE) AS value
    FROM events
),
l AS (
    SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, eid) AS prev_us
    FROM e
),
f AS (
    SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                   THEN 1 ELSE 0 END AS is_new
    FROM l
),
m AS (
    SELECT *, CAST(sum(is_new) OVER (
        PARTITION BY user_id ORDER BY us, eid
        ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
    FROM f
)
SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       round(sum(value), 6) AS total_value
FROM m GROUP BY 1, 2
"""


# as-of join (purchase <- most recent click with us <= purchase us, max
# eid on right-side ts ties): the window restatement of ASOF semantics,
# identical rule text to operators/events.event_asof — right(side 0)
# sorts before left(side 1) at equal us so the <= visibility holds
_EVENT_ASOF_SQL = """WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS etype,
           epoch_us(ts) AS us, CAST(event_id AS BIGINT) AS eid
    FROM events
),
t AS (
    SELECT user_id, us, eid,
           CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END AS side
    FROM e WHERE etype IN ('purchase', 'click')
),
m AS (
    -- both carry-forwards share the us-not-null guard so a null-ts
    -- right event can never split matched_eid/matched_us across rows
    SELECT *,
           last_value(CASE WHEN side = 0 AND us IS NOT NULL THEN us END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, side, eid
               ROWS UNBOUNDED PRECEDING) AS matched_us,
           last_value(CASE WHEN side = 0 AND us IS NOT NULL THEN eid END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, side, eid
               ROWS UNBOUNDED PRECEDING) AS matched_eid
    FROM t
)
SELECT eid AS event_id, user_id, us, matched_eid, matched_us,
       us - matched_us AS lag_us
FROM m WHERE side = 1
"""


# FORWARD as-of join (events.event_asof_forward) — the deliberate
# mirror of _EVENT_ASOF_SQL.  Pins (change both sides or neither):
# (left=purchase, right=click), visibility us_r >= us_l, MIN-eid tie
# on equal right us — all three encoded as the REVERSED window sort
# (us DESC, side ASC, eid DESC) with every direction NULLS LAST
# explicitly (DuckDB defaults NULLS FIRST on DESC).
_EVENT_ASOF_FWD_SQL = """WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS etype,
           epoch_us(ts) AS us, CAST(event_id AS BIGINT) AS eid
    FROM events
),
t AS (
    SELECT user_id, us, eid,
           CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END AS side
    FROM e WHERE etype IN ('purchase', 'click')
),
m AS (
    SELECT *,
           last_value(CASE WHEN side = 0 AND us IS NOT NULL THEN us END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY us DESC NULLS LAST, side ASC NULLS LAST,
                        eid DESC NULLS LAST
               ROWS UNBOUNDED PRECEDING) AS matched_us,
           last_value(CASE WHEN side = 0 AND us IS NOT NULL THEN eid END
                      IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY us DESC NULLS LAST, side ASC NULLS LAST,
                        eid DESC NULLS LAST
               ROWS UNBOUNDED PRECEDING) AS matched_eid
    FROM t
)
SELECT eid AS event_id, user_id, us, matched_eid, matched_us,
       matched_us - us AS lead_us
FROM m WHERE side = 1
"""


# retention matrix: cohort = UTC day index (days since epoch) of the
# user's first event; a user counts once per (cohort, offset) they were
# active in.  Day math restated as floor(us / 86_400e6) on both sides.
_COHORT_RETENTION_SQL = """WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
    FROM events
),
f AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1),
a AS (
    SELECT DISTINCT f.cohort_day, e.day - f.cohort_day AS day_offset,
           e.user_id
    FROM e JOIN f USING (user_id)
)
SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_users
FROM a GROUP BY 1, 2
"""


# interval join (purchase x clicks in the prior hour, both endpoints
# inclusive): the oracle states the raw inequality join; the engine's
# bucketized equi-join must produce the identical pair set
_RANGE_HORIZON_US = 3_600 * 1_000_000

_EVENT_RANGE_JOIN_SQL = f"""WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id, event_type AS etype,
           epoch_us(ts) AS us, CAST(event_id AS BIGINT) AS eid
    FROM events
),
l AS (SELECT user_id, us, eid FROM e WHERE etype = 'purchase'),
r AS (SELECT user_id, us AS right_us, eid AS right_eid FROM e
      WHERE etype = 'click')
SELECT l.eid AS event_id, l.user_id, l.us, r.right_eid, r.right_us,
       l.us - r.right_us AS lag_us
FROM l JOIN r ON r.user_id = l.user_id
             AND r.right_us <= l.us
             AND r.right_us >= l.us - {_RANGE_HORIZON_US}
"""


# OLAP ROLLUP over (event_type, UTC day index); lvl = grouping bitmask
# (Spark grouping_id == DuckDB GROUPING(a, b), first arg most
# significant — verified 0/1/3 on both engines)
_EVENTS_CUBE_SQL = """WITH e AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
           CAST(value AS DOUBLE) AS value
    FROM events
)
SELECT event_type, day,
       CAST(grouping(event_type, day) AS BIGINT) AS lvl,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM e GROUP BY CUBE(event_type, day)
"""

# Per-user activity pivot (operators/events.event_pivot).  Pins
# restated verbatim (change both sides or neither): pinned type list
# click/error/purchase/signup/view rotated into n_<type> columns,
# n_total counts ALL events (unknown types included), purchase_cents =
# per-event round(value * 100.0) BIGINT summed exactly; every user
# with >= 1 event emits.
_EVENT_PIVOT_SQL = """SELECT
    CAST(user_id AS BIGINT) AS user_id,
    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_click,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_error,
    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_purchase,
    CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_signup,
    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         AS BIGINT) AS n_view,
    CAST(count(*) AS BIGINT) AS n_total,
    CAST(sum(CASE WHEN event_type = 'purchase'
             THEN CAST(round(value * 100.0) AS BIGINT)
             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS purchase_cents
FROM events
GROUP BY 1
"""


# RFM segmentation (operators/events.rfm_segments).  Pins restated
# verbatim: purchases only, day = floor(epoch_us/86400e6), exact
# cents, ntile(5) under the pinned deterministic total orders with
# the 6-x flip (best = 5 on every axis), rfm = 100r + 10f + m.
_RFM_SQL = """WITH pur AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
           CAST(round(value * 100.0) AS BIGINT) AS cents
    FROM events WHERE event_type = 'purchase'
),
pu AS (
    SELECT user_id, max(day) AS last_day,
           CAST(count(*) AS BIGINT) AS freq,
           CAST(sum(cents) AS BIGINT) AS monetary_cents
    FROM pur GROUP BY 1
),
base AS (
    SELECT user_id,
           CAST((SELECT max(last_day) FROM pu) - last_day AS BIGINT)
               AS rec_days,
           freq, monetary_cents
    FROM pu
),
scored AS (
    SELECT *,
           CAST(6 - ntile(5) OVER (ORDER BY rec_days ASC, user_id ASC)
                AS BIGINT) AS r,
           CAST(6 - ntile(5) OVER (ORDER BY freq DESC, user_id ASC)
                AS BIGINT) AS f,
           CAST(6 - ntile(5) OVER (ORDER BY monetary_cents DESC,
                                   user_id ASC) AS BIGINT) AS m
    FROM base
)
SELECT user_id, rec_days, freq, monetary_cents, r, f, m,
       CAST(100 * r + 10 * f + m AS BIGINT) AS rfm
FROM scored
"""


# A/B experiment readout (operators/events.ab_test_report).  Pins
# restated verbatim (change both sides or neither): variant =
# hash60('ab-' || user_id) % 2, population = DISTINCT user_ids,
# conversion = >= 1 'purchase' event, conv_ppm = (2*1e6*conv + n) DIV
# (2*n) integer round-half-away.
_AB_TEST_SQL = """WITH pu AS (
    SELECT CAST(user_id AS BIGINT) AS u,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY 1
),
v AS (
    SELECT CAST(('0x' || substr(md5('ab-' || CAST(u AS VARCHAR)), 1, 15))
                ::UBIGINT AS BIGINT) % 2 AS variant,
           conv
    FROM pu
)
SELECT CAST(variant AS BIGINT) AS variant,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(conv) AS BIGINT) AS n_converted,
       CAST((2 * 1000000 * sum(conv) + count(*)) // (2 * count(*))
            AS BIGINT) AS conv_ppm
FROM v GROUP BY 1
"""


# Fixed-width value histogram (operators/events.events_value_histogram).
# Pins restated verbatim: cents = per-event round(value * 100.0)
# BIGINT, bin = cents // 2000 (values non-negative), empty bins absent,
# min/max cents audit columns.
_EVENT_HIST_SQL = """SELECT
    event_type,
    CAST(CAST(round(value * 100.0) AS BIGINT) // 2000 AS BIGINT) AS bin,
    CAST(count(*) AS BIGINT) AS n,
    CAST(min(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS min_cents,
    CAST(max(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS max_cents
FROM events
GROUP BY 1, 2
"""


_EVENTS_ROLLUP_SQL = """WITH e AS (
    SELECT event_type,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
           CAST(value AS DOUBLE) AS value
    FROM events
)
SELECT event_type, day,
       CAST(grouping(event_type, day) AS BIGINT) AS lvl,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS total_value
FROM e GROUP BY ROLLUP(event_type, day)
"""


# batch sliding windows (1 h window, 15 min slide, epoch-aligned):
# event at t belongs to starts slide*i, i in
# [floor((t - window)/slide) + 1, floor(t/slide)] — the unnest
# materializes what Spark's Expand node streams
_SLIDE_W_US = 3_600 * 1_000_000
_SLIDE_S_US = 900 * 1_000_000

_EVENTS_SLIDING_SQL = f"""WITH e AS (
    SELECT event_type, epoch_us(ts) AS us FROM events
),
x AS (
    SELECT event_type,
           unnest(range(
               CAST(floor((us - {_SLIDE_W_US}) / {_SLIDE_S_US}) AS BIGINT) + 1,
               CAST(floor(us / {_SLIDE_S_US}) AS BIGINT) + 1)) AS i
    FROM e
)
SELECT CAST(i * {_SLIDE_S_US} AS BIGINT) AS window_start_us, event_type,
       CAST(count(*) AS BIGINT) AS n_events
FROM x GROUP BY 1, 2
"""


# concat-and-chunk sequence packing: pack_key = hash60('pack-'||id)
# (salt pinned to curation.PACK_SALT), global prefix sum over
# (pack_key, id), window = curation.PACK_WINDOW; bpe formula restated
# verbatim from textstats/budget_pack; zero-token docs -> (-1, -1, 0)
def _pack_sequences_sql(window: int, salt: str) -> str:
    return f"""WITH {_DOC_TOKENS},
st AS (
    SELECT doc_id AS id,
           CAST(coalesce(list_sum(list_transform(tokens,
               x -> CAST(ceil(length(x) / 4) AS INTEGER))), 0) AS BIGINT)
               AS bpe_est,
           CAST(('0x' || substr(md5('{salt}-' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                AS BIGINT) AS pack_key
    FROM doctoks
),
c AS (
    SELECT id, pack_key, bpe_est,
           CAST(sum(bpe_est) OVER (ORDER BY pack_key, id
               ROWS UNBOUNDED PRECEDING) - bpe_est AS BIGINT) AS start_tok
    FROM st
)
SELECT CAST(id AS BIGINT) AS id, pack_key, bpe_est, start_tok,
       CAST(CASE WHEN bpe_est > 0 THEN start_tok // {window}
                 ELSE -1 END AS BIGINT) AS first_win,
       CAST(CASE WHEN bpe_est > 0 THEN (start_tok + bpe_est - 1) // {window}
                 ELSE -1 END AS BIGINT) AS last_win,
       CAST(CASE WHEN bpe_est > 0
                 THEN (start_tok + bpe_est - 1) // {window}
                      - start_tok // {window} + 1
                 ELSE 0 END AS BIGINT) AS n_wins
FROM c
"""


# deterministic shuffled shard export: key = hash60('shard-'||id),
# shard = key mod 16, pos = rank within shard on (key, id) — salt and
# shard count pinned to curation.SHARD_SALT / SHARD_COUNT
_EXPORT_SHARDS_SQL = """WITH k AS (
    SELECT CAST(doc_id AS BIGINT) AS id,
           CAST(('0x' || substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                AS BIGINT) AS skey
    FROM documents
),
s AS (SELECT id, skey, CAST(skey % 16 AS BIGINT) AS shard FROM k)
SELECT id, shard,
       CAST(row_number() OVER (
           PARTITION BY shard ORDER BY skey, id) AS BIGINT) AS pos
FROM s
"""


# best-window snippet extraction: hits = matched token positions, best
# start = (hit count in [pos, pos+W) desc, pos asc); W pinned to
# operators/snippets.SNIPPET_WINDOW; candidate starts are hit
# positions only — restated identically in the Spark op
def _snippets_sql(queries, window: int) -> str:
    return f"""WITH {_DOC_TOKENS},
q AS (SELECT * FROM {_values(queries)} q(qid, qtext)),
qterms AS (
    SELECT DISTINCT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term
    FROM q
),
pos AS (
    SELECT doc_id AS id, CAST(t.i AS BIGINT) AS pos, tokens[t.i + 1] AS term
    FROM doctoks, unnest(range(0, len(tokens))) AS t(i)
),
hits AS (
    SELECT q.qid, p.id, p.pos
    FROM pos p JOIN qterms q USING (term)
),
counted AS (
    SELECT *, CAST(count(*) OVER (
        PARTITION BY qid, id ORDER BY pos
        RANGE BETWEEN CURRENT ROW AND {window - 1} FOLLOWING
    ) AS BIGINT) AS n_hits
    FROM hits
),
best AS (
    SELECT qid, id, pos AS start_pos, n_hits FROM (
        SELECT *, row_number() OVER (
            PARTITION BY qid, id ORDER BY n_hits DESC, pos ASC) AS brank
        FROM counted) WHERE brank = 1
)
SELECT b.qid, b.id, b.start_pos, b.n_hits,
       array_to_string(
           d.tokens[b.start_pos + 1 : b.start_pos + {window}], ' ')
           AS snippet
FROM best b JOIN doctoks d ON d.doc_id = b.id
"""


# per-user daily resample + gap-fill (the hypertable-rollup
# primitive): empty days emit zeros, last_value forward-fills the
# day's closing value (last event by (us desc, eid desc))
_EVENTS_GAPFILL_SQL = """WITH e AS (
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
           epoch_us(ts) AS us, CAST(event_id AS BIGINT) AS eid,
           CAST(value AS DOUBLE) AS value
    FROM events
),
r AS (
    SELECT *, row_number() OVER (
        PARTITION BY user_id, day ORDER BY us DESC, eid DESC) AS rn
    FROM e
),
daily AS (
    SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS total_value,
           max(CASE WHEN rn = 1 THEN value END) AS close_value
    FROM r GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM e GROUP BY 1),
grid AS (
    SELECT user_id, CAST(unnest(range(d0, d1 + 1)) AS BIGINT) AS day
    FROM span
),
g AS (
    SELECT gr.user_id, gr.day, d.n_events, d.total_value, d.close_value
    FROM grid gr LEFT JOIN daily d USING (user_id, day)
)
SELECT user_id, day,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       coalesce(total_value, 0.0) AS total_value,
       round(last_value(close_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY day
           ROWS UNBOUNDED PRECEDING), 6) AS last_value
FROM g
"""


# deterministic train/val/test split: same md5 coin family as
# domain_mix_sample, salt 'split', thresholds 100k/200k ppm
_TRAIN_SPLIT_SQL = """WITH k AS (
    SELECT CAST(doc_id AS BIGINT) AS id,
           CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT
                AS BIGINT) % 1000000 AS split_key
    FROM documents
)
SELECT id, split_key,
       CASE WHEN split_key < 100000 THEN 'test'
            WHEN split_key < 200000 THEN 'val'
            ELSE 'train' END AS split
FROM k
"""


# semi-structured rollup: props->'$.k' extracted on both engines
# (get_json_object <-> json_extract_string), exact interpolated median
# of value (Spark percentile <-> DuckDB quantile_cont), round 6
_EVENT_PROPS_ROLLUP_SQL = """SELECT
    event_type,
    CAST(count(*) AS BIGINT) AS n_events,
    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
    CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        AS sum_k,
    CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        AS min_k,
    CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        AS max_k,
    round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
    round(CAST(quantile_cont(CAST(value AS DOUBLE), 0.5) AS DOUBLE), 6)
        AS p50_value
FROM events GROUP BY 1
"""


def pipeline_oracles() -> dict[str, str]:
    return {
        "exact_dedup": _EXACT_DEDUP_SQL,
        "jaccard_pairs": _JACCARD_PAIRS_SQL,
        # LSH + exact-verify returns exactly the exhaustive pairs when
        # banding recall is 1 at the threshold (asserted in tests) —
        # the oracle is the exhaustive computation.
        "minhash_lsh_pairs": _JACCARD_PAIRS_SQL,
        # streaming_neardup shares the batch LSH oracle BY DESIGN:
        # shared band/shingle expressions, each pair discovered in
        # exactly one epoch, bucket cap non-binding on the driver
        # corpora (the batch==exact condition)
        "streaming_neardup": _JACCARD_PAIRS_SQL,
        # connected-components survivor selection over the same pairs
        "dedup_keep_list": _DEDUP_KEEP_SQL,
        "simhash": _simhash_sql(),
        "lang_id": _lang_id_sql(),
        "quality_score": _QUALITY_SQL,
        "length_outliers": _LENGTH_OUTLIERS_SQL,
        "feature_hashing": _FEATURE_HASHING_SQL,
        "token_counts": _TOKEN_COUNTS_SQL,
        "token_fertility": _TOKEN_FERTILITY_SQL,
        "corpus_manifest": _CORPUS_MANIFEST_SQL,
        "readability_scores": _READABILITY_SQL,
        "fingerprint": _FINGERPRINT_SQL,
        # MOSS winnowing local fingerprints (textstats.winnow_fingerprints)
        "winnow_fingerprints": _winnow_sql(4, 5),
        "winnow_pairs": _winnow_pairs_sql(4, 5),
        "cosine_topk": _COSINE_TOPK_SQL,
        "cosine_topk_filtered": _COSINE_FILTERED_SQL,
        "knn_classify": _KNN_CLASSIFY_SQL,
        "nearest_centroid": _NEAREST_CENTROID_SQL,
        "conv_mean_embeddings": _CONV_MEAN_EMB_SQL,
        "embedding_moments": _EMB_MOMENTS_SQL,
        "dense_maxp_topk": _DENSE_MAXP_SQL,
        "conv_maxsim_topk": _CONV_MAXSIM_SQL,
        "knn_join": _KNN_JOIN_SQL,
        # MMR diversified top-k (params pinned to similarity.mmr_topk)
        "mmr_topk": _mmr_sql(PROBE_IDS, ANN_K, 20, 0.5),
        # exact duplicated-substring span coverage (fixed-width form of
        # Lee et al. 2021); n pinned to dedup.DUPSPAN_N
        "dup_spans": _dup_spans_sql(4),
        # exact phrase queries over the n-gram stream
        "phrase_topk": _phrase_topk_sql(PHRASE_SET, PHRASE_K),
        # literal substring search (trigram-pruned grep; prune exact
        # by construction, oracle = direct contains scan)
        "substring_topk": _substring_topk_sql(SUBSTR_SET, SUBSTR_K),
        # regex grep (RE2/Java-common subset, non-overlapping count)
        "regex_topk": _regex_topk_sql(REGEX_SET, REGEX_K),
        # field-weighted passage BM25 (assistant turns w=2)
        "bm25f_topk": _bm25f_sql(QUERY_SET, TOPK_K),
        # lexical more-like-this (micro-quantized tf-idf cosine)
        "more_like_this": _mlt_sql(MLT_PROBE_DOCNOS, MLT_K),
        "vsm_cosine_topk": _vsm_topk_sql(QUERY_SET, TOPK_K),
        # Clarity QPP (integer micro-log10 KL, params pinned to qpp.py)
        "clarity_scores": _clarity_sql(QUERY_SET, 10),
        # the stored positional path must return EXACTLY the corpus-scan
        # phrase result — same oracle by design
        "phrase_topk_positional": _phrase_topk_sql(PHRASE_SET, PHRASE_K),
        # append-only incremental growth must serve identically
        "phrase_topk_incremental": _phrase_topk_sql(PHRASE_SET, PHRASE_K),
        "proximity_topk": _PROXIMITY_SQL,
        # unordered-window proximity (#uwN; anchor = first term)
        "uw_proximity_topk": _UW_PROXIMITY_SQL,
        # Sequential Dependence Model (unigram + #1 + #uw8, micro-exact)
        "sdm_topk": _SDM_SQL,
        # per-doc TextRank keywords (integer PageRank, unrolled CTEs)
        "textrank_keywords": _TEXTRANK_SQL,
        # relational OLAP suite over the TPC-H-shaped tables
        "tpch_pricing_summary": _TPCH_Q1_SQL,
        "tpch_top_orders": _TPCH_Q3_SQL,
        "tpch_order_priority": _TPCH_Q4_SQL,
        "tpch_local_supplier_volume": _TPCH_Q5_SQL,
        "tpch_forecast_revenue": _TPCH_Q6_SQL,
        "tpch_returned_revenue": _TPCH_Q10_SQL,
        "tpch_promo_share": _TPCH_Q14_SQL,
        "tpch_customer_distribution": _TPCH_Q13_SQL,
        "tpch_large_orders": _TPCH_Q18_SQL,
        "tpch_discounted_revenue": _TPCH_Q19_SQL,
        # the spark.sql() surface runs the SAME Q1 (same oracle)
        "tpch_pricing_summary_sql": _TPCH_Q1_SQL,
        "tpch_volume_shipping": _TPCH_Q7_SQL,
        "tpch_market_share": _TPCH_Q8_SQL,
        "tpch_product_profit": _TPCH_Q9_SQL,
        "tpch_top_supplier": _TPCH_Q15_SQL,
        "tpch_min_cost_supplier": _TPCH_Q2_SQL,
        "tpch_important_stock": _TPCH_Q11_SQL,
        "tpch_parts_supplier_counts": _TPCH_Q16_SQL,
        "tpch_excess_stock": _TPCH_Q20_SQL,
        "tpch_small_qty_revenue": _TPCH_Q17_SQL,
        "tpch_idle_rich_customers": _TPCH_Q22_SQL,
        "tpch_priority_mix": _TPCH_Q12_SQL,
        "tpch_waiting_suppliers": _TPCH_Q21_SQL,
        # distributed k-means (all-integer Lloyd state, unrolled
        # iterations) + SemDeDup within-cluster pruning — literals
        # pinned to operators/clustering.{KM_K,KM_ITERS,KM_MICRO,
        # SEM_TAU}: change both sides or neither
        "kmeans_clusters": _kmeans_sql(10, 3, 1_000_000),
        "semdedup": _semdedup_sql(10, 3, 1_000_000, 0.35),
        "embedding_near_dup": _EMBED_NEAR_DUP_SQL,
        # LSH-blocked + exact-verify path must reproduce the exhaustive
        # pairs (band params pinned with measured recall 1.0 on this
        # corpus at sf0.01 and sf0.1 — tests/test_pipeline_ops.py)
        "embedding_near_dup_blocked": _EMBED_NEAR_DUP_SQL,
        # ANN machinery at exactness-recovering parameters: nprobe ==
        # n_cells (IVF) / hamming_radius == bits (LSH) make the
        # candidate set the full corpus, so the distributed plumbing
        # (assignment matmul, cell/signature equi-join, ranking) must
        # reproduce the exhaustive cosine oracle bit-for-bit; the
        # approximate regimes keep their recall floors in pytest.
        "ivf_cosine_topk_exact": _COSINE_TOPK_SQL,
        # streaming-ingested IVF at full probe == exhaustive cosine
        "streaming_ivf_topk_exact": _COSINE_TOPK_SQL,
        "lsh_cosine_topk_exact": _COSINE_TOPK_SQL,
        # SQ8 two-pass top-k: the int8 pass only PRE-RANKS — the final
        # ranking comes from exact float64 cosine over the rescore pool,
        # and at the pinned rescore factor the pool contains the true
        # top-k on these corpora (rank-identity measured at
        # sf0.001/0.01/0.1), so the exhaustive oracle applies verbatim.
        "sq_cosine_topk": _COSINE_TOPK_SQL,
        # PQ-ADC with exact rescore: pool provably contains the true
        # top-k at the pinned rescore factor (similarity.PQ_RESCORE)
        "pq_cosine_topk": _COSINE_TOPK_SQL,
        # IVF-PQ at nprobe == IVF_CENTROIDS: pool == pq_cosine_topk's
        # by construction (same codebooks/rescore), recall 1.0 pinned
        "ivfpq_cosine_topk": _COSINE_TOPK_SQL,
        # real binary decode (PPM P6) through mapInPandas vs the md5
        # byte stream restated in SQL
        "ppm_image_features": _PPM_FEATURES_SQL,
        "image_ahash_pairs": _AHASH_PAIRS_SQL,
        "audio_fingerprint_pairs": _AUDIO_FP_SQL,
        "video_fingerprint_pairs": _VIDEO_FP_SQL,
        # real resize kernel: stride-2 nearest-neighbor grid, exact
        # integer channel sums (16x16 -> 8x8; pixel = pos//3,
        # row = pixel//16, col = pixel%16, chan = pos%3)
        "ppm_resize": _PPM_RESIZE_SQL,
        "wav_audio_features": _WAV_FEATURES_SQL,
        "y4m_frame_stats": _Y4M_STATS_SQL,
        "y4m_scene_cuts": _Y4M_SCENE_SQL,
        "wav_energy_segments": _WAV_SEGMENTS_SQL,
        "ppm_color_histogram": _PPM_HIST_SQL,
        # frame sampling: the SAME stats restricted to even frames
        "y4m_frame_sample": _Y4M_STATS_SQL.replace(
            "GROUP BY id, pos // 192",
            "GROUP BY id, pos // 192 HAVING (pos // 192) % 2 = 0"
        ),
        # bigram-LM quality/selection scores — exact integer micro-log10
        # sums on both sides (order-independent across engines)
        "bigram_lm_ppl": _BIGRAM_LM_PPL_SQL,
        "lm_importance": _LM_IMPORTANCE_SQL,
        "pmi_collocations": _PMI_COLLOCATIONS_SQL,
        "segment_queries": _segment_queries_sql(QUERY_SET),
        "vocab_kl_drift": _VOCAB_KL_SQL,
        "spell_correct": _SPELL_CORRECT_SQL,
        "bpe_merges": _BPE_MERGES_SQL,
        "bpe_segmentation": _BPE_SEGMENT_SQL,
        "kmv_distinct": _KMV_DISTINCT_SQL,
        "ams_f2": _AMS_F2_SQL,
        "streaming_ams": _STREAMING_AMS_SQL,
        "hll_distinct": _HLL_DISTINCT_SQL,
        "bloom_terms": _BLOOM_SQL,
        "cms_term_counts": _CMS_SQL,
        "containment_pairs": _CONTAINMENT_SQL,
        # quantile sketch in the exact regime (k=4096 >= every group
        # at every SF, so the bottom-k sample IS the group — the kmv
        # below-k discipline; approximate regime in pytest)
        "quantile_sketch": _QUANTILE_SKETCH_SQL,
        # streaming_quantiles shares the batch oracle VERBATIM:
        # bottom-k-by-hash merge is exact and replay-idempotent, and
        # in the pinned exact regime the sample IS the group
        "streaming_quantiles": _QUANTILE_SKETCH_SQL,
        # streaming final state == batch sketch (mergeable-sketch law)
        "streaming_kmv": _KMV_STREAM_SQL,
        "streaming_cms": _CMS_STREAM_SQL,
        "streaming_bloom": _BLOOM_STREAM_SQL,
        "streaming_hll": _HLL_STREAM_SQL,
        # prefix filtering is exact: same pair set as the direct join
        "jaccard_pairs_prefix": _JACCARD_PAIRS_SQL,
        "complete_prefix": _COMPLETE_PREFIX_SQL,
        "item_pagerank": _ITEM_PAGERANK_SQL,
        "item_lpa": _ITEM_LPA_SQL,
        "item_ppr": _ITEM_PPR_SQL,
        "item_transitions": _ITEM_TRANSITIONS_SQL,
        "item_communities": _ITEM_COMMUNITIES_SQL,
        # min-hop BFS over the strong co-visitation graph (seeds and
        # hop bound pinned; edge threshold shared with communities)
        "item_bfs": _item_bfs_sql(BFS_SEEDS, 3),
        # item-item CF cosine (binary user vectors, exact intersections)
        "item_similarity": _ITEM_SIMILARITY_SQL,
        "item_adamic_adar": _ITEM_AA_SQL,
        "item_assoc_rules": _ASSOC_SQL,
        "item_hits": _item_hits_sql(),
        "triangle_counts": _TRIANGLE_COUNTS_SQL,
        "conversation_stats": _conversation_stats_sql(),
        "cdc_apply": _cdc_apply_sql(),
        # streaming_cdc shares the batch oracle BY DESIGN: per-key
        # argmax over a unique seq is commutative/associative/
        # idempotent, so the final streamed winners equal the batch
        # window under any feed split
        "streaming_cdc": _cdc_apply_sql(),
        "scd2_history": _scd2_sql(),
        "instruction_pairs": _INSTRUCTION_PAIRS_SQL,
        # streaming_sft shares the batch oracle BY DESIGN: the
        # doc_id-prefix split keeps per-conversation turn order across
        # epochs, so the held-last-turn state sees exactly the batch
        # adjacency
        "streaming_sft": _INSTRUCTION_PAIRS_SQL,
        "turn_windows": _turn_windows_sql(3),
        "assistant_token_spans": _assistant_spans_sql(),
        # streaming SpaceSaving == batch top-k at the pinned capacity
        # (no eviction fires below HH_CAP distinct terms per source)
        "term_suggest": _term_suggest_sql(),
        "streaming_heavy_hitters": f"""
WITH tok AS (
    SELECT source, unnest({_TOKENS_EXPR.format(col='text')}) AS term
    FROM documents
),
cnt AS (
    SELECT source, term, CAST(count(*) AS BIGINT) AS cnt
    FROM tok GROUP BY source, term
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY cnt DESC, term ASC
    ) AS rn FROM cnt
)
SELECT source, term, cnt FROM ranked WHERE rn <= 10
ORDER BY source, term
""",
        "session_paths": _SESSION_PATHS_SQL,
        # composite corpus-cleaning verdict (dedup + lang + quality +
        # token budget in one pass); the dedup leg shares the banding-
        # recall-1.0 assumption guarded by
        # tests/test_pipeline_ops.py::test_lsh_banding_recall_is_total_here
        "training_corpus": _training_corpus_sql(),
        # streaming exact dedup: per-turn verdict, winner = min key per
        # fingerprint (batch-invariant under conv-ordered epochs)
        "streaming_dedup": _STREAMING_DEDUP_SQL,
        # curation family: benchmark 8-gram decontamination (broadcast
        # semi-join shape), Gopher repetition filters, PII scrub over
        # the injected-PII corpus, deterministic domain-mix sampling
        "decontaminate": _DECONTAMINATE_SQL,
        "repetition_stats": _REPETITION_SQL,
        "pii_scrub": _PII_SCRUB_SQL,
        "domain_mix_sample": _DOMAIN_MIX_SQL,
        # cross-doc boilerplate n-grams + per-domain token-budget
        # packing (distributed prefix sum on the Spark side)
        "boilerplate_stats": _boilerplate_sql(),
        "budget_pack": _budget_pack_sql(),
        "doc_chunks": _DOC_CHUNKS_SQL_TMPL.format(
            doctoks=_DOC_TOKENS, stride=16, window=32
        ),
        "span_corruption": _SPAN_CORRUPTION_SQL,
        "preference_pairs": _PREFERENCE_PAIRS_SQL.replace(
            "__QS_STOPS__", _QS_STOPS_SQL
        ),
        # streaming twin shares the batch oracle VERBATIM (max/min
        # merge idempotence + additive count, exactly-once offsets)
        "streaming_preference": _PREFERENCE_PAIRS_SQL.replace(
            "__QS_STOPS__", _QS_STOPS_SQL
        ),
        # per-doc TF-IDF keyword extraction + the two classic
        # event-analytics workloads (ordered funnel, batch
        # gaps-and-islands sessionization) over the events table
        "top_keywords": _top_keywords_sql(),
        "event_funnel": _EVENT_FUNNEL_SQL,
        "funnel_summary": _FUNNEL_SUMMARY_SQL,
        "event_sessions": _EVENT_SESSIONS_SQL,
        # the streaming funnel converges to the batch funnel under the
        # time-ordered-epoch contract — the SAME SQL gates both
        "streaming_funnel": _EVENT_FUNNEL_SQL,
        # as-of join, retention matrix, semi-structured JSON rollup
        "event_asof": _EVENT_ASOF_SQL,
        "event_asof_forward": _EVENT_ASOF_FWD_SQL,
        "cohort_retention": _COHORT_RETENTION_SQL,
        "event_props_rollup": _EVENT_PROPS_ROLLUP_SQL,
        # bucketized interval join, OLAP rollup, sliding windows
        "event_range_join": _EVENT_RANGE_JOIN_SQL,
        # stream-stream interval join: SAME rows as the batch op —
        # inner joins emit on arrival, watermarks only bound state
        "streaming_range_join": _EVENT_RANGE_JOIN_SQL,
        "events_rollup": _EVENTS_ROLLUP_SQL,
        "event_pivot": _EVENT_PIVOT_SQL,
        # streaming_pivot shares the batch oracle VERBATIM: additive
        # integer counters + exactly-once offsets (the streaming_cms
        # discipline)
        "streaming_pivot": _EVENT_PIVOT_SQL,
        "events_value_histogram": _EVENT_HIST_SQL,
        "ab_test_report": _AB_TEST_SQL,
        "rfm_segments": _RFM_SQL,
        # streaming_rfm shares the batch oracle VERBATIM: max-merge +
        # additive counters with exactly-once offsets; quintiles
        # derive at read time through the one shared derivation
        "streaming_rfm": _RFM_SQL,
        # full CUBE (adds the per-day cross-type subtotals, lvl=2)
        "events_cube": _EVENTS_CUBE_SQL,
        "events_sliding_counts": _EVENTS_SLIDING_SQL,
        # deterministic shuffled shard export + train/val/test split
        "export_shards": _EXPORT_SHARDS_SQL,
        "train_split": _TRAIN_SPLIT_SQL,
        # per-domain adaptive quality threshold (median calibration)
        "adaptive_quality": _ADAPTIVE_QUALITY_SQL,
        # concat-and-chunk packing (window/salt pinned to curation)
        "pack_sequences": _pack_sequences_sql(256, "pack"),
        # best-window snippet extraction over the documents table
        "snippets": _snippets_sql(QUERY_SET, 10),
        # per-user daily resample + forward-fill gap-fill
        "events_gapfill": _EVENTS_GAPFILL_SQL,
        # hourly count anomalies (dense grid, integer stats, pinned
        # double-before-multiply z² form, threshold 4.0)
        "event_anomalies": _EVENT_ANOMALIES_SQL,
        "event_trend": _EVENT_TREND_SQL,
        # streaming trend shares the batch oracle VERBATIM (additive
        # counters + the ONE shared read-time derivation)
        "streaming_trend": _EVENT_TREND_SQL,
        "session_entry_exit": _SESSION_ENTRY_EXIT_SQL,
        # streaming_anomalies shares the batch oracle VERBATIM:
        # counter addition + exactly-once offsets make the final
        # streamed counts equal the batch aggregate; the z² analysis
        # derives at read time through the one shared derivation
        "streaming_anomalies": _EVENT_ANOMALIES_SQL,
        # time-decayed item popularity (2^-age micro-quantized)
        "item_popularity": _ITEM_POPULARITY_SQL,
    }


def _hybrid_borda_sql(probe_ids, k: int, pool: int) -> str:
    """Borda-count fusion (operators/hybrid.hybrid_borda_topk).  Pins
    restated: per-system contribution = pool + 1 - rank as BIGINT
    (integer-native, no quantization), pools / probe-self-exclusion /
    leg rankings shared VERBATIM with the RRF gate, fusion ties
    (borda desc, doc asc), fused score stays the exact integer sum."""
    ids = ", ".join(str(i) for i in probe_ids)
    return f"""{_PREFIX},
pq AS (
    SELECT CAST(doc_id AS VARCHAR) AS qid, text AS qtext
    FROM documents WHERE doc_id IN ({ids})
),
qtok AS (
    SELECT qid, unnest({_TOKENS_EXPR.format(col='qtext')}) AS term FROM pq
),
qterms AS (
    SELECT qid, term, CAST(count(*) AS BIGINT) AS qtf FROM qtok GROUP BY qid, term
),
qexist AS (
    SELECT q.qid, q.term, q.qtf, l.df FROM qterms q JOIN lexicon l USING (term)
),
lscored AS (
    SELECT q.qid, p.docid,
           sum(q.qtf * ({_BM25})) AS raw_score
    FROM qexist q
    JOIN postings p USING (term)
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.qid, p.docid
),
lexr AS (
    SELECT qid, docid - 1 AS doc,
           row_number() OVER (
               PARTITION BY qid
               ORDER BY round(raw_score, 6) DESC, docid ASC
           ) AS rn
    FROM lscored
    WHERE docid <> CAST(qid AS BIGINT) + 1
),
lexp AS (
    SELECT qid, doc, CAST({pool} + 1 - rn AS BIGINT) AS cl
    FROM lexr WHERE rn <= {pool}
),
dns AS (
    SELECT CAST(p.vec_id AS VARCHAR) AS qid, b.vec_id AS doc,
           {_cos6('p.embedding', 'b.embedding')} AS cos6
    FROM embeddings p JOIN embeddings b ON b.vec_id <> p.vec_id
    WHERE p.vec_id IN ({ids})
),
dnsr AS (
    SELECT qid, doc,
           row_number() OVER (
               PARTITION BY qid ORDER BY cos6 DESC, doc ASC
           ) AS rn
    FROM dns
),
dnsp AS (
    SELECT qid, doc, CAST({pool} + 1 - rn AS BIGINT) AS cd
    FROM dnsr WHERE rn <= {pool}
),
fused AS (
    SELECT coalesce(l.qid, d.qid) AS qid,
           coalesce(l.doc, d.doc) AS doc,
           coalesce(l.cl, 0) + coalesce(d.cd, 0) AS fm
    FROM lexp l FULL OUTER JOIN dnsp d
        ON l.qid = d.qid AND l.doc = d.doc
),
ranked AS (
    SELECT qid, doc, fm,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY fm DESC, doc ASC
           ) AS BIGINT) AS rank
    FROM fused
)
SELECT qid, CAST(doc AS VARCHAR) AS docno, rank, CAST(fm AS BIGINT) AS borda
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""


def _postretrieval_qpp_sql(queries, standard: str, k: int) -> str:
    """operators/qpp.postretrieval_qpp: WIG (corpus baseline 0) + NQC
    (mean-normalized).  Pins restated verbatim: su = round(1e6*score)
    BIGINT over the ROUND-6 ranking scores, S/Q exact integer sums,
    n_terms = DISTINCT in-lexicon query terms, wig = round(S /
    (k_used * sqrt(n_terms) * 1e6), 6), nqc = round(sqrt(double(
    k_used*Q - S^2)) / double(S), 6) with S <= 0 pinned to 0.0 —
    IEEE sqrt is correctly rounded on both engines; one division
    each."""
    return f"""{_ranked_ctes(queries, standard, False)},
su AS (
    SELECT qid, CAST(round(1000000.0 * score, 0) AS BIGINT) AS su
    FROM ranked WHERE rank <= {k}
),
qa AS (
    SELECT qid, CAST(count(*) AS BIGINT) AS k_used,
           CAST(sum(su) AS BIGINT) AS s_sum,
           CAST(sum(su * su) AS BIGINT) AS s_sq
    FROM su GROUP BY qid
),
qn AS (
    SELECT qid, CAST(count(DISTINCT term) AS BIGINT) AS n_terms
    FROM qexist GROUP BY qid
)
SELECT a.qid, a.k_used, n.n_terms, a.s_sum, a.s_sq,
       round(CAST(a.s_sum AS DOUBLE)
             / (CAST(a.k_used AS DOUBLE) * sqrt(CAST(n.n_terms AS DOUBLE))
                * 1000000.0), 6) AS wig,
       CASE WHEN a.s_sum <= 0 THEN 0.0
            ELSE round(
                sqrt(CAST(a.k_used * a.s_sq - a.s_sum * a.s_sum AS DOUBLE))
                / CAST(a.s_sum AS DOUBLE), 6)
       END AS nqc
FROM qa a JOIN qn n USING (qid)
ORDER BY a.qid
"""


def _impact_topk_sql(queries, k: int, levels: int = 255) -> str:
    """operators/impact.impact_topk: impact-ordered (SAAT) retrieval.
    Pins restated verbatim: per-posting score6 = ROUND-6 BM25 (qtf=1,
    corpus-global stats), smax = global max(score6), impact =
    round((levels.0 * s6) / smax) BIGINT — multiplication binds before
    the ONE division — zero-impact postings DROPPED, total = exact
    integer sum of qtf * impact, rank (total desc, docid asc)."""
    bm25_l = _BM25.replace("q.df", "l.df")
    return f"""{_PREFIX}, {_query_ctes(queries)},
pscore AS (
    SELECT p.term, p.docid, round(({bm25_l}), 6) AS s6
    FROM postings p
    JOIN lexicon l ON p.term = l.term
    JOIN doclens dl ON p.docid = dl.docid
    CROSS JOIN stats s
),
smax AS (SELECT max(s6) AS m FROM pscore),
imp AS (
    SELECT term, docid,
           CAST(round(({levels}.0 * s6) / m, 0) AS BIGINT) AS impact
    FROM pscore CROSS JOIN smax
),
impk AS (SELECT * FROM imp WHERE impact >= 1),
totals AS (
    SELECT q.qid, i.docid, sum(q.qtf * i.impact) AS total
    FROM qexist q JOIN impk i USING (term)
    GROUP BY 1, 2
),
ranked AS (
    SELECT qid, docid, total,
           CAST(row_number() OVER (
               PARTITION BY qid ORDER BY total DESC, docid ASC
           ) AS BIGINT) AS rank
    FROM totals
)
SELECT qid, CAST(docid - 1 AS VARCHAR) AS docno, rank,
       CAST(total AS BIGINT) AS impact
FROM ranked WHERE rank <= {k}
ORDER BY qid, rank
"""
