"""Query-language completeness: min-should-match and query-time
synonym expansion — the two Lucene query-DSL features between plain
OR and the +must/-not boolean syntax (operators/boolquery.py).

min-should-match (msm_topk): a doc qualifies iff it matches at least
m of the query's IN-LEXICON distinct terms, with m clamped per query
to that count (the Lucene clamp: a 1-term query under msm=2 still
matches on its 1 term; a 2-term query behaves conjunctively).
Scoring/rank identical to the standard BM25 path over the qualifying
docs.

synonym expansion (synonym_topk): each original query term t expands
to {t} ∪ SYN_MAP[t] at its original weight; when two originals expand
to the same term its weights SUM (the natural groupBy semantics —
pinned); OOV expansion terms drop exactly like OOV originals.  df for
the expanded terms is their own lexicon df (no blending).  Both
restated verbatim in the oracle.

Scale shape: both are the standard broadcast-query-terms join + one
(qid, docid) aggregate — msm adds a HAVING on the match count,
synonyms only widen the tiny broadcast table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .topk import query_terms

MSM_M = 2


def msm_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    m: int = MSM_M,
    k: int = 10,
) -> DataFrame:
    """-> DataFrame(qid string, docno string, rank long, score double)."""
    spark = index.flat.sparkSession
    empty = "qid string, docno string, rank long, score double"
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame([], empty)
    terms = sorted({t for _, t, _ in qt_rows})
    lex = (
        index.lexicon.where(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    )
    df_by_term = {r["term"]: r["df"] for r in lex}
    rows = [
        (q, t, c, df_by_term[t]) for q, t, c in qt_rows if t in df_by_term
    ]
    if not rows:
        return spark.createDataFrame([], empty)
    qt = spark.createDataFrame(
        rows, "qid string, term string, qtf int, df long"
    )
    need: dict[str, int] = {}
    for q, _, _, _ in rows:
        need[q] = need.get(q, 0) + 1
    req = F.create_map(
        *[F.lit(x) for q, n in sorted(need.items()) for x in (q, min(m, n))]
    )

    s = scoring.bm25_col(
        F.col("tf"), F.col("doc_len"), F.col("df"), index.n_docs, index.avgdl
    )
    scored = (
        index.flat.join(F.broadcast(qt), "term")
        .withColumn("contrib", F.col("qtf") * s)
        .groupBy("qid", "docid")
        .agg(F.sum("contrib").alias("raw"), F.count("*").alias("nmatch"))
        .where(F.col("nmatch") >= req[F.col("qid")])
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("score", F.round(F.col("raw"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            (F.col("docid") - 1).cast("string").alias("docno"),
            "rank",
            "score",
        )
    )


def synonym_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    syn_map: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """-> DataFrame(qid string, docno string, rank long, score double)."""
    spark = index.flat.sparkSession
    empty = "qid string, docno string, rank long, score double"
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame([], empty)
    expanded: dict[tuple[str, str], int] = {}
    for q, t, c in qt_rows:
        for e in [t] + list(syn_map.get(t, [])):
            expanded[(q, e)] = expanded.get((q, e), 0) + c
    terms = sorted({t for _, t in expanded})
    lex = (
        index.lexicon.where(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    )
    df_by_term = {r["term"]: r["df"] for r in lex}
    rows = [
        (q, t, c, df_by_term[t])
        for (q, t), c in sorted(expanded.items())
        if t in df_by_term
    ]
    if not rows:
        return spark.createDataFrame([], empty)
    qt = spark.createDataFrame(
        rows, "qid string, term string, qtf int, df long"
    )
    s = scoring.bm25_col(
        F.col("tf"), F.col("doc_len"), F.col("df"), index.n_docs, index.avgdl
    )
    scored = (
        index.flat.join(F.broadcast(qt), "term")
        .withColumn("contrib", F.col("qtf") * s)
        .groupBy("qid", "docid")
        .agg(F.sum("contrib").alias("raw"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("score", F.round(F.col("raw"), 6))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            (F.col("docid") - 1).cast("string").alias("docno"),
            "rank",
            "score",
        )
    )
