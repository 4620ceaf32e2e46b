"""Percolation — reverse search (the Elasticsearch percolator).

Instead of "which docs match this query", percolation answers "which
STORED queries match this document" — the alerting/routing primitive
(saved searches, content subscriptions, moderation rules) that a
forward search engine cannot serve without rescanning every query.

Semantics (pinned, restated verbatim in oracle._percolate_sql):
a stored query matches a document iff EVERY distinct query term
occurs in the document (conjunctive containment over normalized
tokens — the reference's conjunctive mode applied in reverse);
queries whose terms are all OOV for the corpus still require their
terms (they simply never match).  Output one row per (doc, query)
match: (doc_id, qid, n_terms) with n_terms = the query's distinct
term count; docs matching nothing emit no rows.

Scale shape (100 TB): the stored-query table inverts into
(term -> qid) — driver-small, broadcast; one explode of distinct doc
tokens joins it, and one (doc, qid) count compares against the
broadcast per-query requirement.  Cost is O(matching token pairs),
never O(docs × queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from .topk import query_terms


def percolate(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> DataFrame(doc_id long, qid string, n_terms long)."""
    spark = docs.sparkSession
    qt_rows = query_terms(queries, parse=False)
    if not qt_rows:
        return spark.createDataFrame(
            [], "doc_id long, qid string, n_terms long"
        )
    inv = spark.createDataFrame(
        sorted({(q, t) for q, t, _ in qt_rows}), "qid string, term string"
    )
    need = inv.groupBy("qid").agg(F.count("*").alias("n_terms"))

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    )
    hit = (
        toks.join(F.broadcast(inv), "term")
        .groupBy("doc_id", "qid")
        .agg(F.count("*").alias("n_have"))
    )
    return (
        hit.join(F.broadcast(need), "qid")
        .where(F.col("n_have") == F.col("n_terms"))
        .select("doc_id", "qid", F.col("n_terms").cast("long").alias("n_terms"))
    )


PERC_SCORED_K = 3


def percolate_scored(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = PERC_SCORED_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, qid, rank, score): scored percolation — each doc's
    matching registered queries RANKED by their BM25 score against the
    doc (the ES percolator with scoring on: route a document to its
    best-matching alerts, not just the matching set).

    Pins (restated in oracle._PERCOLATE_SCORED_SQL — change both
    sides or neither): the match set = percolate's CONJUNCTIVE
    containment over DISTINCT normalized terms VERBATIM; score =
    sum over the query's distinct terms of qtf * BM25(tf, dl, df, N,
    avgdl) with the engine's exact formula/op order (scoring.bm25_col)
    over the DOCUMENTS corpus stats (N = all docs, avgdl =
    sum(dl)/N, df over the oracle token pipeline); rank per doc on
    (round-6 score desc, qid asc), k = 3.

    Scale shape: one tokenize pass feeds dl + the (doc, term) tf agg;
    the query table broadcasts; stats are two scalars — no new
    shuffle family beyond percolate + one window."""
    from .scoring import bm25_col
    from .topk import query_terms

    spark = docs.sparkSession
    qt_rows = query_terms(queries, parse=False)
    if not qt_rows:
        return spark.createDataFrame(
            [], "doc_id long, qid string, rank long, score double"
        )
    qt = spark.createDataFrame(
        sorted({(q, t, c) for q, t, c in qt_rows}),
        "qid string, term string, qtf int",
    )
    need = qt.groupBy("qid").agg(F.count("*").alias("n_terms"))

    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).persist()
    try:
        dls = toks.select("doc_id", F.size("toks").cast("long").alias("dl"))
        st = dls.agg(
            F.count("*").alias("n"), F.sum("dl").alias("s")
        ).collect()[0]
        n_docs, avgdl = int(st["n"]), int(st["s"] or 0) / float(st["n"])
        flat = (
            toks.select("doc_id", F.explode("toks").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").cast("long").alias("tf"))
        )
        dfs = flat.groupBy("term").agg(F.count("*").cast("long").alias("df"))
        matched = (
            flat.join(F.broadcast(qt.select("qid", "term")), "term")
            .groupBy("doc_id", "qid")
            .agg(F.count("*").alias("n_have"))
            .join(F.broadcast(need), "qid")
            .where(F.col("n_have") == F.col("n_terms"))
            .select("doc_id", "qid")
        )
        contrib = (
            flat.join(F.broadcast(qt), "term")
            .join(dfs, "term")
            .join(dls, "doc_id")
            .join(matched, ["doc_id", "qid"], "left_semi")
        )
        scored = contrib.groupBy("doc_id", "qid").agg(
            F.round(
                F.sum(
                    F.col("qtf")
                    * bm25_col(
                        F.col("tf"), F.col("dl"), F.col("df"), n_docs, avgdl
                    )
                ),
                6,
            ).alias("score")
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("score").desc(), F.col("qid").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("doc_id", "qid", "rank", "score")
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out
