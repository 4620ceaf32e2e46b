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

from pyspark.sql import DataFrame
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
