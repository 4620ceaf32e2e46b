"""Faceted search — per-query facet counts over the full match set.

The aggregation side of a search engine (Elasticsearch aggs, Solr
facets): for each query, count ALL matching documents per metadata
bucket — not just the top-k page.  Facet counts drive the filter UI
and query analytics; they are a scan-heavy aggregate the serve path
needs to push down, not a ranking.

Semantics (pinned, restated verbatim in oracle._facets_sql):
a document matches a query iff >= 1 normalized query term occurs in
it (disjunctive candidates — the same match set every OR-mode ranker
scores); facets = the two metadata dimensions `source` and `lang`,
emitted as (qid, facet, value, n_docs) rows with facet in
{'source', 'lang'}; empty buckets emit nothing.

Scale shape (100 TB): distinct doc tokens explode once, the
driver-small query-term table broadcasts, the (qid, doc) match set
dedups in the same aggregation that counts it per bucket — one
shuffle keyed (qid, facet value), never a per-query scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from .topk import query_terms

FACET_DIMS = ("source", "lang")


def facet_counts(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    dims: tuple = FACET_DIMS,
) -> DataFrame:
    """-> DataFrame(qid string, facet string, value string,
    n_docs long)."""
    spark = docs.sparkSession
    qt_rows = query_terms(queries, parse=False)
    if not qt_rows:
        return spark.createDataFrame(
            [], "qid string, facet string, value string, n_docs long"
        )
    qt = spark.createDataFrame(
        sorted({(q, t) for q, t, _ in qt_rows}), "qid string, term string"
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    )
    matched = (
        toks.join(F.broadcast(qt), "term").select("qid", "doc_id").distinct()
    )
    meta = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[F.col(d).cast("string").alias(d) for d in dims],
    )
    j = matched.join(meta, "doc_id")
    parts = [
        j.groupBy("qid", F.col(d).alias("value"))
        .agg(F.count("*").alias("n_docs"))
        .select(
            "qid",
            F.lit(d).alias("facet"),
            "value",
            F.col("n_docs").cast("long").alias("n_docs"),
        )
        for d in dims
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
