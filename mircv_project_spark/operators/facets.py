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

from pyspark.sql import DataFrame, Window
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


SIGTERMS_K = 10
_MICRO = 1e6


def significant_terms(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = SIGTERMS_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Significant-terms aggregation (the Elasticsearch discovery
    facet): terms unusually frequent in a query's MATCH SET relative
    to the whole corpus — "what is this result set about that the
    corpus is not".

    Semantics (pinned, restated verbatim in oracle._sigterms_sql —
    change both sides or neither):

    - foreground = the disjunctive match set (>= 1 normalized query
      term in the doc — facet_counts' rule, shared verbatim);
    - candidates = distinct terms of foreground docs MINUS the query's
      own distinct normalized terms (self-terms are trivially
      over-represented);
    - JLH score over doc-frequency rates: fp = fg_df/F, bp = bg_df/N,
      score = (fp - bp) * (fp / bp) — both factors cast to double via
      the single division each, the product micro-quantized
      (round(score * 1e6) BIGINT) BEFORE ranking; only micro > 0 rows
      (fp > bp) are significant;
    - rank per query (micro desc, term asc), top k; emitted score =
      micro / 1e6 (exact 6 decimals).

    Scale shape (100 TB): the distinct-token explode happens ONCE and
    feeds both the background df aggregate and (joined against the
    broadcast-small match set) the foreground counts; one shuffle
    keyed (qid, term), the final window per qid over candidate terms.

    -> (qid string, term string, fg_df long, bg_df long, score double,
    rank bigint)
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    empty = (
        "qid string, term string, fg_df long, bg_df long,"
        " score double, rank bigint"
    )
    qt_rows = query_terms(queries, parse=False)
    if not qt_rows:
        return spark.createDataFrame([], empty)
    qt = spark.createDataFrame(
        sorted({(q, t) for q, t, _ in qt_rows}), "qid string, term string"
    )

    # background N = ALL corpus rows (empty docs included — they are
    # part of the doc-frequency denominator); restated as count(*)
    n_docs = docs.count()
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias(
            "term"
        ),
    ).persist()
    try:
        bg = toks.groupBy("term").agg(
            F.count("*").cast("long").alias("bg_df")
        )
        matched = (
            toks.join(F.broadcast(qt), "term")
            .select("qid", "doc_id")
            .distinct()
        )
        fsize = matched.groupBy("qid").agg(
            F.count("*").cast("long").alias("fg_n")
        )
        fg = (
            matched.join(toks, "doc_id")
            .join(F.broadcast(qt), ["qid", "term"], "left_anti")
            .groupBy("qid", "term")
            .agg(F.count("*").cast("long").alias("fg_df"))
        )
        fp = F.col("fg_df").cast("double") / F.col("fg_n").cast("double")
        bp = F.col("bg_df").cast("double") / F.lit(float(n_docs))
        micro = F.round(((fp - bp) * (fp / bp)) * F.lit(_MICRO)).cast("long")
        scored = (
            fg.join(bg, "term")
            .join(F.broadcast(fsize), "qid")
            .withColumn("micro", micro)
            .where(F.col("micro") > 0)
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("micro").desc(), F.col("term").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                "qid",
                "term",
                "fg_df",
                "bg_df",
                F.round(F.col("micro") / F.lit(_MICRO), 6).alias("score"),
                "rank",
            )
        )
        return out.localCheckpoint()
    finally:
        toks.unpersist()


TOPHITS_INNER = 3


def facet_top_hits(
    index,
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k_inner: int = TOPHITS_INNER,
    id_col: str = "doc_id",
    dim: str = "source",
) -> DataFrame:
    """Bucketed top hits (Elasticsearch `terms` aggregation with a
    `top_hits` sub-aggregation): for each query, every source bucket's
    total match count PLUS its best k_inner documents from the engine's
    BM25 ranking — the "show me the best result per site" serve shape.

    Pins (restated in oracle._facet_top_hits_sql — change both or
    neither): bucket membership = the engine's scored (disjunctive)
    match set, bucket hit order = the ranking's total order (round-6
    score desc, docno asc), k_inner = 3, n_docs counts ALL scored docs
    in the bucket (the facet count, not the page), docno = doc_id.

    -> (qid string, source string, n_docs long, bucket_rank long,
    docno string, score double).

    Scale shape: one exhaustive ranking (the standard scorer), one
    broadcast-able metadata join on docno, then a count and a window
    both keyed (qid, source) — no second corpus scan, no per-bucket
    re-query."""
    from . import scoring
    from .topk import exhaustive_topk

    turns = exhaustive_topk(index, queries, scoring.BM25, k=2_000_000_000)
    meta = docs.select(
        F.col(id_col).cast("long").alias("did"),
        F.col(dim).cast("string").alias("source"),
    )
    j = turns.drop("rank").join(
        meta, turns.docno.cast("long") == meta.did
    )
    counts = j.groupBy("qid", "source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    w = Window.partitionBy("qid", "source").orderBy(
        F.col("score").desc(), F.col("docno").cast("long").asc()
    )
    hits = j.withColumn(
        "bucket_rank", F.row_number().over(w).cast("long")
    ).where(F.col("bucket_rank") <= k_inner)
    return hits.join(counts, ["qid", "source"]).select(
        "qid", "source", "n_docs", "bucket_rank", "docno", "score"
    )


FACET_HIST_BIN = 200  # n_chars per histogram bucket


def facet_histogram(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    value_col: str = "n_chars",
    bin_width: int = FACET_HIST_BIN,
) -> DataFrame:
    """-> (qid, bucket, n_docs): numeric range facets — the histogram
    aggregation search UIs render beside the categorical facet counts
    (ES `histogram` agg / Solr range facets).

    Pins (restated in oracle._FACET_HISTOGRAM_SQL — change both sides
    or neither): match set = facet_counts' DISJUNCTIVE rule verbatim
    (any query term present, DISTINCT normalized tokens), bucket =
    n_chars integer-DIV 200 (non-negative — the events_value_histogram
    discipline), empty buckets absent.

    Scale shape: same broadcast term semi-join as facet_counts, one
    (qid, bucket) partial agg — no new shuffle family."""
    from ..operators.topk import query_terms

    spark = docs.sparkSession
    qt_rows = query_terms(queries, parse=False)
    if not qt_rows:
        return spark.createDataFrame([], "qid string, bucket long, n_docs long")
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
    vals = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"CAST({value_col} AS BIGINT) DIV {int(bin_width)}").alias(
            "bucket"
        ),
    )
    return (
        matched.join(vals, "doc_id")
        .groupBy("qid", "bucket")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
