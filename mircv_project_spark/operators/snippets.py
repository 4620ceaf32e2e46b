"""Best-window snippet extraction over the documents table.

For each (query, document) pair with at least one matching token
position, find the ``window``-token span with the most query-term HITS
(matched token positions, not distinct terms — the metric both engines
can compute with a plain windowed sum), tie-broken to the earliest
start.  The classic search-results highlighting primitive the reference
lacks (its TREC output stops at docnos).

Scale shape: tokenize once (the projection-materialized pattern from
CLAUDE.md), posexplode to (id, pos, term), broadcast the tiny
query-term table, and count hits per candidate start with a RANGE
window frame over each (qid, id) partition — the frame is bounded by
the doc's OWN hit count, never the corpus; one (qid, id) shuffle
total.  Candidate starts are hit positions only (an argmax window
always starts at a hit), so the window work is O(hits), not O(tokens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col

SNIPPET_WINDOW = 10


def best_snippets(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    window: int = SNIPPET_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (qid, id, start_pos, n_hits, snippet): per (query, doc with
    >= 1 hit), the best window start (0-based token position), its hit
    count, and the snippet text (the window's tokens space-joined).
    Best = (n_hits desc, start_pos asc) — deterministic."""
    spark = docs.sparkSession
    qdf = spark.createDataFrame(list(queries), "qid string, qtext string")
    qterms = qdf.select(
        "qid", F.explode(tokens_col(F.col("qtext"))).alias("term")
    ).distinct()

    toked = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    positions = toked.select(
        "id", F.posexplode("toks").alias("pos", "term")
    )
    hits = positions.join(F.broadcast(qterms), "term").select(
        "qid", "id", F.col("pos").cast("long").alias("pos")
    )
    frame = (
        Window.partitionBy("qid", "id")
        .orderBy("pos")
        .rangeBetween(Window.currentRow, int(window) - 1)
    )
    counted = hits.withColumn("n_hits", F.count("*").over(frame).cast("long"))
    best = Window.partitionBy("qid", "id").orderBy(
        F.col("n_hits").desc(), F.col("pos").asc()
    )
    top = (
        counted.withColumn("brank", F.row_number().over(best))
        .where(F.col("brank") == 1)
        .select("qid", "id", F.col("pos").alias("start_pos"), "n_hits")
    )
    return top.join(toked, "id").select(
        "qid",
        "id",
        "start_pos",
        "n_hits",
        F.array_join(
            F.slice(F.col("toks"), F.col("start_pos") + 1, int(window)), " "
        ).alias("snippet"),
    )
