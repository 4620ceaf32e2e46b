"""BM25F — field-weighted passage retrieval over conversations.

The reference scores flat documents only (queryProcessor/Scorer.java
has no field concept); real engines weight fields before saturation
and serve passages, not whole threads.  This implements the standard
weighted-field-concatenation form of BM25F (Robertson/Zaragoza 2009,
§6) with the PASSAGE as the retrieval unit: every contiguous
PASS_TURNS-turn window of a conversation (starts 0..PASS_SMAX) is a
pseudo-document whose term frequencies and length are FIELD-WEIGHTED
sums over its member turns,

    tfw(t, p) = Σ_turns∈p w(role) · tf(t, turn)     (exact integer)
    dlw(p)    = Σ_turns∈p w(role) · doc_len(turn)   (exact integer)

with integer weights w(assistant) = W_ASSISTANT = 2, w(other) = 1
(role ⟺ doc_id % 4 == 1 — the transcripts-source law, same pin as
bm25_topk_filtered).  The saturation runs the engine's exact BM25
parenthesization (operators/scoring.py) on passage-level stats:
df = passages containing the term, N = passage count, avgdl =
Σ dlw / N.  The passage unit matters beyond serving granularity: at
conversation granularity this corpus' common terms appear in EVERY
conversation (idf ≡ 0, the gate would be vacuous); passage df varies.

Tail conversations may have fewer than TURNS_PER_CONV turns — a
window start s exists iff the conversation has ≥1 turn in
[s, s+PASS_TURNS-1]; shorter windows keep their (smaller) exact dlw.

Rank (round(score,6) desc, conv_id asc, w_start asc), top k; queries
tokenize through the engine's own pipeline (parse=False — DuckDB has
no stem()).

Scale shape (100 TB): each doc explodes into ≤PASS_TURNS member rows
(a constant ×3, map-side); the postings⋈membership join is a plain
docid equi-join (membership is corpus-sized — never broadcast); then
one (term, conv, ws) partial agg and the standard broadcast-query-
terms join + one (qid, conv, ws) aggregate.  Same shuffle profile as
exhaustive_topk with (conv, ws) as the doc key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .topk import query_terms

W_ASSISTANT = 2
PASS_TURNS = 3
PASS_SMAX = 5  # TURNS_PER_CONV - PASS_TURNS


def _weight_col():
    """w = 2 for assistant turns (docno % 4 == 1), else 1."""
    return F.when(
        (F.col("docno").cast("long") % 4) == 1, F.lit(W_ASSISTANT)
    ).otherwise(F.lit(1))


def _membership(doc_index: DataFrame) -> DataFrame:
    """docid -> the ≤PASS_TURNS window starts containing its turn."""
    lo = F.greatest(F.lit(0), F.col("turn_idx") - F.lit(PASS_TURNS - 1))
    hi = F.least(F.lit(PASS_SMAX), F.col("turn_idx"))
    return doc_index.select(
        "docid",
        "conv_id",
        _weight_col().alias("w"),
        "doc_len",
        F.explode(F.sequence(lo, hi)).alias("ws"),
    )


def bm25f_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    k: int = 10,
) -> DataFrame:
    """-> DataFrame(qid string, conv_id string, w_start long,
    rank long, score double)."""
    spark = index.flat.sparkSession
    empty = "qid string, conv_id string, w_start long, rank long, score double"
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame([], empty)

    member = _membership(index.doc_index)
    plen = member.groupBy("conv_id", "ws").agg(
        F.sum(F.col("w") * F.col("doc_len")).alias("dlw")
    )
    pstats = plen.agg(
        F.count("*").alias("n_pass"), F.sum("dlw").alias("sum_dlw")
    ).collect()[0]
    n_pass, avgdlw = pstats["n_pass"], pstats["sum_dlw"] / pstats["n_pass"]

    terms = sorted({t for _, t, _ in qt_rows})
    ppost = (
        index.flat.where(F.col("term").isin(terms))
        .join(member.select("docid", "conv_id", "w", "ws"), "docid")
        .groupBy("term", "conv_id", "ws")
        .agg(F.sum(F.col("w") * F.col("tf")).alias("tfw"))
    )
    pdf = ppost.groupBy("term").agg(F.count("*").alias("df"))
    qt = spark.createDataFrame(qt_rows, "qid string, term string, qtf int")

    # exact scoring.BM25 parenthesization on passage-level stats
    coeff = F.col("tfw") / (
        (
            F.lit(1.5)
            * (F.lit(0.3) + (F.lit(0.7) * (F.col("dlw") / F.lit(avgdlw))))
        )
        + F.col("tfw")
    )
    contrib = F.col("qtf") * (
        coeff * F.log10(F.lit(float(n_pass)) / F.col("df"))
    )
    scored = (
        ppost.join(F.broadcast(pdf), "term")
        .join(F.broadcast(qt), "term")
        .join(plen, ["conv_id", "ws"])
        .groupBy("qid", "conv_id", "ws")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("conv_id").asc(), F.col("ws").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            "conv_id",
            F.col("ws").cast("long").alias("w_start"),
            "rank",
            "score",
        )
    )


def conv_maxp_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    k: int = 10,
) -> DataFrame:
    """Max-passage conversation retrieval — the standard long-document
    pooling strategy (a thread is relevant if its BEST turn is):
    conversation score = max over member turns of the turn's ROUND-6
    BM25 score, rank (score desc, conv_id asc, best docno asc is not
    needed — the max is per conv), top k.  Ties inside a conversation
    resolve by the engine's turn ranking (round-6 desc, docid asc), so
    best_docno is deterministic too.

    -> DataFrame(qid string, conv_id string, best_docno string,
    rank long, score double).

    Scale shape: the turn ranking is the standard exhaustive path; the
    pooling is ONE (qid, conv) max over its output — no second scan."""
    from .topk import exhaustive_topk

    spark = index.flat.sparkSession
    turns = exhaustive_topk(index, queries, scoring.BM25, k=2_000_000_000)
    dmap = index.doc_index.select(
        (F.col("docid") - 1).cast("string").alias("docno"), "conv_id"
    )
    j = turns.join(dmap, "docno")
    w_best = Window.partitionBy("qid", "conv_id").orderBy(
        F.col("score").desc(), F.col("docno").cast("long").asc()
    )
    best = (
        j.withColumn("brn", F.row_number().over(w_best))
        .where(F.col("brn") == 1)
        .select("qid", "conv_id", F.col("docno").alias("best_docno"), "score")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("conv_id").asc()
    )
    return (
        best.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "conv_id", "best_docno", "rank", "score")
    )


COLLAPSE_INNER = 2


def bm25_topk_collapse(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    k: int = 10,
    inner: int = COLLAPSE_INNER,
) -> DataFrame:
    """Field collapsing with inner hits (Elasticsearch `collapse` +
    `inner_hits`, Solr CollapsingQParser): results grouped by
    conversation — each conversation appears ONCE in the ranking,
    scored by its best turn, and carries up to ``inner`` best member
    turns as inner hits.

    Pins (restated in oracle._collapse_sql — change both or neither):
    inner = 2; inner-hit order = the engine's turn ranking (round-6
    score desc, docno asc); conversation score = the best inner hit's
    score; conversation rank (score desc, conv_id asc); k = 10
    conversations, every emitted row carries its conversation's rank.

    -> (qid string, conv_id string, rank long, inner_rank long,
    docno string, score double).

    Scale shape: one exhaustive turn ranking (the standard scorer) +
    two windows over its output partitioned by (qid, conv) / (qid) —
    no second corpus scan; doc->conv rides the doc_index join."""
    from .topk import exhaustive_topk

    turns = exhaustive_topk(index, queries, scoring.BM25, k=2_000_000_000)
    dmap = index.doc_index.select(
        (F.col("docid") - 1).cast("string").alias("docno"), "conv_id"
    )
    j = turns.drop("rank").join(dmap, "docno")
    w_inner = Window.partitionBy("qid", "conv_id").orderBy(
        F.col("score").desc(), F.col("docno").cast("long").asc()
    )
    hits = j.withColumn(
        "inner_rank", F.row_number().over(w_inner).cast("long")
    ).where(F.col("inner_rank") <= inner)
    w_conv = Window.partitionBy("qid").orderBy(
        F.col("best").desc(), F.col("conv_id").asc()
    )
    best = (
        hits.where(F.col("inner_rank") == 1)
        .select("qid", "conv_id", F.col("score").alias("best"))
        .withColumn("rank", F.row_number().over(w_conv).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "conv_id", "rank")
    )
    return hits.join(best, ["qid", "conv_id"]).select(
        "qid", "conv_id", "rank", "inner_rank", "docno", "score"
    )
