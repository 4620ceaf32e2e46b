"""Hybrid lexical + dense retrieval with Reciprocal Rank Fusion.

The modern serve path: a query runs BOTH the inverted-index BM25
ranker and the embedding cosine ranker, and the two rankings fuse by
RRF (Cormack, Clarke & Buettcher, SIGIR 2009):

    fused(d) = sum over systems s of 1 / (C + rank_s(d)),  C = 60

RRF needs no score calibration between systems — only ranks — which is
why it is the default hybrid fusion in production engines.

Query model on the driver corpora: each probe is a document id; its
TEXT is the lexical query and its EMBEDDING the dense query (the
documents and embeddings tables share ids by construction), with the
probe document itself excluded from both rankings — the standard
"more-like-this" evaluation shape that needs no external query set.

Pins (restated in oracle._hybrid_rrf_sql — change both or neither):
- C = 60, per-system pool = 20, final k = 10;
- contribution quantized per system BEFORE the sum:
  round(1e6 / (C + rank)) as BIGINT — the fused score is an exact
  integer sum (shuffle-order-independent), reported /1e6 round 6;
- lexical rank = BM25 rank among NON-probe docs (computed by taking
  top pool+1, dropping the probe, keeping the first pool — exactly the
  non-self ranking whether or not the probe doc made the cut);
- dense rank = cosine_topk's (round(cos,6) desc, id asc) rank;
- fusion ties (fused desc, doc asc).

Scale shape: both legs are the existing serve paths (broadcast query
table + postings join; broadcast probes + code/vector scan); fusion
touches 2 * pool rows per query — a full-outer join of two tiny
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .similarity import cosine_topk
from .topk import exhaustive_topk

RRF_C = 60
HYBRID_POOL = 20
HYBRID_K = 10
_MICRO = 1_000_000.0


def _rrf_contrib(rank_col):
    return F.round(F.lit(_MICRO) / (F.lit(RRF_C) + rank_col)).cast("long")


def hybrid_rrf_topk(
    index: InvertedIndex,
    embeddings: DataFrame,
    docs: DataFrame,
    probe_ids: list[int],
    k: int = HYBRID_K,
    pool: int = HYBRID_POOL,
) -> DataFrame:
    """-> (qid string, docno string, rank long, score double)."""
    spark = index.flat.sparkSession
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(probe_ids))
        .select("doc_id", "text")
        .collect()
    }
    queries = [
        (str(p), texts[p])
        for p in probe_ids
        if texts.get(p) is not None
    ]

    lex = exhaustive_topk(index, queries, scoring.BM25, k=pool + 1)
    w_lex = Window.partitionBy("qid").orderBy(F.col("rank").asc())
    lexp = (
        lex.where(F.col("docno") != F.col("qid"))
        .withColumn("lrank", F.row_number().over(w_lex))
        .where(F.col("lrank") <= pool)
        .select(
            "qid",
            F.col("docno").cast("long").alias("doc"),
            _rrf_contrib(F.col("lrank")).alias("cl"),
        )
    )

    dense = cosine_topk(embeddings, probe_ids, k=pool)
    dnsp = dense.select(
        F.col("probe_id").cast("string").alias("qid"),
        F.col("neighbor_id").alias("doc"),
        _rrf_contrib(F.col("rank")).alias("cd"),
    )

    fused = (
        lexp.join(dnsp, ["qid", "doc"], "full_outer")
        .select(
            "qid",
            "doc",
            (
                F.coalesce(F.col("cl"), F.lit(0))
                + F.coalesce(F.col("cd"), F.lit(0))
            ).alias("fm"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("fm").desc(), F.col("doc").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            F.col("doc").cast("string").alias("docno"),
            "rank",
            F.round(F.col("fm") / F.lit(_MICRO), 6).alias("score"),
        )
    )
