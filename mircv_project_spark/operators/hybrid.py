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


def _norm_u(s_col, mn_col, mx_col):
    """Pool-relative min-max normalization quantized to exact integer
    micro units; a constant pool (max == min) pins every member to
    1e6 (all equally best) — restated verbatim in the oracle."""
    return F.when(mx_col == mn_col, F.lit(1_000_000).cast("long")).otherwise(
        F.round(
            F.lit(_MICRO) * (s_col - mn_col) / (mx_col - mn_col)
        ).cast("long")
    )


def hybrid_combmnz_topk(
    index: InvertedIndex,
    embeddings: DataFrame,
    docs: DataFrame,
    probe_ids: list[int],
    k: int = HYBRID_K,
    pool: int = HYBRID_POOL,
) -> DataFrame:
    """CombMNZ fusion (Fox & Shaw 1994) — the score-aware sibling of
    RRF: per system, pool scores min-max normalize to [0, 1e6] integer
    micro units (inputs are the systems' ROUND-6 scores, so the
    normalization arithmetic is identical on both engines); fused =
    n_systems_retrieving(d) × Σ norm_u(d) — an exact BIGINT product of
    exact integers.  Query model, pools, self-exclusion, and ties all
    shared with hybrid_rrf_topk.

    -> (qid string, docno string, rank long, score double) with
    score = round(fused / 1e6, 6) (range [0, 4] for two systems)."""
    spark = index.flat.sparkSession
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(probe_ids))
        .select("doc_id", "text")
        .collect()
    }
    queries = [
        (str(p), texts[p]) for p in probe_ids if texts.get(p) is not None
    ]

    lex = exhaustive_topk(index, queries, scoring.BM25, k=pool + 1)
    w_lex = Window.partitionBy("qid").orderBy(F.col("rank").asc())
    w_pool = Window.partitionBy("qid")
    lexp = (
        lex.where(F.col("docno") != F.col("qid"))
        .withColumn("lrank", F.row_number().over(w_lex))
        .where(F.col("lrank") <= pool)
        .withColumn("mn", F.min("score").over(w_pool))
        .withColumn("mx", F.max("score").over(w_pool))
        .select(
            "qid",
            F.col("docno").cast("long").alias("doc"),
            _norm_u(F.col("score"), F.col("mn"), F.col("mx")).alias("cu"),
        )
    )

    dense = cosine_topk(embeddings, probe_ids, k=pool)
    w_dp = Window.partitionBy("probe_id")
    dnsp = (
        dense.withColumn("mn", F.min("cos").over(w_dp))
        .withColumn("mx", F.max("cos").over(w_dp))
        .select(
            F.col("probe_id").cast("string").alias("qid"),
            F.col("neighbor_id").alias("doc"),
            _norm_u(F.col("cos"), F.col("mn"), F.col("mx")).alias("cu"),
        )
    )

    fused = (
        lexp.unionByName(dnsp)
        .groupBy("qid", "doc")
        .agg(
            F.sum("cu").alias("su"),
            F.count("*").alias("nsys"),
        )
        .select(
            "qid", "doc", (F.col("nsys") * F.col("su")).alias("fm")
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("fm").desc(), F.col("doc").asc()
    )
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


def hybrid_borda_topk(
    index: InvertedIndex,
    embeddings: DataFrame,
    docs: DataFrame,
    probe_ids: list[int],
    k: int = HYBRID_K,
    pool: int = HYBRID_POOL,
) -> DataFrame:
    """Borda-count fusion of the same two legs as RRF (Aslam & Montague,
    SIGIR 2001 "Models for Metasearch"): each system awards its rank-r
    pool member (pool + 1 - r) points, unranked docs get 0, and the
    fused score is the exact INTEGER point sum — the positional-voting
    counterpart to RRF's reciprocal weighting (Borda decays linearly
    where RRF decays hyperbolically, so deep-pool agreement counts for
    more).

    Pins (restated in oracle._hybrid_borda_sql — change both or
    neither): per-system contribution = pool + 1 - rank as BIGINT (no
    quantization needed — Borda is integer-native), pools/self-exclusion
    /leg rankings shared verbatim with the RRF gate, fusion ties
    (borda desc, doc asc).

    -> (qid string, docno string, rank long, borda long).

    Scale shape: identical to hybrid_rrf_topk — both legs are the
    existing serve paths; fusion is a full-outer join of two
    pool-sized-per-query tables.
    """
    spark = index.flat.sparkSession
    texts = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(probe_ids))
        .select("doc_id", "text")
        .collect()
    }
    queries = [
        (str(p), texts[p]) for p in probe_ids if texts.get(p) is not None
    ]

    def _pts(rank_col):
        return (F.lit(pool + 1) - rank_col).cast("long")

    lex = exhaustive_topk(index, queries, scoring.BM25, k=pool + 1)
    w_lex = Window.partitionBy("qid").orderBy(F.col("rank").asc())
    lexp = (
        lex.where(F.col("docno") != F.col("qid"))
        .withColumn("lrank", F.row_number().over(w_lex))
        .where(F.col("lrank") <= pool)
        .select(
            "qid",
            F.col("docno").cast("long").alias("doc"),
            _pts(F.col("lrank")).alias("cl"),
        )
    )

    dense = cosine_topk(embeddings, probe_ids, k=pool)
    dnsp = dense.select(
        F.col("probe_id").cast("string").alias("qid"),
        F.col("neighbor_id").alias("doc"),
        _pts(F.col("rank")).alias("cd"),
    )

    fused = lexp.join(dnsp, ["qid", "doc"], "full_outer").select(
        "qid",
        "doc",
        (
            F.coalesce(F.col("cl"), F.lit(0)) + F.coalesce(F.col("cd"), F.lit(0))
        ).alias("fm"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("fm").desc(), F.col("doc").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            F.col("doc").cast("string").alias("docno"),
            "rank",
            F.col("fm").cast("long").alias("borda"),
        )
    )
