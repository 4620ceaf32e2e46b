"""Query performance prediction — the Clarity score.

Clarity (Cronen-Townsend, Zhou, Croft 2002): the KL divergence
between the query's relevance-model term distribution (estimated from
the first-pass top docs) and the collection language model.  High
clarity = the top docs talk about something specific; low clarity =
the ranking is collection-like noise.  Engines use it to route hard
queries (expansion, fallback, human review) — a QPP primitive the
reference lacks.

Chain (all pinned, restated verbatim in oracle._clarity_sql):

1. fb = first-pass BM25 top QPP_FB_DOCS with their ROUNDED scores —
   identical to RM3's stage 1;
2. relevance model, micro-quantized to exact integers (the lm.py
   discipline): wq(t) = round(1e6 · Σ_d score(d) · tf(t,d)/dl(d)) as
   BIGINT, keeping terms with wq >= 1 (a wq=0 term has p(t|q) below
   quantization — and log of 0 is undefined);
3. W = Σ_t wq — exact BIGINT normalizer;
4. per-term KL contribution in integer micro-log10 units:
   cq(t) = round(1e6 · log10((wq·CF) / (W·cf_t))) as BIGINT, the
   factors cast to double BEFORE multiplying (BIGINT products
   overflow at scale — the pmi_collocations pin), CF = Σ lexicon cf
   (total token count);
5. S = Σ_t wq · cq — exact BIGINT; clarity = round(S / (W · 1e6), 6)
   (one double division), reported in log10 units.

Output: (qid, n_terms, w_total, clarity) — the integer audit columns
ride along so the gate hash covers the exact aggregates, not just the
rounded scalar.

Scale shape (100 TB): stage 1 is the standard exhaustive/pruned top-k;
the feedback fetch is a broadcast docid semi-join on the flat postings
(forward index at scale); everything after aggregates ≤ fb_docs · dl
terms per query — driver-trivial, fully Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .topk import exhaustive_topk

QPP_FB_DOCS = 10
_MICRO = 1_000_000.0


def clarity_scores(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    fb_docs: int = QPP_FB_DOCS,
) -> DataFrame:
    """-> DataFrame(qid string, n_terms long, w_total long,
    clarity double)."""
    spark = index.flat.sparkSession
    empty = "qid string, n_terms long, w_total long, clarity double"

    first = exhaustive_topk(index, queries, scoring.BM25, k=fb_docs)
    if not first.head(1):
        return spark.createDataFrame([], empty)
    fb = first.select(
        "qid", (F.col("docno").cast("long") + 1).alias("docid"), "score"
    )

    cf_total = index.lexicon.agg(F.sum("cf").alias("cf")).collect()[0]["cf"]
    w_raw = (
        index.flat.join(F.broadcast(fb), "docid")
        .groupBy("qid", "term")
        .agg(
            F.sum(
                F.col("score") * F.col("tf") / F.col("doc_len")
            ).alias("w")
        )
    )
    wq = w_raw.select(
        "qid",
        "term",
        F.round(F.lit(_MICRO) * F.col("w")).cast("long").alias("wq"),
    ).where(F.col("wq") >= 1)
    wtot = wq.groupBy("qid").agg(
        F.sum("wq").alias("w_total"), F.count("*").alias("n_terms")
    )

    # factors to double BEFORE multiplying (BIGINT overflow at scale)
    cq = F.round(
        F.lit(_MICRO)
        * F.log10(
            (F.col("wq").cast("double") * F.lit(float(cf_total)))
            / (F.col("w_total").cast("double") * F.col("cf").cast("double"))
        )
    ).cast("long")
    contrib = (
        wq.join(F.broadcast(index.lexicon.select("term", "cf")), "term")
        .join(F.broadcast(wtot), "qid")
        .select("qid", (F.col("wq") * cq).alias("c"))
    )
    s = contrib.groupBy("qid").agg(F.sum("c").alias("s"))
    return (
        s.join(wtot, "qid")
        .select(
            "qid",
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("w_total").cast("long").alias("w_total"),
            F.round(
                F.col("s").cast("double")
                / (F.col("w_total").cast("double") * F.lit(_MICRO)),
                6,
            ).alias("clarity"),
        )
    )
