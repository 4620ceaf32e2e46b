"""Resource selection over document-partitioned index shards (CORI).

Completes the federation story beside operators/topk.topk_from_shards:
before fanning a query out to every shard, a broker ranks shards by
how likely each is to hold relevant documents and routes to the best
ones.  This is the CORI collection-selection belief (Callan, Lu &
Croft, SIGIR 1995) — the standard df.icf formula over shard-level
statistics only (per-shard df, shard token counts, shard count): no
posting payloads are ever touched, so selection costs one metadata
round per query.

Per in-corpus query term t and shard s:

    T = df / (df + 50 + 150 * cw_s / avg_cw)
    I = log10((NS + 0.5) / cf_t) / log10(NS + 1.0)
    belief(t, s) = 0.4 + 0.6 * (T * I)

where df = t's document frequency IN s (0 when absent — the belief
floor 0.4 still contributes, the standard default-belief semantics),
cw_s = shard token count, avg_cw = mean shard token count, NS = shard
count, cf_t = number of shards containing t.  Shard score = SUM of
per-term beliefs (the conventional mean divides by the per-query
constant |q|, which cannot change the shard ranking; the sum keeps the
emitted score tie-free at 6 decimals).

Exactness contract (the repo lm.py discipline — change the oracle too
or neither): each belief is micro-quantized (round(belief * 1e6) as
BIGINT) BEFORE the per-shard sum; constants (50, 150, 0.4/0.6, the
NS + 0.5 / NS + 1.0 smoothing) and the parenthesization
(150.0 * cw_double) / avg_cw, 0.4 + 0.6 * (T * I) are restated
verbatim in oracle._cori_sql; terms absent from EVERY shard drop
(cf = 0 has no I); DISTINCT query terms (CORI is a unigram resource
model — query-term multiplicity is not part of the formula).

Scale shape: inputs are shard LEXICON rows for the query terms only
(bucket/min-max-pruned per shard) + one scalar per shard; every frame
here is broker-tier metadata, broadcast-joined.  At 10^4 shards this
is exactly the broker a production federation runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import query_terms

CORI_B = 0.4
# literal 0.6, NEVER computed as 1.0 - CORI_B: the doubles differ by
# one ulp (1 - 0.4 rounds up, the 0.6 literal rounds down) and the
# oracle writes the literal
CORI_B1 = 0.6
CORI_DF_K = 50.0
CORI_DF_SCALE = 150.0
_MICRO = 1e6

_CORI_SCHEMA = "qid string, shard int, score double, rank bigint"


def cori_shard_scores(
    readers, queries: list[tuple[str, str]]
) -> DataFrame:
    """-> (qid string, shard int, score double, rank bigint): every
    shard ranked per query by the CORI belief sum (rank score desc,
    shard asc)."""
    if not readers:
        raise ValueError("need at least one shard reader")
    spark = readers[0].postings.sparkSession
    ns = len(readers)

    qt_rows = query_terms(queries, readers[0].parse)
    if not qt_rows:
        return spark.createDataFrame([], _CORI_SCHEMA)
    terms = sorted({t for _, t, _ in qt_rows})
    qterm = spark.createDataFrame(
        sorted({(q, t) for q, t, _ in qt_rows}), "qid string, term string"
    )

    sdf = reduce(
        lambda a, b: a.unionByName(b),
        [
            r._prune(r.lexicon, terms).select(
                F.lit(sid).cast("int").alias("shard"),
                "term",
                F.col("df").cast("long").alias("df"),
            )
            for sid, r in enumerate(readers)
        ],
    )
    cw_rows = [(sid, int(r.sum_doc_len)) for sid, r in enumerate(readers)]
    scw = spark.createDataFrame(cw_rows, "shard int, cw long")
    avg_cw = sum(c for _, c in cw_rows) / float(ns)

    cf = sdf.groupBy("term").agg(F.countDistinct("shard").alias("cf"))

    grid = (
        qterm.join(F.broadcast(cf), "term")  # drops corpus-OOV terms
        .crossJoin(F.broadcast(scw))
        .join(F.broadcast(sdf), ["term", "shard"], "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0).cast("long")))
    )
    t_part = F.col("df").cast("double") / (
        F.col("df").cast("double")
        + F.lit(CORI_DF_K)
        + (F.lit(CORI_DF_SCALE) * F.col("cw").cast("double")) / F.lit(avg_cw)
    )
    i_part = F.log10((F.lit(float(ns)) + F.lit(0.5)) / F.col("cf").cast("double")) / F.log10(
        F.lit(float(ns)) + F.lit(1.0)
    )
    belief = F.lit(CORI_B) + F.lit(CORI_B1) * (t_part * i_part)
    micro = F.round(belief * F.lit(_MICRO)).cast("long")

    agg = (
        grid.withColumn("micro", micro)
        .groupBy("qid", "shard")
        .agg(F.sum("micro").alias("m"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("m").desc(), F.col("shard").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(
            "qid",
            "shard",
            F.round(F.col("m") / F.lit(_MICRO), 6).alias("score"),
            "rank",
        )
    )
