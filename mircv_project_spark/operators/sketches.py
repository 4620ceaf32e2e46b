"""Distinct-count sketches (KMV / k-minimum-values, Bar-Yossef et al.
2002) — the cardinality-estimation family a 100-TB pipeline runs where
exact distinct counts are too expensive (per-domain vocabulary sizes,
dedup-rate monitoring, join-key cardinality planning).

Why this is hash-gateable at all: the hash is the deterministic
md5-derived 60-bit `textnorm.hash60_col` (restated verbatim in DuckDB),
so the k smallest DISTINCT hash values per group — and therefore the
estimate — are identical on both engines.  Nothing here is randomized
at run time; "approximate" means approximate w.r.t. the TRUE count,
which the gate output carries alongside (`n_distinct`) precisely so the
estimator is verifiable.

Estimator (pinned, restated verbatim in the oracle — change both or
neither): with U = kth smallest distinct hash / 2^60,
est = (k-1)/U, evaluated as round((15.0 * 2^60) / double(kth_hash), 6)
for k = KMV_K = 16 (15.0 * 2^60 is exact in double on both engines);
groups with fewer than k distinct hashes use the
exact sketch size (the sketch IS the set).  Salt 'kmv-' keeps the hash
stream independent of the shard/split/pack coins.

Scale shape (100 TB): the sketch path never computes a global
distinct — stage 1 is a `mapInPandas` partial k-min (per Arrow batch:
local dedup, k smallest per group — bounded memory, map-side, the
sketch-merge property that makes KMV distributed-friendly); stage 2
ranks the surviving <= k-per-batch rows per group (a shuffle of sketch
rows, not token rows).  The exact `n_distinct` column is the
verification path and the one O(distinct-tokens) shuffle — a production
run at scale drops it and keeps only the sketch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import hash60_col, tokens_col

KMV_K = 16
KMV_SALT = "kmv-"
_TWO60 = float(1 << 60)  # 2^60, exactly representable


def kmv_est_col(n_sketch: "F.Column", kth_hash: "F.Column", k: int = KMV_K):
    """The ONE copy of the pinned estimator expression (shared by the
    batch operator and the streaming-KMV gate so the two cannot
    drift): exact sketch size below k, else (k-1)/U in micro-hash
    space, round 6."""
    return F.when(n_sketch < k, n_sketch.cast("double")).otherwise(
        F.round(F.lit(float(k - 1) * _TWO60) / kth_hash.cast("double"), 6)
    )


def _partial_kmin(k: int):
    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield (
                pdf.drop_duplicates()
                .sort_values(["source", "h"])
                .groupby("source", sort=False)
                .head(k)[["source", "h"]]
            )

    return f


def kmv_distinct_tokens(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = KMV_K,
) -> DataFrame:
    """-> (source, n_distinct, kth_hash, est): per-source distinct
    normalized-token cardinality — exact count beside the KMV estimate
    from the k smallest distinct hashes."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).persist()  # sketch and exact branches both read it
    try:
        hashed = toks.select(
            "source",
            hash60_col(F.concat(F.lit(KMV_SALT), F.col("t"))).alias("h"),
        )
        partial = hashed.mapInPandas(
            _partial_kmin(k), schema="source string, h long"
        )
        w = Window.partitionBy("source").orderBy(F.col("h").asc())
        sketch = (
            partial.distinct()
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .groupBy("source")
            .agg(
                F.max("h").alias("kth_hash"),
                F.count("*").alias("n_sketch"),
            )
        )
        exact = (
            toks.distinct()
            .groupBy("source")
            .agg(F.count("*").alias("n_distinct"))
        )
        est = kmv_est_col(F.col("n_sketch"), F.col("kth_hash"), k)
        out = (
            exact.join(sketch, "source")
            .select(
                "source",
                F.col("n_distinct").cast("long").alias("n_distinct"),
                F.col("kth_hash").cast("long").alias("kth_hash"),
                est.alias("est"),
            )
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out
