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


QSK_K = 4096
QSK_SALT = "qsk-"
QSK_QS = (0.25, 0.5, 0.75, 0.9)


def _partial_kmin_v(k: int):
    """Per-Arrow-batch bottom-k by (h) per source, VALUE riding along —
    the mergeable-sample property (bottom-k of a union == bottom-k of
    the per-part bottom-ks)."""

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield (
                pdf.sort_values(["source", "h"])
                .groupby("source", sort=False)
                .head(k)[["source", "h", "v"]]
            )

    return f


def quantile_sketch(
    docs: DataFrame,
    value_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    k: int = QSK_K,
    qs: tuple = QSK_QS,
) -> DataFrame:
    """-> (source, n_sample, q25, q50, q75, q90): per-source quantile
    estimates from a MERGEABLE bottom-k-by-hash uniform sample — the
    quantile member of the sketch family beside KMV (cardinality) and
    the heavy-hitter map.

    The sample key is the deterministic 60-bit md5 hash of the salted
    row id (salt 'qsk-', independent of the shard/split/pack coins):
    the k rows with smallest hash are a uniform k-subset, identical on
    both engines and under ANY partitioning; merging partial bottom-ks
    is exact (bottom-k of a union == bottom-k of per-part bottom-ks),
    which is what stage 1's mapInPandas partial k-min exploits —
    bounded memory, map-side, no global sort of values.

    Estimates are linear-interpolated quantiles over the SAMPLE
    (Spark percentile() == DuckDB quantile_cont at round 6 — the
    event_props_rollup pin).  GATE regime: k = 4096 >= every group at
    every SF, so the sample IS the group and the estimate is exact
    (the kmv below-k discipline); the approximate regime (k << n,
    bounded error) lives in pytest.

    Scale shape (100 TB): stage 1 touches each row once map-side and
    emits <= k rows per (partition, source); stage 2 shuffles sketch
    rows only."""
    base = docs.select(
        F.col(source_col).alias("source"),
        hash60_col(
            F.concat(F.lit(QSK_SALT), F.col(id_col).cast("string"))
        ).alias("h"),
        F.col(value_col).cast("long").alias("v"),
    )
    partial = base.mapInPandas(
        _partial_kmin_v(k), schema="source string, h long, v long"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    sample = (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    aggs = [F.count("*").cast("long").alias("n_sample")] + [
        F.round(F.percentile(F.col("v"), F.lit(q)), 6).alias(
            f"q{int(q * 100)}"
        )
        for q in qs
    ]
    return sample.groupBy("source").agg(*aggs)
