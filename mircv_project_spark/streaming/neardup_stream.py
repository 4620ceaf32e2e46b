"""Streaming MinHash-LSH near-duplicate detection: as documents
arrive, find their near-duplicates against EVERYTHING ingested so far
— the live dedup a continuously-fed training corpus needs (reject or
flag an incoming document the moment its twin is known, instead of a
nightly batch sweep).

foreachBatch + a parquet delta store (the streaming/incremental.py
discipline, not applyInPandasWithState — band buckets are unbounded
per key, so state lives in storage, not the state store):

- per micro-batch, the batch's (id, band, bkey) rows and (id,
  shingle) rows append to the store under ``epoch=<batchId>``
  partitions (a replayed batch OVERWRITES its own epoch dirs —
  byte-identical, the percolate idempotence discipline);
- candidates = the NEW batch's band rows equi-joined against the
  ACCUMULATED store (which already includes this epoch — so
  within-batch pairs are found too), bucket-capped on the
  accumulated sizes, pairs normalized id_a < id_b;
- exact-Jaccard verification reads both sides' shingles from the
  store; verified pairs >= threshold write to ``out/epoch=<batchId>``
  (again overwrite-idempotent).

Every derivation is the batch operator's own expression
(dedup.lsh_band_rows / shingle_sets — the ONE copies), and each pair
is discovered exactly once (in the epoch where its LATER member
arrives), so the union of epoch outputs equals batch
``minhash_lsh_pairs`` whenever the bucket cap never binds — the same
condition under which the batch gate equals exact jaccard_pairs.
``streaming_neardup`` therefore shares the ``minhash_lsh_pairs``
oracle BY DESIGN.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    MAX_BUCKET,
    lsh_band_rows,
    shingle_sets,
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def run_streaming_neardup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    max_bucket: int = MAX_BUCKET,
):
    """One availableNow pass over new document files in ``input_dir``;
    verified near-dup pairs land in ``out_dir/epoch=<batchId>``."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sh_new = shingle_sets(batch_df).persist()
        try:
            bands_new = lsh_band_rows(sh_new)
            bands_new.write.mode("overwrite").parquet(
                f"{store_dir}/bands/epoch={batch_id}"
            )
            sh_new.write.mode("overwrite").parquet(
                f"{store_dir}/shingles/epoch={batch_id}"
            )
            # distinct on read: a document re-ingested under the same
            # id (a feed replay, a backfill overlap) must not inflate
            # its shingle multiset — the whole pipeline is idempotent
            # at the (id, value) level, like the bloom/hll merges
            bands_all = (
                spark.read.parquet(f"{store_dir}/bands")
                .select("id", "band", "bkey")
                .distinct()
            )
            sh_all = (
                spark.read.parquet(f"{store_dir}/shingles")
                .select("id", "shingle")
                .distinct()
            )
            sizes = bands_all.groupBy("band", "bkey").agg(
                F.count("*").alias("bs")
            )
            nb = bands_new.join(
                sizes.where(F.col("bs") <= max_bucket), ["band", "bkey"]
            ).select("id", "band", "bkey")
            cand = (
                nb.alias("a")
                .join(
                    bands_all.alias("b"),
                    (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bkey") == F.col("b.bkey"))
                    & (F.col("a.id") != F.col("b.id")),
                )
                .select(
                    F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                )
                .distinct()
            )
            sizes_doc = sh_all.groupBy("id").agg(F.count("*").alias("n_sh"))
            ea = sh_all.select(F.col("id").alias("id_a"), "shingle")
            eb = sh_all.select(F.col("id").alias("id_b"), "shingle")
            inter = (
                cand.join(ea, "id_a")
                .join(eb, ["id_b", "shingle"])
                .groupBy("id_a", "id_b")
                .agg(F.count("*").alias("inter"))
            )
            jac = F.col("inter") / (
                F.col("na") + F.col("nb") - F.col("inter")
            )
            pairs = (
                inter.join(
                    sizes_doc.select(
                        F.col("id").alias("id_a"), F.col("n_sh").alias("na")
                    ),
                    "id_a",
                )
                .join(
                    sizes_doc.select(
                        F.col("id").alias("id_b"), F.col("n_sh").alias("nb")
                    ),
                    "id_b",
                )
                .where(jac >= threshold)
                .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            )
            pairs.write.mode("overwrite").parquet(
                f"{out_dir}/epoch={batch_id}"
            )
        finally:
            sh_new.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def all_neardup_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """Union of every epoch's verified pairs (distinct — a pair is
    discovered once, in the epoch its later member arrived; distinct
    guards replays of partially-written epochs)."""
    if not os.path.isdir(out_dir):
        return spark.createDataFrame(
            [], "id_a long, id_b long, jaccard double"
        )
    return (
        spark.read.parquet(out_dir)
        .select("id_a", "id_b", "jaccard")
        .distinct()
    )
