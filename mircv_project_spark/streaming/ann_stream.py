"""Streaming vector-index ingest — incremental IVF maintenance.

The batch IVF (operators/similarity.ivf_cosine_topk) re-fits and
re-assigns on every call; a vector SERVING deployment trains the
coarse quantizer once, then ingests arriving embeddings forever:
assignment is a pure map (one BLAS matmul per Arrow batch against the
frozen centroids), each micro-batch appends its (cell, id, vector)
rows, and queries serve from the persisted cell table.  This is
exactly how production IVF systems grow (FAISS's add-after-train
contract): the quantizer NEVER retrains on ingest, so cell ids stay
stable and growth is append-only.

Exactness: with nprobe == n_cells the candidate pool is the full
corpus regardless of quantizer quality, so the served ranking must
equal the exhaustive cosine oracle — the same exact-recovery regime
ivf_cosine_topk_exact pins (the approximate regime keeps its recall
floor in pytest).  Idempotence: per-epoch overwrite partitions (the
streaming/incremental.py replay discipline).

Scale shape: ingest is map-only (no shuffle at all); the quantizer is
a driver-small table; the serve path joins only the probes' cells
(partition-prunable on the cell column at real nprobe).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    IVF_CENTROIDS,
    IVF_SEED,
    _as_double,
    _assign_udf,
    _dot,
    _fit_centroids,
    _norm,
)

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def embedding_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EMB_SCHEMA).parquet(input_dir)


def train_quantizer(
    embeddings: DataFrame,
    out_dir: str,
    n_centroids: int = IVF_CENTROIDS,
    seed: int = IVF_SEED,
) -> None:
    """Fit the coarse quantizer ONCE (bounded-sample spherical kmeans,
    similarity._fit_centroids) and persist it — the train step of the
    train-then-add contract."""
    C = _fit_centroids(embeddings, "embedding", n_centroids, seed)
    if C is None:
        raise ValueError("cannot train a quantizer on an empty table")
    spark = embeddings.sparkSession
    rows = [(int(i), [float(x) for x in c]) for i, c in enumerate(C)]
    spark.createDataFrame(rows, "cell int, c array<double>").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{out_dir}/centroids")


def load_quantizer(spark: SparkSession, out_dir: str) -> np.ndarray:
    rows = spark.read.parquet(f"{out_dir}/centroids").orderBy("cell").collect()
    return np.stack([np.asarray(r["c"], dtype=np.float64) for r in rows])


def run_ivf_ingest(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass: assign every new embedding file's vectors
    to their frozen-quantizer cell and write the epoch's rows."""
    C = load_quantizer(spark, out_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        cell = _assign_udf(C)
        out = batch_df.select(
            F.col("vec_id").cast("long").alias("nid"),
            _as_double(F.col("embedding")).alias("v"),
            cell(F.col("embedding")).alias("cell"),
        )
        out.write.mode("overwrite").parquet(f"{out_dir}/cells/epoch={epoch_id}")

    return (
        embedding_stream(spark, input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ivf_topk_from_store(
    spark: SparkSession,
    out_dir: str,
    probe_ids: list[int],
    k: int = 5,
    nprobe: int | None = None,
) -> DataFrame:
    """Serve cosine top-k from the PERSISTED cell table (all ingested
    epochs).  nprobe=None probes every cell (the exact regime); a real
    deployment passes a small nprobe and pays only those cells'
    partitions.  Output shape shared with similarity.ivf_cosine_topk:
    (probe_id, neighbor_id, rank, cos), cos rounded 6, rank
    (cos desc, neighbor_id asc), probe excluded from its own result."""
    from pyspark.sql import Window

    C = load_quantizer(spark, out_dir)
    base = spark.read.parquet(f"{out_dir}/cells").select("nid", "v", "cell")
    probes_rows = (
        base.where(F.col("nid").isin(probe_ids)).select("nid", "v").collect()
    )
    n_cells = len(C)
    npb = n_cells if nprobe is None else min(int(nprobe), n_cells)
    pc = []
    for r in probes_rows:
        pv = np.asarray(r["v"], dtype=np.float64)
        pvn = pv / max(np.linalg.norm(pv), 1e-12)
        cells = np.argsort(-(C @ pvn))[:npb]
        pc.extend((int(r["nid"]), int(c)) for c in cells)
    if not pc:
        return spark.createDataFrame(
            [], "probe_id long, neighbor_id long, rank long, cos double"
        )
    probe_cells = spark.createDataFrame(pc, "pid long, cell int")
    probes = spark.createDataFrame(
        [(int(r["nid"]), [float(x) for x in r["v"]]) for r in probes_rows],
        "pid long, pv array<double>",
    )
    cand = (
        base.join(F.broadcast(probe_cells), "cell")
        .join(F.broadcast(probes), "pid")
        .where(F.col("nid") != F.col("pid"))
    )
    cos = F.round(
        _dot(F.col("pv"), F.col("v")) / (_norm(F.col("pv")) * _norm(F.col("v"))),
        6,
    )
    scored = cand.select("pid", "nid", cos.alias("cos"))
    w = Window.partitionBy("pid").orderBy(
        F.col("cos").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cos",
        )
    )
