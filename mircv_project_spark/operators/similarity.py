"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: exact baseline; broadcast the probe set,
  JVM-side zip_with/aggregate dot products (no Python per row), one
  shuffle for the per-probe top-k window.  The DuckDB oracle restates
  it (same float64 op order, rounded to 6).
- LSH (random-hyperplane / SimHash-for-vectors) bucketed top-k: the
  scale path — signatures computed by an Arrow pandas UDF as one BLAS
  matmul per batch, candidates restricted to probe buckets within
  Hamming radius, then exact cosine on candidates only.  Approximate
  (recall measured in tests), hence no SQL oracle.

Scale: brute force is O(n_probes * n_vectors) — fine for a broadcast
probe set against a partitioned table; LSH drops the candidate set to
buckets, and the signature matmul is embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each probe id.
    -> (probe_id, neighbor_id, rank, cos) with rank over
    (round(cos,6) desc, neighbor_id asc), self excluded."""
    base = embeddings.select(
        F.col(id_col).cast("long").alias("nid"), _as_double(F.col(vec_col)).alias("v")
    )
    probes = base.where(F.col("nid").isin(probe_ids)).select(
        F.col("nid").alias("pid"), F.col("v").alias("pv")
    )
    cos = F.round(_dot(F.col("pv"), F.col("v")) / (_norm(F.col("pv")) * _norm(F.col("v"))), 6)
    cand = (
        base.crossJoin(F.broadcast(probes))
        .where(F.col("nid") != F.col("pid"))
        .select("pid", "nid", cos.alias("cos"))
    )
    w = Window.partitionBy("pid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cos",
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cos >= t).

    Exact all-pairs form (oracle-checkable).  The scale path bounds the
    candidate set first — IVF cell equality or hyperplane-signature
    Hamming radius (see ivf_cosine_topk / lsh_cosine_topk) — and runs
    this exact cosine only on candidates, same verify-after-blocking
    pattern as dedup.minhash_lsh_pairs."""
    base = embeddings.select(
        F.col(id_col).cast("long").alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("n", _norm(F.col("v")))
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    cos = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


# ------------------------- LSH (random hyperplanes) -------------------------

LSH_BITS = 16
LSH_SEED = 1234


def _hyperplanes(dims: int, bits: int = LSH_BITS, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dims))


def signature_udf(dims: int, bits: int = LSH_BITS, seed: int = LSH_SEED):
    """pandas UDF: embedding -> int signature via one matmul per Arrow
    batch (H @ X^T, sign bits packed)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        H = _hyperplanes(dims, bits, seed)
        X = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dims)
        proj = X @ H.T  # (n, bits)
        bitsmat = (proj > 0).astype(np.int64)
        weights = (1 << np.arange(bits, dtype=np.int64))
        return pd.Series(bitsmat @ weights)

    return _sig


# ------------------------------ IVF (coarse quantizer) ------------------------------

IVF_CENTROIDS = 16
IVF_NPROBE = 6
IVF_SEED = 77
IVF_SAMPLE = 100_000


def _kmeans_cosine(X: np.ndarray, k: int, iters: int = 15, seed: int = IVF_SEED) -> np.ndarray:
    """Spherical k-means on the driver over a bounded sample (numpy).
    At 10^12 scale the sample is a seeded limit-pushdown scan; Lloyd
    iterations are O(sample * k * d) driver-side, centroids broadcast."""
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = Xn[rng.choice(len(Xn), k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                v = Xn[m].mean(axis=0)
                C[j] = v / max(np.linalg.norm(v), 1e-12)
    return C


def _assign_udf(centroids: np.ndarray):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _cell(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Xn @ centroids.T, axis=1).astype(np.int32))

    return _cell


def ivf_cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    seed: int = IVF_SEED,
) -> DataFrame:
    """IVF approximate cosine top-k: spherical-kmeans coarse quantizer,
    candidates = vectors in each probe's `nprobe` nearest cells, exact
    cosine on candidates only.  One BLAS matmul per Arrow batch for
    cell assignment; the candidate join is an equi-join on cell id.

    Approximate: recall depends on how clustered the corpus is (random
    synthetic vectors are the worst case — tests pin a recall floor and
    the candidate-fraction saving rather than exactness), hence no SQL
    oracle."""
    sample = np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in embeddings.select(vec_col).limit(IVF_SAMPLE).collect()
        ]
    )
    C = _kmeans_cosine(sample, n_centroids, seed=seed)
    cell = _assign_udf(C)
    base = embeddings.select(
        F.col(id_col).cast("long").alias("nid"),
        _as_double(F.col(vec_col)).alias("v"),
        cell(F.col(vec_col)).alias("cell"),
    )
    probes_rows = base.where(F.col("nid").isin(probe_ids)).select("nid", "v").collect()
    spark = embeddings.sparkSession
    pc = []
    for r in probes_rows:
        pv = np.asarray(r["v"], dtype=np.float64)
        pvn = pv / max(np.linalg.norm(pv), 1e-12)
        cells = np.argsort(-(C @ pvn))[:nprobe]
        pc.extend((int(r["nid"]), int(c)) for c in cells)
    probe_cells = spark.createDataFrame(pc, "pid long, cell int")
    probes = spark.createDataFrame(
        [(int(r["nid"]), [float(x) for x in r["v"]]) for r in probes_rows],
        f"pid long, pv array<double>",
    )
    cand = (
        base.join(F.broadcast(probe_cells), "cell")
        .join(F.broadcast(probes), "pid")
        .where(F.col("nid") != F.col("pid"))
    )
    cos = F.round(_dot(F.col("pv"), F.col("v")) / (_norm(F.col("pv")) * _norm(F.col("v"))), 6)
    scored = cand.select("pid", "nid", cos.alias("cos")).distinct()
    w = Window.partitionBy("pid").orderBy(F.col("cos").desc(), F.col("nid").asc())
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


def lsh_cosine_topk(
    embeddings: DataFrame,
    probe_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = LSH_BITS,
    hamming_radius: int = 2,
    seed: int = LSH_SEED,
) -> DataFrame:
    """Approximate cosine top-k: candidates limited to vectors whose
    hyperplane signature is within `hamming_radius` of the probe's,
    then exact cosine on candidates.  Recall vs cosine_topk is asserted
    in tests (no SQL oracle — ANN is approximate by construction)."""
    dims = len(embeddings.select(vec_col).first()[0])
    sig = signature_udf(dims, bits, seed)
    base = embeddings.select(
        F.col(id_col).cast("long").alias("nid"),
        _as_double(F.col(vec_col)).alias("v"),
        sig(F.col(vec_col)).alias("sig"),
    )
    probes = base.where(F.col("nid").isin(probe_ids)).select(
        F.col("nid").alias("pid"), F.col("v").alias("pv"), F.col("sig").alias("psig")
    )
    ham = F.bit_count(F.col("sig").bitwiseXOR(F.col("psig")))
    cos = F.round(_dot(F.col("pv"), F.col("v")) / (_norm(F.col("pv")) * _norm(F.col("v"))), 6)
    cand = (
        base.join(F.broadcast(probes), ham <= hamming_radius)
        .where(F.col("nid") != F.col("pid"))
        .select("pid", "nid", cos.alias("cos"))
    )
    w = Window.partitionBy("pid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("pid").alias("probe_id"),
            F.col("nid").alias("neighbor_id"),
            "rank",
            "cos",
        )
    )
