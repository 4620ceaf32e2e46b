"""Distributed k-means over embedding columns + SemDeDup-style
semantic near-duplicate pruning (Abbas et al. 2023: cluster the
corpus, then drop all-but-one of each within-cluster epsilon-ball).

The reference engine (an IR query processor) has no clustering analog;
these are the training-data-pipeline operators a 100-TB curation run
needs: k-means gives the partition SemDeDup prunes inside of (and the
same centroids double as an IVF coarse quantizer).

Exactness contract (the integer-quantization trick shared with
operators/lm.py): k-means over floats is NOT gateable — centroid means
are shuffle-order-dependent float sums.  So every vector component is
quantized to integer MICRO units (round(x * 1e6) as BIGINT) up front,
distances are exact integer sums of squared integer diffs, and each
centroid update re-quantizes to integers with a sign-aware
round-half-away integer division:

    c_j = sign(S) * ((2*|S| + n) DIV (2*n)),  S = sum of member q_j

so every iteration's state is exact integer arithmetic — deterministic
across shuffle order, parallelism, and engines.  The DuckDB oracle
unrolls the KM_ITERS Lloyd iterations into a CTE chain (same pattern
as the MMR oracle) and restates the identical init / argmin-tie /
empty-cluster / rounding rules.

Pinned gate params (change BOTH the operator defaults and
oracle._kmeans_ctes or neither): k = 10, iters = 3, micro = 1e6,
init = the k lowest-id vectors (cid = their ascending-id index),
assignment tie -> lowest cid, empty cluster -> centroid unchanged,
SemDeDup tau = 0.35 (within-cluster cos6 p99 is ~0.33 on the driver
corpora, so 0.35 drops a discriminative ~15% minority; cos6 is the ONE
shared round-6 cosine formula, so boundary ties agree by construction).

Scale shape (100 TB): the k centroids are driver-state (k*d integers),
embedded as literals, so ASSIGNMENT IS MAP-ONLY — no join, no shuffle;
each update is one (cluster, dim)-keyed groupBy producing k*d rows
(map-side combined) plus a bounded k*d collect.  The returned
assignment recomputes as a single scan+map.  SemDeDup's within-cluster
self-join is one equi-join on the cluster key whose quadratic term is
bounded by the largest cluster — at scale you raise k (SemDeDup's own
design point) and/or cap cluster fan-in like the LSH bucket cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .similarity import _as_double, _dot, _norm

KM_K = 10
KM_ITERS = 3
KM_MICRO = 1_000_000
SEM_TAU = 0.35


def _quantized(
    embeddings: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """-> (id, qv array<bigint>): micro-quantized vectors.  Exact .5
    ties CAN occur (any m/2^k float32 times 1e6, e.g. 0.0078125 ->
    7812.5); parity holds because BOTH engines round ties away from
    zero (Spark HALF_UP == DuckDB round()) — never swap either side to
    banker's/HALF_EVEN rounding."""
    return embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(KM_MICRO))).cast(
                "long"
            ),
        ).alias("qv"),
    )


def _d2_to(centroid: list[int]):
    """Exact squared L2 distance (BIGINT) from qv to an integer
    centroid literal: |q|,|c| <= ~5e5 -> per-dim square <= ~1e12, x64
    dims ~6e13 — comfortably inside signed 64-bit on both engines."""
    cv = F.array(*[F.lit(int(c)).cast("long") for c in centroid])
    return F.aggregate(
        F.zip_with(F.col("qv"), cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )


def _assign_cols(centroids: list[list[int]]):
    """argmin over centroids as array_min of (d2, cid) structs —
    struct ordering gives the pinned tie rule (d2 asc, cid asc)."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _d2_to(cv).alias("d2"),
                    F.lit(cid).cast("long").alias("cid"),
                )
                for cid, cv in enumerate(centroids)
            ]
        )
    )
    return best["cid"].alias("cluster"), best["d2"].alias("d2")


def _half_away_div(s: int, n: int) -> int:
    """round-half-away-from-zero integer division, mirrored verbatim by
    the oracle's CASE WHEN s >= 0 THEN (2s+n)//(2n) ELSE -((-2s+n)//(2n))."""
    if s >= 0:
        return (2 * s + n) // (2 * n)
    return -((-2 * s + n) // (2 * n))


def kmeans_assign(
    embeddings: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, cluster, d2): Lloyd's k-means over micro-quantized
    vectors, all-integer state (module docstring has the full
    exactness contract).  d2 is the exact squared quantized distance
    to the final assigned centroid."""
    qv = _quantized(embeddings, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        # init: the k lowest-id vectors, cid = ascending-id index
        centroids = [
            list(r.qv) for r in qv.orderBy("id").limit(k).collect()
        ]
        for it in range(iters):
            cluster, d2 = _assign_cols(centroids)
            asg = qv.select("id", "qv", cluster, d2)
            if it == iters - 1:
                out = asg.select("id", "cluster", "d2").localCheckpoint()
                break
            sums = (
                asg.select("cluster", F.posexplode("qv").alias("j", "v"))
                .groupBy("cluster", "j")
                .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                .collect()  # bounded: k*d rows of driver state
            )
            upd: dict[int, list[int]] = {}
            for r in sums:
                upd.setdefault(int(r.cluster), [0] * len(centroids[0]))[
                    int(r.j)
                ] = _half_away_div(int(r.s), int(r.n))
            # empty cluster -> centroid unchanged (pinned rule)
            centroids = [
                upd.get(cid, cv) for cid, cv in enumerate(centroids)
            ]
    finally:
        qv.unpersist()
    return out


def _dropped_ids(av: DataFrame, tau: float) -> DataFrame:
    """(id, cluster, v) -> distinct ids that lose their epsilon-ball:
    an EQUI-join on the cluster key (never a nested-loop scan — the
    plan test pins that), id-asc winner, shared round-6 cosine."""
    a = av.select(
        F.col("cluster"),
        F.col("id").alias("ida"),
        F.col("v").alias("va"),
    )
    b = av.select(
        F.col("cluster"),
        F.col("id").alias("idb"),
        F.col("v").alias("vb"),
    )
    cos6 = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (_norm(F.col("va")) * _norm(F.col("vb"))),
        6,
    )
    return (
        a.join(b, "cluster")
        .where(F.col("ida") < F.col("idb"))
        .where(cos6 >= F.lit(tau))
        .select(F.col("idb").alias("id"))
        .distinct()
    )


def semdedup_keep(
    embeddings: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    tau: float = SEM_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, cluster, keep): SemDeDup verdict — drop id iff a LOWER
    id in the SAME k-means cluster has round-6 cosine >= tau with it
    (keep-the-min-id per epsilon-ball, the same winner rule as every
    dedup gate).  Cross-cluster near-dups are invisible by design —
    that is SemDeDup's approximation, not a bug."""
    asg = kmeans_assign(embeddings, k, iters, id_col, vec_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        vecs = embeddings.select(
            F.col(id_col).cast("long").alias("id"),
            _as_double(F.col(vec_col)).alias("v"),
        )
        av = asg.join(vecs, "id").select("id", "cluster", "v")
        dropped = _dropped_ids(av, tau)
        out = (
            asg.join(dropped.withColumn("hit", F.lit(1)), "id", "left")
            .select(
                "id", "cluster", F.col("hit").isNull().alias("keep")
            )
            .localCheckpoint()
        )
    finally:
        asg.unpersist()
    return out


def nearest_centroid_classify(
    embeddings: DataFrame,
    probe_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over the embedding
    column — the parametric sibling of knn_classify: one prototype
    vector per label (the class centroid), probes take the label of
    the closest prototype.  -> (probe_id, true_label, pred_label, d2).

    Exactness contract (the k-means integer discipline — a float
    centroid mean is shuffle-order-dependent): components
    micro-quantized BIGINT up front, per-(label, dim) centroid = the
    sign-aware round-half-away integer division of the exact
    component sum, probe distances = exact BIGINT squared L2 in micro
    space.  Pins restated in oracle._NEAREST_CENTROID_SQL (change
    both sides or neither): centroids over ALL vectors (probes
    included — the classifier trains on the full labeled set), argmin
    tie -> lowest label, d2 = the winning distance.

    Scale shape (100 TB): centroid build is ONE (label, dim)-keyed
    partial aggregate (map-side combined, |labels|*d rows out); the
    probe side joins the tiny centroid table on dim — no per-pair
    vector shuffling."""
    q = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(label_col).cast("long").alias("lbl"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(KM_MICRO))).cast(
                "long"
            ),
        ).alias("qv"),
    )
    dims = q.select(
        "lbl", F.posexplode("qv").alias("dim", "v")
    )
    cent = (
        dims.groupBy("lbl", "dim")
        .agg(
            F.sum("v").cast("long").alias("s"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "lbl",
            "dim",
            F.expr(
                "CASE WHEN s >= 0 THEN (2 * s + n) DIV (2 * n)"
                " ELSE -(((-2) * s + n) DIV (2 * n)) END"
            ).cast("long").alias("c"),
        )
    )
    probes = q.where(F.col("id").isin(probe_ids)).select(
        F.col("id").alias("pid"),
        F.col("lbl").alias("true_label"),
        F.posexplode("qv").alias("dim", "pv"),
    )
    d2 = (
        probes.join(F.broadcast(cent), "dim")
        .groupBy("pid", "true_label", "lbl")
        .agg(
            F.sum(
                (F.col("pv") - F.col("c")) * (F.col("pv") - F.col("c"))
            ).cast("long").alias("d2")
        )
    )
    w = Window.partitionBy("pid").orderBy(F.col("d2").asc(), F.col("lbl").asc())
    return (
        d2.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("pid").alias("probe_id"),
            "true_label",
            F.col("lbl").alias("pred_label"),
            "d2",
        )
    )


def conv_mean_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_size: int = 8,
) -> DataFrame:
    """-> (conv_id, n_members, pooled array<bigint>): mean-pooled
    conversation embeddings — each conversation's vector = the
    per-dimension mean of its member turns' vectors (the standard
    pooling step before conversation-level ANN / clustering /
    near-dup in a training pipeline).

    conv = the transcripts id law on vector ids ('conv-' ||
    lpad(vec_id // 8, 12, '0') — the dense_maxp_topk pin).

    Exactness contract (the k-means integer discipline — a float mean
    is shuffle-order-dependent): components micro-quantized BIGINT up
    front, per-(conv, dim) exact integer sums, mean = the sign-aware
    round-half-away integer division, array reassembled in dimension
    order.  Restated verbatim in oracle._CONV_MEAN_EMB_SQL (change
    both sides or neither).

    Scale shape (100 TB): ONE (conv, dim)-keyed partial aggregate
    (map-side combined) and one per-conv array rebuild — no
    per-pair work, no driver state."""
    conv = F.concat(
        F.lit("conv-"),
        F.lpad(
            (F.col(id_col).cast("long") / F.lit(group_size))
            .cast("long")
            .cast("string"),
            12,
            "0",
        ),
    )
    q = embeddings.select(
        conv.alias("conv_id"),
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(KM_MICRO))).cast(
                "long"
            ),
        ).alias("qv"),
    )
    members = q.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_members")
    )
    dims = q.select("conv_id", F.posexplode("qv").alias("dim", "v"))
    pooled = (
        dims.groupBy("conv_id", "dim")
        .agg(
            F.sum("v").cast("long").alias("s"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "conv_id",
            "dim",
            F.expr(
                "CASE WHEN s >= 0 THEN (2 * s + n) DIV (2 * n)"
                " ELSE -(((-2) * s + n) DIV (2 * n)) END"
            ).cast("long").alias("c"),
        )
        .groupBy("conv_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "c"))),
                lambda x: x["c"],
            ).alias("pooled")
        )
    )
    return members.join(pooled, "conv_id").select(
        "conv_id", "n_members", "pooled"
    )


def embedding_moments(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (i, j, n, sum_i, sum_j, sum_ij) for the upper triangle
    i <= j (1-based dims): exact integer first and second moments of
    the micro-quantized embedding matrix — everything PCA / whitening
    / OPQ rotation training needs from the distributed pass (the
    covariance is n*sum_ij - sum_i*sum_j, assembled driver-side at
    d x d scale; eigen-decomposition is a driver-side numpy step on
    that tiny matrix, not a distributed op).

    Exactness contract (the k-means discipline): components
    micro-quantized BIGINT, every emitted sum an exact BIGINT
    (sum_ij <= n * 1e12 — keep n below ~9e6 per job or rescale MICRO;
    the final covariance subtraction is the driver's to do in Python
    ints, NOT here, because n * sum_ij overflows BIGINT first).
    Restated verbatim in oracle._EMB_MOMENTS_SQL (change both sides
    or neither).

    Scale shape (100 TB): mapInPandas partial GRAM matrices — one
    exact int64 X^T X matmul per Arrow batch, d*(d+1)/2 rows out per
    batch (the map-side combine), then ONE (i, j)-keyed sum; the
    n*d^2 exploded form never materializes."""
    from typing import Iterator as _It

    import numpy as _np
    import pandas as _pd

    q = embeddings.select(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(KM_MICRO))).cast(
                "long"
            ),
        ).alias("qv")
    )

    def gram(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = _np.asarray(
                [_np.asarray(v, dtype=_np.int64) for v in pdf["qv"]]
            )
            g = m.T @ m  # exact int64 partial Gram
            s = m.sum(axis=0)
            d = m.shape[1]
            iu, ju = _np.triu_indices(d)
            yield _pd.DataFrame(
                {
                    "i": (iu + 1).astype("int64"),
                    "j": (ju + 1).astype("int64"),
                    "n": _np.full(iu.size, len(pdf), dtype="int64"),
                    "si": s[iu],
                    "sj": s[ju],
                    "sij": g[iu, ju],
                }
            )

    return (
        q.mapInPandas(
            gram,
            schema="i long, j long, n long, si long, sj long, sij long",
        )
        .groupBy("i", "j")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("si").cast("long").alias("sum_i"),
            F.sum("sj").cast("long").alias("sum_j"),
            F.sum("sij").cast("long").alias("sum_ij"),
        )
    )
