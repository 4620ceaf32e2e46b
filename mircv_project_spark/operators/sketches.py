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


def qsk_quantile_aggs(value_col: str = "v", qs: tuple = QSK_QS):
    """The ONE copy of the sample-quantile aggregate list (n_sample +
    linear-interpolated percentiles round 6), shared by the batch
    operator and the streaming-sample gate so the two cannot drift."""
    return [F.count("*").cast("long").alias("n_sample")] + [
        F.round(F.percentile(F.col(value_col), F.lit(q)), 6).alias(
            f"q{int(q * 100)}"
        )
        for q in qs
    ]


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
    return sample.groupBy("source").agg(*qsk_quantile_aggs("v", qs))


HLL_P = 8  # 2^8 = 256 registers
HLL_M = 256
HLL_SALT = "hll-"
# alpha_256 = 0.7213 / (1 + 1.079/256) as ONE pinned literal (both
# engines parse the same decimal to the same double; computing the
# division at run time would be a second rounding)
HLL_ALPHA = 0.7182725932495458
_TWO52 = 1 << 52


def hll_bucket_rho(term_col):
    """struct(bucket, rho) of a term — the ONE copy of the salted
    register arithmetic (bucket = h % 256, rho = trailing-zero count
    of the upper 52 bits + 1, capped at 52, w == 0 -> 52), shared by
    the batch operator and the streaming sketch so the two cannot
    drift."""
    h = hash60_col(F.concat(F.lit(HLL_SALT), term_col))
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(52)).otherwise(
        F.least(
            F.bit_count((w.bitwiseAND(-w)) - F.lit(1)) + F.lit(1),
            F.lit(52),
        )
    )
    return F.struct(
        (h % F.lit(HLL_M)).alias("bucket"), rho.cast("int").alias("rho")
    )


def hll_estimate_from_regs(regs: DataFrame) -> DataFrame:
    """(source, bucket, m) register table -> (source, n_nonzero,
    reg_sum, z_scaled, est): the exact-BIGINT harmonic sum and the one
    final division — shared by the batch gate and the streaming
    final-state derivation so the estimator exists once."""
    agg = regs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_nonzero"),
        F.sum("m").cast("long").alias("reg_sum"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(52 - m AS INT))")
        )
        .cast("long")
        .alias("znz"),
    )
    z_scaled = (
        (F.lit(HLL_M) - F.col("n_nonzero")) * F.lit(_TWO52) + F.col("znz")
    ).cast("long")
    num = HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(_TWO52)
    return agg.withColumn("z_scaled", z_scaled).select(
        "source",
        "n_nonzero",
        "reg_sum",
        "z_scaled",
        F.round(F.lit(num) / F.col("z_scaled").cast("double"), 6).alias(
            "est"
        ),
    )


def hll_distinct_tokens(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, n_distinct, n_nonzero, reg_sum, z_scaled, est):
    per-source HyperLogLog cardinality sketch (Flajolet et al. 2007)
    beside the exact count — the fixed-size (m = 256 registers)
    member of the sketch family next to KMV's k-minimum-values.

    Why this is hash-gateable (same discipline as KMV): the hash is
    the deterministic md5-derived hash60 (salt 'hll-'), registers are
    integer maxima, and the harmonic sum is computed in EXACT integer
    units — z_scaled = sum over all 256 registers of 2^(52 - M_j)
    (empty registers contribute 2^52), a BIGINT.  Only the final
    estimate divides once: est = round(alpha*m^2*2^52 / z_scaled, 6),
    with alpha_256 a pinned literal and the numerator built by exact
    power-of-two scaling.  Pins restated verbatim in oracle._HLL_SQL
    (change both sides or neither): p = 8, bucket = h % 256, w =
    h >> 8 (52 bits), rho = trailing-zero count + 1 = bit_count((w &
    -w) - 1) + 1 capped at 52 (w = 0 pins rho = 52), RAW estimator
    only — no small-range correction (the exact n_distinct column is
    the verification path, so correction would only obscure the
    estimator under test).

    Scale shape (100 TB): registers merge by max, so the per-token
    explode feeds ONE partial-aggregating groupBy(source, bucket) —
    map-side combine bounds the shuffle at 256 rows per (partition,
    source); no distinct, no sort.  The exact n_distinct branch is the
    O(distinct) verification path a production run drops."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).persist()  # register and exact branches both read it
    try:
        regs = (
            toks.select("source", hll_bucket_rho(F.col("t")).alias("br"))
            .select(
                "source",
                F.col("br.bucket").alias("bucket"),
                F.col("br.rho").alias("rho"),
            )
            .groupBy("source", "bucket")
            .agg(F.max("rho").alias("m"))
        )
        est = hll_estimate_from_regs(regs)
        exact = (
            toks.distinct()
            .groupBy("source")
            .agg(F.count("*").cast("long").alias("n_distinct"))
        )
        out = (
            exact.join(est, "source")
            .select(
                "source",
                "n_distinct",
                "n_nonzero",
                "reg_sum",
                "z_scaled",
                "est",
            )
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out


BLOOM_WORD = 60  # bits per word — keeps every mask positive in BIGINT
BLOOM_WORDS = 256
BLOOM_BITS = BLOOM_WORD * BLOOM_WORDS  # 15360
BLOOM_K = 4
BLOOM_SALTS = ("bloom0-", "bloom1-", "bloom2-", "bloom3-")


def bloom_pos_col(term_col, i: int):
    """Hash-i bit position of a term — the ONE copy of the salted
    position arithmetic, shared by the filter build, the probe side,
    and the streaming filter (so the three cannot drift)."""
    return hash60_col(
        F.concat(F.lit(BLOOM_SALTS[i]), term_col)
    ) % F.lit(BLOOM_BITS)


def bloom_probe_verdicts(
    sources: DataFrame, words: DataFrame, pr: DataFrame
) -> DataFrame:
    """(source) x (term) grid against a (source, word, w) filter table
    -> (source, term, in_filter).  Shared by the batch gate and the
    streaming final-state derivation — the membership test exists
    once."""
    ppos = pr.select(
        "term",
        F.explode(
            F.array(*[bloom_pos_col(F.col("term"), i) for i in range(BLOOM_K)])
        ).alias("p"),
    ).select(
        "term",
        F.expr(f"p DIV {BLOOM_WORD}").cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT),"
            f" CAST(p % {BLOOM_WORD} AS INT))"
        ).alias("mask"),
    )
    grid = sources.crossJoin(F.broadcast(ppos))
    hits = grid.join(words, ["source", "word"], "left").select(
        "source",
        "term",
        (
            F.coalesce(F.col("w"), F.lit(0).cast("long"))
            .bitwiseAND(F.col("mask"))
            == F.col("mask")
        ).cast("int").alias("hit"),
    )
    return hits.groupBy("source", "term").agg(
        F.min("hit").cast("int").alias("in_filter")
    )


def bloom_term_filter(
    docs: DataFrame,
    probes: list[str],
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, term, present, in_filter, n_set): per-source Bloom
    filter over the distinct normalized-token vocabulary (Bloom CACM
    1970 — the membership structure Parquet/Impala attach to columns
    and engines use for join pruning), probed with a pinned term set;
    the exact `present` verdict rides beside `in_filter` so the
    no-false-negatives contract is verifiable (in_filter >= present
    always; in_filter > present is the measured false-positive).

    Hash-gateable like KMV/HLL: k = 4 positions per term are
    deterministic md5-derived hash60 values mod BLOOM_BITS (salts
    'bloom0-'..'bloom3-'), the filter is an exact integer bit-or over
    60-bit words (60, not 64 — a bit-63 mask would wrap negative and
    engines disagree on signed overflow), and membership is integer
    mask tests.  Restated verbatim in oracle._BLOOM_SQL (change both
    sides or neither).  Probes are given in NORMALIZED token form.
    n_set = total set bits in the source's filter (the fill-rate
    audit column).

    Scale shape (100 TB): the filter build is ONE partial-aggregating
    groupBy(source, word) bit_or — map-side combine bounds the shuffle
    at BLOOM_WORDS rows per (partition, source); the probe side is a
    driver-small grid equi-joined to the word table.  Filters merge by
    bit-or (union semantics), the property that makes Bloom filters
    per-partition buildable."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).distinct().persist()
    try:
        pos = toks.select(
            "source",
            F.explode(
                F.array(*[bloom_pos_col(F.col("t"), i) for i in range(BLOOM_K)])
            ).alias("p"),
        )
        words = (
            pos.select(
                "source",
                F.expr(f"p DIV {BLOOM_WORD}").cast("long").alias("word"),
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(p % {BLOOM_WORD} AS INT))"
                ).alias("mask"),
            )
            .groupBy("source", "word")
            .agg(F.bit_or("mask").alias("w"))
        )
        nset = words.groupBy("source").agg(
            F.sum(F.bit_count("w")).cast("long").alias("n_set")
        )
        pr = spark.createDataFrame(
            [(t,) for t in probes], "term string"
        )
        sources = docs.select(
            F.col(source_col).alias("source")
        ).distinct()
        in_filter = bloom_probe_verdicts(sources, words, pr)
        present = (
            sources.crossJoin(F.broadcast(pr))
            .join(
                toks.withColumnRenamed("t", "term").withColumn(
                    "pres", F.lit(1)
                ),
                ["source", "term"],
                "left",
            )
            .select(
                "source",
                "term",
                F.coalesce(F.col("pres"), F.lit(0)).cast("int").alias(
                    "present"
                ),
            )
        )
        out = (
            present.join(in_filter, ["source", "term"])
            .join(nset, "source")
            .select("source", "term", "present", "in_filter", "n_set")
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out


CMS_D = 4
CMS_W = 1024
CMS_SALTS = ("cms0-", "cms1-", "cms2-", "cms3-")


def cms_cell_col(term_col, i: int):
    """Row-i sketch cell of a term: struct(row, col) — the ONE copy of
    the salted cell arithmetic, shared by the batch operator, the probe
    side, and the streaming sketch (so the three cannot drift)."""
    return F.struct(
        F.lit(i).alias("row"),
        (
            hash60_col(F.concat(F.lit(CMS_SALTS[i]), term_col))
            % F.lit(CMS_W)
        ).alias("col"),
    )


def cms_probe_estimates(
    sources: DataFrame, counters: DataFrame, pr: DataFrame
) -> DataFrame:
    """(source) x (term) grid -> (source, term, est): est = min over
    the d rows of the counter at the term's cell, untouched cell -> 0.
    Shared by the batch gate and the streaming final-state derivation
    — the estimate arithmetic exists once."""
    pcells = pr.select(
        "term",
        F.explode(
            F.array(*[cms_cell_col(F.col("term"), i) for i in range(CMS_D)])
        ).alias("c"),
    ).select("term", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
    grid = sources.crossJoin(F.broadcast(pcells))
    return (
        grid.join(counters, ["source", "row", "col"], "left")
        .groupBy("source", "term")
        .agg(
            F.min(F.coalesce(F.col("n"), F.lit(0).cast("long")))
            .cast("long")
            .alias("est")
        )
    )


def cms_term_counts(
    docs: DataFrame,
    probes: list[str],
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, term, true_count, est, n_cells): per-source
    count-min sketch of the token OCCURRENCE stream (Cormode &
    Muthukrishnan 2005) probed with the pinned terms — the
    frequency-estimation sketch beside SpaceSaving's top-k: d = 4
    hash rows of w = 1024 counters, est(t) = min over rows of the
    counter at that row's hash cell; the exact `true_count` rides
    beside so the one-sided overestimate contract (est >= true_count,
    est > true_count is the measured collision error) is verifiable.

    Hash-gateable like Bloom/HLL/KMV: cells are deterministic
    md5-derived hash60 values mod CMS_W (salts 'cms0-'..'cms3-'),
    counters are exact BIGINT sums.  Restated verbatim in
    oracle._CMS_SQL (change both sides or neither).  Probes in
    NORMALIZED token form; a probe whose cell was never touched
    estimates 0.  n_cells = the source's nonzero cells (fill audit).

    Scale shape (100 TB): the sketch build is ONE partial-aggregating
    groupBy(source, row, col) count — map-side combine bounds the
    shuffle at d*w rows per (partition, source); counters merge by
    addition (the CMS mergeability property), and the probe side is a
    driver-small cell list equi-joined to the counter table.  The
    exact true_count branch is the verification path a production run
    drops."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).persist()  # counter and exact branches both read it
    try:
        cells = toks.select(
            "source",
            F.explode(
                F.array(*[cms_cell_col(F.col("t"), i) for i in range(CMS_D)])
            ).alias("c"),
        ).select("source", F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        counters = cells.groupBy("source", "row", "col").agg(
            F.count("*").cast("long").alias("n")
        )
        ncells = counters.groupBy("source").agg(
            F.count("*").cast("long").alias("n_cells")
        )
        pr = spark.createDataFrame([(t,) for t in probes], "term string")
        sources = docs.select(
            F.col(source_col).alias("source")
        ).distinct()
        est = cms_probe_estimates(sources, counters, pr)
        true_c = (
            sources.crossJoin(F.broadcast(pr))
            .join(
                toks.withColumnRenamed("t", "term")
                .groupBy("source", "term")
                .agg(F.count("*").alias("tc")),
                ["source", "term"],
                "left",
            )
            .select(
                "source",
                "term",
                F.coalesce(F.col("tc"), F.lit(0)).cast("long").alias(
                    "true_count"
                ),
            )
        )
        out = (
            true_c.join(est, ["source", "term"])
            .join(ncells, "source")
            .select("source", "term", "true_count", "est", "n_cells")
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out


# ------------------------------ AMS F2 sketch ------------------------------
#
# Alon-Matias-Szegedy second frequency moment (F2 = sum over terms of
# count^2) — the tug-of-war sketch (Alon, Matias, Szegedy, STOC 1996).
# Each of AMS_R independent estimator rows assigns every term a salted
# +-1 sign and keeps Z_r = SUM over the OCCURRENCE stream of sign_r(t)
# (duplicates kept — F2 is about frequencies); E[Z_r^2] = F2 and the
# estimate of record is the MEDIAN of the R squares.  State is one
# BIGINT per (source, r): additive, commutative, mergeable — the
# streaming_cms discipline (map-side partial sums, O(R) per key).
# |Z_r| <= stream length, so Z^2 stays inside BIGINT up to ~3e9
# occurrences per source per job — shard beyond that.
#
# Gate pins (change both sides or neither): R = 5 (odd — the median is
# the exact middle element, no interpolation), salts 'ams0-'..'ams4-',
# sign = +1 iff hash60(salt || term) is even, est = the sorted
# 5-array's element 3 (1-based), exact f2_true rides beside as the
# verification column.

AMS_R = 5
AMS_SALT = "ams"


def ams_est_col(zs: list) -> "F.Column":
    """Median-of-squares estimator — the ONE shared expression (batch
    operator and the streaming-AMS read view both call it): sorted
    array of the R squares, 1-based middle element (R odd)."""
    squares = F.array_sort(F.array(*[(z * z).cast("long") for z in zs]))
    return F.element_at(squares, (AMS_R + 1) // 2).cast("long")


def ams_sign_col(term_col, r: int):
    """+-1 sign for estimator row r — the ONE shared expression (the
    oracle restates it verbatim over the same md5-derived hash60)."""
    h = hash60_col(F.concat(F.lit(f"{AMS_SALT}{r}-"), term_col))
    return F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1))


def ams_f2_tokens(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, z0..z4, f2_est, f2_true): per-source AMS F2 over the
    normalized-token occurrence stream.  One (source) shuffle for the
    sketch (R integer partial sums ride map-side); the exact f2_true
    branch pays the full (source, term) shuffle and exists for
    verification — drop it at production scale."""
    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).persist()  # sketch and exact branches both read it
    try:
        zs = toks.groupBy("source").agg(
            *[
                F.sum(ams_sign_col(F.col("t"), r)).cast("long").alias(f"z{r}")
                for r in range(AMS_R)
            ]
        )
        f2 = (
            toks.groupBy("source", "t")
            .agg(F.count("*").cast("long").alias("c"))
            .groupBy("source")
            .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_true"))
        )
        out = (
            zs.join(f2, "source")
            .select(
                "source",
                *[F.col(f"z{r}") for r in range(AMS_R)],
                ams_est_col([F.col(f"z{r}") for r in range(AMS_R)]).alias(
                    "f2_est"
                ),
                "f2_true",
            )
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out
