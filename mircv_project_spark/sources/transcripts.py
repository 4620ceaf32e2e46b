"""Transcript table: loading, derivation, docId assignment, synthesis.

The engine's input is a table of multi-turn conversation transcripts
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp) — the Spark equivalent of the reference's collection.tsv
(one line per document, ``parsing/Parser.java:121-138``).  One turn ==
one document; docId assignment is a dense 1-based rank over the total
order (conv_id, turn_idx) — mirroring the reference's read-order
``lastDocId++`` (``model/InvertedIndex.java:51``) and the docno mapping
``docno = docid - 1`` (``model/DocumentIndex.java:82-84``).

For the driver's test data, transcripts are derived deterministically
from the ``documents`` parquet table so a DuckDB oracle can construct
the identical table (see oracle.py: TRANSCRIPTS_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Deterministic documents -> transcripts mapping.  Chosen so the
# lexicographic order of (conv_id, turn_idx) equals doc_id order, which
# makes docid == doc_id + 1 and keeps the DuckDB oracle trivial to state.
# conv ids zero-pad to 12 digits (same width as generate_transcripts and
# the oracle SQL) so lexicographic == numeric order holds through 10^12
# conversations (8 * 10^12 turns) — not just 10^8.
TURNS_PER_CONV = 8
_ROLES = ["user", "assistant", "system", "tool"]


def load_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcripts table from {sf_dir}/documents.parquet."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    return docs.select(
        F.concat(
            F.lit("conv-"),
            F.lpad(F.floor(F.col("doc_id") / TURNS_PER_CONV).cast("string"), 12, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col("text"),
        F.when(F.col("doc_id") % 4 == 3, F.lit("grep")).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
    )


def assign_doc_ids(
    transcripts: DataFrame,
    scalable: bool = True,
    assume_sorted: bool = False,
    cleanup: list | None = None,
) -> DataFrame:
    """Add ``docid`` (1-based dense rank over ORDER BY conv_id, turn_idx)
    and ``docno`` (= docid - 1, the external id).

    scalable=True (default): two-pass zipWithIndex-equivalent — range
    repartition on the sort key, count rows per partition, broadcast the
    cumulative offsets, then number within partitions.  Deterministic
    because the sort key is total, and avoids the single-task bottleneck
    of a global window.  This is the only global sort in the build
    (SURVEY.md §7 step 2); at 10^12 rows it is checkpointed right after.

    assume_sorted=True: the input's partitions are already contiguous,
    sorted ranges of the key (e.g. generate_transcripts — spark.range
    partitions are ordered id ranges, and conv order == id order by
    construction).  Skips the range-partitioner's sampling pass, the
    shuffle, and the sort — docids come from per-partition counts +
    offsets alone.  Only valid for such sources; parquet-scanned tables
    keep the default full path.

    scalable=False: plain row_number() over a global window (oracle
    semantics, used in tests to cross-check the scalable path).
    """
    if not scalable:
        w = Window.orderBy("conv_id", "turn_idx")
        out = transcripts.withColumn("docid", F.row_number().over(w).cast("long"))
        return out.withColumn("docno", (F.col("docid") - 1).cast("string"))

    if assume_sorted:
        # NO persist here (round-6 measurement): caching the generated
        # text column cost 11-37 s at 500k turns while re-running the
        # deterministic generator costs ~2 s, and the counts job below
        # column-prunes the text away entirely when the source is lazy.
        # Valid because assume_sorted sources are deterministic plans
        # with stable partitioning (spark.range slices), so _pid and
        # per-partition counts are identical across the two jobs.
        ranged = transcripts.withColumn("_pid", F.spark_partition_id())
    else:
        n_part = max(transcripts.sparkSession.sparkContext.defaultParallelism, 8)
        ranged = transcripts.repartitionByRange(n_part, "conv_id", "turn_idx")
        ranged = ranged.sortWithinPartitions("conv_id", "turn_idx").withColumn(
            "_pid", F.spark_partition_id()
        )
        # persisted: consumed twice (per-partition counts, then
        # numbering) — without this the sampling pass + shuffle + sort
        # would run twice; at cluster scale this is the checkpointed
        # stage.  The cache must outlive the returned (lazy) numbering
        # plan, so it cannot be unpersisted here; callers that fully
        # materialize the result (e.g. the per-epoch streaming drain)
        # pass a ``cleanup`` list and unpersist afterwards — otherwise a
        # long-running stream accumulates one cached batch per epoch.
        ranged = ranged.persist()
        if cleanup is not None:
            cleanup.append(ranged)
    # per-partition counts -> cumulative start offsets (tiny; collected)
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offmap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    out = (
        ranged.withColumn(
            "docid",
            (F.row_number().over(w) + offmap[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
        .withColumn("docno", (F.col("docid") - 1).cast("string"))
    )
    return out


def generate_transcripts(
    spark: SparkSession,
    n_turns: int,
    vocab: list[str] | None = None,
    words_per_turn: int = 40,
    zipf_alpha: float = 1.6,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic transcript generator for benchmarks.

    Pure Catalyst expressions (spark.range + xxhash64-based sampling) —
    no Python in the generation path, so synthesizing 10^8+ turns is
    JVM-speed and identical for any partitioning.  Term distribution is
    Zipf-ish via a power transform of a uniform hash, giving realistic
    head-term skew for the salted aggregation to chew on.
    """
    vocab = vocab or _DEFAULT_VOCAB
    varr = F.array(*[F.lit(w) for w in vocab])
    vsize = len(vocab)
    base = spark.range(n_turns).withColumnRenamed("id", "doc_id")
    # per-(turn, position) uniform in [0,1): u = hash / 2^64 + 0.5
    word_i = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_turn)),
        lambda i: F.element_at(
            varr,
            (
                F.floor(
                    F.pow(
                        F.xxhash64(F.col("doc_id"), i, F.lit(seed)).cast("double")
                        / F.lit(float(2**64))
                        + F.lit(0.5),
                        F.lit(zipf_alpha),
                    )
                    * vsize
                ).cast("int")
                % vsize
                + 1
            ),
        ),
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.col("doc_id") % 4 + 1).cast("int")
    )
    return base.select(
        F.concat(
            F.lit("conv-"),
            F.lpad(F.floor(F.col("doc_id") / TURNS_PER_CONV).cast("string"), 12, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % TURNS_PER_CONV).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(" ", word_i).alias("text"),
        F.when(F.col("doc_id") % 4 == 3, F.lit("grep")).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_dt_interval(secs=F.col("doc_id").cast("double"))
        ).alias("ts"),
    )


_BASE_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "batch", "window", "spark", "order", "data", "column", "join",
    "small", "line", "customer", "query", "stream", "group", "big", "sort",
    "merge", "filter", "vector", "the", "a", "index", "shard", "search",
    "rank", "score", "term", "doc", "block", "cache", "disk", "memory",
    "thread", "executor", "shuffle", "skew", "salt", "bucket", "codec",
    "running", "universities", "connection", "engines", "tokens", "stemming",
    "retrieval", "ranking", "postings", "compression", "evaluate", "latency",
]

# realistic vocabulary size: 60 base words stay the Zipf head; suffixed
# variants form a ~1.5k-word tail so the build sees a head/tail df mix
# instead of 60 giant posting lists
_DEFAULT_VOCAB = _BASE_VOCAB + [
    f"{w}{i}" for i in range(24) for w in _BASE_VOCAB
]
