"""Structured-Streaming incremental index maintenance.

The reference is strictly batch (S1: tar.gz scan).  The Spark-native
engine adds streaming ingestion of new transcript turns:

- ``index_delta_query``: readStream over a transcript directory ->
  foreachBatch appends (a) doc_index delta rows with globally
  consistent docIds and (b) flat posting delta rows
  (term, docid, tf, doc_len) to a delta store.  docIds continue the
  reference's read-order semantics (``model/InvertedIndex.java:51``:
  lastDocId++ per arriving document): foreachBatch executes micro-
  batches sequentially, so batch N's ids start where N-1 ended (the
  running offset is recovered from the delta store on restart —
  exactly-once via the streaming checkpoint + idempotent per-batch
  overwrite into a batch=<epoch> subdirectory).
- ``compact_index``: merges accumulated deltas into a fresh postings
  table via the same aggregate_postings used by the batch build —
  queries on the compacted index are bit-identical to a batch build
  over the same rows in the same order.
- ``turns_per_window``: the watermarked event-time aggregation
  (late-data tolerant ingestion metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.index_build import (
    InvertedIndex,
    aggregate_postings,
    filter_indexable,
    tokenize_stage,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp"
)


def transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def _next_doc_offset(spark: SparkSession, delta_dir: str, epoch_id: int) -> int:
    """Running docId offset for epoch `epoch_id`.

    Crash-replay idempotence: the scan EXCLUDES the current epoch's own
    partition (batch >= epoch_id) — a replayed epoch that already wrote
    rows before the checkpoint committed must recompute the SAME offset
    it used the first time, so the overwrite reproduces identical
    docids (no gap, docno mapping equal to the batch build's).
    """
    try:
        row = (
            spark.read.parquet(f"{delta_dir}/doc_index")
            .where(F.col("batch") < epoch_id)
            .agg(F.max("docid"))
            .collect()[0]
        )
        return int(row[0] or 0)
    except Exception:  # first batch: no delta store yet
        return 0


def index_delta_query(
    spark: SparkSession,
    input_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    parse: bool = True,
    available_now: bool = True,
):
    """Start (and return) the streaming query writing index deltas."""

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = filter_indexable(batch_df)
        if batch_df.isEmpty():
            return
        offset = _next_doc_offset(spark, delta_dir, epoch_id)
        # arrival-order docIds within the batch (reference read-order
        # semantics); (conv_id, turn_idx) orders rows of one batch.
        # Scalable two-pass numbering (range repartition + per-partition
        # offsets, sources/transcripts.py:52) — a backfill-sized batch
        # never funnels through a single-task global Window sort.
        from ..sources.transcripts import assign_doc_ids

        caches: list = []
        with_ids = (
            assign_doc_ids(batch_df, scalable=True, cleanup=caches)
            .withColumn("docid", (F.col("docid") + F.lit(offset)).cast("long"))
            .withColumn("docno", (F.col("docid") - 1).cast("string"))
        )
        # persisted: consumed by TWO write jobs below (doc_index, then
        # flat) — without the cache the whole numbering + tokenizer-UDF
        # lineage executes twice per epoch (the dedup.py multi-branch
        # gotcha); a backfill-sized batch would pay the full tokenize
        # twice.  The first write materializes it, the second reads cache.
        tok = tokenize_stage(with_ids, parse).persist()
        try:
            # idempotent per-epoch outputs: reprocessing epoch N overwrites
            # its own subdirectory instead of double-appending
            tok.select("docid", "docno", "conv_id", "turn_idx", "doc_len").write.mode(
                "overwrite"
            ).parquet(f"{delta_dir}/doc_index/batch={epoch_id}")
            flat = tok.select(
                "docid", "doc_len", F.explode("terms").alias("kv")
            ).select("docid", F.col("kv.term").alias("term"), F.col("kv.tf").alias("tf"), "doc_len")
            flat.write.mode("overwrite").parquet(f"{delta_dir}/flat/batch={epoch_id}")
        finally:
            tok.unpersist(blocking=False)
            for c in caches:
                c.unpersist(blocking=False)

    writer = (
        transcript_stream(spark, input_dir)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# run-id stride per compaction generation: generation g's runs get ids
# g*RUN_STRIDE + local_run, so a term's runs across generations sort in
# generation order — and within a generation in docId-range order — which
# is exactly ascending docId (new epochs only ever append larger docIds).
# int32-safe for >2000 generations at the config fanout cap.
RUN_STRIDE = 1_000_000


def _read_meta(spark: SparkSession, state_dir: str) -> dict | None:
    """None ONLY when no committed meta exists (first compaction).
    A meta that exists but fails to read must RAISE — treating a
    transient read error as 'no state' would make compact_index wipe
    and rebuild every generation, silently masking corruption.  Local
    FS existence check here; on a cluster this state is an Iceberg
    table and 'missing' is a catalog lookup, not an exception guess."""
    import os

    if not os.path.exists(f"{state_dir}/meta/_SUCCESS"):
        return None
    r = spark.read.parquet(f"{state_dir}/meta").collect()[0]
    return {
        "gen": int(r["gen"]),
        "watermark": int(r["watermark"]),
        "n_docs": int(r["n_docs"]),
        "sum_doc_len": int(r["sum_doc_len"]),
    }


def compact_index(
    spark: SparkSession,
    delta_dir: str,
    parse: bool,
    codec: str = "vb",
    state_dir: str | None = None,
    upto_batch: int | None = None,
) -> InvertedIndex:
    """INCREMENTAL compaction of accumulated deltas into queryable index
    tables — cost O(new epochs), not O(corpus).

    Only epochs newer than the persisted watermark aggregate (one
    shuffle over the NEW rows only) into a fresh generation of runs
    appended under ``delta_dir/compacted/runs/gen=G``; prior
    generations' run files are reused untouched.  Runs are the merge
    unit by design (operators/index_build.py:135-151): a term's posting
    list is its runs' blocks concatenated in run order, and generation-
    strided run ids keep that order == ascending docId because new
    epochs only ever append larger docIds.

    Exactness across avgdl drift: each run stores a (tf -> min doc_len)
    frontier (bm_frontier) and the BM25 upper bound is recomputed from
    it LAZILY at the current corpus avgdl — bit-identical to a batch
    build's max-over-postings (coeff is monotone in dl for fixed tf),
    with no posting-payload reads.  TFIDF bounds don't depend on avgdl.

    Crash-safety: the runs generation writes first, meta (watermark,
    gen, running doc stats) commits last; a replayed compaction
    recomputes the SAME generation directory via overwrite.  On a
    cluster this state maps to an Iceberg table with snapshot commits.
    """
    import shutil

    from ..operators.index_build import lexicon_from_runs
    from ..operators import scoring

    state = state_dir or f"{delta_dir}/compacted"
    meta = _read_meta(spark, state)
    if meta is None:
        # no committed meta: clear any orphan run generation from a
        # crashed first compaction so gen 0 re-covers everything
        shutil.rmtree(f"{state}/runs", ignore_errors=True)
        meta = {"gen": 0, "watermark": -1, "n_docs": 0, "sum_doc_len": 0}

    doc_index = spark.read.parquet(f"{delta_dir}/doc_index")
    if upto_batch is not None:
        # compact only a prefix of the epochs (the NRT gate's committed
        # baseline); the returned view covers the same prefix
        doc_index = doc_index.where(F.col("batch") <= upto_batch)
    new_docs = doc_index.where(F.col("batch") > meta["watermark"])
    row = new_docs.agg(
        F.count("*"), F.sum("doc_len"), F.max("batch")
    ).collect()[0]
    n_new, s_new = int(row[0]), int(row[1] or 0)
    n_docs = meta["n_docs"] + n_new
    sum_dl = meta["sum_doc_len"] + s_new

    if n_new:
        gen = meta["gen"]
        flat_new = spark.read.parquet(f"{delta_dir}/flat").where(
            F.col("batch") > meta["watermark"]
        )
        if upto_batch is not None:
            flat_new = flat_new.where(F.col("batch") <= upto_batch)
        flat_new = flat_new.select("term", "docid", "tf", "doc_len")
        runs_new = aggregate_postings(
            flat_new,
            n_docs=n_docs,
            avgdl=sum_dl / float(n_docs),
            codec=codec,
            bm_frontier=True,
            # heavy-term salting must range-partition over THIS
            # segment's docid extent, not the cumulative corpus domain
            # (otherwise run payloads grow unbounded as the corpus does)
            docid_lo=meta["n_docs"],
        ).withColumn("run", (F.col("run") + gen * RUN_STRIDE).cast("int"))
        runs_new.write.mode("overwrite").parquet(f"{state}/runs/gen={gen}")
        spark.createDataFrame(
            [(gen + 1, int(row[2]), n_docs, sum_dl)],
            "gen int, watermark long, n_docs long, sum_doc_len long",
        ).write.mode("overwrite").parquet(f"{state}/meta")

    # lazy pbm recompute from the per-run frontier at the CURRENT avgdl
    avgdl = sum_dl / float(n_docs)

    def _coeff(p):
        return scoring.bm25_coeff_col(p["tf"], p["dl"], avgdl)

    postings = (
        spark.read.parquet(f"{state}/runs")
        .withColumn("pbm", F.array_max(F.transform("bmfront", _coeff)))
        .drop("gen", "bmfront")
    )
    flat = spark.read.parquet(f"{delta_dir}/flat")
    if upto_batch is not None:
        flat = flat.where(F.col("batch") <= upto_batch)
    flat = flat.select("term", "docid", "tf", "doc_len")
    return InvertedIndex(
        tokenized=doc_index,
        lexicon=lexicon_from_runs(postings, n_docs),
        doc_index=doc_index.select("docid", "docno", "conv_id", "turn_idx", "doc_len"),
        flat=flat,
        postings=postings,
        n_docs=n_docs,
        sum_doc_len=sum_dl,
        parse=parse,
        codec=codec,
    )


def nrt_index(
    spark: SparkSession,
    delta_dir: str,
    parse: bool,
    codec: str = "vb",
    state_dir: str | None = None,
) -> InvertedIndex:
    """Near-real-time queryable view: committed compacted generations
    UNION an on-the-fly aggregation of every epoch past the committed
    watermark — the Lucene NRT-reader pattern.  Nothing is written:
    freshly ingested turns become searchable WITHOUT waiting for a
    compaction commit, and the view is exact — global stats (n_docs,
    avgdl) cover all epochs, fresh runs take the next generation's
    strided run ids (so run order stays ascending-docId), and every
    run's BM25 bound is recomputed from its (tf -> min dl) frontier at
    the CURRENT avgdl, committed and fresh alike — identical to a
    batch build over the full corpus.

    Scale: the fresh aggregation shuffles only the un-compacted
    epochs' rows (partition-pruned by the batch predicate); committed
    generations are reused untouched, exactly as in compact_index."""
    from ..operators.index_build import lexicon_from_runs
    from ..operators import scoring

    state = state_dir or f"{delta_dir}/compacted"
    meta = _read_meta(spark, state)
    if meta is None:
        meta = {"gen": 0, "watermark": -1, "n_docs": 0, "sum_doc_len": 0}

    doc_index = spark.read.parquet(f"{delta_dir}/doc_index")
    fresh_docs = doc_index.where(F.col("batch") > meta["watermark"])
    row = fresh_docs.agg(F.count("*"), F.sum("doc_len")).collect()[0]
    n_new, s_new = int(row[0]), int(row[1] or 0)
    n_docs = meta["n_docs"] + n_new
    sum_dl = meta["sum_doc_len"] + s_new
    avgdl = sum_dl / float(n_docs)

    def _coeff(p):
        return scoring.bm25_coeff_col(p["tf"], p["dl"], avgdl)

    parts = []
    if meta["gen"] > 0:
        parts.append(spark.read.parquet(f"{state}/runs").drop("gen"))
    if n_new:
        flat_new = (
            spark.read.parquet(f"{delta_dir}/flat")
            .where(F.col("batch") > meta["watermark"])
            .select("term", "docid", "tf", "doc_len")
        )
        runs_new = aggregate_postings(
            flat_new,
            n_docs=n_docs,
            avgdl=avgdl,
            codec=codec,
            bm_frontier=True,
            docid_lo=meta["n_docs"],
        ).withColumn(
            "run", (F.col("run") + meta["gen"] * RUN_STRIDE).cast("int")
        )
        parts.append(runs_new.select(*parts[0].columns) if parts else runs_new)
    if not parts:
        raise ValueError(f"no epochs under {delta_dir}")
    runs = parts[0]
    for p in parts[1:]:
        runs = runs.unionByName(p)
    # persist the assembled run table: a reader's fused lexicon+postings
    # fetch (index_store._fetch_rows) is a UNION whose two branches both
    # contain this plan — without the persist the fresh-epoch
    # aggregation (shuffle + encode UDF) executes twice per query batch,
    # with it the first fetch materializes it once and every subsequent
    # batch serves from cache (round-6 NRT-freshness measurement).
    # Read-only: nothing is written, the committed meta never advances.
    postings = runs.withColumn(
        "pbm", F.array_max(F.transform("bmfront", _coeff))
    ).drop("bmfront").persist()

    flat = spark.read.parquet(f"{delta_dir}/flat").select(
        "term", "docid", "tf", "doc_len"
    )
    return InvertedIndex(
        tokenized=doc_index,
        lexicon=lexicon_from_runs(postings, n_docs),
        doc_index=doc_index.select(
            "docid", "docno", "conv_id", "turn_idx", "doc_len"
        ),
        flat=flat,
        postings=postings,
        n_docs=n_docs,
        sum_doc_len=sum_dl,
        parse=parse,
        codec=codec,
    )


def turns_per_window(
    stream: DataFrame, window: str = "1 minute", watermark: str = "30 seconds"
) -> DataFrame:
    """Watermarked event-time aggregation: turns + distinct-ish convs
    per (window, role).  Late rows beyond the watermark are dropped;
    state is bounded by watermark horizon."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("role"))
        .agg(
            F.count("*").alias("turns"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "turns",
            "approx_convs",
        )
    )


def run_turns_per_window(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "30 seconds",
    watermark: str = "10 seconds",
):
    """One availableNow pass of the watermarked window aggregation over
    new files in ``input_dir``, appending FINALIZED windows to
    ``out_dir`` parquet.  Append mode emits a window exactly once, when
    the watermark (max event time − delay, updated at micro-batch
    boundaries) passes its end — windows still inside the watermark
    horizon stay in state and never reach the sink, which is what bounds
    state at an unbounded stream.  availableNow's trailing no-data batch
    flushes windows the final data batch closed."""
    return (
        turns_per_window(transcript_stream(spark, input_dir), window, watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def asof_lexicon(spark: SparkSession, delta_dir: str, epoch: int) -> DataFrame:
    """Time-travel read: the lexicon (with corpus stats) AS OF
    ingestion epoch E — the epoch-partitioned delta layout IS the
    snapshot log, so reading partitions batch <= E reconstructs
    exactly the post-epoch-E index state; no snapshot files, no
    tombstones, O(prefix) work.

    -> (term, df, cf, idf, bm25_ub, tfidf_ub) with idf/UBs computed at
    the AS-OF n_docs/avgdl (round 6) — the same derivation the batch
    lexicon gate pins, restricted to the prefix.

    Scale shape: partition pruning on `batch` keeps unread epochs out
    of the scan entirely; one (term) aggregate over the prefix rows."""
    from ..operators import scoring

    flat = spark.read.parquet(f"{delta_dir}/flat").where(
        F.col("batch") <= int(epoch)
    )
    di = spark.read.parquet(f"{delta_dir}/doc_index").where(
        F.col("batch") <= int(epoch)
    )
    st = di.agg(F.count("*").alias("n"), F.sum("doc_len").alias("s")).collect()[0]
    n_docs = int(st["n"])
    avgdl = int(st["s"] or 0) / max(n_docs, 1)

    coeff = scoring.bm25_coeff_col(F.col("tf"), F.col("doc_len"), avgdl)
    agg = flat.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.max(coeff).alias("mbc"),
        F.max(scoring.tfidf_coeff_col(F.col("tf"))).alias("mtc"),
    )
    idf = scoring.idf_col(F.col("df"), n_docs)
    return agg.select(
        "term",
        F.col("df").cast("long").alias("df"),
        F.col("cf").cast("long").alias("cf"),
        F.round(idf, 6).alias("idf"),
        F.round(F.col("mbc") * idf, 6).alias("bm25_ub"),
        F.round(F.col("mtc") * idf, 6).alias("tfidf_ub"),
    )


def lexicon_diff(
    spark: SparkSession, delta_dir: str, epoch_a: int, epoch_b: int
) -> DataFrame:
    """Vocabulary drift between two ingestion epochs of the streaming
    index — the ops view behind "what changed since the last snapshot"
    (new terms appearing, head terms growing).

    -> (term, df_a, cf_a, df_b, cf_b, status) over the epoch-B
    vocabulary, status in {'new', 'grown', 'stable'} (pinned, restated
    verbatim in the oracle): 'new' when the term is absent at epoch A
    (df_a = 0), else 'grown' when cf_b > cf_a (ingestion is
    append-only, so any new occurrence grows cf — df alone can stall
    while cf grows), else 'stable'.

    Scale shape: two partition-pruned prefix scans of the flat delta
    store (batch <= E is a partition predicate), one term-keyed
    aggregate each, one term equi-join."""
    flat = spark.read.parquet(f"{delta_dir}/flat")

    def lex(e: int, suffix: str) -> DataFrame:
        return (
            flat.where(F.col("batch") <= int(e))
            .groupBy("term")
            .agg(
                F.count("*").cast("long").alias(f"df_{suffix}"),
                F.sum("tf").cast("long").alias(f"cf_{suffix}"),
            )
        )

    la, lb = lex(epoch_a, "a"), lex(epoch_b, "b")
    zero = F.lit(0).cast("long")
    status = (
        F.when(F.col("df_a") == 0, F.lit("new"))
        .when(F.col("cf_b") > F.col("cf_a"), F.lit("grown"))
        .otherwise(F.lit("stable"))
    )
    return (
        lb.join(la, "term", "left")
        .select(
            "term",
            F.coalesce(F.col("df_a"), zero).alias("df_a"),
            F.coalesce(F.col("cf_a"), zero).alias("cf_a"),
            "df_b",
            "cf_b",
        )
        .withColumn("status", status)
    )
