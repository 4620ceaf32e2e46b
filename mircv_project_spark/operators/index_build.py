"""Inverted-index construction as DataFrame aggregations.

The reference's SPIMI build (``model/InvertedIndex.java:30-214``) is a
single-threaded loop: tokenize, accumulate term->postings in RAM, flush
memory-bounded partial indexes, then k-way-merge them.  Spark-first,
that entire structure collapses into one two-stage aggregation:

- the *partial index flush* is a shuffle map output of
  ``groupBy(term[, salt])`` (M1/M2);
- the *k-way merge of sorted runs* (M3) is the sort-based shuffle
  aggregation itself; explicit salted sub-groups cover head-term skew,
  and their runs concatenate in docId order because the salt is a
  range-partition of the docId domain;
- df/cf/maxDocId merging (M4) are plain sum/max aggregates;
- term upper bounds (A5, ``queryProcessor/Scorer.java:52-72``) fold into
  the same aggregation: score = coeff(tf, dl) * idf with idf constant
  per term, so UB = max(coeff) * idf — no second pass over postings;
- block split + skip pointers (M5) are a vectorized pandas UDF over the
  assembled per-term arrays (functions/codecs.py).

Pipeline stages (each checkpointable -> resumable build, SURVEY.md §7):

  stage "tokenized": transcripts -> (docid, docno, conv_id, turn_idx,
                     doc_len, terms array<struct<term,tf>>)   [doc_index]
  stage "stats":     N, sum_dl, avgdl
  stage "postings":  salted two-stage groupBy(term) -> lexicon scalars +
                     docId-sorted posting arrays -> encoded blocks
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config
from ..functions import codecs
from ..functions.tokenizer import doc_terms_udf
from . import scoring

BLOCKS_SCHEMA = (
    "array<struct<max_doc_id:long, n:int, max_tf:int, min_dl:int,"
    " docids:binary, tfs:binary, dls:binary>>"
)


@dataclass
class InvertedIndex:
    """Handle to the built index tables (DataFrames + scalar stats)."""

    tokenized: DataFrame  # docid, docno, conv_id, turn_idx, doc_len, terms
    doc_index: DataFrame  # docid, docno, conv_id, turn_idx, doc_len
    flat: DataFrame  # term, docid, tf, doc_len  (pre-compression postings)
    postings: DataFrame  # run-grained: term, run, run_df, pcf, pbm, ptf, blocks, bucket
    lexicon: DataFrame  # term, df, cf, idf, bm25_ub, tfidf_ub, n_runs, bucket
    n_docs: int
    sum_doc_len: int
    parse: bool
    codec: str
    term_buckets: int = config.POSTINGS_TERM_BUCKETS
    metrics: dict = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        # reference CollectionStatistics.java:33 — long / (double) int
        return self.sum_doc_len / float(self.n_docs)


def filter_indexable(transcripts: DataFrame) -> DataFrame:
    """Blank turns are skipped entirely — they consume no docId
    (``model/InvertedIndex.java:45-47``: ``line.isBlank() -> continue``).
    Must run BEFORE docId assignment."""
    return transcripts.where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    )


def tokenize_stage(transcripts_with_docid: DataFrame, parse: bool) -> DataFrame:
    terms = doc_terms_udf(parse)(F.col("text")).alias("terms")
    out = transcripts_with_docid.select(
        "docid", "docno", "conv_id", "turn_idx", terms
    )
    # docLen = token count after the FULL pipeline (stop/stem included
    # when parse=True) — model/InvertedIndex.java:59-63 / SURVEY T9.
    return out.withColumn(
        "doc_len",
        F.aggregate("terms", F.lit(0), lambda acc, x: acc + x["tf"]),
    )


def _encode_blocks_udf(codec_name: str, avgdl: float, bm_frontier: bool):
    """Block encoder over one term-run's postings arrays.

    docId ordering happens HERE (numpy argsort per run) rather than as
    a JVM sort_array over collect_list structs: the array sort of
    millions of short-lived struct objects was measurable GC/alloc
    churn in the postings stage, while an int64 argsort over the same
    data is a few ms per run and keeps the whole ordering step inside
    the Arrow batch.

    The same crossing also computes:

    - ``pbm`` = max per-posting BM25 coefficient of the run, via
      scoring.bm25_coeff_np — bit-identical to the Catalyst
      max(bm25_coeff_col) it replaces (same constants + parenthesization;
      IEEE float64 elementwise).  Computing it HERE removes an 8-byte
      double per posting from the aggregation shuffle (guide §2.3
      "shuffle fewer bytes"); the TFIDF coefficient is monotone in tf so
      its max derives from max(tf) JVM-side and needs no payload column
      at all.
    - ``bmfront`` (optional) = the per-run (tf -> min doc_len) frontier:
      bm25_coeff is strictly decreasing in dl for fixed tf, so
      max(coeff) over a run equals max over this frontier for ANY avgdl
      — incremental compaction recomputes exact upper bounds as avgdl
      drifts without re-reading payloads (streaming/incremental.py).
      Previously a SECOND pandas UDF over the same arrays; folded into
      this one so the run data crosses the Python boundary once.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from . import scoring as _scoring

    schema = f"struct<pbm:double, blocks:{BLOCKS_SCHEMA}"
    if bm_frontier:
        schema += ", bmfront:array<struct<tf:int, dl:int>>"
    schema += ">"

    @pandas_udf(schema)
    def _enc(docids: pd.Series, tfs: pd.Series, dls: pd.Series) -> pd.DataFrame:
        pbms: list[float] = []
        blocks: list[list] = []
        fronts: list[list] = []
        for i, t, d in zip(docids, tfs, dls):
            ids = np.asarray(i, dtype=np.int64)
            order = np.argsort(ids, kind="stable")  # docids unique per run
            ta = np.asarray(t, dtype=np.int64)[order]
            da = np.asarray(d, dtype=np.int64)[order]
            pbms.append(float(_scoring.bm25_coeff_np(ta, da, avgdl).max()))
            blocks.append(
                codecs.encode_posting_blocks(ids[order], ta, da, codec=codec_name)
            )
            if bm_frontier:
                uniq, inv = np.unique(ta, return_inverse=True)
                mind = np.full(len(uniq), np.iinfo(np.int64).max)
                np.minimum.at(mind, inv, da)
                fronts.append(
                    [{"tf": int(u), "dl": int(m)} for u, m in zip(uniq, mind)]
                )
        out = {"pbm": pbms, "blocks": blocks}
        if bm_frontier:
            out["bmfront"] = fronts
        return pd.DataFrame(out)

    return _enc


def aggregate_postings(
    flat: DataFrame,
    n_docs: int,
    avgdl: float,
    codec: str = codecs.VB,
    heavy_df_threshold: int = config.HEAVY_TERM_DF_THRESHOLD,
    heavy_fanout: int = config.HEAVY_TERM_FANOUT,
    term_buckets: int = config.POSTINGS_TERM_BUCKETS,
    metrics: dict | None = None,
    bm_frontier: bool = False,
    docid_lo: int = 0,
    reduce_side: bool | None = None,
) -> DataFrame:
    """flat (term, docid, tf, doc_len) -> run-grained postings table:

    - postings: term, run, run_df, pcf, pbm, ptf, blocks, bucket
      (the lexicon — term-level df/cf/idf/UBs — derives from the run
      scalars via lexicon_from_runs() AFTER this table materializes,
      so the posting payload is shuffled exactly once)

    Run-grained layout is the scale-critical decision: a head term's
    postings are NEVER materialized as one row/array.  Tail terms
    (df <= heavy_df_threshold) take a SINGLE groupBy(term) shuffle of
    the posting payload — one run each.  Heavy terms are salted into
    range-partitioned docId sub-runs (disjoint, increasing ranges) and
    each run block-encodes independently; since runs are docId-ordered
    segments, a term's blocks are just its runs' blocks concatenated in
    run order (the reference's k-way merge property across SPIMI
    partitions, model/InvertedIndex.java:174-178, kept as metadata
    instead of re-sorted).

    This mirrors the reference's lexicon.dat / posting-file split.
    Shared by the batch build and the streaming-delta compaction."""
    metrics = metrics if metrics is not None else {}

    # --- head-term skew detection (north rule: explicit skew splitting) ---
    # Stays a DataFrame end-to-end: the heavy set broadcast-joins onto
    # the postings instead of becoming driver-side isin()/create_map
    # literal expression trees — with a 10^7-term vocabulary and
    # thousands of heavy terms the literal form is a giant driver-built
    # plan; the broadcast join is O(heavy_terms) bytes shipped once.
    # Bounded by construction: at most total_postings/threshold rows.
    t1 = time.monotonic()
    heavy = (
        flat.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > heavy_df_threshold)
        .select(
            "term",
            # per-term fanout scales with df so run payloads stay
            # bounded (~heavy_df_threshold postings per run, capped)
            F.least(
                F.lit(heavy_fanout),
                F.greatest(
                    F.lit(2),
                    F.ceil(F.col("df") / F.lit(float(heavy_df_threshold))),
                ),
            )
            .cast("int")
            .alias("fan"),
        )
        .persist()
    )
    metrics["heavy_terms"] = heavy.count()
    metrics["heavy_detect_sec"] = time.monotonic() - t1

    enc = _encode_blocks_udf(codec, avgdl, bm_frontier)

    def _encode_runs(grouped: DataFrame) -> DataFrame:
        # first projection materializes the UDF result as ONE column so
        # the field extractions below never re-evaluate the UDF (the
        # tokenizer-tree Catalyst gotcha, CLAUDE.md)
        enc_cols = grouped.select(
            "term",
            "run",
            F.col("pdf").alias("run_df"),
            "pcf",
            "maxtf",
            enc(
                F.transform("rundata", lambda p: p["docid"]),
                F.transform("rundata", lambda p: p["tf"]),
                F.transform("rundata", lambda p: p["doc_len"]),
            ).alias("e"),
        )
        cols = [
            F.col("term"),
            F.col("run"),
            F.col("run_df"),
            F.col("pcf"),
            F.col("e.pbm").alias("pbm"),
            # max over per-posting (1 + log10(tf)) == the expression at
            # max(tf) — strictly increasing in tf, same JVM double
            scoring.tfidf_coeff_col(F.col("maxtf")).alias("ptf"),
            F.col("e.blocks").alias("blocks"),
        ]
        if bm_frontier:
            cols.append(F.col("e.bmfront").alias("bmfront"))
        return enc_cols.select(*cols)

    # rundata arrives UNSORTED from collect_list; the encode UDF sorts
    # by docid numpy-side (see _encode_blocks_udf) — cheaper than a JVM
    # sort_array over the struct arrays.  No per-posting score columns
    # ride the shuffle: pbm comes out of the encode UDF, ptf from
    # max(tf) (16 fewer bytes per posting through the exchange).
    run_agg = [
        F.count("*").alias("pdf"),
        F.sum("tf").alias("pcf"),
        F.max("tf").alias("maxtf"),
        F.collect_list(F.struct("docid", "tf", "doc_len")).alias("rundata"),
    ]

    # one unified path: tail terms miss the broadcast join (fan null ->
    # run 0, a single run), heavy terms salt into range-partitioned
    # docId sub-runs; the shuffle key is (term, run) either way.
    # The range partitioning spans the SEGMENT actually present in
    # `flat` — (docid_lo, n_docs] — not the full cumulative domain:
    # incremental compaction feeds only the new tail segment, and
    # salting over the whole corpus range would collapse a heavy term's
    # fanout to ~fan * (segment/corpus) runs, unbounding run payloads
    # (docid_lo=0 reproduces the batch expression exactly).
    extent = n_docs - docid_lo + 1
    salted = flat.join(F.broadcast(heavy), "term", "left").withColumn(
        "run",
        F.when(F.col("fan").isNull(), F.lit(0))
        .otherwise(
            F.floor((F.col("docid") - F.lit(docid_lo)) * F.col("fan") / F.lit(extent))
        )
        .cast("int"),
    )
    # MEMORY-SAFETY DISPATCH (round-5, found by the 8x data-axis
    # probe): Spark's MAP-SIDE partial collect_list buffers one
    # UnsafeRow copy per posting per task until the
    # objectHashAggregate.sortBased.fallbackThreshold KEY count trips —
    # a key-COUNT bound, not a byte bound, and with a ~50k-term
    # vocabulary the key count never trips while per-task bytes grow
    # linearly with input: a 4M-turn build OOM'd a 12 GiB heap in
    # ObjectAggregationIterator.processInputs.  Above a total-token
    # budget we therefore pre-partition by the aggregation key so BOTH
    # aggregate passes run ABOVE the exchange (verified plan: Exchange
    # -> partial -> final, one shuffle total): the map side becomes a
    # pure streaming shuffle write and a reduce task's memory is its
    # partition's payload, bounded by spark.sql.shuffle.partitions
    # (which scales with input).  Below the budget the classic
    # map-side path stays: it shuffles compact per-task list rows
    # instead of raw posting rows (fewer shuffle-row overheads; an
    # interleaved A/B at 500k turns measured the two paths within host
    # noise — ratios 1.05/0.63 — so the dispatch is a memory-safety
    # decision, not a latency tradeoff), and its per-task memory is
    # provably small there.
    # Both paths produce IDENTICAL runs (same keys, same per-run rows;
    # rundata order is nondeterministic either way and the encode UDF
    # sorts by docid) — the 8x probe's n_runs/posting_bytes matched
    # across paths bit-for-bit.
    # Dispatch on the tokens flowing through THIS aggregation: for a
    # batch build that's the whole corpus, but incremental/NRT
    # compaction feeds only the new segment (docid_lo = committed
    # n_docs) — a small fresh epoch over a large committed corpus must
    # not be forced onto the reduce-side path by corpus-cumulative
    # stats (segment tokens ~= segment docs x avgdl).
    segment_tokens = (n_docs - docid_lo) * avgdl
    if reduce_side is None:
        reduce_side = segment_tokens > config.REDUCE_SIDE_AGG_TOKENS
    metrics["reduce_side_agg"] = bool(reduce_side)
    if reduce_side:
        salted = salted.select(
            "term", "run", "docid", "tf", "doc_len"
        ).repartition("term", "run")
    runs = _encode_runs(salted.groupBy("term", "run").agg(*run_agg))

    bucket = F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
    out_cols = ["term", "run", "run_df", "pcf", "pbm", "ptf", "blocks"]
    if bm_frontier:
        out_cols.append("bmfront")
    return runs.select(*out_cols, bucket.alias("bucket"))


def lexicon_from_runs(postings_runs: DataFrame, n_docs: int) -> DataFrame:
    """Run-scalar aggregation -> lexicon
    (term, df, cf, idf, bm25_ub, tfidf_ub, n_runs, bucket).

    Call on the MATERIALIZED runs table: column pruning keeps the
    `blocks` payload out of this scan entirely (term-level df/cf/idf/
    upper bounds per model/InvertedIndex.java:156-166,186-195)."""
    idf = scoring.idf_col(F.col("df"), n_docs)
    return (
        postings_runs.groupBy("term", "bucket")
        .agg(
            F.sum("run_df").alias("df"),
            F.sum("pcf").alias("cf"),
            F.max("pbm").alias("max_bm25_coeff"),
            F.max("ptf").alias("max_tfidf_coeff"),
            F.count("*").alias("n_runs"),
        )
        .select(
            "term",
            "df",
            "cf",
            idf.alias("idf"),
            (F.col("max_bm25_coeff") * idf).alias("bm25_ub"),
            (F.col("max_tfidf_coeff") * idf).alias("tfidf_ub"),
            "n_runs",
            "bucket",
        )
    )


def build_index(
    spark: SparkSession,
    transcripts_with_docid: DataFrame,
    parse: bool = True,
    codec: str = codecs.VB,
    checkpoint_dir: str | None = None,
    heavy_df_threshold: int = config.HEAVY_TERM_DF_THRESHOLD,
    heavy_fanout: int = config.HEAVY_TERM_FANOUT,
    term_buckets: int = config.POSTINGS_TERM_BUCKETS,
) -> InvertedIndex:
    """Build the full index from a docid-assigned transcript table.

    checkpoint_dir: when set, each stage is persisted as parquet and
    re-read (resumable, and avoids recomputing the tokenize UDF for the
    stats/postings stages).  When None (test scale) stages are cached.
    """
    metrics: dict = {}
    t0 = time.monotonic()

    tok = tokenize_stage(transcripts_with_docid, parse)
    if checkpoint_dir:
        path = f"{checkpoint_dir}/tokenized"
        tok.write.mode("overwrite").parquet(path)
        tok = spark.read.parquet(path)
    else:
        tok = tok.cache()

    # --- collection statistics (A2/A6) ---
    # ONE job materializes the tokenized cache AND aggregates the
    # collection stats (caching is partition-granular, so the agg
    # populates every cached column) — the old path paid a separate
    # cache-count job before the stats agg.  Round-6 A/B note: caching
    # the EXPLODED flat table instead measured ~13% slower end-to-end
    # in a healthy host phase (12M plain rows cache slower than 500k
    # array rows), so the tokenized table stays the cached stage.
    row = tok.agg(
        F.count("*").alias("n"), F.sum("doc_len").alias("s")
    ).collect()[0]
    n_docs, sum_dl = int(row["n"]), int(row["s"] or 0)
    avgdl = sum_dl / float(n_docs)
    metrics["stats_sec"] = time.monotonic() - t0

    doc_index = tok.select("docid", "docno", "conv_id", "turn_idx", "doc_len")

    # --- flat postings: one row per (doc, term); tf counted map-side ---
    flat = tok.select(
        "docid",
        "doc_len",
        F.explode("terms").alias("kv"),
    ).select(
        F.col("kv.term").alias("term"),
        "docid",
        F.col("kv.tf").alias("tf"),
        "doc_len",
    )

    postings = aggregate_postings(
        flat,
        n_docs=n_docs,
        avgdl=avgdl,
        codec=codec,
        heavy_df_threshold=heavy_df_threshold,
        heavy_fanout=heavy_fanout,
        term_buckets=term_buckets,
        metrics=metrics,
    )
    # materialize runs once; the lexicon aggregates their scalars only
    postings = _materialize(spark, postings, checkpoint_dir, "postings", metrics)
    lexicon = lexicon_from_runs(postings, n_docs)

    metrics["build_sec_total"] = time.monotonic() - t0
    return InvertedIndex(
        tokenized=tok,
        doc_index=doc_index,
        flat=flat,
        postings=postings,
        lexicon=lexicon,
        n_docs=n_docs,
        sum_doc_len=sum_dl,
        parse=parse,
        codec=codec,
        term_buckets=term_buckets,
        metrics=metrics,
    )


def _materialize(
    spark: SparkSession,
    df: DataFrame,
    checkpoint_dir: str | None,
    stage: str,
    metrics: dict,
) -> DataFrame:
    t = time.monotonic()
    if checkpoint_dir:
        path = f"{checkpoint_dir}/{stage}"
        df.write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
    else:
        out = df.cache()
        out.count()
    metrics[f"{stage}_sec"] = time.monotonic() - t
    return out


def staged_build(
    spark: SparkSession,
    transcripts_with_docid: DataFrame,
    workdir: str,
    parse: bool = True,
    codec: str = codecs.VB,
    **agg_kwargs,
) -> InvertedIndex:
    """Checkpoint-resumable build (SURVEY §7 step 6 / north rule).

    Every stage materializes to ``workdir/<stage>`` and is SKIPPED on
    re-run when its ``_SUCCESS`` marker exists, so a killed build
    resumes from the last completed stage.  Per-stage lineage + metrics
    (rows, seconds, skipped) append to ``workdir/lineage.jsonl``.
    Stage outputs are plain parquet here; on a cluster the same layout
    maps to Iceberg checkpoint tables with snapshot-based rollback.
    """
    import json
    import os

    def done(stage: str) -> bool:
        return os.path.exists(f"{workdir}/{stage}/_SUCCESS")

    def lineage(stage: str, **kv) -> None:
        os.makedirs(workdir, exist_ok=True)
        with open(f"{workdir}/lineage.jsonl", "a") as f:
            f.write(json.dumps({"stage": stage, **kv}) + "\n")

    metrics: dict = {}

    # stage 1: tokenized (+ doc_index columns)
    t0 = time.monotonic()
    if not done("tokenized"):
        tokenize_stage(transcripts_with_docid, parse).write.mode(
            "overwrite"
        ).parquet(f"{workdir}/tokenized")
        tok = spark.read.parquet(f"{workdir}/tokenized")
        lineage(
            "tokenized",
            skipped=False,
            rows=tok.count(),
            partitions=tok.rdd.getNumPartitions(),
            sec=round(time.monotonic() - t0, 3),
        )
    else:
        tok = spark.read.parquet(f"{workdir}/tokenized")
        lineage("tokenized", skipped=True)

    # stage 2: stats
    row = tok.agg(F.count("*").alias("n"), F.sum("doc_len").alias("s")).collect()[0]
    n_docs, sum_dl = int(row["n"]), int(row["s"] or 0)
    avgdl = sum_dl / float(n_docs)
    lineage("stats", skipped=False, n_docs=n_docs, sum_doc_len=sum_dl)

    flat = tok.select("docid", "doc_len", F.explode("terms").alias("kv")).select(
        F.col("kv.term").alias("term"), "docid", F.col("kv.tf").alias("tf"), "doc_len"
    )

    # stage 3: postings
    t0 = time.monotonic()
    if not done("postings"):
        aggregate_postings(
            flat, n_docs=n_docs, avgdl=avgdl, codec=codec, metrics=metrics,
            **agg_kwargs,
        ).write.mode("overwrite").partitionBy("bucket").parquet(
            f"{workdir}/postings"
        )
        postings = spark.read.parquet(f"{workdir}/postings")
        lineage(
            "postings",
            skipped=False,
            rows=postings.count(),
            heavy_terms=metrics.get("heavy_terms"),
            sec=round(time.monotonic() - t0, 3),
        )
    else:
        postings = spark.read.parquet(f"{workdir}/postings")
        lineage("postings", skipped=True)

    return InvertedIndex(
        tokenized=tok,
        doc_index=tok.select("docid", "docno", "conv_id", "turn_idx", "doc_len"),
        flat=flat,
        postings=postings,
        lexicon=lexicon_from_runs(postings, n_docs),
        n_docs=n_docs,
        sum_doc_len=sum_dl,
        parse=parse,
        codec=codec,
        # MUST mirror what aggregate_postings hashed the bucket column
        # with — a mismatched default here makes IndexReader._prune
        # filter on the wrong bucket ids and silently drop terms
        term_buckets=agg_kwargs.get("term_buckets", config.POSTINGS_TERM_BUCKETS),
        metrics=metrics,
    )


def write_index(index: InvertedIndex, out_dir: str) -> None:
    """Persist index tables.  Postings are hash-bucketed by term
    (partition column) and sorted by term within files, so a query-time
    term lookup prunes to one bucket directory and skips row groups via
    parquet min/max — the columnar equivalent of the reference's
    binary-searched sorted lexicon (``model/Lexicon.java:154-195``).
    With an Iceberg catalog these become ``writeTo(...).partitionedBy(
    bucket(term))``; plain parquet keeps the same layout on disk.
    """
    index.postings.repartition("bucket").sortWithinPartitions(
        "term", "run"
    ).write.mode("overwrite").partitionBy("bucket").parquet(f"{out_dir}/postings")
    index.lexicon.repartition("bucket").sortWithinPartitions("term").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(f"{out_dir}/lexicon")
    index.doc_index.repartitionByRange(
        max(1, index.n_docs // 4_000_000), "docid"
    ).write.mode("overwrite").parquet(f"{out_dir}/doc_index")
    # session from postings, not tokenized — view-backed indexes
    # (masked/vacuumed stores) carry tokenized=None
    stats = index.postings.sparkSession.createDataFrame(
        [
            (
                index.n_docs,
                index.sum_doc_len,
                index.parse,
                index.codec,
                index.term_buckets,
            )
        ],
        "n_docs long, sum_doc_len long, parse boolean, codec string,"
        " term_buckets int",
    )
    stats.write.mode("overwrite").parquet(f"{out_dir}/stats")
