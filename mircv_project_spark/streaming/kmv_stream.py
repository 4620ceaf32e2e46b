"""Streaming KMV distinct-count sketch: a per-source running
cardinality estimate over an unbounded document stream.

The batch operator (operators/sketches.kmv_distinct_tokens) answers
after the fact; an ingest pipeline watches per-domain vocabulary
cardinality AS DATA ARRIVES (dedup-rate drift, crawler loops, domain
explosions).  State per source is the k smallest distinct hashes seen
so far — bounded at k longs per group, the textbook mergeable-sketch
property — updated per micro-batch by merging the batch's hashes and
re-truncating.

Why streaming == batch EXACTLY here (the gate contract): the k-min
sketch is a commutative, idempotent, associative merge — the final
state after any partition of the corpus into micro-batches equals the
batch sketch over the whole corpus, with NO ordering contract at all
(unlike streaming_funnel's time-ordered-epoch requirement or
streaming_dedup's conv-ordered one).  The gate takes each source's
LAST emitted row (max epoch — a source absent from later batches keeps
its earlier row, which is still its final state) and compares against
the batch oracle.

The stream emits only integer sketch fields (source, epoch, n_sketch,
kth_hash); the float estimate is derived downstream via the ONE shared
Catalyst expression (sketches.kmv_est_col) — computing it in Python
here would introduce a third rounding implementation (Python's
banker's round vs the engines' half-away).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import hash60_col, tokens_col
from ..operators.sketches import KMV_K, KMV_SALT

KMV_OUT_SCHEMA = "source string, epoch int, n_sketch int, kth_hash long"
_KMV_STATE_SCHEMA = "mins array<bigint>, epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_kmv(stream: DataFrame, k: int = KMV_K) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, n_sketch,
    kth_hash) sketch rows (append mode; one row per source per batch it
    appears in; state = the merged k-min list)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    ).select(
        "source",
        hash60_col(F.concat(F.lit(KMV_SALT), F.col("t"))).alias("h"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        hs: set[int] = set()
        for pdf in pdfs:
            hs.update(int(v) for v in pdf["h"])
        if state.exists:
            mins, epoch = state.get
            hs.update(int(v) for v in mins)
            epoch = int(epoch) + 1
        else:
            epoch = 1
        merged = sorted(hs)[:k]
        state.update((merged, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                "n_sketch": [len(merged)],
                "kth_hash": [merged[-1]],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_kmv(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sketch rows to ``out_dir`` (checkpointed state carries
    the k-min sets across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_kmv(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_kmv_estimates(out: DataFrame, k: int = KMV_K) -> DataFrame:
    """Sketch-row stream output -> (source, n_sketch, kth_hash, est):
    each source's LAST state (max epoch), estimate via the shared
    batch expression."""
    from pyspark.sql.window import Window

    from ..operators.sketches import kmv_est_col

    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return last.select(
        "source",
        F.col("n_sketch").cast("long").alias("n_sketch"),
        "kth_hash",
        kmv_est_col(F.col("n_sketch"), F.col("kth_hash"), k).alias("est"),
    )
