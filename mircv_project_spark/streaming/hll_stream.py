"""Streaming HyperLogLog: per-source running cardinality registers
over an unbounded document stream — the fixed-size member of the
streaming-sketch family beside KMV (k-min values), CMS (counters) and
Bloom (bitsets).

The batch operator (operators/sketches.hll_distinct_tokens) answers
after the fact; an ingest pipeline keeps the registers CURRENT as data
arrives (live per-domain vocabulary monitoring without a distinct).
State per source is the sparse register table (parallel bucket/m
arrays, bounded at HLL_M = 256 ints per group), updated per
micro-batch by taking the elementwise MAX of the batch's registers —
HLL registers merge by max, the union property.

Why streaming == batch EXACTLY here (the gate contract, the
streaming_kmv/cms/bloom discipline): integer max is commutative,
associative and IDEMPOTENT, so the final registers after ANY
micro-batch split of the corpus equal the batch sketch — no ordering
contract, and replayed documents change nothing.  The gate takes each
source's LAST emitted row (max epoch) and derives (n_nonzero, reg_sum,
z_scaled, est) through the ONE shared derivation
(sketches.hll_estimate_from_regs) against the batch oracle restated
WITHOUT the exact `n_distinct` column (the final registers alone
cannot know it).

Every hash stays in the shared Catalyst register expression
(sketches.hll_bucket_rho) — the Python state function only ever maxes
small integers; it computes no hashes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from ..operators.sketches import hll_bucket_rho

HLL_OUT_SCHEMA = (
    "source string, epoch int, buckets array<int>, ms array<int>"
)
_HLL_STATE_SCHEMA = "buckets array<int>, ms array<int>, epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_hll(stream: DataFrame) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, buckets, ms)
    sparse register rows (append mode; one row per source per batch it
    appears in; state = the max-merged registers; buckets ascending)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    toks = stream.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    base = toks.select(
        "source", hll_bucket_rho(F.col("t")).alias("br")
    ).select(
        "source",
        F.col("br.bucket").cast("int").alias("bucket"),
        F.col("br.rho").cast("int").alias("rho"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        acc: dict[int, int] = {}
        for pdf in pdfs:
            for b, r in zip(pdf["bucket"], pdf["rho"]):
                bi = int(b)
                ri = int(r)
                if ri > acc.get(bi, 0):
                    acc[bi] = ri
        if state.exists:
            buckets, ms, epoch = state.get
            for b, m in zip(buckets, ms):
                bi = int(b)
                mi = int(m)
                if mi > acc.get(bi, 0):
                    acc[bi] = mi
            epoch = int(epoch) + 1
        else:
            epoch = 1
        items = sorted(acc.items())
        buckets = [b for b, _ in items]
        ms = [m for _, m in items]
        state.update((buckets, ms, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                "buckets": [buckets],
                "ms": [ms],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_hll(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sparse register rows to ``out_dir`` (checkpointed state
    carries the registers across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_hll(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_hll_estimate(out: DataFrame) -> DataFrame:
    """Register-row stream output -> (source, n_nonzero, reg_sum,
    z_scaled, est): each source's LAST state (max epoch) re-expanded
    into the register table, estimate via the ONE shared batch
    derivation (sketches.hll_estimate_from_regs)."""
    from pyspark.sql.window import Window

    from ..operators.sketches import hll_estimate_from_regs

    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    regs = last.select(
        "source",
        F.explode(F.arrays_zip("buckets", "ms")).alias("z"),
    ).select(
        "source",
        F.col("z.buckets").cast("long").alias("bucket"),
        F.col("z.ms").cast("int").alias("m"),
    )
    return hll_estimate_from_regs(regs)
