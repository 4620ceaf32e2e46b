"""Streaming AMS F2 sketch: per-source running second-frequency-moment
state over an unbounded document stream.

The batch operator (operators/sketches.ams_f2_tokens) answers after the
fact; an ingest pipeline watches per-domain token-frequency SKEW as
data arrives (F2 spikes when a template or spam phrase floods a
domain's token stream while F1 barely moves).  State per source is the
AMS_R Z-counters — one BIGINT each — updated per micro-batch by ADDING
the batch's signed sums: signed integer addition is commutative and
associative, so the final state after ANY micro-batch split of the
corpus equals the batch sketch (the streaming_cms discipline; no
ordering contract, test-pinned).

Every sign stays in the ONE shared Catalyst expression
(sketches.ams_sign_col) and the estimate derives at read time through
sketches.ams_est_col — the Python state function only ever adds
integers; it computes no hashes and no floats.  The gate shares the
batch SQL oracle minus ``f2_true`` (a stream cannot know the exact
moment).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from ..operators.sketches import AMS_R, ams_est_col, ams_sign_col

_Z_COLS = [f"z{r}" for r in range(AMS_R)]
AMS_OUT_SCHEMA = "source string, epoch int, " + ", ".join(
    f"{z} bigint" for z in _Z_COLS
)
_AMS_STATE_SCHEMA = ", ".join(f"{z} bigint" for z in _Z_COLS) + ", epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_ams(stream: DataFrame) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, z0..z4)
    sketch rows (append mode; one row per source per batch it appears
    in; state = the running Z sums)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    toks = stream.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    base = toks.select(
        "source",
        *[ams_sign_col(F.col("t"), r).cast("long").alias(z)
          for r, z in enumerate(_Z_COLS)],
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        sums = [0] * AMS_R
        for pdf in pdfs:
            for r, z in enumerate(_Z_COLS):
                sums[r] += int(pdf[z].sum())
        if state.exists:
            prev = state.get
            sums = [s + int(p) for s, p in zip(sums, prev[:AMS_R])]
            epoch = int(prev[AMS_R]) + 1
        else:
            epoch = 1
        state.update((*sums, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                **{z: [sums[r]] for r, z in enumerate(_Z_COLS)},
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=AMS_OUT_SCHEMA,
        stateStructType=_AMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_ams(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sketch rows to ``out_dir`` (checkpointed state carries
    the Z counters across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_ams(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_ams_estimates(out: DataFrame) -> DataFrame:
    """Sketch-row stream output -> (source, z0..z4, f2_est): each
    source's LAST state (max epoch), estimate via the ONE shared batch
    expression (sketches.ams_est_col)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "epoch")
    )
    return last.select(
        "source",
        *_Z_COLS,
        ams_est_col([F.col(z) for z in _Z_COLS]).alias("f2_est"),
    )
