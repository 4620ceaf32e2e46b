"""Streaming DPO preference-pair mining: per-conversation running
best/worst assistant-turn state over an unbounded transcript stream —
the live twin of operators/dialogue.preference_pairs (preference pairs
materialize AS conversations grow, instead of a batch sweep).

Why streaming == batch EXACTLY here (the gate contract): chosen is
the MAXIMUM of the key (quality, -turn_idx) and rejected the MINIMUM
of the same key — max/min merges are commutative, associative and
IDEMPOTENT, so the final extremes after ANY micro-batch split equal
the batch extremes regardless of arrival order; the assistant-turn
count is additive under the engine's exactly-once micro-batch offsets
(the streaming_rfm counter discipline).  The gate takes each
conversation's LAST emitted row (max epoch), keeps n_assistant >= 2,
and shares the batch ``preference_pairs`` oracle VERBATIM — the
margin derives at read time in Catalyst with the same micro
expression.

Per-turn quality is computed CATALYST-side through the ONE shared
formula (textstats.quality_expr) before the state function, which
only ever compares (double, int) keys and adds integers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from ..operators.textstats import quality_expr

PREF_OUT_SCHEMA = (
    "conv_id string, epoch int, chosen_turn int, rejected_turn int,"
    " chosen_quality double, rejected_quality double, n_assistant long"
)
_PREF_STATE_SCHEMA = (
    "bq double, bt int, wq double, wt int, na long, epoch int"
)

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string"
)


def streaming_preference_pairs(stream: DataFrame) -> DataFrame:
    """transcript stream -> per-micro-batch (conv_id, epoch,
    chosen/rejected state) rows (append mode; one row per conversation
    per batch an assistant turn arrives in)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = (
        stream.where(F.col("role") == "assistant")
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            tokens_col(F.col("text")).alias("toks"),
        )
        .select(
            "conv_id",
            "turn_idx",
            quality_expr(F.col("toks")).alias("q"),
        )
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        # chosen = max (q, -turn), rejected = min (q, -turn)
        best = worst = None
        n = 0
        for pdf in pdfs:
            for t, q in zip(pdf["turn_idx"], pdf["q"]):
                kq = (float(q), -int(t))
                if best is None or kq > best:
                    best = kq
                if worst is None or kq < worst:
                    worst = kq
                n += 1
        if state.exists:
            bq, bt, wq, wt, na, epoch = state.get
            kb, kw = (float(bq), -int(bt)), (float(wq), -int(wt))
            if best is None or kb > best:
                best = kb
            if worst is None or kw < worst:
                worst = kw
            n += int(na)
            epoch = int(epoch) + 1
        else:
            epoch = 1
        state.update(
            (best[0], -best[1], worst[0], -worst[1], n, epoch)
        )
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "epoch": [epoch],
                "chosen_turn": [-best[1]],
                "rejected_turn": [-worst[1]],
                "chosen_quality": [best[0]],
                "rejected_quality": [worst[0]],
                "n_assistant": [n],
            }
        )

    return base.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=PREF_OUT_SCHEMA,
        stateStructType=_PREF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_preference(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new transcript files in
    ``input_dir``, appending state rows to ``out_dir``."""
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    return (
        streaming_preference_pairs(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_preference_pairs(out: DataFrame) -> DataFrame:
    """State-row stream output -> the batch preference_pairs table:
    each conversation's LAST state (max epoch), n_assistant >= 2 only,
    margin derived in Catalyst with the batch micro expression."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return last.where(F.col("n_assistant") >= 2).select(
        "conv_id",
        F.col("chosen_turn").alias("chosen_turn"),
        F.col("rejected_turn").alias("rejected_turn"),
        "chosen_quality",
        "rejected_quality",
        F.round(
            (F.col("chosen_quality") - F.col("rejected_quality"))
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("margin_micro"),
    )
