"""Streaming CDC apply: maintain the per-key WINNING change (highest
seq) over an unbounded upsert/delete feed, then serve the merged table
— the streaming twin of operators/cdc.apply_changes, the way a live
MERGE-INTO pipeline actually runs (Debezium-style feeds applied
continuously, not in one batch).

State per key (conv_id, turn_idx) is the current winner (seq, op,
role, text, us), updated per micro-batch by keeping the row with the
HIGHEST seq.  Why streaming == batch EXACTLY here (the gate contract,
the streaming_kmv/cms/bloom/hll discipline): argmax over a totally
ordered unique-per-key seq is commutative, associative and IDEMPOTENT
— a strictly-greater seq replaces, an equal seq keeps the existing
state (so replayed deliveries change nothing), and the final state
after ANY micro-batch split of the feed equals the batch window's
winner.  The gate feeds the pinned cdc feed split by seq across two
availableNow runs and derives the final table through
``final_cdc_table`` (kept = base anti-join winner keys, upserts =
winning non-delete payloads — apply_changes' own rule), so
``streaming_cdc`` shares the batch ``cdc_apply`` oracle BY DESIGN.

The Python state function only ever compares two integers; every
payload column passes through opaquely.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_OUT_SCHEMA = (
    "conv_id string, turn_idx int, epoch int, seq bigint, op string,"
    " role string, text string, us bigint"
)
_CDC_STATE_SCHEMA = (
    "seq bigint, op string, role string, text string, us bigint, epoch int"
)

CHANGES_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string,"
    " tool string, us bigint, op string, seq bigint"
)


def streaming_cdc(stream: DataFrame) -> DataFrame:
    """change-feed stream -> per-micro-batch (key, epoch, winner) rows
    (append mode; one row per key per batch it appears in; state = the
    highest-seq change seen so far)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select(
        "conv_id", "turn_idx", "seq", "op", "role", "text", "us"
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        best = None  # (seq, op, role, text, us)
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                seq = int(r.seq)
                if best is None or seq > best[0]:
                    best = (
                        seq,
                        r.op,
                        None if pd.isna(r.role) else r.role,
                        None if pd.isna(r.text) else r.text,
                        None if pd.isna(r.us) else int(r.us),
                    )
        if state.exists:
            s_seq, s_op, s_role, s_text, s_us, epoch = state.get
            # strictly-greater replaces; equal keeps (idempotence)
            if best is None or int(s_seq) >= best[0]:
                best = (int(s_seq), s_op, s_role, s_text, s_us)
            epoch = int(epoch) + 1
        else:
            epoch = 1
        state.update(best + (epoch,))
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "turn_idx": [int(key[1])],
                "epoch": [epoch],
                "seq": [best[0]],
                "op": [best[1]],
                "role": [best[2]],
                "text": [best[3]],
                "us": [best[4]],
            }
        )

    return base.groupBy("conv_id", "turn_idx").applyInPandasWithState(
        fn,
        outputStructType=CDC_OUT_SCHEMA,
        stateStructType=_CDC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_cdc(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new change files in ``input_dir``,
    appending winner rows to ``out_dir`` (checkpointed state carries
    the winners across runs)."""
    stream = spark.readStream.schema(CHANGES_SCHEMA).parquet(input_dir)
    return (
        streaming_cdc(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_cdc_table(base: DataFrame, out: DataFrame) -> DataFrame:
    """Winner-row stream output + base table -> the merged table
    (columns = base.columns): each key's LAST state (max epoch), then
    apply_changes' own rule — kept = base anti-join winner keys,
    upserts = winning non-delete payloads (tool rides as NULL, the
    pinned feed's value)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("epoch").desc()
    )
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    kept = base.join(
        last.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"],
        "left_anti",
    )
    upserts = last.where(F.col("op") != "D").select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.lit(None).cast("string").alias("tool"),
        "us",
    ).select(*base.columns)
    return kept.unionByName(upserts)
