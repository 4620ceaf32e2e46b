"""Streaming exact deduplication: a per-turn duplicate verdict over an
unbounded transcript stream.

Batch exact dedup (operators/dedup.exact_dedup) answers "how many of
each" after the fact; a training-data INGEST pipeline needs the
decision at arrival time — emit every turn exactly once, flagged
``is_dup`` if its normalized-content fingerprint was already seen in
any earlier micro-batch (or earlier in the same batch).  State is the
seen-fingerprint set, partitioned by fingerprint exactly like a shuffle
(applyInPandasWithState groups by fp), so it scales horizontally; at an
unbounded corpus you bound it with a TTL — here state never expires
because exact dedup is exact (NoTimeout, documented trade-off).

Determinism contract (what the DuckDB oracle restates): the winner of a
fingerprint group is its minimum (conv_id, turn_idx) key.  That is
batch-boundary-invariant as long as micro-batches arrive in key order
(the ingest harness feeds conv-id-ordered epoch files, same as
streaming/incremental.py's docid assignment): the earliest batch
containing a fingerprint then also contains its minimum key, and within
a batch the minimum is taken explicitly.

Fingerprint = md5 over the normalized token stream — identical to
operators/textstats.fingerprint (whitespace/markup/case-insensitive),
whose Spark/DuckDB parity is already oracle-pinned.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col

DEDUP_SCHEMA = "conv_id string, turn_idx int, fp string, is_dup boolean"
_STATE_SCHEMA = "seen boolean"
_COLS = ["conv_id", "turn_idx", "fp", "is_dup"]


def streaming_exact_dedup(stream: DataFrame) -> DataFrame:
    """transcript stream -> (conv_id, turn_idx, fp, is_dup) verdict
    stream (append mode: every input turn emits exactly one row, in the
    micro-batch it arrives in)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select(
        "conv_id",
        "turn_idx",
        F.md5(F.concat_ws(" ", tokens_col(F.col("text")))).alias("fp"),
    )

    def fn(key, pdfs, state: GroupState):
        fp = key[0]
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["conv_id", "turn_idx"], kind="stable", ignore_index=True
        )
        is_dup = [True] * len(batch)
        if not state.exists:
            is_dup[0] = False
            state.update((True,))
        yield pd.DataFrame(
            {
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "fp": fp,
                "is_dup": is_dup,
            },
            columns=_COLS,
        )

    return base.groupBy("fp").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass of the dedup verdict over new files in
    ``input_dir``, appending to ``out_dir`` parquet (checkpointed state
    carries the seen set across runs)."""
    from .incremental import transcript_stream

    return (
        streaming_exact_dedup(transcript_stream(spark, input_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
