"""Streaming SFT instruction/response pair extraction: mine strictly
adjacent user->assistant pairs as transcripts ARRIVE, including pairs
whose two turns land in different micro-batches — the live twin of
operators/dialogue.instruction_pairs (a training-data feed that
materializes examples at ingest time instead of re-scanning).

State per conversation is the single most recent turn seen
(turn_idx, role, text) — O(1), the conversation_sessions discipline.
Exactness contract (the streaming_funnel ordered-feed discipline,
restated in the gate): per conversation, every turn of batch k
precedes batch k+1 in turn order (any doc_id-prefix split of the
transcript law satisfies this — turn order IS doc order within a
conversation), so "the previous turn" is always either earlier in
the same batch or the held state, and the union of per-batch
emissions equals the batch operator's output.  ``streaming_sft``
therefore shares the batch ``instruction_pairs`` oracle BY DESIGN.

The Python state function only compares turn indexes and roles; the
token counts derive downstream through the SAME Catalyst expression
the batch operator uses.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col

SFT_OUT_SCHEMA = (
    "conv_id string, turn_idx int, prompt string, response string"
)
_SFT_STATE_SCHEMA = "last_turn int, last_role string, last_text string"

TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string"
)


def streaming_sft_pairs(stream: DataFrame) -> DataFrame:
    """transcript stream -> (conv_id, turn_idx, prompt, response)
    pair rows (append mode; state = the conversation's most recent
    turn, carried across batches)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select("conv_id", "turn_idx", "role", "text")

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(r.turn_idx), r.role, r.text)
                for r in pdf.itertuples(index=False)
            )
        rows.sort(key=lambda r: r[0])
        if state.exists:
            prev = tuple(state.get)  # (turn, role, text)
        else:
            prev = None
        out = []
        for turn, role, text in rows:
            if (
                role == "assistant"
                and prev is not None
                and prev[1] == "user"
                and prev[0] == turn - 1
            ):
                out.append((key[0], turn, prev[2], text))
            prev = (turn, role, text)
        if prev is not None:
            state.update(prev)
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "prompt", "response"]
        )

    return base.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=SFT_OUT_SCHEMA,
        stateStructType=_SFT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_sft(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new transcript files in
    ``input_dir``, appending pair rows to ``out_dir``."""
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    return (
        streaming_sft_pairs(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def sft_pairs_with_counts(out: DataFrame) -> DataFrame:
    """Pair rows -> the batch operator's exact shape: token counts
    through the ONE shared T1-T5 expression."""

    def ntok(c):
        return F.coalesce(F.size(tokens_col(F.col(c))), F.lit(0)).cast(
            "long"
        )

    return out.select(
        "conv_id",
        "turn_idx",
        "prompt",
        "response",
        ntok("prompt").alias("prompt_ntok"),
        ntok("response").alias("response_ntok"),
    )
