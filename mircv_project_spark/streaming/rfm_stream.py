"""Streaming RFM counters: per-user (last purchase day, purchase
count, exact cents) kept current as events arrive, served as the SAME
RFM segmentation the batch operator computes — the streaming
materialized-view pattern (the anomaly-counter discipline: stream the
cheap mergeable state, derive the analytic view at read time; the
QUINTILES are relative to the whole population, so they cannot be
streamed per key and must derive on read).

State per user: max-merge for last_day (idempotent) and additive
counters for freq/cents (exactly-once via the checkpointed offsets —
the streaming_cms argument), so the final state after ANY micro-batch
split equals the batch per-user aggregate.  The quintile stage is the
ONE shared derivation (operators/events.rfm_from_user_stats), so
``streaming_rfm`` shares the batch ``rfm_segments`` oracle VERBATIM.

Day and cents quantization stay in Catalyst (the batch operator's own
expressions); the state fn only maxes and adds integers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import US_PER_DAY, _us_col

RFM_OUT_SCHEMA = (
    "user_id bigint, epoch int, last_day bigint, freq bigint,"
    " monetary_cents bigint"
)
_RFM_STATE_SCHEMA = (
    "last_day bigint, freq bigint, monetary_cents bigint, epoch int"
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint,"
    " event_type string, value double, props string"
)


def streaming_rfm_counters(stream: DataFrame) -> DataFrame:
    """event stream -> per-micro-batch (user_id, epoch, last_day,
    freq, monetary_cents) rows for users with purchase activity."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.where(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(_us_col("ts") / F.lit(US_PER_DAY)).cast("long").alias("day"),
        F.round(F.col("value") * F.lit(100.0)).cast("long").alias("cents"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        last = None
        freq = 0
        cents = 0
        for pdf in pdfs:
            for d, c in zip(pdf["day"], pdf["cents"]):
                d = int(d)
                last = d if last is None or d > last else last
                freq += 1
                cents += int(c)
        if state.exists:
            s_last, s_freq, s_cents, epoch = state.get
            last = max(int(s_last), last) if last is not None else int(s_last)
            freq += int(s_freq)
            cents += int(s_cents)
            epoch = int(epoch) + 1
        else:
            epoch = 1
        state.update((last, freq, cents, epoch))
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "epoch": [epoch],
                "last_day": [last],
                "freq": [freq],
                "monetary_cents": [cents],
            }
        )

    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RFM_OUT_SCHEMA,
        stateStructType=_RFM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_rfm(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new event files in ``input_dir``."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        streaming_rfm_counters(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_rfm(out: DataFrame) -> DataFrame:
    """Counter-row stream output -> the RFM table: each user's LAST
    state (max epoch), quintiles through the ONE shared derivation."""
    from pyspark.sql.window import Window

    from ..operators.events import rfm_from_user_stats

    w = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return rfm_from_user_stats(
        last.select("user_id", "last_day", "freq", "monetary_cents")
    )
