"""Streaming anomaly counters: per-(event_type, hour) running counts
over an unbounded event stream, served as the SAME anomaly table the
batch operator computes — the streaming materialized-view pattern
(keep the cheap additive state current; derive the analytic view at
read time).

State per (event_type, hour-index) is one integer counter, updated
per micro-batch by addition.  Why streaming == batch EXACTLY here
(the streaming_cms discipline): integer counter addition is
commutative and associative, and the checkpointed file offsets make
delivery exactly-once, so the final counters after ANY micro-batch
split equal the batch (type, hour) aggregate.  The z²/dense-grid
analysis is NOT streamed — it derives at read time from the final
counters through the ONE shared derivation
(operators/events.anomalies_from_counts), so ``streaming_anomalies``
shares the batch ``event_anomalies`` oracle VERBATIM.

Keying by (type, hour) — not type with an hour map — keeps per-key
state O(1) and lets the state store scale with touched hours.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANOM_OUT_SCHEMA = "event_type string, h bigint, epoch int, c bigint"
_ANOM_STATE_SCHEMA = "c bigint, epoch int"

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint,"
    " event_type string, value double, props string"
)
_US_PER_HOUR = 3_600_000_000


def streaming_anomaly_counts(stream: DataFrame) -> DataFrame:
    """event stream -> per-micro-batch (event_type, h, epoch, c) rows
    (append mode; one row per touched (type, hour) per batch; state =
    the running counter).  hour = floor(epoch_us / 3600e6), the
    tz-free batch pin."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.events import _us_col

    base = stream.select(
        "event_type",
        F.floor(_us_col("ts") / F.lit(_US_PER_HOUR)).cast("long").alias("h"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        add = 0
        for pdf in pdfs:
            add += len(pdf)
        if state.exists:
            c, epoch = state.get
            c = int(c) + add
            epoch = int(epoch) + 1
        else:
            c, epoch = add, 1
        state.update((c, epoch))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "h": [int(key[1])],
                "epoch": [epoch],
                "c": [c],
            }
        )

    return base.groupBy("event_type", "h").applyInPandasWithState(
        fn,
        outputStructType=ANOM_OUT_SCHEMA,
        stateStructType=_ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_anomaly_counts(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new event files in ``input_dir``,
    appending counter rows to ``out_dir``."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        streaming_anomaly_counts(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_anomalies(out: DataFrame) -> DataFrame:
    """Counter-row stream output -> the anomaly table: each key's LAST
    count (max epoch), analyzed through the ONE shared batch
    derivation (events.anomalies_from_counts)."""
    from pyspark.sql.window import Window

    from ..operators.events import anomalies_from_counts

    w = Window.partitionBy("event_type", "h").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    cnts = last.select("event_type", "h", "c")
    return anomalies_from_counts(out.sparkSession, cnts)


def final_trend(out: DataFrame) -> DataFrame:
    """Counter-row stream output -> the OLS trend table: each key's
    LAST count (max epoch), regressed through the ONE shared batch
    derivation (events.trend_from_counts).  Shares the batch
    event_trend oracle VERBATIM — same counters, same derivation (the
    streaming_anomalies discipline)."""
    from pyspark.sql.window import Window

    from ..operators.events import trend_from_counts

    w = Window.partitionBy("event_type", "h").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return trend_from_counts(out.sparkSession, last.select("event_type", "h", "c"))
