"""Streaming per-user activity pivot: the live materialized view of
operators/events.event_pivot — per-user wide counters kept current as
events arrive (the dashboard table a product surface reads without
re-scanning history).

State per user is the six additive counters (five pinned type counts,
total) plus the exact purchase cents — integer addition is
commutative/associative and the checkpointed offsets make delivery
exactly-once, so the final counters after ANY micro-batch split equal
the batch pivot (the streaming_cms/anomalies discipline).
``streaming_pivot`` therefore shares the batch ``event_pivot`` oracle
VERBATIM.  The cents quantization stays in Catalyst (the ONE
event_pivot expression); the state fn only adds integers.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.events import PIVOT_TYPES

PIVOT_OUT_SCHEMA = (
    "user_id bigint, epoch int, "
    + ", ".join(f"n_{t} bigint" for t in PIVOT_TYPES)
    + ", n_total bigint, purchase_cents bigint"
)
_PIVOT_STATE_SCHEMA = (
    ", ".join(f"n_{t} bigint" for t in PIVOT_TYPES)
    + ", n_total bigint, purchase_cents bigint, epoch int"
)

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint,"
    " event_type string, value double, props string"
)


def streaming_pivot(stream: DataFrame) -> DataFrame:
    """event stream -> per-micro-batch wide counter rows (append
    mode; one row per touched user per batch; state = the running
    counters)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * F.lit(100.0)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    base = stream.select(
        F.col("user_id").cast("long").alias("user_id"),
        "event_type",
        cents.alias("cents"),
    )
    n_fields = [f"n_{t}" for t in PIVOT_TYPES]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        add = {f: 0 for f in n_fields}
        total = 0
        pc = 0
        for pdf in pdfs:
            for et, c in zip(pdf["event_type"], pdf["cents"]):
                f = f"n_{et}"
                if f in add:
                    add[f] += 1
                total += 1
                pc += int(c)
        if state.exists:
            vals = list(state.get)
            for i, f in enumerate(n_fields):
                add[f] += int(vals[i])
            total += int(vals[len(n_fields)])
            pc += int(vals[len(n_fields) + 1])
            epoch = int(vals[len(n_fields) + 2]) + 1
        else:
            epoch = 1
        state.update(
            tuple(add[f] for f in n_fields) + (total, pc, epoch)
        )
        yield pd.DataFrame(
            {
                "user_id": [int(key[0])],
                "epoch": [epoch],
                **{f: [add[f]] for f in n_fields},
                "n_total": [total],
                "purchase_cents": [pc],
            }
        )

    return base.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=PIVOT_OUT_SCHEMA,
        stateStructType=_PIVOT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_pivot(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new event files in ``input_dir``."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        streaming_pivot(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_pivot(out: DataFrame) -> DataFrame:
    """Counter-row stream output -> the batch pivot's exact shape:
    each user's LAST state (max epoch)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    return last.select(
        "user_id",
        *[f"n_{t}" for t in PIVOT_TYPES],
        "n_total",
        "purchase_cents",
    )
