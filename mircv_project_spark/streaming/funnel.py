"""Streaming ordered funnel: per-user O(1) state via
``applyInPandasWithState``.

Batch ``operators/events.event_funnel`` computes t_k = min event time
of step k STRICTLY after t_{k-1}.  That chain is order-sensitive, so
the streaming form is exact under the same contract the other
streaming gates pin (CLAUDE.md): micro-batches arrive in EVENT-TIME
order per user.  Each batch is sorted (us, event_id) and scanned with
a 3-slot state machine — when events ascend in us, "first qualifying
seen" equals "min qualifying", so the greedy scan reproduces the batch
SQL exactly.  State per user is three longs (-1 = unset): bounded,
shuffle-partitioned by the group key, horizontally scalable like any
keyed aggregation.

A user's final row emits via EVENT-TIME TIMEOUT once the watermark
passes ``last event + FLUSH_GAP_S`` (the gate appends far-future
sentinel batches to flush, same two-run pattern as
streaming/sessions.py).  The deadline is EVENT-TIME anchored, NOT
``watermark + 1``: a wm-relative deadline registered while the
watermark still trails the data is already expired by the next batch,
and Spark then fires the timeout for a user even when that same batch
carries the user's new data — emitting a partial chain and resetting
state.  With the event-anchored deadline, ordinary batches can never
expire a user (corpus event times all precede sentinel - FLUSH_GAP_S);
only the sentinel jump does.  Users who never produced a first-step
event hold state but emit nothing — the batch semantics ("every user
with at least one first-step event") are preserved.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..operators.events import FUNNEL_HORIZON_S, FUNNEL_STEPS

FUNNEL_OUT_SCHEMA = (
    "user_id long, t_view long, t_click long, t_purchase long, "
    "converted boolean"
)
_STATE_SCHEMA = "t0 long, t1 long, t2 long"
_COLS = ["user_id", "t_view", "t_click", "t_purchase", "converted"]

# flush deadline = last event + this gap; sentinel batches must carry a
# ts beyond every corpus event + FLUSH_GAP_S for final rows to emit
FLUSH_GAP_S = 90 * 86_400


def streaming_funnel(
    stream: DataFrame,
    horizon_seconds: int = FUNNEL_HORIZON_S,
    watermark: str = "0 seconds",
) -> DataFrame:
    """events stream -> one funnel row per user with a first-step
    event, emitted by event-time timeout after the user's last batch
    (append mode).  Steps pinned to operators/events.FUNNEL_STEPS."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    steps = list(FUNNEL_STEPS)
    horizon_us = int(horizon_seconds) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            t0, t1, t2 = state.get
            state.remove()
            if t0 >= 0:
                conv = bool(t2 >= 0 and (t2 - t0) <= horizon_us)
                yield pd.DataFrame(
                    [(
                        user_id,
                        t0,
                        t1 if t1 >= 0 else None,
                        t2 if t2 >= 0 else None,
                        conv,
                    )],
                    columns=_COLS,
                )
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "event_id"], kind="stable", ignore_index=True
        )
        us = (batch["ts"].astype("int64") // 1000).to_numpy()
        et = batch["event_type"].to_numpy()

        t0, t1, t2 = state.get if state.exists else (-1, -1, -1)
        for i in range(len(us)):
            if t0 < 0:
                if et[i] == steps[0]:
                    t0 = int(us[i])
            elif t1 < 0:
                if et[i] == steps[1] and us[i] > t0:
                    t1 = int(us[i])
            elif t2 < 0:
                if et[i] == steps[2] and us[i] > t1:
                    t2 = int(us[i])
            else:
                break
        state.update((int(t0), int(t1), int(t2)))
        # the timed-out branch's yield already makes fn a generator;
        # the normal path emits nothing until the user's timeout fires.
        # Event-anchored deadline (see module docstring for why NOT
        # watermark + 1); the wm floor only guards the degenerate case
        # of a deadline the watermark has already passed at set time.
        deadline_ms = int(us[-1] // 1000) + FLUSH_GAP_S * 1000
        state.setTimeoutTimestamp(
            max(deadline_ms, state.getCurrentWatermarkMs() + 1)
        )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def events_stream(spark, input_dir: str) -> DataFrame:
    """File-source stream over events-shaped parquet files."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    return spark.readStream.schema(schema).parquet(input_dir)


def run_streaming_funnel(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    horizon_seconds: int = FUNNEL_HORIZON_S,
    watermark: str = "0 seconds",
):
    """One availableNow pass over new files in ``input_dir``, appending
    timed-out funnel rows to ``out_dir``.  Timeouts registered in batch
    N fire in a LATER batch, so callers flush with two far-future
    sentinel batches (separate runs), as in streaming/sessions.py."""
    return (
        streaming_funnel(
            events_stream(spark, input_dir), horizon_seconds, watermark
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
