"""Stream-stream interval join with watermark state eviction — the
canonical hard Structured Streaming operator (two unbounded inputs,
bounded state), gated by the SAME SQL oracle as the batch
``operators/events.event_range_join``.

Semantics (identical to the batch op, pinned): every (purchase, click)
pair by the same user with ``left.us - horizon <= right.us <= left.us``
(both endpoints inclusive; horizon = events.RANGE_HORIZON_S = 3600 s).

How the streaming form stays exact:

- An INNER stream-stream join emits a pair the moment the later side
  arrives — no watermark wait on EMISSION (unlike the windowed-agg
  gate), so no flush sentinels are needed; availableNow epochs emit
  every pair exactly once (cross-epoch pairs emit when the left
  arrives, finding the right in state).
- The time-range condition is written on the WATERMARKED TIMESTAMP
  columns (Spark's state-cleanup inference requires that — a condition
  on derived epoch-us longs would make both sides' state grow
  unboundedly); the epoch-us payload columns ride along for the
  tz-free output contract shared with the batch op.
- Watermark delay = the horizon itself, NOT 0 s: eviction only needs to
  keep a right row until no future left can reach back to it, and the
  extra horizon of slack makes the boundary case (a left exactly
  ``horizon`` after a right, arriving in a later epoch under the
  time-ordered-epoch contract, CLAUDE.md) provably retained — loosening
  eviction can only over-RETAIN, never drop a pair.  State stays
  bounded at ~2 horizons of events per side.

Scale shape: the join is keyed by user_id (condition's equality part),
so state is shuffle-partitioned like any keyed stateful op; per-key
state is bounded by event rate x 2 horizons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.events import ASOF_LEFT, ASOF_RIGHT, RANGE_HORIZON_S, _us_col
from .funnel import events_stream

RANGE_OUT_COLS = [
    "event_id",
    "user_id",
    "us",
    "right_eid",
    "right_us",
    "lag_us",
]


def streaming_range_join(
    stream: DataFrame,
    left_type: str = ASOF_LEFT,
    right_type: str = ASOF_RIGHT,
    horizon_seconds: int = RANGE_HORIZON_S,
) -> DataFrame:
    """events stream -> (event_id, user_id, us, right_eid, right_us,
    lag_us), append mode, exactly one row per qualifying pair."""
    h = int(horizon_seconds)
    wm = f"{h} seconds"
    lefts = (
        stream.where(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("lts"),
            _us_col("ts").alias("us"),
            F.col("event_id").cast("long").alias("eid"),
        )
        .withWatermark("lts", wm)
    )
    rights = (
        stream.where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("rts"),
            _us_col("ts").alias("right_us"),
            F.col("event_id").cast("long").alias("right_eid"),
        )
        .withWatermark("rts", wm)
    )
    joined = lefts.join(
        rights,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("rts") <= F.col("lts"))
        & (F.col("rts") >= F.col("lts") - F.expr(f"INTERVAL {h} SECONDS")),
        "inner",
    )
    return joined.select(
        F.col("eid").alias("event_id"),
        F.col("l_user").cast("long").alias("user_id"),
        "us",
        "right_eid",
        "right_us",
        (F.col("us") - F.col("right_us")).alias("lag_us"),
    )


def run_streaming_range_join(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    horizon_seconds: int = RANGE_HORIZON_S,
):
    """One availableNow pass over new files in ``input_dir``, appending
    joined pairs to ``out_dir``.  Inner joins emit on arrival — no
    flush sentinels required."""
    return (
        streaming_range_join(
            events_stream(spark, input_dir), horizon_seconds=horizon_seconds
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
