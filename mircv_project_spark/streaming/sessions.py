"""Custom stateful streaming operator: conversation sessionization.

The builder brief names ``applyInPandasWithState`` as the tool for
custom stateful operators over the transcript stream; the incremental
indexer (streaming/incremental.py) covers ingestion and the watermarked
window agg covers built-in state, but nothing exercised ARBITRARY
per-key state until now.  Sessionization is the canonical case: per
``conv_id``, turns accumulate into a session until an inactivity gap
exceeds ``gap_seconds``; the trailing open session lives in the state
store across micro-batches and closes via EVENT-TIME TIMEOUT once the
watermark passes its deadline — late-data-safe, scales horizontally
because state is partitioned by the group key exactly like a shuffle.
Buffered-turn state is bounded by the watermark horizon; after a
timeout a 5-int counter tombstone remains per conversation so that a
conversation resuming later continues its session numbering (the
gaps-and-islands oracle numbers islands over full history).

Output timestamps are unix epoch SECONDS (longs): the session scalars
then hash identically between Spark and the DuckDB gaps-and-islands
oracle (``oracle.py: conversation_sessions``) with no tz/format
ambiguity (session timezone is pinned UTC in session.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

SESSION_SCHEMA = (
    "conv_id string, session_idx int, n_turns long, "
    "start_s long, end_s long, chars long"
)
_STATE_SCHEMA = "session_idx int, n_turns long, start_us long, end_us long, chars long"
_COLS = ["conv_id", "session_idx", "n_turns", "start_s", "end_s", "chars"]


def conversation_sessions(
    stream: DataFrame, gap_seconds: int = 1, watermark: str = "0 seconds"
) -> DataFrame:
    """transcript stream -> closed-session stream (append mode).

    A session closes in-batch when the next turn of its conversation
    arrives more than ``gap_seconds`` later (STRICT >, matching the
    oracle's ``delta > gap`` islands rule), or by event-time timeout
    when the watermark passes ``end + gap`` — whichever is observed
    first.  Each emitted row: (conv_id, session_idx, n_turns, start_s,
    end_s, chars)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import numpy as np

        conv_id = key[0]
        if state.hasTimedOut:
            sidx, n, st, en, ch = state.get
            # Keep a counter-only tombstone (n == 0) instead of
            # state.remove(): a conversation that RESUMES after its
            # trailing session timed out must continue numbering at
            # sidx+1, not restart at 0 (the gaps-and-islands oracle
            # numbers islands over the conversation's full history).
            # No new timeout is registered on the tombstone; the n == 0
            # guard makes a re-fired timeout a no-op either way.  State
            # is O(#conversations) small counters.
            if n > 0:
                state.update((int(sidx) + 1, 0, 0, 0, 0))
                yield pd.DataFrame(
                    [(conv_id, sidx, n, st // 1_000_000, en // 1_000_000, ch)],
                    columns=_COLS,
                )
            return

        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts", kind="stable", ignore_index=True
        )
        t_us = (batch["ts"].astype("int64") // 1000).to_numpy()
        chars = batch["text"].astype(str).str.len().to_numpy()

        if state.exists:
            sidx, n, st, en, ch = state.get
        else:
            sidx, n, st, en, ch = 0, 0, 0, 0, 0

        rows = []
        # vectorized gap split: a turn starts a new session when it
        # arrives > gap after its predecessor (the open state session
        # acts as predecessor of the first batch row)
        prev = np.empty(len(t_us), dtype=np.int64)
        prev[1:] = t_us[:-1]
        prev[0] = en if n > 0 else t_us[0]
        brk = (t_us - prev) > gap_us
        sess_ids = np.cumsum(brk)
        if n > 0 and brk[0]:
            rows.append((conv_id, sidx, n, st // 1_000_000, en // 1_000_000, ch))
            sidx += 1
            n = 0
            ch = 0
        last_sid = int(sess_ids[-1])
        for sid in np.unique(sess_ids):
            m = sess_ids == sid
            seg_t = t_us[m]
            if n == 0:
                st = int(seg_t[0])
            n += int(m.sum())
            en = int(seg_t[-1])
            ch += int(chars[m].sum())
            if int(sid) != last_sid:
                rows.append((conv_id, sidx, n, st // 1_000_000, en // 1_000_000, ch))
                sidx += 1
                n = 0
                ch = 0
        state.update((int(sidx), int(n), int(st), int(en), int(ch)))
        # close the trailing session once the watermark passes end+gap
        deadline_ms = en // 1000 + int(gap_seconds) * 1000 + 1
        state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
        if rows:
            yield pd.DataFrame(rows, columns=_COLS)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_sessions(
    spark,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1,
    watermark: str = "0 seconds",
):
    """One availableNow pass of the sessionizer over new files in
    ``input_dir``, appending closed sessions to ``out_dir`` parquet.
    Event-time timeouts for batch N's trailing sessions fire in a LATER
    batch (the watermark advances between batches), so a caller that
    wants every session closed appends two sentinel files with a
    far-future ts and runs twice more (see the gate entry)."""
    from .incremental import transcript_stream

    return (
        conversation_sessions(
            transcript_stream(spark, input_dir), gap_seconds, watermark
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
