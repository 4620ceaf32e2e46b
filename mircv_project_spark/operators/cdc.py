"""CDC apply / MERGE-INTO analog: maintain a keyed table under a
change feed (upserts + deletes with a sequence order).

The incremental-corpus maintenance primitive the streaming index
(streaming/incremental.py) sits on top of conceptually: transcripts
arrive as corrections too (moderation redactions, tool-output
backfills), not only appends.  On Iceberg this is ``MERGE INTO``; the
engine expresses the same semantics as composable DataFrame ops so it
works on any store.

Semantics (pinned, restated in oracle._cdc_apply_sql):
- changes carry (key..., op, seq, payload...): op 'U' = upsert (insert
  or replace the whole row), 'D' = delete;
- per key the HIGHEST seq wins (ties are a feed-contract violation —
  the gate feed makes seq unique per key by construction);
- result = base rows whose key has no change + payload rows of the
  winning 'U' changes (a winning 'D' removes the key; a 'D' on an
  absent key is a no-op).

Scale shape: winner selection is one window (or max-struct agg) over
the CHANGE FEED only — never the base; the base is touched by exactly
one anti-join on the key (broadcast when the feed is small, AQE
otherwise) plus the union.  The base never re-sorts or re-shuffles
beyond the join, which co-located bucketing on the key eliminates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """-> base with the change feed applied (columns = base.columns)."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    kept = base.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.where(F.col(op_col) != "D").select(*base.columns)
    return kept.unionByName(upserts)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """-> the change feed with SCD TYPE-2 validity intervals: every
    change row annotated with (valid_to_seq, is_current) — the
    warehouse history-tracking twin of apply_changes (which keeps
    only the winner, this keeps the full lineage with interval
    bookkeeping for as-of queries over dimension history).

    Pinned semantics (restated in oracle._scd2_sql — change both
    sides or neither): per key ordered by seq ascending,
    valid_to_seq = the NEXT change's seq (NULL on the latest row),
    is_current = the latest row AND not a delete (a closing 'D' row
    stays in the history but nothing is current).

    Scale shape: one window over the CHANGE FEED only (the
    apply_changes discipline — the base table is never touched)."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).asc())
    nxt = F.lead(F.col(seq_col)).over(w)
    return changes.withColumn(
        "valid_to_seq", nxt.cast("long")
    ).withColumn(
        "is_current",
        F.col("valid_to_seq").isNull() & (F.col(op_col) != "D"),
    )
