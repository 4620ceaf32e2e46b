"""Physical-plan assertions — the 'would this survive 100x' checks.

These helpers inspect `df.explain()` output so tests can pin the plan
properties the scale design depends on, not just the results:

- posting fetches must prune partitions (bucket) and push the term
  predicate into the parquet scan;
- the query-term join in the exhaustive scorer must broadcast (never
  sort-merge a 10-row dim against 10^12 postings);
- hot paths must stay inside WholeStageCodegen (no row-at-a-time
  Python in the middle of a pipeline).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def assert_partition_pruned(df: DataFrame, partition_col: str) -> str:
    text = plan_text(df)
    assert "PartitionFilters: [" in text and partition_col in text.split(
        "PartitionFilters:"
    )[1].split("]")[0], f"no partition pruning on {partition_col}:\n{text}"
    return text


def assert_filter_pushed(df: DataFrame, col: str) -> str:
    text = plan_text(df)
    pushed = [
        seg.split("]")[0]
        for seg in text.split("PushedFilters: [")[1:]
    ]
    assert any(col in seg for seg in pushed), (
        f"no pushed filter on {col}:\n{text}"
    )
    return text


def assert_broadcast_join(df: DataFrame) -> str:
    text = plan_text(df)
    assert "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text, (
        f"expected broadcast join:\n{text}"
    )
    return text


def assert_no_sort_merge_join(df: DataFrame) -> str:
    text = plan_text(df)
    assert "SortMergeJoin" not in text, f"unexpected SortMergeJoin:\n{text}"
    return text


def assert_whole_stage_codegen(df: DataFrame) -> str:
    # simple mode marks codegen'd operators with '*(n)'; formatted mode
    # doesn't print the markers in all Spark versions
    text = plan_text(df, mode="simple")
    assert "*(" in text or "WholeStageCodegen" in text, (
        f"no WholeStageCodegen:\n{text}"
    )
    return text


def assert_no_broadcast_nested_loop(df: DataFrame) -> str:
    """Cartesian guard: BroadcastNestedLoopJoin materializes O(n*m)
    joined rows — the execution shape the blocked/chunked similarity
    paths exist to avoid."""
    text = plan_text(df)
    assert "BroadcastNestedLoopJoin" not in text and "CartesianProduct" not in text, (
        f"unexpected nested-loop/cartesian join:\n{text}"
    )
    return text
