"""Streaming count-min sketch: per-source running token-frequency
counters over an unbounded document stream.

The batch operator (operators/sketches.cms_term_counts) answers after
the fact; an ingest pipeline watches per-domain term frequencies AS
DATA ARRIVES (spam-phrase bursts, template floods, crawler loops).
State per source is the d x w counter table stored sparse (parallel
cell/count arrays, bounded at d*w = 4096 longs per group), updated
per micro-batch by ADDING the batch's cell counts — counters merge by
addition, the CMS mergeability property.

Why streaming == batch EXACTLY here (the gate contract, the
streaming_kmv discipline): integer addition is commutative and
associative, so the final counter state after ANY micro-batch split
of the corpus equals the batch sketch — no ordering contract.  The
gate takes each source's LAST emitted row (max epoch) and derives the
probe estimates through the ONE shared Catalyst expression
(sketches.cms_probe_estimates) against the batch oracle restated
WITHOUT the exact true_count column (a stream cannot know it).

Every hash stays in the shared Catalyst cell expression
(sketches.cms_cell_col) — the Python state function only ever sees
integer cell indexes and counts; it computes no hashes and no floats.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from ..operators.sketches import CMS_D, CMS_W, cms_cell_col

CMS_OUT_SCHEMA = (
    "source string, epoch int, cells array<bigint>, counts array<bigint>"
)
_CMS_STATE_SCHEMA = "cells array<bigint>, counts array<bigint>, epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_cms(stream: DataFrame) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, cells,
    counts) sparse counter rows (append mode; one row per source per
    batch it appears in; state = the merged counter table; cell index
    = row * CMS_W + col, cells ascending)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    toks = stream.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    base = toks.select(
        "source",
        F.explode(
            F.array(*[cms_cell_col(F.col("t"), i) for i in range(CMS_D)])
        ).alias("c"),
    ).select(
        "source",
        (F.col("c.row").cast("long") * F.lit(CMS_W) + F.col("c.col"))
        .cast("long")
        .alias("idx"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        acc: dict[int, int] = {}
        for pdf in pdfs:
            for v in pdf["idx"]:
                i = int(v)
                acc[i] = acc.get(i, 0) + 1
        if state.exists:
            cells, counts, epoch = state.get
            for c, n in zip(cells, counts):
                acc[int(c)] = acc.get(int(c), 0) + int(n)
            epoch = int(epoch) + 1
        else:
            epoch = 1
        items = sorted(acc.items())
        cells = [c for c, _ in items]
        counts = [n for _, n in items]
        state.update((cells, counts, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                "cells": [cells],
                "counts": [counts],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=CMS_OUT_SCHEMA,
        stateStructType=_CMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_cms(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sparse counter rows to ``out_dir`` (checkpointed state
    carries the counters across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_cms(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_cms_estimates(out: DataFrame, probes: list[str]) -> DataFrame:
    """Sketch-row stream output -> (source, term, est, n_cells): each
    source's LAST state (max epoch) re-expanded into the counter table,
    probe estimates via the ONE shared batch expression."""
    from pyspark.sql.window import Window

    from ..operators.sketches import cms_probe_estimates

    spark = out.sparkSession
    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    counters = last.select(
        "source",
        F.explode(F.arrays_zip("cells", "counts")).alias("z"),
    ).select(
        "source",
        F.expr(f"CAST(z.cells DIV {CMS_W} AS INT)").alias("row"),
        (F.col("z.cells") % F.lit(CMS_W)).cast("long").alias("col"),
        F.col("z.counts").cast("long").alias("n"),
    )
    ncells = counters.groupBy("source").agg(
        F.count("*").cast("long").alias("n_cells")
    )
    pr = spark.createDataFrame([(t,) for t in probes], "term string")
    sources = last.select("source").distinct()
    est = cms_probe_estimates(sources, counters, pr)
    return est.join(ncells, "source").select(
        "source", "term", "est", "n_cells"
    )
