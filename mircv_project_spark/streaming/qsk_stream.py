"""Streaming quantile sketch: per-source running bottom-k-by-hash
uniform samples over an unbounded document stream — the quantile
member of the streaming-sketch family beside KMV (cardinality), CMS
(frequency), Bloom (membership) and HLL (cardinality, fixed-size).

The batch operator (operators/sketches.quantile_sketch) answers after
the fact; an ingest pipeline keeps the sample CURRENT (live
length-distribution monitoring without a global sort).  State per
source is the bottom-k (hash, value) sample (parallel hs/vs arrays,
bounded at QSK_K rows per group), updated per micro-batch by merging
and re-taking the bottom-k.

Why streaming == batch EXACTLY here (the gate contract): bottom-k of
a union equals the bottom-k of per-part bottom-ks (the mergeable-
sample property the batch mapInPandas stage already exploits), the
merge deduplicates on the (hash, value) pair so REPLAYED documents
change nothing (each doc's salted id-hash is deterministic), and the
hash total-orders the sample independently of arrival order.  The
gate takes each source's LAST emitted row (max epoch) and computes
the quantiles through the ONE shared aggregate list
(sketches.qsk_quantile_aggs) — in the pinned exact regime (QSK_K >=
every group) the sample IS the group, so streaming shares the batch
``quantile_sketch`` oracle VERBATIM.

The Python state function only ever merges integer pairs; the hash
stays in the shared Catalyst expression (textnorm.hash60_col with the
'qsk-' salt) and the quantile math stays in Catalyst.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import hash60_col
from ..operators.sketches import QSK_K, QSK_SALT

QSK_OUT_SCHEMA = (
    "source string, epoch int, hs array<bigint>, vs array<bigint>"
)
_QSK_STATE_SCHEMA = "hs array<bigint>, vs array<bigint>, epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_quantile_sketch(stream: DataFrame, k: int = QSK_K) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, hs, vs)
    sample rows (append mode; one row per source per batch it appears
    in; state = the bottom-k merged sample ordered by (h, v))."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select(
        "source",
        hash60_col(
            F.concat(F.lit(QSK_SALT), F.col("doc_id").cast("string"))
        ).alias("h"),
        F.col("n_chars").cast("long").alias("v"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        pairs = set()
        for pdf in pdfs:
            for h, v in zip(pdf["h"], pdf["v"]):
                pairs.add((int(h), int(v)))
        if state.exists:
            hs, vs, epoch = state.get
            pairs.update(zip((int(h) for h in hs), (int(v) for v in vs)))
            epoch = int(epoch) + 1
        else:
            epoch = 1
        sample = sorted(pairs)[:k]
        hs = [h for h, _ in sample]
        vs = [v for _, v in sample]
        state.update((hs, vs, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                "hs": [hs],
                "vs": [vs],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=QSK_OUT_SCHEMA,
        stateStructType=_QSK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_qsk(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sample rows to ``out_dir`` (checkpointed state carries
    the samples across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_quantile_sketch(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_qsk_estimates(out: DataFrame) -> DataFrame:
    """Sample-row stream output -> (source, n_sample, q25, q50, q75,
    q90): each source's LAST state (max epoch) re-expanded into sample
    rows, quantiles via the ONE shared batch aggregate list."""
    from pyspark.sql.window import Window

    from ..operators.sketches import qsk_quantile_aggs

    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    rows = last.select(
        "source", F.explode("vs").alias("v")
    )
    return rows.groupBy("source").agg(*qsk_quantile_aggs("v"))
