"""Streaming stratified sample: per-source running k-smallest-by-hash
uniform samples over an unbounded document stream — the live twin of
operators/curation.stratified_sample (equal-size per-domain eval
samples kept CURRENT at ingest).

Why streaming == batch EXACTLY here (the gate contract, the
streaming_quantiles discipline verbatim): bottom-k of a union equals
the bottom-k of per-part bottom-ks, the merge deduplicates on the
(hash, doc_id) pair so REPLAYED documents change nothing (each doc's
salted id-hash is deterministic), and the hash total-orders the
sample independently of arrival order.  The gate takes each source's
LAST emitted row (max epoch) and shares the batch
``stratified_sample`` oracle VERBATIM — pos is re-derived at read
time from the stored (h, doc_id) order.

The Python state function only ever merges integer pairs; the hash
stays in the shared Catalyst expression (textnorm.hash60_col with the
'ssamp-' salt of curation.SSAMP_SALT).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import hash60_col
from ..operators.curation import SSAMP_K, SSAMP_SALT

SSAMP_OUT_SCHEMA = (
    "source string, epoch int, hs array<bigint>, ids array<bigint>"
)
_SSAMP_STATE_SCHEMA = "hs array<bigint>, ids array<bigint>, epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_stratified_sample(
    stream: DataFrame, k: int = SSAMP_K
) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, hs, ids)
    sample rows (append mode; state = the bottom-k merged (h, doc_id)
    sample ordered by (h, doc_id))."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select(
        "source",
        hash60_col(
            F.concat(F.lit(SSAMP_SALT), F.col("doc_id").cast("string"))
        ).alias("h"),
        F.col("doc_id").cast("long").alias("v"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        pairs = set()
        for pdf in pdfs:
            for h, v in zip(pdf["h"], pdf["v"]):
                pairs.add((int(h), int(v)))
        if state.exists:
            hs, ids, epoch = state.get
            pairs.update(zip((int(h) for h in hs), (int(v) for v in ids)))
            epoch = int(epoch) + 1
        else:
            epoch = 1
        sample = sorted(pairs)[:k]
        hs = [h for h, _ in sample]
        ids = [v for _, v in sample]
        state.update((hs, ids, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                "hs": [hs],
                "ids": [ids],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=SSAMP_OUT_SCHEMA,
        stateStructType=_SSAMP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_ssample(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sample rows to ``out_dir`` (checkpointed state carries
    the samples across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_stratified_sample(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_ssample(out: DataFrame) -> DataFrame:
    """Sample-row stream output -> (source, doc_id, h, pos): each
    source's LAST state (max epoch) re-expanded, pos re-derived under
    the batch order (h asc, doc_id asc) — the ONE ordering pin."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    rows = last.select(
        "source",
        F.explode(F.arrays_zip("hs", "ids")).alias("z"),
    ).select(
        "source",
        F.col("z.ids").alias("doc_id"),
        F.col("z.hs").alias("h"),
    )
    wp = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    return rows.select(
        "source",
        "doc_id",
        "h",
        F.row_number().over(wp).cast("long").alias("pos"),
    )
