"""Streaming Bloom filter: per-source running vocabulary-membership
bitsets over an unbounded document stream.

The batch operator (operators/sketches.bloom_term_filter) answers
after the fact; an ingest pipeline keeps the filter CURRENT as data
arrives (membership routing, join pruning against live feeds).  State
per source is the sparse word table of the bitset (parallel word/bits
arrays, bounded at BLOOM_WORDS longs per group), updated per
micro-batch by OR-ing the batch's word masks — Bloom filters merge by
bitwise OR, the union property.

Why streaming == batch EXACTLY here (the gate contract, the
streaming_kmv/cms discipline): bitwise OR is commutative, associative
and idempotent, so the final bitset after ANY micro-batch split of
the corpus equals the batch filter — no ordering contract, and even
replayed documents change nothing.  The gate takes each source's LAST
emitted row (max epoch) and derives the probe verdicts through the
ONE shared Catalyst expression (sketches.bloom_probe_verdicts)
against the batch oracle restated WITHOUT the exact `present` column
(the final filter state alone cannot know it).

Every hash stays in the shared Catalyst position expression
(sketches.bloom_pos_col) — the Python state function only ever ORs
integer masks; it computes no hashes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from ..operators.sketches import (
    BLOOM_K,
    BLOOM_WORD,
    bloom_pos_col,
)

BLOOM_OUT_SCHEMA = (
    "source string, epoch int, words array<bigint>, bits array<bigint>"
)
_BLOOM_STATE_SCHEMA = "words array<bigint>, bits array<bigint>, epoch int"

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def streaming_bloom(stream: DataFrame) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, words, bits)
    sparse bitset rows (append mode; one row per source per batch it
    appears in; state = the OR-merged filter; words ascending)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    toks = stream.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    )
    base = toks.select(
        "source",
        F.explode(
            F.array(*[bloom_pos_col(F.col("t"), i) for i in range(BLOOM_K)])
        ).alias("p"),
    ).select(
        "source",
        F.expr(f"p DIV {BLOOM_WORD}").cast("long").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD} AS INT))"
        ).alias("mask"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        acc: dict[int, int] = {}
        for pdf in pdfs:
            for w, m in zip(pdf["word"], pdf["mask"]):
                wi = int(w)
                acc[wi] = acc.get(wi, 0) | int(m)
        if state.exists:
            words, bits, epoch = state.get
            for w, b in zip(words, bits):
                wi = int(w)
                acc[wi] = acc.get(wi, 0) | int(b)
            epoch = int(epoch) + 1
        else:
            epoch = 1
        items = sorted(acc.items())
        words = [w for w, _ in items]
        bits = [b for _, b in items]
        state.update((words, bits, epoch))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "epoch": [epoch],
                "words": [words],
                "bits": [bits],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=BLOOM_OUT_SCHEMA,
        stateStructType=_BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_bloom(
    spark: SparkSession, input_dir: str, out_dir: str, checkpoint_dir: str
):
    """One availableNow pass over new document files in ``input_dir``,
    appending sparse bitset rows to ``out_dir`` (checkpointed state
    carries the filters across runs)."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_bloom(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_bloom_membership(out: DataFrame, probes: list[str]) -> DataFrame:
    """Bitset-row stream output -> (source, term, in_filter, n_set):
    each source's LAST state (max epoch) re-expanded into the word
    table, probe verdicts via the ONE shared batch expression."""
    from pyspark.sql.window import Window

    from ..operators.sketches import bloom_probe_verdicts

    spark = out.sparkSession
    w = Window.partitionBy("source").orderBy(F.col("epoch").desc())
    last = out.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    words = last.select(
        "source",
        F.explode(F.arrays_zip("words", "bits")).alias("z"),
    ).select(
        "source",
        F.col("z.words").cast("long").alias("word"),
        F.col("z.bits").cast("long").alias("w"),
    )
    nset = words.groupBy("source").agg(
        F.sum(F.bit_count("w")).cast("long").alias("n_set")
    )
    pr = spark.createDataFrame([(t,) for t in probes], "term string")
    sources = last.select("source").distinct()
    verdicts = bloom_probe_verdicts(sources, words, pr)
    return verdicts.join(nset, "source").select(
        "source", "term", "in_filter", "n_set"
    )
