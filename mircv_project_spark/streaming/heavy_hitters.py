"""Streaming per-source heavy hitters: a SpaceSaving top-k term table
maintained over an unbounded document stream.

The ingest-side vocabulary monitor (spam bursts, crawler loops,
template floods show up as new heavy terms within a batch or two) —
the streaming complement of the batch top_keywords/boilerplate
operators.  State per source is a bounded SpaceSaving summary (Metwally
et al. 2005): at most CAP (term, count, err) entries; an arriving term
not in the table evicts the minimum-count entry and inherits its count
as its error bound.

Exactness contract (what lets the gate share the batch-SQL oracle):
with CAP >= the source's distinct-term count no eviction ever fires,
every count is exact, and the final state's top-k == the batch top-k
under the pinned (cnt desc, term asc) order — REGARDLESS of how the
stream was micro-batched (counting is commutative).  The gate pins
HH_CAP = 4096, far above the driver corpora's per-source vocabulary;
a unit test exercises the genuinely-approximate regime (tiny capacity)
and asserts the SpaceSaving guarantees (count overestimates by at most
err; true heavy terms survive).

Pinned semantics (restated in the oracle — change both or neither):
batch increments merge as c[t] += n; an absent term with a full table
evicts the (count asc, term asc)-minimal entry m and enters with
count = m.count + n, err = m.count; per-epoch emission = the current
top HH_K by (cnt desc, term asc); the final answer is each source's
max-epoch emission.

Scale shape: terms explode map-side (one tokenizer pass); state is
keyed by source so hot sources parallelize across the state store;
each state is O(CAP) regardless of stream length.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col

HH_CAP = 4096
HH_K = 10

HH_OUT_SCHEMA = "source string, epoch int, term string, cnt long"
_HH_STATE_SCHEMA = (
    "terms array<string>, counts array<bigint>, errs array<bigint>, epoch int"
)

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def spacesaving_merge(
    counts: dict[str, int],
    errs: dict[str, int],
    batch: dict[str, int],
    cap: int,
) -> None:
    """In-place SpaceSaving batch merge — the pinned update rule (terms
    merge in ascending order; a full table evicts the (count asc, term
    asc)-minimal entry, the entrant inherits its count as err)."""
    for t in sorted(batch):
        n = batch[t]
        if t in counts:
            counts[t] += n
        elif len(counts) < cap:
            counts[t] = n
            errs[t] = 0
        else:
            victim = min(counts, key=lambda x: (counts[x], x))
            m = counts.pop(victim)
            errs.pop(victim)
            counts[t] = m + n
            errs[t] = m


def streaming_heavy_hitters(
    stream: DataFrame, cap: int = HH_CAP, k: int = HH_K
) -> DataFrame:
    """document stream -> per-micro-batch (source, epoch, term, cnt)
    rows: the source's current top-k SpaceSaving entries (append
    mode)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = stream.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("t")
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        counts: dict[str, int] = {}
        errs: dict[str, int] = {}
        if state.exists:
            terms, cnts, es, epoch = state.get
            counts = {t: int(c) for t, c in zip(terms, cnts)}
            errs = {t: int(e) for t, e in zip(terms, es)}
            epoch = int(epoch) + 1
        else:
            epoch = 1
        batch: dict[str, int] = {}
        for pdf in pdfs:
            for t, n in pdf["t"].value_counts().items():
                batch[t] = batch.get(t, 0) + int(n)
        spacesaving_merge(counts, errs, batch, cap)
        order = sorted(counts, key=lambda x: (-counts[x], x))
        state.update(
            (
                order,
                [counts[t] for t in order],
                [errs[t] for t in order],
                epoch,
            )
        )
        top = order[:k]
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(top),
                "epoch": [epoch] * len(top),
                "term": top,
                "cnt": [counts[t] for t in top],
            }
        )

    return base.groupBy("source").applyInPandasWithState(
        fn,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_heavy_hitters(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    cap: int = HH_CAP,
    k: int = HH_K,
):
    """One availableNow pass over new document files in ``input_dir``,
    appending top-k rows to ``out_dir``."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(input_dir)
    return (
        streaming_heavy_hitters(stream, cap=cap, k=k)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def final_heavy_hitters(out: DataFrame) -> DataFrame:
    """Stream output -> (source, term, cnt): each source's max-epoch
    emission (its final top-k)."""
    mx = out.groupBy("source").agg(F.max("epoch").alias("epoch"))
    return out.join(mx, ["source", "epoch"]).select("source", "term", "cnt")
