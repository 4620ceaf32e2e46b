"""Streaming percolation — alerting over a document stream.

The batch percolator (operators/percolate.py) answers "which stored
queries match this document" after the fact; the ALERTING product
(saved searches, content subscriptions, moderation rules) needs that
verdict as documents ARRIVE.  The match decision is purely doc-local
(conjunctive containment of the query's distinct normalized terms in
the one document), so streaming percolation is exact by construction:
each micro-batch emits its own docs' matches, micro-batches partition
the stream, and the union of per-epoch outputs equals the batch
percolator over the full corpus — the gate shares percolate's oracle
BY DESIGN.

Idempotence: each epoch writes its own partition directory with
overwrite (the streaming/incremental.py replay discipline) — a
replayed micro-batch rewrites the same files instead of double-
appending.

Scale shape: per batch, the stored-query inversion broadcasts (it is
the driver-small table the batch operator already uses) and the only
shuffle is the (doc, qid) requirement count within the batch; state is
EMPTY — nothing accumulates, which is what makes the operator safe on
an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def document_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(DOC_SCHEMA).parquet(input_dir)


def run_percolate_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    queries: list[tuple[str, str]],
):
    """One availableNow pass: percolate every new document file in
    ``input_dir`` against the stored ``queries``, writing per-epoch
    match partitions under ``out_dir``."""
    from ..operators.percolate import percolate

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = percolate(batch_df, queries)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        document_stream(spark, input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_percolate_matches(spark: SparkSession, out_dir: str) -> DataFrame:
    """-> (doc_id, qid, n_terms) across all epochs."""
    return spark.read.parquet(out_dir).select("doc_id", "qid", "n_terms")
