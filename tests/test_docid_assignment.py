"""docId assignment: the scalable two-pass zipWithIndex path must equal
the window-function oracle path, and both must equal doc_id + 1 under
the deterministic documents->transcripts mapping."""

from pyspark.sql import functions as F

from mircv_project_spark.operators.index_build import filter_indexable
from mircv_project_spark.sources.transcripts import (
    assign_doc_ids,
    generate_transcripts,
    load_transcripts,
)
from tests.conftest import SF_SMALL


def test_docid_paths_agree(spark):
    t = filter_indexable(load_transcripts(spark, SF_SMALL))
    a = assign_doc_ids(t, scalable=True).select("conv_id", "turn_idx", "docid", "docno")
    b = assign_doc_ids(t, scalable=False).select("conv_id", "turn_idx", "docid", "docno")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_docid_equals_docid_plus_one(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text")
    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_SMALL)))
    joined = t.join(docs, t.docno == docs.doc_id.cast("string"), "full")
    assert joined.where(F.col("docno").isNull() | F.col("doc_id").isNull()).count() == 0
    assert t.where(F.col("docid") != F.col("docno").cast("long") + 1).count() == 0


def test_assume_sorted_path_agrees(spark):
    """assume_sorted=True (no sampling pass / shuffle / sort) must equal
    the window oracle on a source whose partitions are contiguous sorted
    key ranges — the generator is exactly that."""
    t = filter_indexable(generate_transcripts(spark, 5000, seed=13))
    a = assign_doc_ids(t, scalable=True, assume_sorted=True).select(
        "conv_id", "turn_idx", "docid", "docno"
    )
    b = assign_doc_ids(t, scalable=False).select(
        "conv_id", "turn_idx", "docid", "docno"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_generator_deterministic(spark):
    a = generate_transcripts(spark, 200, seed=7).orderBy("conv_id", "turn_idx")
    b = generate_transcripts(spark, 200, seed=7).orderBy("conv_id", "turn_idx")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]
    assert a.count() == 200
