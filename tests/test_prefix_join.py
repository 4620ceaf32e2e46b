"""Prefix-filtered exact Jaccard join (dedup.jaccard_pairs_prefix):
must return EXACTLY the direct inverted-join pair set (prefix theorem
recall 1), with strictly fewer candidate rows through the join."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mircv_project_spark.operators import dedup as D

DOCS = [
    # 0/1 differ in the final token only: 15 tokens -> 13 shingles,
    # 12 shared -> J = 12/14 = 0.857 >= 0.8; 2 partially similar,
    # 3/4 unrelated, 5 exact dup of 0
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi pi rho"),
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi pi sigma"),
    (2, "alpha beta gamma delta other words entirely now here yes"),
    (3, "one two three four five six seven eight nine ten"),
    (4, "completely different content with nothing shared at all ok"),
    (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi pi rho"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_equals_direct_join(spark, docs_df):
    t = 0.8
    a = (
        D.jaccard_pairs_prefix(docs_df, t)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    b = (
        D.jaccard_pairs(docs_df, t)
        .toPandas()
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) >= 2  # the planted dups actually matched


def test_boundary_pair_at_exact_threshold(spark):
    # 12 tokens -> 10 shingles each; the last two tokens differ, so
    # each doc has 2 private shingles: inter = 8, union = 12,
    # J = 8/12 exactly.  At t = 8/12 the pair must be KEPT (>= is the
    # pinned rule) — threshold passed as the exact fraction, not the
    # rounded output value.
    x = "a b c d e f g h i j k l"
    y = "a b c d e f g h i j y z"
    df = spark.createDataFrame([(0, x), (1, y)], "doc_id long, text string")
    t = 8 / 12
    kept = D.jaccard_pairs_prefix(df, t).collect()
    assert len(kept) == 1 and kept[0].jaccard == round(t, 6)
    # and the direct join agrees at the same threshold
    assert D.jaccard_pairs(df, t).collect()[0].jaccard == round(t, 6)


def test_prefix_prunes_candidates(spark, docs_df):
    # candidate pairs through the prefix join must be fewer than the
    # distinct pairs through the full inverted-shingle join
    sh = D.shingle_sets(docs_df)
    full = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id"), F.col("b.id"))
        .distinct()
        .count()
    )
    # reconstruct the operator's candidate set at t=0.8
    from pyspark.sql import Window

    dfc = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    w = Window.partitionBy("id").orderBy(F.col("sdf").asc(), F.col("shingle").asc())
    ranked = (
        sh.join(dfc, "shingle")
        .withColumn("r", F.row_number().over(w))
        .withColumn("n_sh", F.count("*").over(Window.partitionBy("id")))
    )
    plen = F.col("n_sh") - F.ceil(F.lit(0.8) * F.col("n_sh") - F.lit(1e-9)) + 1
    prefix = ranked.where(F.col("r") <= plen).select("id", "shingle")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id"), F.col("b.id"))
        .distinct()
        .count()
    )
    assert cand < full
