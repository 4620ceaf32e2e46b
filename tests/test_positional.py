"""Positional index (operators/positional.py): the stored phrase path
must be rank-identical to the corpus-scan phrase path (shared pinned
semantics), the store roundtrip must prune (partition filter on bucket,
pushed filter on term), and overlap/duplicate-term phrases must count
exactly."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mircv_project_spark import config
from mircv_project_spark.operators import positional as P
from mircv_project_spark.operators.phrase import phrase_topk

DOCS = [
    (0, "spark spark spark joins the table"),
    (1, "the table joins spark"),
    (2, "spark joins spark joins spark"),
    (3, "nothing relevant here"),
    (4, "table joins table joins"),
]
PHRASES = [
    ("p1", "spark spark"),  # duplicate-term phrase: overlap counting
    ("p2", "spark joins"),
    ("p3", "table joins"),
    ("p4", "joins the table"),
    ("p5", "absent phrase"),  # OOV: no rows
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_hand_counts_and_overlap(spark, docs_df):
    pos = P.build_positional_postings(docs_df)
    got = {
        (r.qid, r.id): r.n_hits
        for r in P.phrase_topk_positional(pos, PHRASES).collect()
    }
    # "spark spark spark" holds "spark spark" at positions 0 and 1
    assert got[("p1", 0)] == 2
    assert ("p1", 2) not in got  # "spark joins spark": never adjacent
    assert got[("p2", 2)] == 2
    assert got[("p4", 0)] == 1 and ("p4", 1) not in got
    assert not any(q == "p5" for q, _ in got)


def test_matches_corpus_scan_phrase_path(spark, docs_df):
    pos = P.build_positional_postings(docs_df)
    a = (
        P.phrase_topk_positional(pos, PHRASES)
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    b = (
        phrase_topk(docs_df, PHRASES)
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_store_roundtrip_prunes(spark, docs_df, tmp_path):
    store = str(tmp_path / "posidx")
    P.write_positional_index(P.build_positional_postings(docs_df), store)
    loaded = P.load_positional_postings(spark, store)
    out = P.phrase_topk_positional(loaded, [("p2", "spark joins")])
    # rank identity through the store
    a = out.toPandas().sort_values(["qid", "rank"], ignore_index=True)
    b = (
        phrase_topk(docs_df, [("p2", "spark joins")])
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    # the pruned scan pushes both predicates down to parquet
    from mircv_project_spark.functions.hashing import term_bucket

    buckets = sorted(
        {term_bucket(t, config.POSTINGS_TERM_BUCKETS) for t in ("spark", "joins")}
    )
    pruned = loaded.where(F.col("bucket").isin(buckets)).where(
        F.col("term").isin(["spark", "joins"])
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "PushedFilters" in plan and "term" in plan


def test_proximity_existential_not_greedy(spark):
    """The counterexample from the docstring: tokens place term b at
    offsets 2 and 4 after a at 1, c at 7; slop 3.  A greedy
    minimal-next chain (a1 -> b2 -> needs c in (2,5] -> fail) misses
    the valid a1 -> b4 -> c7 chain — full existential semantics must
    count the hit."""
    #        pos: 0 1 2 3 4 5 6 7
    text = "x a b x b x x c"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    pos = P.build_positional_postings(df)
    got = P.proximity_topk_positional(
        pos, [("q", "a b c")], slop=3, n_buckets=None
    ).collect()
    assert len(got) == 1 and got[0].n_hits == 1


def test_proximity_slop1_equals_exact_phrase(spark, docs_df):
    pos = P.build_positional_postings(docs_df)
    a = (
        P.proximity_topk_positional(pos, PHRASES, slop=1)
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    b = (
        P.phrase_topk_positional(pos, [(q, p) for q, p in PHRASES if len(p.split()) >= 2])
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_proximity_counts_first_term_positions(spark):
    # "a x b a b": a at 0 and 3; slop 2: a0 -> b2 ok, a3 -> b4 ok = 2
    # hits; slop 1: only a3 -> b4 = 1 hit
    df = spark.createDataFrame([(0, "a x b a b")], "doc_id long, text string")
    pos = P.build_positional_postings(df)
    two = P.proximity_topk_positional(pos, [("q", "a b")], slop=2, n_buckets=None).collect()
    one = P.proximity_topk_positional(pos, [("q", "a b")], slop=1, n_buckets=None).collect()
    assert two[0].n_hits == 2
    assert one[0].n_hits == 1


def test_incremental_epoch_append_equals_one_shot(spark, docs_df, tmp_path):
    """Writing half the corpus then appending the rest must answer
    phrase AND proximity queries identically to a one-shot store."""
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    d1 = docs_df.where(F.col("doc_id") < 3)
    d2 = docs_df.where(F.col("doc_id") >= 3)
    P.write_positional_index(P.build_positional_postings(d1), inc)
    P.append_positional_epoch(d2, inc)
    P.write_positional_index(P.build_positional_postings(docs_df), full)
    for fn in (
        lambda s: P.phrase_topk_positional(s, PHRASES),
        lambda s: P.proximity_topk_positional(s, PHRASES, slop=2),
    ):
        a = (
            fn(P.load_positional_postings(spark, inc))
            .toPandas()
            .sort_values(["qid", "rank"], ignore_index=True)
        )
        b = (
            fn(P.load_positional_postings(spark, full))
            .toPandas()
            .sort_values(["qid", "rank"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_uw_proximity_finds_reversed_order(spark):
    """#uw matches terms in ANY order within the window — the ordered
    chain must miss a reversed pair the unordered operator finds."""
    df = spark.createDataFrame(
        [(0, "join spark data"), (1, "spark x join"), (2, "spark far far far far far far join")],
        "doc_id long, text string",
    )
    pos = P.build_positional_postings(df)
    uw = {
        (r["id"], r["n_hits"])
        for r in P.uw_proximity_topk_positional(
            pos, [("q", "spark join")], width=3, k=10
        ).collect()
    }
    # doc 0: anchor 'spark'@1, 'join'@0 within 2 back -> hit (reversed)
    # doc 1: 'spark'@0, 'join'@2 within width-1=2 -> hit
    # doc 2: distance 7 > 2 -> no hit
    assert uw == {(0, 1), (1, 1)}
    ordered = {
        r["id"]
        for r in P.proximity_topk_positional(
            pos, [("q", "spark join")], slop=2, k=10
        ).collect()
    }
    assert 0 not in ordered and 1 in ordered


def test_uw_anchor_counts_are_per_first_term_position(spark):
    """n_hits counts FIRST-term anchors, overlapping windows included."""
    df = spark.createDataFrame(
        [(0, "spark join spark join spark")], "doc_id long, text string"
    )
    pos = P.build_positional_postings(df)
    rows = P.uw_proximity_topk_positional(
        pos, [("q", "spark join")], width=2, k=10
    ).collect()
    # anchors 'spark'@0,2,4: @0 has join@1, @2 has join@1 and @3,
    # @4 has join@3 -> all 3 anchors hit
    assert [(r["id"], r["n_hits"]) for r in rows] == [(0, 3)]
