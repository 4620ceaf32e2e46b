"""Edge semantics for reverse search and facet counts (oracle
equality at sf0.01 is covered by the gate entries percolate /
facet_counts)."""

from mircv_project_spark.operators.facets import facet_counts
from mircv_project_spark.operators.percolate import percolate


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_percolate_is_conjunctive_and_oov_never_matches(spark):
    docs = _docs(
        spark,
        [
            (0, "spark join fast", "en", "a"),
            (1, "spark only here", "en", "a"),
            (2, "join spark join spark", "en", "b"),
        ],
    )
    qs = [
        ("q1", "spark join"),      # docs 0, 2 (both terms)
        ("q2", "spark zzmissing"), # zzmissing nowhere -> no matches
        ("q3", "spark"),           # all three docs
    ]
    got = sorted(
        (r["qid"], r["doc_id"], r["n_terms"])
        for r in percolate(docs, qs).collect()
    )
    assert got == [
        ("q1", 0, 2), ("q1", 2, 2),
        ("q3", 0, 1), ("q3", 1, 1), ("q3", 2, 1),
    ]


def test_facets_count_full_match_set_disjunctively(spark):
    docs = _docs(
        spark,
        [
            (0, "spark x", "en", "a"),
            (1, "join y", "en", "b"),
            (2, "spark join", "zh", "b"),
            (3, "nothing here", "en", "a"),
        ],
    )
    got = {
        (r["qid"], r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(docs, [("q", "spark join")]).collect()
    }
    # disjunctive match set = docs 0, 1, 2 (doc 3 matches nothing)
    assert got == {
        ("q", "source", "a"): 1,
        ("q", "source", "b"): 2,
        ("q", "lang", "en"): 2,
        ("q", "lang", "zh"): 1,
    }


def test_significant_terms_hand_computed(spark):
    """fg = docs matching 'needle' = {1, 2}; 'marker' is in both fg
    docs but only 2 of 6 corpus docs -> strongly significant; 'common'
    is everywhere -> fp == bp -> dropped; the query's own term drops."""
    from mircv_project_spark.operators.facets import significant_terms

    docs = spark.createDataFrame(
        [
            (1, "needle marker common alpha"),
            (2, "needle marker common beta"),
            (3, "common filler words"),
            (4, "common filler words"),
            (5, "common other things"),
            (6, "common other things"),
        ],
        "doc_id long, text string",
    )
    rows = significant_terms(docs, [("q", "needle")], k=10).collect()
    got = {r["term"]: r for r in rows}
    assert "needle" not in got  # self-term excluded
    assert "common" not in got  # fp == bp -> micro 0 -> dropped
    # marker: fp = 2/2 = 1, bp = 2/6; score = (1 - 1/3) * (1 / (1/3)) = 2
    assert got["marker"]["fg_df"] == 2 and got["marker"]["bg_df"] == 2
    assert got["marker"]["score"] == 2.0
    assert got["marker"]["rank"] == 1
    # alpha/beta: fp = 1/2, bp = 1/6; score = (1/2 - 1/6) * 3 = 1
    assert got["alpha"]["score"] == 1.0 and got["beta"]["score"] == 1.0
    # tie broken term-asc
    assert got["alpha"]["rank"] == 2 and got["beta"]["rank"] == 3


def test_significant_terms_no_match_query_empty(spark):
    from mircv_project_spark.operators.facets import significant_terms

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    assert significant_terms(docs, [("q", "zzzmissing")]).count() == 0


def test_streaming_percolate_equals_batch_and_is_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.percolate import percolate
    from mircv_project_spark.streaming.percolate_stream import (
        read_percolate_matches,
        run_percolate_stream,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "en", "s1", 16),
            (2, "alpha beta", "en", "s1", 10),
            (3, "gamma delta", "en", "s2", 11),
            (4, "beta gamma alpha", "en", "s2", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    queries = [("q1", "alpha beta"), ("q2", "gamma"), ("q3", "zzz")]
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.where(F.col("doc_id") <= 2).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_percolate_stream(spark, inp, out, ckpt, queries).awaitTermination(120)
    docs.where(F.col("doc_id") > 2).coalesce(1).write.mode("append").parquet(
        inp
    )
    run_percolate_stream(spark, inp, out, ckpt, queries).awaitTermination(120)

    want = sorted(tuple(r) for r in percolate(docs, queries).collect())
    got = sorted(
        tuple(r) for r in read_percolate_matches(spark, out).collect()
    )
    assert got == want and got  # non-empty

    # replay with NO new input: checkpointed offsets make it a no-op
    run_percolate_stream(spark, inp, out, ckpt, queries).awaitTermination(120)
    again = sorted(
        tuple(r) for r in read_percolate_matches(spark, out).collect()
    )
    assert again == want


def test_regex_topk_hand_computed(spark):
    """Non-overlapping counting ('aa' in 'aaaa' -> 2), alternation,
    rank ties by id, zero-match patterns emit nothing."""
    from mircv_project_spark.operators.substring import regex_topk

    docs = spark.createDataFrame(
        [
            (1, "aaaa bb"),
            (2, "aa aa aa"),
            (3, "query quick quart"),
            (4, "nothing here"),
        ],
        "doc_id long, text string",
    )
    pats = [("p1", "aa"), ("p2", "qu(ery|ick)"), ("p3", "zz+")]
    rows = sorted(
        tuple(r) for r in regex_topk(docs, pats, k=10).collect()
    )
    assert rows == [
        ("p1", 1, 2, 2),   # 'aaaa' -> 2 non-overlapping
        ("p1", 2, 3, 1),
        ("p2", 3, 2, 1),   # query + quick; 'quart' not matched
    ]
