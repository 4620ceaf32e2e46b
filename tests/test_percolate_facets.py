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
