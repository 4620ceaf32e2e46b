"""Fuzzy retrieval (operators/fuzzy.py): deletion-neighborhood
expansion equals the direct levenshtein join, and the typo query set
is non-trivial on the driver corpus."""

from pyspark.sql import functions as F

from mircv_project_spark import oracle
from mircv_project_spark.operators import scoring
from mircv_project_spark.operators.fuzzy import fuzzy_topk
from mircv_project_spark.operators.spell import deletion_keys_col
from mircv_project_spark.operators.topk import query_terms


def test_expansion_equals_direct_levenshtein(spark, vb_index):
    idx, _ = vb_index
    qt_rows = query_terms(oracle.FUZZY_QUERY_SET, False)
    qdf = spark.createDataFrame(qt_rows, "qid string, qterm string, qtf int")

    qkeys = qdf.select(
        "qid", "qterm", F.explode(deletion_keys_col(F.col("qterm"))).alias("k")
    )
    lkeys = idx.lexicon.select(
        "term", F.explode(deletion_keys_col(F.col("term"))).alias("k")
    )
    via_keys = (
        lkeys.join(F.broadcast(qkeys), "k")
        .select("qid", "qterm", "term")
        .distinct()
        .where(F.levenshtein("qterm", "term") <= 1)
    )
    direct = qdf.join(
        idx.lexicon.select("term"),
        F.levenshtein(qdf.qterm, F.col("term")) <= 1,
    ).select("qid", "qterm", "term")

    assert via_keys.exceptAll(direct).count() == 0
    assert direct.exceptAll(via_keys).count() == 0


def test_typos_recover_matches(spark, vb_index):
    idx, _ = vb_index
    res = fuzzy_topk(idx, oracle.FUZZY_QUERY_SET, scoring.BM25, k=10)
    by_qid = {}
    for r in res.collect():
        by_qid.setdefault(r["qid"], []).append(r)
    # every typo'd query except none should match something: the typos
    # were built at Levenshtein 1 of corpus vocabulary
    for qid, _ in oracle.FUZZY_QUERY_SET:
        assert by_qid.get(qid), qid


def test_all_oov_query_empty(spark, vb_index):
    idx, _ = vb_index
    assert fuzzy_topk(idx, [("x", "warpcoreq zzzzzzz")], k=5).count() == 0


def test_expansion_plans_are_equi_joins(spark, vb_index):
    """The whole point of the deletion-key / substring-key formulations
    is avoiding a vocabulary-wide nested-loop predicate join — pin it."""
    from mircv_project_spark.operators.fuzzy import prefix_topk
    from mircv_project_spark.plans import checks

    idx, _ = vb_index
    fz = fuzzy_topk(idx, oracle.FUZZY_QUERY_SET, scoring.BM25, k=10)
    pf = prefix_topk(idx, oracle.PREFIX_QUERY_SET, scoring.BM25, k=10)
    for df in (fz, pf):
        plan = checks.plan_text(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan


def test_prefix_topk_matches_manual_expansion(spark, vb_index):
    """prefix_topk == exhaustive_topk over the manually expanded term
    list with qtf=1 per expanded term (the wildcard-OR semantics)."""
    from mircv_project_spark.operators.fuzzy import prefix_topk
    from mircv_project_spark.operators.topk import exhaustive_topk

    idx, _ = vb_index
    terms = [r["term"] for r in idx.lexicon.select("term").collect()]
    prefix = "sp"
    expansion = sorted(t for t in terms if t.startswith(prefix))
    assert expansion, "corpus must have sp* terms"
    got = prefix_topk(idx, [("w", prefix)], scoring.BM25, k=10).collect()
    want = exhaustive_topk(idx, [("w", " ".join(expansion))], scoring.BM25, k=10).collect()
    assert [(r.docno, r.rank, r.score) for r in got] == [
        (r.docno, r.rank, r.score) for r in want
    ]
