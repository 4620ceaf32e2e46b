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


def test_store_view_serves_expansion_paths(spark, vb_index, tmp_path):
    """CLI route: fuzzy / prefix / QLD served from a PERSISTED store
    through IndexReader.as_index_view must be rank-identical to the
    in-memory index, and the pruned view must only decode the
    requested terms' blocks."""
    from mircv_project_spark.operators.index_build import write_index
    from mircv_project_spark.operators.qld import qld_topk
    from mircv_project_spark.operators.topk import query_terms
    from mircv_project_spark.sources.index_store import IndexReader

    idx, _ = vb_index
    out = str(tmp_path / "index")
    write_index(idx, out)
    reader = IndexReader.from_dir(spark, out)

    def rows(df):
        return sorted(
            (r["qid"], r["rank"], r["docno"], r["score"]) for r in df.collect()
        )

    # QLD through the term-pruned view
    terms = sorted({t for _, t, _ in query_terms(oracle.QUERY_SET, False)})
    view = reader.as_index_view(terms=terms)
    assert rows(qld_topk(view, oracle.QUERY_SET, k=10)) == rows(
        qld_topk(idx, oracle.QUERY_SET, k=10)
    )
    # the pruned view's flat contains ONLY the requested terms
    extra = view.flat.select("term").distinct().collect()
    assert {r["term"] for r in extra} <= set(terms)

    # fuzzy through an expanded-term view (the scripts/query.py route)
    expanded = [
        r["term"]
        for r in idx.lexicon.join(
            spark.createDataFrame(
                [(t,) for t in {t for _, t, _ in query_terms(oracle.FUZZY_QUERY_SET, False)}],
                "qterm string",
            ),
            F.levenshtein(F.col("term"), F.col("qterm")) <= 1,
        ).select("term").distinct().collect()
    ]
    fview = reader.as_index_view(terms=expanded)
    assert rows(fuzzy_topk(fview, oracle.FUZZY_QUERY_SET, k=10)) == rows(
        fuzzy_topk(idx, oracle.FUZZY_QUERY_SET, k=10)
    )


def test_wildcard_equals_manual_like_expansion(spark, vb_index):
    """The two-sided substring equi-join + length guard must equal a
    manual starts-with/ends-with/non-overlap expansion fed through the
    same wildcard-OR scorer — including y-style patterns whose literal
    parts could overlap on short terms."""
    from mircv_project_spark.operators.fuzzy import wildcard_topk
    from mircv_project_spark.operators.topk import _score_and_rank

    idx, _ = vb_index
    qs = [("y1", "s*k"), ("y2", "c*er"), ("y3", "s*s"), ("y4", "zz*zz")]
    got = sorted(map(tuple, wildcard_topk(idx, qs, k=10).collect()))
    exp = None
    for qid, pat in qs:
        pre, _, suf = pat.partition("*")
        terms = [
            r["term"]
            for r in idx.lexicon.collect()
            if r["term"].startswith(pre)
            and r["term"].endswith(suf)
            and len(r["term"]) >= len(pre) + len(suf)
        ]
        if not terms:
            continue
        part = idx.lexicon.where(F.col("term").isin(terms)).select(
            F.lit(qid).alias("qid"), F.lit(1).alias("qtf"), "term", "df"
        )
        exp = part if exp is None else exp.unionByName(part)
    matched = idx.flat.join(F.broadcast(exp), "term")
    want = sorted(
        map(
            tuple,
            _score_and_rank(
                matched, scoring.BM25, idx.n_docs, idx.avgdl, 10, False, {}
            ).collect(),
        )
    )
    assert got == want and got


def test_wildcard_overlap_guard_excludes_short_terms(spark, vb_index):
    """A term shorter than len(pre)+len(suf) must NOT match even when
    it both starts with pre and ends with suf (LIKE 'pre%suf' can't
    place the % inside overlapping literals) — build a probe expansion
    directly to pin the guard."""
    from mircv_project_spark.operators.fuzzy import wildcard_topk

    idx, _ = vb_index
    # find any term t and probe pattern t[0]*t[-1]; a single-char term
    # 'x' must never match pattern 'x*x'
    one = [r["term"] for r in idx.lexicon.collect() if len(r["term"]) == 1]
    if not one:
        return
    t = one[0]
    res = wildcard_topk(idx, [("g", f"{t}*{t}")], k=500).collect()
    # docs that contain ONLY the 1-char term among pattern-compatible
    # terms would appear iff the guard leaked; verify via expansion
    leak = [
        r["term"]
        for r in idx.lexicon.collect()
        if r["term"].startswith(t) and r["term"].endswith(t)
        and len(r["term"]) < 2
    ]
    assert leak == [t]  # the 1-char term is the only possible leak
    matched_terms = {
        r["term"]
        for r in idx.lexicon.collect()
        if r["term"].startswith(t) and r["term"].endswith(t)
        and len(r["term"]) >= 2
    }
    if not matched_terms:
        assert res == []


def test_wildcard_plan_is_equi_join(spark, vb_index):
    from mircv_project_spark.operators.fuzzy import wildcard_topk
    from mircv_project_spark.plans import checks

    idx, _ = vb_index
    wc = wildcard_topk(idx, oracle.WILDCARD_QUERY_SET, scoring.BM25, k=10)
    plan = checks.plan_text(wc)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_suffix_equals_manual_endswith_expansion(spark, vb_index):
    """The reversed-term equi-join must equal a manual ends-with
    expansion fed through the same wildcard-OR scorer."""
    from pyspark.sql import functions as F

    from mircv_project_spark.operators import scoring
    from mircv_project_spark.operators.fuzzy import suffix_topk
    from mircv_project_spark.operators.topk import _score_and_rank

    idx, _ = vb_index
    qs = [("x1", "er"), ("x2", "ow"), ("x3", "zz")]
    got = sorted(
        map(tuple, suffix_topk(idx, qs, k=10).collect())
    )
    spark_ = idx.flat.sparkSession
    exp = None
    for qid, suf in qs:
        terms = [
            r["term"]
            for r in idx.lexicon.where(F.col("term").endswith(suf)).collect()
        ]
        if not terms:
            continue
        part = idx.lexicon.where(F.col("term").isin(terms)).select(
            F.lit(qid).alias("qid"), F.lit(1).alias("qtf"), "term", "df"
        )
        exp = part if exp is None else exp.unionByName(part)
    matched = idx.flat.join(F.broadcast(exp), "term")
    want = sorted(
        map(
            tuple,
            _score_and_rank(
                matched, scoring.BM25, idx.n_docs, idx.avgdl, 10, False, {}
            ).collect(),
        )
    )
    assert got == want and got
