"""Hand-computed checks for the evaluation stage (MAP/nDCG oracle
equality is covered by the gate entry bm25_eval_metrics; the PR curve
by bm25_pr_curve).  These pin the textbook arithmetic on a tiny run
where every value is computable by hand."""

from mircv_project_spark.operators.evaluation import pr_curve


def _run_df(spark, rows):
    return spark.createDataFrame(
        rows, "qid string, docno string, rank long, score double"
    )


def _qrels_df(spark, rows):
    return spark.createDataFrame(rows, "qid string, docno string, grade int")


def test_pr_curve_hand_computed(spark):
    """R=2 relevant, retrieved at ranks 1 and 3 of 3:
    recall after rank 1 = 1/2, after 3 = 1.  precision: 1/1, 1/2, 2/3.
    Levels 0-5 (recall <= 0.5): max precision over ranks with
    10*cum >= L*2 → rank 1 qualifies for L<=5 → p=1.0.
    Levels 6-10: only rank 3 qualifies → p=2/3."""
    run = _run_df(
        spark,
        [("q", "a", 1, 3.0), ("q", "b", 2, 2.0), ("q", "c", 3, 1.0)],
    )
    qrels = _qrels_df(spark, [("q", "a", 1), ("q", "c", 2)])
    got = {
        r["level"]: r["p_interp"] for r in pr_curve(run, qrels, k=10).collect()
    }
    assert got == {
        **{lv: 1.0 for lv in range(0, 6)},
        **{lv: round(2 / 3, 6) for lv in range(6, 11)},
    }


def test_pr_curve_unreached_levels_are_zero_and_no_rel_omitted(spark):
    """A run that never retrieves the only relevant doc: level 0
    qualifies trivially (10*0 >= 0*R) with precision 0/... — max over
    cum=0 ranks is 0.0; levels 1+ have no qualifying rank → 0.0.
    A query with NO relevant docs emits nothing."""
    run = _run_df(
        spark, [("q", "x", 1, 1.0), ("empty", "y", 1, 1.0)]
    )
    qrels = _qrels_df(spark, [("q", "z", 3)])
    rows = pr_curve(run, qrels, k=10).collect()
    assert {r["qid"] for r in rows} == {"q"}
    assert all(r["p_interp"] == 0.0 for r in rows)
    assert len(rows) == 11


def test_ranker_comparison_consistency(spark, vb_index):
    """The comparison row must restate evaluate_run's APs for both
    rankers and the winner must follow the round-6 compare."""
    from mircv_project_spark import oracle
    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.operators.evaluation import (
        evaluate_run,
        ranker_comparison,
        synthetic_qrels,
    )
    from mircv_project_spark.operators.qld import qld_topk

    idx, _ = vb_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r["qid"]: (r["ap_bm25"], r["ap_qld"], r["winner"])
        for r in ranker_comparison(idx, docs, oracle.QUERY_SET).collect()
    }
    qrels = synthetic_qrels(docs, oracle.QUERY_SET)
    eb = {
        r["qid"]: r["ap"]
        for r in evaluate_run(
            topk.exhaustive_topk(idx, oracle.QUERY_SET, scoring.BM25, k=10),
            qrels,
        ).collect()
    }
    eq = {
        r["qid"]: r["ap"]
        for r in evaluate_run(
            qld_topk(idx, oracle.QUERY_SET, k=10), qrels
        ).collect()
    }
    assert set(got) == set(eb) == set(eq)
    for qid, (ab, aq, w) in got.items():
        assert ab == eb[qid] and aq == eq[qid]
        assert w == ("bm25" if ab > aq else "qld" if ab < aq else "tie")


def test_mrr_metrics_hand_computed(spark):
    """q1: relevant docs {a, c, z} (R=3), retrieved a@2, c@3 of top-10
    → rr = 1/2, recall = 2/3, success = 1.
    q2: relevant {m} never retrieved → rr = 0.0, recall = 0.0,
    success = 0.  q3 has no relevant docs → omitted."""
    from mircv_project_spark.operators.evaluation import mrr_metrics

    run = _run_df(
        spark,
        [
            ("q1", "b", 1, 3.0), ("q1", "a", 2, 2.0), ("q1", "c", 3, 1.0),
            ("q2", "x", 1, 1.0),
            ("q3", "y", 1, 1.0),
        ],
    )
    qrels = _qrels_df(
        spark,
        [("q1", "a", 1), ("q1", "c", 2), ("q1", "z", 3), ("q2", "m", 1)],
    )
    got = {
        r["qid"]: (r["rr"], r["recall"], r["success"])
        for r in mrr_metrics(run, qrels, k=10).collect()
    }
    assert got == {
        "q1": (0.5, round(2 / 3, 6), 1),
        "q2": (0.0, 0.0, 0),
    }


def test_mrr_metrics_k_cut(spark):
    """First relevant sits past k → treated as not retrieved."""
    from mircv_project_spark.operators.evaluation import mrr_metrics

    run = _run_df(spark, [("q", "a", 1, 2.0), ("q", "r", 2, 1.0)])
    qrels = _qrels_df(spark, [("q", "r", 1)])
    rows = mrr_metrics(run, qrels, k=1).collect()
    assert [(r["rr"], r["recall"], r["success"]) for r in rows] == [
        (0.0, 0.0, 0)
    ]


def test_rbp_err_hand_computed(spark):
    """q1 grades by rank: 3, 1, 0.
    RBP(p=1/2) = 2^-1 + 2^-2 = 0.75 (grade>0 at ranks 1,2).
    ERR(gmax=3): r=1 term (7/8) = 0.875; r=2 term (1/2)(1/8)(1/8) =
    1/128 → micro = round(1e6/128) = round(7812.5) = 7813 — an EXACT
    .5 quantizer tie, pinned HALF_UP on both engines; r=3 grade 0 → 0.
    err = 0.882813.  q2 has no relevant docs but still emits a row
    (0.0, 0.0) — RBP/ERR are unnormalized by R."""
    from mircv_project_spark.operators.evaluation import rbp_err_metrics

    run = _run_df(
        spark,
        [
            ("q1", "a", 1, 3.0), ("q1", "b", 2, 2.0), ("q1", "c", 3, 1.0),
            ("q2", "x", 1, 1.0),
        ],
    )
    qrels = _qrels_df(spark, [("q1", "a", 3), ("q1", "b", 1)])
    got = {
        r["qid"]: (r["rbp"], r["err"])
        for r in rbp_err_metrics(run, qrels, k=10).collect()
    }
    assert got == {"q1": (0.75, 0.882813), "q2": (0.0, 0.0)}


def test_rbp_err_k_cut(spark):
    """A grade-3 hit past k contributes to neither metric."""
    from mircv_project_spark.operators.evaluation import rbp_err_metrics

    run = _run_df(spark, [("q", "a", 1, 2.0), ("q", "r", 2, 1.0)])
    qrels = _qrels_df(spark, [("q", "r", 3)])
    rows = rbp_err_metrics(run, qrels, k=1).collect()
    assert [(r["rbp"], r["err"]) for r in rows] == [(0.0, 0.0)]


def test_ranker_tau_matches_bruteforce(spark, vb_index):
    """tau recomputed brute-force in Python from the engine's own two
    rankings must equal the operator's output exactly."""
    from itertools import combinations

    from mircv_project_spark import oracle
    from mircv_project_spark.operators import scoring
    from mircv_project_spark.operators.evaluation import ranker_tau
    from mircv_project_spark.operators.qld import qld_topk
    from mircv_project_spark.operators.topk import exhaustive_topk

    idx, _ = vb_index
    k = oracle.TOPK_K
    a = {
        (r["qid"], int(r["docno"])): r["rank"]
        for r in exhaustive_topk(idx, oracle.QUERY_SET, scoring.BM25, k=k).collect()
    }
    b = {
        (r["qid"], int(r["docno"])): r["rank"]
        for r in qld_topk(idx, oracle.QUERY_SET, k=k).collect()
    }
    expect = {}
    qids = {q for q, _ in a} | {q for q, _ in b}
    for qid in qids:
        common = sorted(
            d for (q, d) in a if q == qid and (qid, d) in b
        )
        n = len(common)
        if n < 2:
            continue
        c = d_ = 0
        for d1, d2 in combinations(common, 2):
            prod = (a[(qid, d1)] - a[(qid, d2)]) * (b[(qid, d1)] - b[(qid, d2)])
            if prod > 0:
                c += 1
            else:
                d_ += 1
        expect[qid] = (n, c, d_, round((c - d_) / (n * (n - 1) / 2), 6))

    got = {
        r["qid"]: (r["n_common"], r["concordant"], r["discordant"], r["tau"])
        for r in ranker_tau(idx, oracle.QUERY_SET, k=k).collect()
    }
    assert got == expect and got


def test_ranker_tau_self_agreement_is_one(spark, vb_index):
    """Degenerate check via the operator's own math: any query where
    the two rankers fully agree on the common set must emit tau=1."""
    from mircv_project_spark import oracle
    from mircv_project_spark.operators.evaluation import ranker_tau

    idx, _ = vb_index
    rows = ranker_tau(idx, oracle.QUERY_SET, k=oracle.TOPK_K).collect()
    for r in rows:
        if r["discordant"] == 0:
            assert r["tau"] == 1.0
        assert r["concordant"] + r["discordant"] == (
            r["n_common"] * (r["n_common"] - 1) // 2
        )


def test_ranker_rbo_matches_bruteforce(spark, vb_index):
    """RBO recomputed brute-force in Python from the engine's own two
    rankings must equal the operator's output exactly (p=1/2, per-depth
    micro quantization)."""
    from mircv_project_spark import oracle
    from mircv_project_spark.operators import scoring
    from mircv_project_spark.operators.evaluation import ranker_rbo
    from mircv_project_spark.operators.qld import qld_topk
    from mircv_project_spark.operators.topk import exhaustive_topk

    idx, _ = vb_index
    k = oracle.TOPK_K
    a = {
        (r["qid"], int(r["docno"])): r["rank"]
        for r in exhaustive_topk(idx, oracle.QUERY_SET, scoring.BM25, k=k).collect()
    }
    b = {
        (r["qid"], int(r["docno"])): r["rank"]
        for r in qld_topk(idx, oracle.QUERY_SET, k=k).collect()
    }
    qids = {q for q, _ in a} & {q for q, _ in b}
    expect = {}
    for qid in qids:
        ms = [
            max(a[(qid, d)], b[(qid, d)])
            for (q, d) in a
            if q == qid and (qid, d) in b
        ]
        micro = 0
        for dep in range(1, k + 1):
            x = sum(1 for m in ms if m <= dep)
            v = ((float(x) * 0.5 ** dep) * 1e6) / float(dep)
            micro += int(v + 0.5)  # positive HALF_UP
        expect[qid] = (len(ms), round(micro / 1e6, 6))

    got = {
        r["qid"]: (r["n_common"], r["rbo"])
        for r in ranker_rbo(idx, oracle.QUERY_SET, k=k).collect()
    }
    assert got == expect and got
    assert all(0.0 <= v[1] <= 1.0 for v in got.values())


def test_ranker_sign_test_matches_scipy_free_binomial(spark, vb_index):
    """The exact p equals a hand-computed binomial tail over the
    comparison's own winners (math.comb, no scipy)."""
    import math

    from mircv_project_spark import oracle
    from mircv_project_spark.operators.evaluation import (
        ranker_comparison,
        ranker_sign_test,
    )

    idx, _ = vb_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cmp_rows = ranker_comparison(
        idx, docs, oracle.QUERY_SET, k=oracle.TOPK_K
    ).collect()
    wb = sum(1 for r in cmp_rows if r.winner == "bm25")
    wq = sum(1 for r in cmp_rows if r.winner == "qld")
    n = wb + wq
    kmin = min(wb, wq)
    num = sum(
        math.comb(n, j)
        for j in range(n + 1)
        if j <= kmin or j >= n - kmin
    )
    v = int(min(1_000_000, int(1e6 * float(num) / (2.0 ** n) + 0.5)))

    got = ranker_sign_test(
        idx, docs, oracle.QUERY_SET, k=oracle.TOPK_K
    ).collect()[0]
    assert (got.wins_bm25, got.wins_qld, got.n_eff) == (wb, wq, n)
    assert got.p_micro == v
    assert 0 <= got.p_micro <= 1_000_000
