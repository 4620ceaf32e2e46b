"""Retrieval-quality evaluation: MAP@k and nDCG@k per query.

The reference's evaluation chapter scores TREC runs with trec_eval
against qrels (SURVEY §5.1: evaluation/qrels.txt, MAP@20 / nDCG@20).
This module reproduces that step as DataFrame ops:

- ``synthetic_qrels``: deterministic relevance judgments over the test
  corpus — grade = min(3, #distinct query terms contained in the doc)
  (noparse tokens), graded 1-3, 0/absent = not relevant.  No external
  data; the DuckDB oracle restates the same derivation.
- ``evaluate_run``: standard definitions over a TREC-shaped run
  (qid, docno, rank, score):
      AP@k    = sum_r  rel_r * (cum_rel_r / r) / R,   R = |relevant|
      nDCG@k  = DCG@k / IDCG@k,  DCG = sum_r (2^grade - 1)/log2(r+1)
  Queries with no relevant docs are omitted (trec_eval behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col


def synthetic_qrels(
    docs: DataFrame, queries: list[tuple[str, str]], id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (qid, docno string, grade int) for grade > 0 only."""
    from .topk import query_terms

    spark = docs.sparkSession
    qt = spark.createDataFrame(
        [(q, t) for q, t, _ in query_terms(queries, parse=False)],
        "qid string, term string",
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("docno_l"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("term"),
    )
    matched = toks.join(F.broadcast(qt), "term").groupBy("qid", "docno_l").agg(
        F.count("*").alias("matched")
    )
    return matched.select(
        "qid",
        F.col("docno_l").cast("string").alias("docno"),
        F.least(F.col("matched"), F.lit(3)).cast("int").alias("grade"),
    )


def evaluate_run(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """run (qid, docno, rank, score) + qrels (qid, docno, grade)
    -> (qid, ap, ndcg) rounded to 6, one row per qid with >=1 relevant."""
    run_k = run.where(F.col("rank") <= k)
    joined = run_k.join(qrels, ["qid", "docno"], "left").withColumn(
        "grade", F.coalesce(F.col("grade"), F.lit(0))
    )
    w = Window.partitionBy("qid").orderBy("rank")
    rel = (F.col("grade") > 0).cast("int")
    per_rank = joined.withColumn("rel", rel).withColumn(
        "cum_rel", F.sum("rel").over(w)
    )
    dcg_term = (F.pow(F.lit(2.0), F.col("grade")) - 1.0) / F.log2(
        F.col("rank") + 1.0
    )
    agg = per_rank.groupBy("qid").agg(
        F.sum(F.col("rel") * F.col("cum_rel") / F.col("rank")).alias("ap_num"),
        F.sum(dcg_term).alias("dcg"),
    )
    # R = total relevant per qid; IDCG = ideal DCG over top-k grades
    r_tot = qrels.groupBy("qid").agg(F.count("*").alias("r_total"))
    wq = Window.partitionBy("qid").orderBy(F.col("grade").desc(), F.col("docno"))
    ideal = (
        qrels.withColumn("irank", F.row_number().over(wq))
        .where(F.col("irank") <= k)
        .groupBy("qid")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("grade")) - 1.0)
                / F.log2(F.col("irank") + 1.0)
            ).alias("idcg")
        )
    )
    return (
        agg.join(r_tot, "qid")
        .join(ideal, "qid")
        .select(
            "qid",
            F.round(F.col("ap_num") / F.col("r_total"), 6).alias("ap"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
    )


def pr_curve(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """11-point interpolated precision-recall curve per query — the
    third trec_eval artifact beside MAP/nDCG (SURVEY §5.1).

    -> (qid, level, p_interp): level L = recall threshold L/10,
    p_interp(L) = max precision over ranks whose recall reaches L,
    0.0 when no rank does; queries with no relevant docs are omitted
    (trec_eval behavior, same as evaluate_run).

    Exactness: the recall test is cross-multiplied to pure integers
    (10·cum_rel >= L·R — no float recall ever exists); precision
    cum_rel/rank is one double division per rank, the max over them
    is order-independent, round 6 once at the end."""
    spark = run.sparkSession
    run_k = run.where(F.col("rank") <= k)
    j = run_k.join(qrels, ["qid", "docno"], "left").withColumn(
        "rel", (F.coalesce(F.col("grade"), F.lit(0)) > 0).cast("int")
    )
    w = Window.partitionBy("qid").orderBy("rank")
    pr = j.select(
        "qid", "rank", F.sum("rel").over(w).cast("long").alias("cum")
    )
    rtot = qrels.groupBy("qid").agg(F.count("*").cast("long").alias("r_total"))
    levels = spark.range(0, 11).select(F.col("id").cast("long").alias("level"))
    grid = rtot.crossJoin(F.broadcast(levels))
    qual = (
        grid.join(pr, "qid")
        .where(
            F.lit(10) * F.col("cum") >= F.col("level") * F.col("r_total")
        )
        .groupBy("qid", "level")
        .agg(
            F.max(
                F.col("cum").cast("double") / F.col("rank").cast("double")
            ).alias("p")
        )
    )
    return grid.join(qual, ["qid", "level"], "left").select(
        "qid",
        "level",
        F.round(F.coalesce(F.col("p"), F.lit(0.0)), 6).alias("p_interp"),
    )


def mrr_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Reciprocal rank / recall@k / success@k per query — the remaining
    trec_eval headline numbers beside MAP/nDCG/PR (recip_rank,
    recall_N, success_N).

    -> (qid, rr, recall, success): rr = 1/rank of the FIRST relevant
    result in the top-k (0.0 when none), recall = |relevant in top-k| /
    R, success = 1 if any relevant in top-k else 0.  Queries with no
    relevant docs are omitted (trec_eval behavior, same as
    evaluate_run).

    Exactness: first-rank and hit counts are integers (min/count aggs);
    rr and recall are ONE double division each, rounded 6 — no float
    accumulations anywhere."""
    run_k = run.where(F.col("rank") <= k)
    j = run_k.join(qrels, ["qid", "docno"], "left").where(
        F.coalesce(F.col("grade"), F.lit(0)) > 0
    )
    per_q = j.groupBy("qid").agg(
        F.min("rank").cast("long").alias("frank"),
        F.count("*").cast("long").alias("hits"),
    )
    r_tot = qrels.groupBy("qid").agg(F.count("*").cast("long").alias("r_total"))
    return r_tot.join(per_q, "qid", "left").select(
        "qid",
        F.round(
            F.when(
                F.col("frank").isNotNull(),
                F.lit(1.0) / F.col("frank").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rr"),
        F.round(
            F.coalesce(F.col("hits"), F.lit(0).cast("long")).cast("double")
            / F.col("r_total").cast("double"),
            6,
        ).alias("recall"),
        F.col("frank").isNotNull().cast("int").alias("success"),
    )


def rbp_err_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Rank-biased precision (Moffat & Zobel TOIS 2008, p = 1/2) and
    expected reciprocal rank (Chapelle et al. CIKM 2009, gmax = 3) per
    query — the two post-trec_eval headline metrics built on graded
    judgments: RBP models a persistence-p browsing user, ERR a cascade
    user who stops at the first satisfying result.

    -> (qid, rbp, err), one row per qid in the run (both metrics are
    unnormalized by R, so zero-relevant queries emit 0.0/0.0 rather
    than being omitted).

    Exactness contract (restated in oracle._rbp_err_sql — change both
    sides or neither):
    - RBP at p = 1/2: rbp = sum_r rel_r * 2^-r — each term is a
      distinct binary digit (r <= k <= 52), so the double sum is exact
      and shuffle-order-independent; round 6 once.
    - ERR at gmax = 3: R_r = (2^g_r - 1)/8 and the stop-probability
      prefix  prod_{j<r}(1 - R_j) = (8^n0 * 7^n1 * 5^n2 * 1^n3)/8^(r-1)
      where n_G = |{j < r : g_j = G}| — CUMULATIVE GRADE COUNTS, i.e.
      plain window sums; the integer numerator is <= 8^(k-1) (exact in
      BIGINT and in double for k <= 10), the denominator r * 8^r <=
      k * 2^(3k) exact.  Per-rank contribution is ONE double division
      micro-quantized to BIGINT (round(1e6 * num / den)) BEFORE the
      per-query sum (a float sum of cascade terms would be
      shuffle-order-dependent at round 6); err = sum_micro / 1e6,
      round 6.  k must stay <= 10: 1e6 * 7 * 8^9 < 2^53 is what keeps
      the quantizer's numerator exact."""
    run_k = run.where(F.col("rank") <= k)
    j = run_k.join(qrels, ["qid", "docno"], "left").withColumn(
        "grade", F.coalesce(F.col("grade"), F.lit(0)).cast("int")
    )
    wprev = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    def _cnt(g: int):
        return F.coalesce(
            F.sum((F.col("grade") == g).cast("long")).over(wprev),
            F.lit(0).cast("long"),
        )

    # prefix numerator of prod_{j<r}(1 - R_j): m(g) = 8 - (2^g - 1)
    pnum = (
        F.pow(F.lit(8.0), _cnt(0))
        * F.pow(F.lit(7.0), _cnt(1))
        * F.pow(F.lit(5.0), _cnt(2))
    ).cast("long")
    num = (F.pow(F.lit(2.0), F.col("grade")).cast("long") - F.lit(1)) * pnum
    den = (F.col("rank").cast("double") * F.pow(F.lit(8.0), F.col("rank"))).cast(
        "long"
    )
    per_rank = j.select(
        "qid",
        (
            (F.col("grade") > 0).cast("double")
            / F.pow(F.lit(2.0), F.col("rank"))
        ).alias("rbp_term"),
        F.round(
            F.lit(1000000.0) * num.cast("double") / den.cast("double"), 0
        )
        .cast("long")
        .alias("err_micro"),
    )
    return per_rank.groupBy("qid").agg(
        F.round(F.sum("rbp_term"), 6).alias("rbp"),
        F.round(F.sum("err_micro").cast("double") / F.lit(1000000.0), 6).alias(
            "err"
        ),
    )


BPREF_REL_MIN = 2  # judged relevant = grade >= 2; judged nonrel = grade 1


def bpref_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Binary preference (Buckley & Voorhees SIGIR 2004) — the
    incomplete-judgments metric trec_eval reports beside MAP:

        bpref = (1/R) * sum_{r in relevant retrieved}
                    (1 - min(n_above_r, R) / min(R, N))

    where R / N are the judged-relevant / judged-nonrelevant pool
    sizes and n_above_r counts judged NONRELEVANT results ranked above
    r; unjudged results are invisible (the metric's whole point).

    The synthetic qrels are graded 1-3 with no explicit nonrelevant
    pool, so the judged split is pinned at BPREF_REL_MIN: relevant =
    grade >= 2 (>= 2 distinct query terms), judged nonrelevant =
    grade 1 (restated in oracle._bpref_sql — change both or neither).

    Exactness: n_above (window sum over the run), R, N, and the
    relevant-retrieved count are integers; the per-result penalty
    min(n_above, R)/min(R, N) is ONE double division micro-quantized
    to BIGINT before the per-query sum (a float sum would be
    shuffle-order-dependent at round 6); bpref = (n_rel_ret*1e6 -
    sum_penalty) / (R*1e6), round 6.  N == 0 pins the penalty to 0
    (trec_eval's guard: every relevant retrieved contributes 1);
    queries with R == 0 are omitted (trec_eval behavior).

    -> (qid, r_total, n_total, n_rel_ret, bpref)."""
    run_k = run.where(F.col("rank") <= k)
    j = run_k.join(qrels, ["qid", "docno"], "left").withColumn(
        "grade", F.coalesce(F.col("grade"), F.lit(0)).cast("int")
    )
    wprev = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    jnon = (F.col("grade") == 1).cast("long")
    per_rank = j.withColumn(
        "n_above", F.coalesce(F.sum(jnon).over(wprev), F.lit(0).cast("long"))
    ).where(F.col("grade") >= F.lit(BPREF_REL_MIN))
    pools = qrels.groupBy("qid").agg(
        F.sum((F.col("grade") >= F.lit(BPREF_REL_MIN)).cast("long"))
        .alias("r_total"),
        F.sum((F.col("grade") == 1).cast("long")).alias("n_total"),
    ).where(F.col("r_total") > 0)
    pen_micro = F.when(F.col("n_total") > 0, F.round(
        F.lit(1_000_000.0)
        * F.least(F.col("n_above"), F.col("r_total")).cast("double")
        / F.least(F.col("r_total"), F.col("n_total")).cast("double"),
        0,
    ).cast("long")).otherwise(F.lit(0).cast("long"))
    scored = per_rank.join(pools, "qid").groupBy(
        "qid", "r_total", "n_total"
    ).agg(
        F.count("*").cast("long").alias("n_rel_ret"),
        F.sum(pen_micro).cast("long").alias("pen"),
    )
    return pools.join(
        scored.select("qid", "n_rel_ret", "pen"), "qid", "left"
    ).select(
        "qid",
        F.col("r_total").cast("long").alias("r_total"),
        F.col("n_total").cast("long").alias("n_total"),
        F.coalesce(F.col("n_rel_ret"), F.lit(0).cast("long")).alias(
            "n_rel_ret"
        ),
        F.round(
            (
                F.coalesce(F.col("n_rel_ret"), F.lit(0).cast("long"))
                * F.lit(1_000_000)
                - F.coalesce(F.col("pen"), F.lit(0).cast("long"))
            ).cast("double")
            / (F.col("r_total").cast("double") * F.lit(1_000_000.0)),
            6,
        ).alias("bpref"),
    )


def ranker_comparison(
    index, docs: DataFrame, queries: list[tuple[str, str]], k: int = 10
) -> DataFrame:
    """Paired per-query comparison of the two scoring families — BM25
    vs Dirichlet QLD — by AP@k against the synthetic qrels: the sign
    test's contingency row, computed per query so the verdict is
    auditable (which queries each model wins, not just the tally).

    winner compares the ROUND-6 APs (exact on both engines); queries
    with no relevant docs are omitted (trec_eval behavior, same as
    evaluate_run).  -> (qid, ap_bm25, ap_qld, winner)."""
    from . import scoring
    from .qld import qld_topk
    from .topk import exhaustive_topk

    qrels = synthetic_qrels(docs, queries)
    eb = evaluate_run(
        exhaustive_topk(index, queries, scoring.BM25, k=k), qrels, k=k
    ).select("qid", F.col("ap").alias("ap_bm25"))
    eq = evaluate_run(qld_topk(index, queries, k=k), qrels, k=k).select(
        "qid", F.col("ap").alias("ap_qld")
    )
    winner = (
        F.when(F.col("ap_bm25") > F.col("ap_qld"), F.lit("bm25"))
        .when(F.col("ap_bm25") < F.col("ap_qld"), F.lit("qld"))
        .otherwise(F.lit("tie"))
    )
    return eb.join(eq, "qid").select(
        "qid", "ap_bm25", "ap_qld", winner.alias("winner")
    )


def ranker_tau(index, queries: list[tuple[str, str]], k: int = 10) -> DataFrame:
    """Kendall-tau rank agreement between the BM25 and Dirichlet-QLD
    top-k lists per query — the standard statistic for "do two rankers
    order the same documents the same way" (Voorhees SIGIR 2001 uses
    exactly this to compare system rankings; ranker_comparison answers
    who WINS, tau answers how much they AGREE).

    Pinned semantics (restated in oracle._ranker_tau_sql — change both
    or neither):
    - rankings = the engine's exhaustive BM25 (round-6 rank) and
      qld_topk (integer-micro rank), both cut at k;
    - common set = docids present in BOTH top-k lists; ranks within
      each list are distinct (row_number), so the common set has no
      ties and plain tau-a applies;
    - pairs = unordered doc pairs over the common set (identified as
      docid_a < docid_b; pair identity doesn't affect the counts —
      flipping a pair flips both rank differences);
    - concordant = (ra_1 - ra_2) * (rb_1 - rb_2) > 0, discordant
      otherwise (no zero products: no ties);
    - tau = round((C - D) / (n(n-1)/2), 6); queries with n_common < 2
      emit NO row (no pairs to compare).

    -> (qid, n_common, concordant, discordant, tau).

    Scale shape: two standard top-k runs, one (qid, docid) equi-join,
    and a per-qid pair self-join bounded by k^2/2 rows per query —
    constant work per query regardless of corpus size."""
    from . import scoring
    from .qld import qld_topk
    from .topk import exhaustive_topk

    a = exhaustive_topk(index, queries, scoring.BM25, k=k).select(
        "qid", F.col("docno").cast("long").alias("d"), F.col("rank").alias("ra")
    )
    b = qld_topk(index, queries, k=k).select(
        "qid", F.col("docno").cast("long").alias("d"), F.col("rank").alias("rb")
    )
    common = a.join(b, ["qid", "d"])
    x = common.select(
        "qid",
        F.col("d").alias("d1"),
        F.col("ra").alias("ra1"),
        F.col("rb").alias("rb1"),
    )
    y = common.select(
        "qid",
        F.col("d").alias("d2"),
        F.col("ra").alias("ra2"),
        F.col("rb").alias("rb2"),
    )
    pairs = x.join(y, "qid").where(F.col("d1") < F.col("d2"))
    conc = (
        ((F.col("ra1") - F.col("ra2")) * (F.col("rb1") - F.col("rb2"))) > 0
    ).cast("long")
    agg = pairs.groupBy("qid").agg(
        F.sum(conc).alias("concordant"),
        F.sum(F.lit(1) - conc).alias("discordant"),
    )
    n = common.groupBy("qid").agg(F.count("*").alias("n_common"))
    return (
        n.where(F.col("n_common") >= 2)
        .join(agg, "qid")
        .select(
            "qid",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("concordant").cast("long").alias("concordant"),
            F.col("discordant").cast("long").alias("discordant"),
            F.round(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / (
                    F.col("n_common").cast("double")
                    * (F.col("n_common").cast("double") - F.lit(1.0))
                    / F.lit(2.0)
                ),
                6,
            ).alias("tau"),
        )
    )


def ranker_rbo(index, queries: list[tuple[str, str]], k: int = 10) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    the BM25 and Dirichlet-QLD top-k lists per query — the
    top-weighted agreement measure beside ranker_tau (tau treats every
    pair equally; RBO geometrically discounts depth, so two rankers
    that agree on the head score high even when tails diverge).

    Pinned semantics (restated in oracle._ranker_rbo_sql — change both
    or neither):
    - rankings = the same two runs as ranker_tau, both cut at k;
      qids = every query with >= 1 in-lexicon term (all emit a row,
      zero-overlap queries emit rbo = 0.0 — unlike tau's n >= 2 rule);
    - p = 1/2 (dyadic — 2^-d is exact in double at every depth);
      truncated depth-k RBO: rbo = sum over d = 1..k of
      (1-p) * p^(d-1) * X_d / d = 2^-d * X_d / d, with X_d = |A_1..d
      intersect B_1..d| = common docs with greatest(ra, rb) <= d;
    - per-DEPTH contribution micro-quantized BIGINT before the
      per-query sum (the rbp discipline): contrib_d =
      round(((X_d_double * pow(0.5, d)) * 1e6) / d_double) — exact .5
      quantizer ties round HALF_UP on both engines;
    - rbo = round(micro_sum / 1e6, 6); n_common (full-k overlap) rides
      beside as the audit column.

    -> (qid, n_common, rbo).

    Scale shape: two standard top-k runs, one (qid, docid) equi-join,
    and a k-row depth expansion per query — constant work per query
    regardless of corpus size."""
    from . import scoring
    from .qld import qld_topk
    from .topk import exhaustive_topk

    a = exhaustive_topk(index, queries, scoring.BM25, k=k).select(
        "qid", F.col("docno").cast("long").alias("d"), F.col("rank").alias("ra")
    )
    b = qld_topk(index, queries, k=k).select(
        "qid", F.col("docno").cast("long").alias("d"), F.col("rank").alias("rb")
    )
    common = a.join(b, ["qid", "d"]).select(
        "qid", F.greatest("ra", "rb").alias("m")
    )
    qids = a.select("qid").distinct().join(b.select("qid").distinct(), "qid")
    depths = qids.select(
        "qid", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("dep")
    )
    xd = (
        depths.join(common, "qid", "left")
        .groupBy("qid", "dep")
        .agg(
            F.sum(
                F.when(F.col("m") <= F.col("dep"), 1).otherwise(0)
            ).cast("long").alias("x")
        )
    )
    contrib = F.round(
        (
            (F.col("x").cast("double") * F.pow(F.lit(0.5), F.col("dep").cast("double")))
            * F.lit(1e6)
        )
        / F.col("dep").cast("double")
    ).cast("long")
    agg = xd.groupBy("qid").agg(F.sum(contrib).cast("long").alias("micro"))
    cnt = common.groupBy("qid").agg(F.count("*").cast("long").alias("nc"))
    return (
        agg.join(cnt, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("nc"), F.lit(0).cast("long")).alias("n_common"),
            F.round(F.col("micro") / F.lit(1e6), 6).alias("rbo"),
        )
    )


def ranker_sign_test(
    index, docs: DataFrame, queries: list[tuple[str, str]], k: int = 10
) -> DataFrame:
    """-> one row (wins_bm25, wins_qld, ties, n_eff, p_micro): the
    EXACT two-sided sign test over ranker_comparison's per-query
    winners — the significance readout every IR comparison table
    footnotes (Smucker et al. CIKM 2007 recommend exactly the
    paired-sign family for system comparison).

    Pinned semantics (restated in oracle._sign_test_sql — change both
    sides or neither): wins from the comparison's ROUND-6 AP verdicts
    (ties excluded from n_eff); exact binomial(n_eff, 1/2) two-sided
    tail mass p = (sum_{j<=kmin} C(n,j) + sum_{j>=n-kmin} C(n,j)) /
    2^n with kmin = least(wins) — the overlapping-middle form CAPPED
    at 1 (p_micro = least(1e6, round(1e6 * num_d / 2^n_d))); all
    binomial coefficients exact integers via factorial (n_eff <=
    #queries << 20 keeps factorial in BIGINT); n_eff = 0 (all ties)
    pins p_micro = 1e6.

    Scale shape: the comparison's own runs + a one-row aggregate and
    a <= n_eff+1-row tail sum."""
    cmp = ranker_comparison(index, docs, queries, k)
    agg = cmp.agg(
        F.sum((F.col("winner") == "bm25").cast("long")).alias("wins_bm25"),
        F.sum((F.col("winner") == "qld").cast("long")).alias("wins_qld"),
        F.sum((F.col("winner") == "tie").cast("long")).alias("ties"),
    ).select(
        F.coalesce("wins_bm25", F.lit(0)).cast("long").alias("wins_bm25"),
        F.coalesce("wins_qld", F.lit(0)).cast("long").alias("wins_qld"),
        F.coalesce("ties", F.lit(0)).cast("long").alias("ties"),
    )
    base = agg.select(
        "*",
        (F.col("wins_bm25") + F.col("wins_qld")).alias("n_eff"),
        F.least("wins_bm25", "wins_qld").alias("kmin"),
    )
    ks = base.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("n_eff"))).alias("j")
    )
    coef = F.expr("factorial(n_eff) DIV (factorial(j) * factorial(n_eff - j))")
    tails = ks.where(
        (F.col("j") <= F.col("kmin"))
        | (F.col("j") >= F.col("n_eff") - F.col("kmin"))
    ).groupBy("wins_bm25", "wins_qld", "ties", "n_eff").agg(
        F.sum(coef).cast("long").alias("num")
    )
    p = F.least(
        F.lit(1_000_000).cast("long"),
        F.round(
            F.lit(1e6)
            * F.col("num").cast("double")
            / F.pow(F.lit(2.0), F.col("n_eff").cast("double"))
        ).cast("long"),
    )
    return tails.select(
        "wins_bm25", "wins_qld", "ties",
        F.col("n_eff").cast("long").alias("n_eff"),
        p.alias("p_micro"),
    )
