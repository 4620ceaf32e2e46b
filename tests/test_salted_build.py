"""Head-term skew splitting: force the salted path (tiny
heavy_df_threshold) and verify the run-grained index is byte-for-byte
rank-identical to the unsalted build — salting must be invisible to
queries (SURVEY §2.3 A3 / §7 risk register)."""

import pandas as pd
from pyspark.sql import functions as F

from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.index_build import (
    build_index,
    filter_indexable,
)
from mircv_project_spark.operators.maxscore import maxscore_topk_df
from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
from mircv_project_spark.sources.index_store import IndexReader
from mircv_project_spark.sources.transcripts import assign_doc_ids, load_transcripts
from tests.conftest import SF_SMALL


def _cmp(df_a, df_b):
    a = df_a.toPandas().sort_values(["qid", "rank"], ignore_index=True)
    b = df_b.toPandas().sort_values(["qid", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_salted_build_rank_identical(spark):
    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_SMALL)))
    plain = build_index(spark, t, parse=False)
    salted = build_index(
        spark, t, parse=False, heavy_df_threshold=50, heavy_fanout=8
    )
    assert salted.metrics["heavy_terms"] > 0, "threshold should trip on this corpus"

    # head terms really are split into multiple runs with disjoint,
    # increasing docid ranges (run order == docid order)
    multi = salted.postings.groupBy("term").agg(
        F.count("*").alias("n_runs")
    ).where(F.col("n_runs") > 1)
    assert multi.count() > 0

    # lexicon scalars identical between salted and plain builds
    lp = plain.lexicon.select("term", "df", "cf", "idf", "bm25_ub", "tfidf_ub")
    ls = salted.lexicon.select("term", "df", "cf", "idf", "bm25_ub", "tfidf_ub")
    assert lp.exceptAll(ls).count() == 0 and ls.exceptAll(lp).count() == 0

    # MaxScore over the salted run-grained store == exhaustive over plain
    for conj, qs in [(False, QUERY_SET), (True, CONJ_QUERY_SET)]:
        ex = topk.exhaustive_topk(plain, qs, scoring.BM25, k=10, conjunctive=conj)
        ms = maxscore_topk_df(
            IndexReader.from_memory(salted), qs, scoring.BM25, k=10, conjunctive=conj
        )
        _cmp(ex, ms)


def test_salted_many_heavy_terms_broadcast_join(spark):
    """5k heavy terms at once: the heavy set rides a broadcast JOIN, not
    driver-built isin()/create_map literal trees, so a large heavy
    vocabulary must neither blow up the plan nor change results."""
    from mircv_project_spark.functions import codecs as C
    from mircv_project_spark.operators.index_build import (
        aggregate_postings,
        lexicon_from_runs,
    )

    n_terms, df_each, n_docs = 5000, 12, 12
    flat = (
        spark.range(n_terms)
        .selectExpr("concat('t', id) as term")
        .crossJoin(spark.range(1, n_docs + 1).selectExpr("id as docid"))
        .selectExpr("term", "docid", "cast(1 as int) as tf", "cast(10 as int) as doc_len")
    )
    metrics: dict = {}
    salted = aggregate_postings(
        flat, n_docs=n_docs, avgdl=10.0, heavy_df_threshold=8, heavy_fanout=4,
        metrics=metrics,
    ).persist()
    assert metrics["heavy_terms"] == n_terms
    plain = aggregate_postings(flat, n_docs=n_docs, avgdl=10.0).persist()

    lp = lexicon_from_runs(plain, n_docs).select(
        "term", "df", "cf", "idf", "bm25_ub", "tfidf_ub"
    )
    ls = lexicon_from_runs(salted, n_docs).select(
        "term", "df", "cf", "idf", "bm25_ub", "tfidf_ub"
    )
    assert lp.exceptAll(ls).count() == 0 and ls.exceptAll(lp).count() == 0

    # every term splits into >1 run; decoded run-concatenated postings
    # equal the single-run build for a sample of terms
    per_term = salted.groupBy("term").agg(F.count("*").alias("n_runs"))
    assert per_term.where(F.col("n_runs") <= 1).count() == 0

    def decoded(runs_df, term):
        out = []
        rows = runs_df.where(F.col("term") == term).select("run", "blocks").collect()
        for _, blocks in sorted((r["run"], r["blocks"]) for r in rows):
            for b in blocks:
                i, t, d = C.decode_block(b.asDict(), codec=C.VB)
                out.extend(zip(i.tolist(), t.tolist(), d.tolist()))
        return out

    for term in ["t0", "t42", "t4999"]:
        assert decoded(salted, term) == decoded(plain, term)


def test_run_docid_ranges_disjoint(spark):
    from mircv_project_spark.functions import codecs as C

    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_SMALL)))
    salted = build_index(
        spark, t, parse=False, heavy_df_threshold=50, heavy_fanout=8
    )
    rows = salted.postings.select("term", "run", "blocks").collect()
    by_term: dict = {}
    for r in rows:
        by_term.setdefault(r["term"], []).append((r["run"], r["blocks"]))
    checked = 0
    for term, runs in by_term.items():
        if len(runs) < 2:
            continue
        prev_max = -1
        for _, blocks in sorted(runs, key=lambda x: x[0]):
            ids = []
            for b in blocks:
                i, _, _ = C.decode_block(b.asDict(), codec=C.VB)
                ids.extend(i.tolist())
            assert ids == sorted(ids)
            assert ids[0] > prev_max
            prev_max = ids[-1]
        checked += 1
    assert checked > 0


def test_segment_salting_keeps_run_fanout(spark):
    """Heavy-term salting over a compaction SEGMENT must range-partition
    the segment's own docid extent (docid_lo): with the cumulative
    domain a late small segment's docids all land in the top sliver of
    the range and a heavy term collapses to ~1 run of unbounded size —
    the exact failure the run-grained layout exists to prevent."""
    from mircv_project_spark.operators.index_build import aggregate_postings

    n_prev, n_new = 1_000_000, 4000
    flat = spark.range(1, n_new + 1).select(
        F.lit("hot").alias("term"),
        (F.col("id") + n_prev).cast("long").alias("docid"),
        F.lit(1).alias("tf"),
        F.lit(5).alias("doc_len"),
    )
    runs = aggregate_postings(
        flat,
        n_docs=n_prev + n_new,
        avgdl=5.0,
        heavy_df_threshold=1000,
        docid_lo=n_prev,
    ).select("run", "run_df").collect()
    assert len(runs) >= 4, runs  # fan = ceil(4000/1000) = 4
    assert max(r["run_df"] for r in runs) <= 2000, runs


def test_zipf_head_term_run_payload_bounded(spark):
    """Adversarial-skew stress (round-3 verdict ask #6): a Zipf-1
    vocabulary whose head term sits in EVERY doc (df = n).  The
    df-scaled fanout must bound every run's payload: run_df and the
    encoded block bytes stay within a small constant of
    heavy_df_threshold (x POSTING_BYTES for the bytes bound) — the
    property that makes the build safe when a stopword's df is 10^9.
    c = 2 covers range-partition imbalance on uniform docids."""
    from mircv_project_spark import config
    from mircv_project_spark.operators.index_build import aggregate_postings

    n, n_terms, thr = 50_000, 50, 1_000
    # term z{k} in every k-th doc -> df(z_k) = n/k, a Zipf-1 df law
    # with df(z1) = n
    flat = (
        spark.range(1, n + 1)
        .selectExpr("id as docid")
        .join(
            spark.range(1, n_terms + 1).selectExpr("id as k"),
            F.expr("docid % k = 0"),
        )
        .selectExpr(
            "concat('z', k) as term", "docid",
            "cast(1 as int) as tf", "cast(8 as int) as doc_len",
        )
    )
    metrics: dict = {}
    runs = (
        aggregate_postings(
            flat, n_docs=n, avgdl=8.0, heavy_df_threshold=thr,
            heavy_fanout=64, metrics=metrics,
        )
        .select(
            "term", "run", "run_df",
            F.aggregate(
                F.transform(
                    "blocks",
                    lambda b: F.length(b["docids"])
                    + F.length(b["tfs"])
                    + F.length(b["dls"]),
                ),
                F.lit(0), lambda acc, x: acc + x,
            ).alias("payload_bytes"),
        )
        .persist()
    )
    assert metrics["heavy_terms"] > 0
    agg = runs.agg(
        F.max("run_df").alias("max_run_df"),
        F.max("payload_bytes").alias("max_run_bytes"),
    ).collect()[0]
    assert agg["max_run_df"] <= 2 * thr, agg
    assert agg["max_run_bytes"] <= 2 * thr * config.POSTING_BYTES, agg
    # the head term really fanned out to the cap-or-df-scaled count
    head = runs.where(F.col("term") == "z1").count()
    assert head == min(64, -(-n // thr)), head
    runs.unpersist()


def test_numpy_bm25_coeff_matches_catalyst(spark):
    """The encode UDF computes pbm (max per-run BM25 coefficient) with
    scoring.bm25_coeff_np instead of shuffling a per-posting Catalyst
    coefficient column (round-6 shuffle-bytes optimization).  The two
    evaluations must be BIT-identical — same constants, same
    parenthesization, IEEE float64 elementwise — or lexicon upper
    bounds (and so pruning thresholds) would drift."""
    import numpy as np

    from mircv_project_spark.operators import scoring

    avgdl = 23.714285714285715  # a non-dyadic realistic value
    grid = spark.range(1, 65).selectExpr("cast(id as int) as tf").crossJoin(
        spark.range(1, 120, 7).selectExpr("cast(id as int) as dl")
    )
    rows = grid.select(
        "tf", "dl",
        scoring.bm25_coeff_col(F.col("tf"), F.col("dl"), avgdl).alias("c"),
    ).collect()
    tfs = np.array([r["tf"] for r in rows], dtype=np.int64)
    dls = np.array([r["dl"] for r in rows], dtype=np.int64)
    got = scoring.bm25_coeff_np(tfs, dls, avgdl)
    want = np.array([r["c"] for r in rows], dtype=np.float64)
    assert (got == want).all()  # exact, not approx


def test_reduce_side_agg_path_identical(spark):
    """Round-5 memory-safety dispatch: aggregate_postings' reduce-side
    (exchange-first) path must produce BIT-IDENTICAL run rows to the
    map-side partial-collect path — the dispatch is a resource
    decision, never a semantic one.  Also pins the auto rule: the
    token budget selects map-side below and reduce-side above."""
    from mircv_project_spark import config
    from mircv_project_spark.operators.index_build import aggregate_postings

    n_terms, n_docs = 200, 40
    flat = (
        spark.range(n_terms)
        .selectExpr("concat('t', id) as term")
        .crossJoin(spark.range(1, n_docs + 1).selectExpr("id as docid"))
        .where("(hash(term, docid) % 3) != 0")
        .selectExpr(
            "term", "docid",
            "cast(1 + pmod(hash(docid, term), 4) as int) as tf",
            "cast(10 as int) as doc_len",
        )
    )
    m_map, m_red = {}, {}
    a = aggregate_postings(
        flat, n_docs=n_docs, avgdl=10.0, heavy_df_threshold=8,
        heavy_fanout=4, reduce_side=False, metrics=m_map,
    )
    b = aggregate_postings(
        flat, n_docs=n_docs, avgdl=10.0, heavy_df_threshold=8,
        heavy_fanout=4, reduce_side=True, metrics=m_red,
    )
    assert m_map["reduce_side_agg"] is False
    assert m_red["reduce_side_agg"] is True

    def canon(df):
        rows = df.select(
            "term", "run", "run_df", "pcf", "pbm", "ptf", "blocks", "bucket"
        ).collect()
        out = []
        for r in rows:
            blocks = tuple(
                tuple(sorted(bl.asDict().items())) for bl in r["blocks"]
            )
            out.append((r["term"], r["run"], r["run_df"], r["pcf"],
                        r["pbm"], r["ptf"], blocks, r["bucket"]))
        return sorted(out)

    assert canon(a) == canon(b)

    # auto rule: total tokens (n_docs * avgdl) vs the config budget
    m_auto: dict = {}
    aggregate_postings(flat, n_docs=n_docs, avgdl=10.0, metrics=m_auto)
    assert m_auto["reduce_side_agg"] is (
        n_docs * 10.0 > config.REDUCE_SIDE_AGG_TOKENS
    )
