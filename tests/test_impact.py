"""Impact-ordered (SAAT) retrieval — operators/impact.py.

The gate (impact_ordered_topk) pins the quantization + full-traversal
semantics against the DuckDB oracle; these tests pin the parts the
oracle can't see: the anytime budget actually SKIPS segments (the
JASS property), budget=None equals the plain impact_topk, and the
quantizer's range/drop rules.
"""

import pytest
from pyspark.sql import functions as F

from mircv_project_spark import oracle
from mircv_project_spark.operators.impact import (
    IMPACT_LEVELS,
    impact_postings,
    impact_segment_meta,
    impact_topk,
    impact_topk_saat,
)


@pytest.fixture(scope="module")
def imp_table(spark, vb_index):
    idx, _ = vb_index
    return idx, impact_postings(idx).persist()


def test_impact_range_and_zero_drop(imp_table):
    """Impacts lie in [1, 255]; the max posting quantizes to exactly
    255 (it IS the smax posting); nothing below 1 survives."""
    _, imp = imp_table
    row = imp.agg(
        F.min("impact").alias("lo"), F.max("impact").alias("hi")
    ).collect()[0]
    assert row["lo"] >= 1
    assert row["hi"] == IMPACT_LEVELS


def test_saat_budget_none_equals_full(imp_table):
    idx, imp = imp_table
    full = impact_topk(idx, oracle.QUERY_SET, k=10, imp=imp)
    saat, stats = impact_topk_saat(
        idx, oracle.QUERY_SET, k=10, budget=None, imp=imp
    )
    assert stats["segments_selected"] == stats["segments_total"]
    a = sorted(tuple(r) for r in full.collect())
    b = sorted(tuple(r) for r in saat.collect())
    assert a == b and len(a) > 0


def test_saat_budget_skips_segments_and_keeps_overlap(imp_table):
    """A tight posting budget must (a) actually skip segments, (b) scan
    no more postings than budget + the largest single segment, and
    (c) still agree with the exact top-10 on most slots — the quantized
    head segments carry the mass (the entire point of impact
    ordering)."""
    idx, imp = imp_table
    exact, full_stats = impact_topk_saat(
        idx, oracle.QUERY_SET, k=10, budget=None, imp=imp
    )
    budget = max(1, full_stats["postings_total"] // (4 * len(oracle.QUERY_SET)))
    approx, stats = impact_topk_saat(
        idx, oracle.QUERY_SET, k=10, budget=budget, imp=imp
    )
    assert stats["segments_selected"] < stats["segments_total"]
    assert stats["postings_selected"] < full_stats["postings_total"]

    ex = {}
    for r in exact.collect():
        ex.setdefault(r["qid"], set()).add(r["docno"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["qid"], set()).add(r["docno"])
    overlaps = [
        len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex if ex[q]
    ]
    assert sum(overlaps) / len(overlaps) >= 0.5


def test_segment_meta_counts(imp_table):
    """Metadata counts must restate the posting table exactly — the
    budget selection trusts them instead of scanning."""
    _, imp = imp_table
    meta_total = impact_segment_meta(imp).agg(
        F.sum("n_postings").alias("n")
    ).collect()[0]["n"]
    assert meta_total == imp.count()


def test_unknown_terms_empty(imp_table):
    idx, imp = imp_table
    df = impact_topk(idx, [("q", "zzzqqqxxx")], k=10, imp=imp)
    assert df.count() == 0
    df2, stats = impact_topk_saat(idx, [("q", "zzzqqqxxx")], k=10, imp=imp)
    assert df2.count() == 0


def test_cascade_equals_exhaustive_bm25(imp_table):
    """The oracle-share measurement: at the pinned pool (100) the
    stage-1 impact candidates contain the true BM25 top-10, so the
    cascade's final ranking is IDENTICAL to the exhaustive scorer —
    scores, ranks, ties and all."""
    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.operators.impact import bm25_cascade_topk

    idx, imp = imp_table
    casc = sorted(
        tuple(r)
        for r in bm25_cascade_topk(idx, oracle.QUERY_SET, k=10, imp=imp).collect()
    )
    exact = sorted(
        tuple(r)
        for r in topk.exhaustive_topk(
            idx, oracle.QUERY_SET, scoring.BM25, k=10
        ).collect()
    )
    assert casc == exact and len(casc) > 0


def test_cascade_small_pool_is_approximate_but_bounded(imp_table):
    """Shrinking the pool below k degrades gracefully: at pool=k the
    result can diverge from exact BM25 but never emits more than pool
    docs per query, and every emitted doc came from the stage-1 pool."""
    from mircv_project_spark.operators.impact import (
        bm25_cascade_topk,
        impact_topk,
    )

    idx, imp = imp_table
    pool = 10
    stage1 = impact_topk(idx, oracle.QUERY_SET, k=pool, imp=imp)
    allowed = {}
    for r in stage1.collect():
        allowed.setdefault(r["qid"], set()).add(r["docno"])
    out = bm25_cascade_topk(idx, oracle.QUERY_SET, k=10, pool=pool, imp=imp)
    per_q = {}
    for r in out.collect():
        per_q.setdefault(r["qid"], set()).add(r["docno"])
    assert per_q
    for qid, docs in per_q.items():
        assert len(docs) <= pool
        assert docs <= allowed[qid]
