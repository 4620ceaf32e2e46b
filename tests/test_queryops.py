"""Edge semantics for min-should-match and synonym expansion (oracle
equality at sf0.01 is covered by bm25_topk_msm / bm25_topk_synonyms)."""

from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.queryops import msm_topk, synonym_topk
from mircv_project_spark.oracle import QUERY_SET, SYN_MAP


def test_msm_clamps_and_interpolates_between_or_and_and(spark, vb_index):
    """msm=1 == the plain OR ranking; msm=huge == conjunctive; msm=2
    sits between (for multi-term queries it drops 1-match docs)."""
    idx, _ = vb_index
    or_run = {
        (r["qid"], r["rank"]): (r["docno"], r["score"])
        for r in topk.exhaustive_topk(
            idx, QUERY_SET, scoring.BM25, k=10
        ).collect()
    }
    m1 = {
        (r["qid"], r["rank"]): (r["docno"], r["score"])
        for r in msm_topk(idx, QUERY_SET, m=1, k=10).collect()
    }
    assert m1 == or_run

    conj = {
        (r["qid"], r["rank"]): (r["docno"], r["score"])
        for r in topk.exhaustive_topk(
            idx, QUERY_SET, scoring.BM25, k=10, conjunctive=True
        ).collect()
    }
    mbig = {
        (r["qid"], r["rank"]): (r["docno"], r["score"])
        for r in msm_topk(idx, QUERY_SET, m=10_000, k=10).collect()
    }
    assert mbig == conj

    m2 = msm_topk(idx, QUERY_SET, m=2, k=10).collect()
    assert m2 and {r["qid"] for r in m2}


def test_synonyms_change_rankings_and_oov_is_noop(spark, vb_index):
    """The in-vocab expansions must move at least one query's ranking;
    an all-OOV synonym map must reproduce the plain run exactly."""
    idx, _ = vb_index
    base = {
        (r["qid"], r["rank"]): r["docno"]
        for r in topk.exhaustive_topk(
            idx, QUERY_SET, scoring.BM25, k=10
        ).collect()
    }
    syn = {
        (r["qid"], r["rank"]): r["docno"]
        for r in synonym_topk(idx, QUERY_SET, SYN_MAP, k=10).collect()
    }
    assert syn != base

    noop = {
        (r["qid"], r["rank"]): r["docno"]
        for r in synonym_topk(
            idx, QUERY_SET, {"join": ["zzmissing"]}, k=10
        ).collect()
    }
    assert noop == base


def test_search_after_pages_tile_the_global_ranking(spark, vb_index):
    """Pages 1..3 via the cursor must tile the plain top-30 exactly
    (ranks, docnos, scores), and a page past the result set is empty."""
    from mircv_project_spark.operators.queryops import search_after_topk

    idx, _ = vb_index
    full = {
        (r["qid"], r["rank"]): (r["docno"], r["score"])
        for r in topk.exhaustive_topk(
            idx, QUERY_SET, scoring.BM25, k=30
        ).collect()
    }
    tiled = {}
    for p in (1, 2, 3):
        for r in search_after_topk(idx, QUERY_SET, page=p, k=10).collect():
            tiled[(r["qid"], r["rank"])] = (r["docno"], r["score"])
    assert tiled == full
    deep = search_after_topk(idx, QUERY_SET, page=1000, k=10).collect()
    assert deep == []


def test_scoped_stats_differ_from_global_stats(spark, vb_index):
    """The per-view-stats variant must genuinely re-rank or re-score
    relative to corpus-global filtered retrieval (else the gate pair
    tests one thing twice)."""
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.index_build import filter_indexable
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids,
        load_transcripts,
    )

    idx, _ = vb_index
    t = assign_doc_ids(
        filter_indexable(load_transcripts(spark, "/root/testdata/sf0.001")),
        scalable=True,
    )
    allowed = t.where(F.col("role") == "assistant").select("docid")
    glob = {
        (r["qid"], r["docno"]): r["score"]
        for r in topk.filtered_topk(
            idx, QUERY_SET, allowed, scoring.BM25, k=10
        ).collect()
    }
    scoped = {
        (r["qid"], r["docno"]): r["score"]
        for r in topk.filtered_topk_scoped_stats(
            idx, QUERY_SET, allowed, scoring.BM25, k=10
        ).collect()
    }
    assert scoped and glob
    assert scoped != glob
    # both rank only allowed docs (docno % 4 == 1 is the role law)
    for _, dn in list(scoped) + list(glob):
        assert int(dn) % 4 == 1


def test_recency_boost_prefers_fresh_on_equal_scores(spark, vb_index):
    """Recency must actually re-rank: the boosted ranking differs from
    plain BM25, boosted scores never exceed the plain score (decay <=
    1), and a doc's boost is monotone in its ts."""
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.index_build import filter_indexable
    from mircv_project_spark.operators.queryops import recency_topk
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids,
        load_transcripts,
    )

    idx, _ = vb_index
    t = assign_doc_ids(
        filter_indexable(load_transcripts(spark, "/root/testdata/sf0.001")),
        scalable=True,
    )
    doc_ts = t.select(
        "docid",
        (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1_000_000))
        .cast("long")
        .alias("ts_s"),
    )
    plain = {
        (r["qid"], r["docno"]): r["score"]
        for r in topk.exhaustive_topk(
            idx, QUERY_SET, scoring.BM25, k=1_000_000
        ).collect()
    }
    boosted_rows = recency_topk(idx, doc_ts, QUERY_SET, k=10).collect()
    assert boosted_rows
    for r in boosted_rows:
        assert r["score"] <= plain[(r["qid"], r["docno"])] + 1e-9
    plain_top = {
        (r["qid"], r["rank"]): r["docno"]
        for r in topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10).collect()
    }
    boosted_top = {(r["qid"], r["rank"]): r["docno"] for r in boosted_rows}
    assert boosted_top != plain_top
