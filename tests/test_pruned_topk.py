"""Distributed block-max pruned top-k (operators/topk.py
topk_from_blocks_pruned): rank-identical to the exhaustive scorer on
every query, and on a skewed corpus (one near-stopword + selective
terms) it must actually skip decoding most of the stopword's blocks —
Q4's block-skipping benefit on the distributed path."""

import pandas as pd
from pyspark.sql import functions as F  # noqa: F401 (plan debugging)

from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.index_build import build_index, filter_indexable
from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
from mircv_project_spark.sources.index_store import IndexReader
from mircv_project_spark.sources.transcripts import assign_doc_ids, load_transcripts
from tests.conftest import SF_SMALL


def _cmp(df_a, df_b):
    a = df_a.toPandas().sort_values(["qid", "rank"], ignore_index=True)
    b = df_b.toPandas().sort_values(["qid", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])


def test_pruned_rank_identical_driver_corpus(spark):
    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_SMALL)))
    idx = build_index(spark, t, parse=False)
    reader = IndexReader.from_memory(idx)
    for standard in [scoring.BM25, scoring.TFIDF]:
        ex = topk.exhaustive_topk(idx, QUERY_SET, standard, k=10)
        pr = topk.topk_from_blocks_pruned(reader, QUERY_SET, standard, k=10)
        _cmp(ex, pr)


def test_pruned_conjunctive_rank_identical(spark):
    """Conjunctive pruned path == exhaustive conjunctive ranking; the
    rarest-term candidate source must also SKIP most blocks of the
    other (denser) terms (intersection-driven lookups)."""
    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_SMALL)))
    idx = build_index(spark, t, parse=False)
    reader = IndexReader.from_memory(idx)
    for standard in [scoring.BM25, scoring.TFIDF]:
        ex = topk.exhaustive_topk(idx, CONJ_QUERY_SET, standard, k=10, conjunctive=True)
        pr = topk.topk_from_blocks_pruned(
            reader, CONJ_QUERY_SET, standard, k=10, conjunctive=True
        )
        _cmp(ex, pr)


def test_pruned_conjunctive_skips_dense_blocks(spark):
    t = assign_doc_ids(filter_indexable(_skewed_transcripts(spark)))
    idx = build_index(spark, t, parse=False)
    reader = IndexReader.from_memory(idx)
    queries = [("c1", "rare common")]
    metrics: dict = {}
    pr = topk.topk_from_blocks_pruned(
        reader, queries, scoring.BM25, k=5, conjunctive=True, metrics=metrics
    )
    ex = topk.exhaustive_topk(idx, queries, scoring.BM25, k=5, conjunctive=True)
    _cmp(ex, pr)
    # 'rare' (df ~ 10) is the candidate source; 'common' (df ~ 1800,
    # ~40+ blocks) contributes via candidate-driven lookups only
    assert metrics["essential_terms"] == 1, metrics
    assert metrics["ne_blocks_total"] > 20, metrics
    assert metrics["ne_blocks_decoded"] < metrics["ne_blocks_total"] / 2, metrics


def _skewed_transcripts(spark, n=2000, rare_every=200):
    """Every doc holds the near-stopword 'common' (plus a unique filler)
    except each 10th-percentile doc also holds 'rare'; 'common' df ~ 0.9n
    so its idf/UB is tiny, 'rare' df = n/rare_every with a large UB."""
    rows = []
    for i in range(n):
        words = [f"filler{i % 37}"]
        if i % 10 != 0:
            words.append("common")
        if i % rare_every == 0:
            words.append("rare common")
        rows.append(
            (f"conv-{i // 8:012d}", i % 8, "user", " ".join(words), None, None)
        )
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string,"
        " ts timestamp",
    )


def test_pruned_skips_stopword_blocks(spark):
    t = assign_doc_ids(filter_indexable(_skewed_transcripts(spark)))
    idx = build_index(spark, t, parse=False)
    reader = IndexReader.from_memory(idx)
    queries = [("q1", "rare common")]
    metrics: dict = {}
    pr = topk.topk_from_blocks_pruned(
        reader, queries, scoring.BM25, k=5, metrics=metrics
    )
    ex = topk.exhaustive_topk(idx, queries, scoring.BM25, k=5)
    _cmp(ex, pr)
    # 'common' must be classified non-essential and most of its blocks
    # (df ~ 1800 -> ~42 blocks of ~44 docids) never decode: only the
    # ones whose docid range contains one of the ~10 'rare' candidates.
    assert metrics["non_essential_pairs"] >= 1, metrics
    assert metrics["ne_blocks_total"] > 20, metrics
    assert metrics["ne_blocks_decoded"] < metrics["ne_blocks_total"] / 2, metrics
    assert metrics["ne_blocks_decoded"] >= 1, metrics
