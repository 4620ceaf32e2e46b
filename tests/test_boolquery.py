"""Boolean query semantics (operators/boolquery.py) cross-checked
against the plain exhaustive paths on the sf0.001 index."""

from pyspark.sql import functions as F

from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.boolquery import boolean_topk, parse_boolean_query


def _rows(df):
    return [(r["qid"], r["rank"], r["docno"], r["score"]) for r in df.collect()]


def test_parse_roles():
    p = parse_boolean_query("spark +join -slow +the", parse=False)
    assert p == {"must": ["join", "the"], "should": ["spark"], "not": ["slow"]}


def test_all_must_equals_conjunctive(vb_index):
    idx, _ = vb_index
    got = boolean_topk(idx, [("q", "+hash +merge")], scoring.BM25, k=10)
    want = topk.exhaustive_topk(
        idx, [("q", "hash merge")], scoring.BM25, k=10, conjunctive=True
    )
    assert _rows(got) == _rows(want)


def test_all_should_equals_disjunctive(vb_index):
    idx, _ = vb_index
    got = boolean_topk(idx, [("q", "hash merge")], scoring.BM25, k=10)
    want = topk.exhaustive_topk(idx, [("q", "hash merge")], scoring.BM25, k=10)
    assert _rows(got) == _rows(want)


def test_oov_must_is_dropped(vb_index):
    idx, _ = vb_index
    got = boolean_topk(idx, [("q", "+warpcore spark")], scoring.BM25, k=10)
    want = boolean_topk(idx, [("q", "spark")], scoring.BM25, k=10)
    assert _rows(got) == _rows(want)


def test_not_excludes_matching_docs(vb_index):
    idx, _ = vb_index
    got = boolean_topk(idx, [("q", "spark -slow")], scoring.BM25, k=10)
    slow_docs = {
        str(r["docid"] - 1)
        for r in idx.flat.where(F.col("term") == "slow").select("docid").collect()
    }
    assert got.count() > 0
    for r in got.collect():
        assert r["docno"] not in slow_docs
