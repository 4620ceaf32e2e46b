"""LTR feature export (operators/ltr.py): each feature column must
agree with the standalone ranker that defines it."""

from mircv_project_spark import oracle
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.ltr import ltr_features
from mircv_project_spark.operators.qld import qld_topk


def test_features_agree_with_standalone_rankers(vb_index):
    idx, _ = vb_index
    feats = {
        (r["qid"], r["docno"]): r
        for r in ltr_features(idx, oracle.QUERY_SET, pool=20).collect()
    }
    assert feats

    bm = topk.exhaustive_topk(idx, oracle.QUERY_SET, scoring.BM25, k=20)
    for r in bm.collect():
        key = (r["qid"], r["docno"])
        assert key in feats  # pool IS the bm25 top-20
        assert feats[key]["bm25"] == r["score"]

    tf = topk.exhaustive_topk(idx, oracle.QUERY_SET, scoring.TFIDF, k=20)
    tf_scores = {(r["qid"], r["docno"]): r["score"] for r in tf.collect()}
    ql = qld_topk(idx, oracle.QUERY_SET, k=20)
    ql_scores = {(r["qid"], r["docno"]): r["score"] for r in ql.collect()}
    checked_tf = checked_ql = 0
    for key, row in feats.items():
        if key in tf_scores:
            assert row["tfidf"] == tf_scores[key]
            checked_tf += 1
        if key in ql_scores:
            assert row["qld"] == ql_scores[key]
            checked_ql += 1
    assert checked_tf > 10 and checked_ql > 10  # real overlap, not vacuous
