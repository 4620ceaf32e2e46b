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


def test_triplets_semantics(spark, vb_index):
    """Positives match ALL in-lexicon query terms, negatives only
    some; both come from the BM25 pool; pair counts bounded."""
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.ltr import training_triplets
    from mircv_project_spark.operators.topk import query_terms

    idx, _ = vb_index
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = training_triplets(idx, docs, oracle.QUERY_SET).collect()
    assert rows

    lex_terms = {r["term"] for r in idx.lexicon.select("term").collect()}
    by_query = {}
    for q, t, _ in query_terms(oracle.QUERY_SET, False):
        if t in lex_terms:
            by_query.setdefault(q, set()).add(t)
    doc_terms = {}
    for r in idx.flat.select("term", "docid").collect():
        doc_terms.setdefault(r["docid"] - 1, set()).add(r["term"])

    per_q = {}
    for r in rows:
        need = by_query[r["qid"]]
        assert need <= doc_terms[int(r["pos_docno"])]
        assert not need <= doc_terms[int(r["neg_docno"])]
        assert r["pos_grade"] == len(need)
        per_q.setdefault(r["qid"], set()).add(
            (r["pos_docno"], r["neg_docno"])
        )
    for q, pairs in per_q.items():
        assert len(pairs) <= 2 * 3
    # single-term queries: every pool doc is a full match -> no negatives
    assert "q05" not in per_q
