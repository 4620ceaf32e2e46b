"""Score explanation (topk.explain_topdoc): the explained doc is the
served rank-1 doc, contributions reconcile with the ranking score, and
statistics columns carry the scorer's actual inputs."""

from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.oracle import QUERY_SET


def test_explain_reconciles_with_ranking(spark, vb_index):
    idx, _ = vb_index
    queries = QUERY_SET[:4]
    run = {
        (r["qid"], r["rank"]): (r["docno"], r["score"])
        for r in topk.exhaustive_topk(
            idx, queries, scoring.BM25, k=1
        ).collect()
    }
    rows = topk.explain_topdoc(idx, queries, scoring.BM25).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for qid, terms in by_q.items():
        docno, score = run[(qid, 1)]
        # the explained doc IS the served rank-1 doc, total its score
        assert all(t["docno"] == docno for t in terms)
        assert all(t["total"] == score for t in terms)
        # raw contributions reconcile: each row is rounded separately,
        # so the sum of contribs matches total only to rounding slack
        assert abs(sum(t["contrib"] for t in terms) - score) <= 1e-6 * (
            len(terms) + 1
        )
        # every row is a real match with positive stats
        assert all(t["tf"] >= 1 and t["df"] >= 1 for t in terms)
