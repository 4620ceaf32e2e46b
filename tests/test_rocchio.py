"""Rocchio feedback vs an independent pure-Python replication of the
pinned chain (operators/rocchio.py docstring) over the sf0.001 corpus.
Oracle equality at sf0.01 is covered by the gate entry rocchio_topk;
this cross-checks every intermediate stage with a second
implementation that shares no code with the operator."""

import math
from collections import defaultdict

from mircv_project_spark.operators.rocchio import (
    ROCCHIO_FB_DOCS,
    ROCCHIO_FB_TERMS,
    rocchio_topk,
)
from mircv_project_spark.operators.topk import query_terms
from mircv_project_spark.oracle import QUERY_SET


def _bm25(tf, dl, df, n_docs, avgdl):
    return (tf / ((1.5 * (0.3 + (0.7 * (dl / avgdl)))) + tf)) * math.log10(
        n_docs / df
    )


def _wq(tf, df, n_docs):
    # Spark F.round to 0 scale is HALF_UP; the operand is nonnegative.
    return math.floor(1e6 * (1.0 + math.log10(tf)) * math.log10(n_docs / df) + 0.5)


def _python_rocchio(flat_rows, n_docs, avgdl, queries, k, fb_docs, fb_terms):
    postings = defaultdict(list)  # term -> [(docid, tf, dl)]
    doc_terms = defaultdict(list)  # docid -> [(term, tf)]
    df = defaultdict(int)
    for term, docid, tf, dl in flat_rows:
        postings[term].append((docid, tf, dl))
        doc_terms[docid].append((term, tf))
        df[term] += 1

    out = {}
    for qid, term_tfs in queries.items():
        qex = {t: n for t, n in term_tfs.items() if t in postings}
        if not qex:
            continue
        # stage 1: first-pass BM25, round 6, (score desc, docid asc)
        raw = defaultdict(float)
        for t, qtf in qex.items():
            for docid, tf, dl in postings[t]:
                raw[docid] += qtf * _bm25(tf, dl, df[t], n_docs, avgdl)
        ranked = sorted(
            ((round(s, 6), -d) for d, s in raw.items()), key=lambda x: (-x[0], -x[1])
        )
        fb = [-nd for _, nd in ranked[:fb_docs]]
        # stages 2-3: exact integer centroid sums over the feedback docs
        cent = defaultdict(int)
        for docid in fb:
            for term, tf in doc_terms[docid]:
                cent[term] += _wq(tf, df[term], n_docs)
        # stage 4: selected weights
        qw = {}
        for t, qtf in qex.items():
            qw[t] = fb_docs * qtf * 1_000_000 + cent.get(t, 0)
        exp = sorted(
            ((s, t) for t, s in cent.items() if t not in qex),
            key=lambda x: (-x[0], x[1]),
        )[:fb_terms]
        for s, t in exp:
            qw[t] = s
        # stage 5: exact integer final scores
        scaled = defaultdict(int)
        for t, w in qw.items():
            for docid, tf, dl in postings[t]:
                scaled[docid] += w * _wq(tf, df[t], n_docs)
        ranked2 = sorted(
            ((s, -d) for d, s in scaled.items()), key=lambda x: (-x[0], -x[1])
        )
        out[qid] = [
            (str(-nd - 1), i + 1, round(s / 1e12, 6))
            for i, (s, nd) in enumerate(ranked2[:k])
        ]
    return out


def test_rocchio_matches_independent_python_model(spark, vb_index):
    idx, _ = vb_index
    got = rocchio_topk(idx, QUERY_SET, k=10).collect()
    flat_rows = [
        (r["term"], r["docid"], r["tf"], r["doc_len"])
        for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_rocchio(
        flat_rows,
        idx.n_docs,
        idx.avgdl,
        queries,
        10,
        ROCCHIO_FB_DOCS,
        ROCCHIO_FB_TERMS,
    )
    got_by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["qid"], r["rank"])):
        got_by_q[r["qid"]].append((r["docno"], r["rank"], r["score"]))
    assert dict(got_by_q) == exp


def test_rocchio_changes_the_ranking(spark, vb_index):
    """Sanity: centroid expansion actually re-ranks at least one query
    vs the plain exhaustive run."""
    from mircv_project_spark.operators import scoring, topk

    idx, _ = vb_index
    base = {
        (r["qid"], r["rank"]): r["docno"]
        for r in topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10).collect()
    }
    roc = {
        (r["qid"], r["rank"]): r["docno"]
        for r in rocchio_topk(idx, QUERY_SET, k=10).collect()
    }
    assert roc != base
