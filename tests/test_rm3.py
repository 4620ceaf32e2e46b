"""RM3 query expansion vs an independent pure-Python replication of
the pinned chain (operators/rm3.py docstring) over the sf0.001 corpus.
Oracle equality at sf0.01 is covered by the gate entry bm25_rm3_topk;
this cross-checks every intermediate stage with a second
implementation that shares no code with the operator."""

import math
from collections import defaultdict

from mircv_project_spark.operators.rm3 import (
    RM3_FB_DOCS,
    RM3_FB_TERMS,
    RM3_LAMBDA,
    rm3_topk,
)
from mircv_project_spark.operators.topk import query_terms
from mircv_project_spark.oracle import QUERY_SET


def _bm25(tf, dl, df, n_docs, avgdl):
    return (tf / ((1.5 * (0.3 + (0.7 * (dl / avgdl)))) + tf)) * math.log10(
        n_docs / df
    )


def _python_rm3(flat_rows, n_docs, avgdl, queries, k, fb_docs, fb_terms, lam):
    postings = defaultdict(list)  # term -> [(docid, tf, dl)]
    doc_terms = defaultdict(list)  # docid -> [(term, tf, dl)]
    df = defaultdict(int)
    for term, docid, tf, dl in flat_rows:
        postings[term].append((docid, tf, dl))
        doc_terms[docid].append((term, tf, dl))
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
        fb = [(-nd, s) for s, nd in ranked[:fb_docs]]
        # stage 2: relevance-model weights
        w = defaultdict(float)
        for docid, score in fb:
            for term, tf, dl in doc_terms[docid]:
                w[term] += score * tf / dl
        wsel = sorted(
            ((round(v, 6), t) for t, v in w.items()), key=lambda x: (-x[0], x[1])
        )[:fb_terms]
        wsum = sum(v for v, _ in wsel)
        # stage 3: interpolation over in-lexicon originals
        ql = float(sum(qex.values()))
        weight = defaultdict(float)
        for t, qtf in qex.items():
            weight[t] += lam * qtf / ql
        for v, t in wsel:
            weight[t] += (1.0 - lam) * v / wsum
        # stage 4: weighted BM25
        raw2 = defaultdict(float)
        for t, wt in weight.items():
            for docid, tf, dl in postings[t]:
                raw2[docid] += wt * _bm25(tf, dl, df[t], n_docs, avgdl)
        ranked2 = sorted(
            ((round(s, 6), -d) for d, s in raw2.items()),
            key=lambda x: (-x[0], -x[1]),
        )
        out[qid] = [
            (str(-nd - 1), i + 1, s) for i, (s, nd) in enumerate(ranked2[:k])
        ]
    return out


def test_rm3_matches_independent_python_model(spark, vb_index):
    idx, _ = vb_index
    got = rm3_topk(idx, QUERY_SET, k=10).collect()
    flat_rows = [
        (r["term"], r["docid"], r["tf"], r["doc_len"])
        for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_rm3(
        flat_rows,
        idx.n_docs,
        idx.avgdl,
        queries,
        10,
        RM3_FB_DOCS,
        RM3_FB_TERMS,
        RM3_LAMBDA,
    )
    got_by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["qid"], r["rank"])):
        got_by_q[r["qid"]].append((r["docno"], r["rank"], r["score"]))
    assert dict(got_by_q) == exp


def test_rm3_changes_the_ranking(spark, vb_index):
    """Sanity: expansion actually re-ranks at least one query vs the
    plain exhaustive run (otherwise the gate entry would silently test
    nothing beyond bm25_topk)."""
    from mircv_project_spark.operators import scoring, topk

    idx, _ = vb_index
    base = {
        (r["qid"], r["rank"]): r["docno"]
        for r in topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10).collect()
    }
    rm3 = {
        (r["qid"], r["rank"]): r["docno"]
        for r in rm3_topk(idx, QUERY_SET, k=10).collect()
    }
    assert rm3 != base
