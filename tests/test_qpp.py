"""Clarity QPP vs an independent pure-Python replication of the
pinned chain (operators/qpp.py docstring) over the sf0.001 corpus;
oracle equality at sf0.01 is covered by the gate entry
clarity_scores."""

import math
from collections import defaultdict

from mircv_project_spark.operators.qpp import QPP_FB_DOCS, clarity_scores
from mircv_project_spark.operators.topk import query_terms
from mircv_project_spark.oracle import QUERY_SET


def _bm25(tf, dl, df, n_docs, avgdl):
    return (tf / ((1.5 * (0.3 + (0.7 * (dl / avgdl)))) + tf)) * math.log10(
        n_docs / df
    )


def _python_clarity(flat_rows, n_docs, avgdl, queries, fb_docs):
    postings = defaultdict(list)
    doc_terms = defaultdict(list)
    df = defaultdict(int)
    cf_total = 0
    for term, docid, tf, dl in flat_rows:
        postings[term].append((docid, tf, dl))
        doc_terms[docid].append((term, tf, dl))
        df[term] += 1
        cf_total += tf
    cf = defaultdict(int)
    for term, docid, tf, dl in flat_rows:
        cf[term] += tf

    out = {}
    for qid, term_tfs in queries.items():
        qex = {t: n for t, n in term_tfs.items() if t in postings}
        if not qex:
            continue
        raw = defaultdict(float)
        for t, qtf in qex.items():
            for docid, tf, dl in postings[t]:
                raw[docid] += qtf * _bm25(tf, dl, df[t], n_docs, avgdl)
        ranked = sorted(
            ((round(s, 6), -d) for d, s in raw.items()),
            key=lambda x: (-x[0], -x[1]),
        )
        fb = [(-nd, s) for s, nd in ranked[:fb_docs]]
        w = defaultdict(float)
        for docid, score in fb:
            for term, tf, dl in doc_terms[docid]:
                w[term] += score * tf / dl
        wq = {
            t: math.floor(1e6 * v + 0.5)
            for t, v in w.items()
            if math.floor(1e6 * v + 0.5) >= 1
        }
        if not wq:
            continue
        W = sum(wq.values())
        s_sum = 0
        for t, q in wq.items():
            cq = math.floor(
                1e6
                * math.log10((float(q) * float(cf_total)) / (float(W) * float(cf[t])))
                + 0.5
            )
            s_sum += q * cq
        out[qid] = (len(wq), W, round(s_sum / (W * 1e6), 6))
    return out


def test_clarity_matches_independent_python_model(spark, vb_index):
    idx, _ = vb_index
    got = {
        r["qid"]: (r["n_terms"], r["w_total"], r["clarity"])
        for r in clarity_scores(idx, QUERY_SET).collect()
    }
    flat_rows = [
        (r["term"], r["docid"], r["tf"], r["doc_len"])
        for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_clarity(
        flat_rows, idx.n_docs, idx.avgdl, queries, QPP_FB_DOCS
    )
    assert got == exp


def test_clarity_discriminates(spark, vb_index):
    """Sanity: clarity over the pinned query set is not constant (the
    point of QPP is to separate specific from collection-like
    queries)."""
    idx, _ = vb_index
    vals = [r["clarity"] for r in clarity_scores(idx, QUERY_SET).collect()]
    assert len(vals) >= 2 and len(set(vals)) >= 2


def _python_preqpp(flat_rows, n_docs, queries):
    cf = defaultdict(int)
    df = defaultdict(int)
    c_total = 0
    for term, docid, tf, dl in flat_rows:
        cf[term] += tf
        df[term] += 1
        c_total += tf

    def half_away(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    out = {}
    for qid, term_tfs in queries.items():
        qex = {t: n for t, n in term_tfs.items() if t in cf}
        if not qex:
            continue
        ql = sum(qex.values())
        idf_u = [half_away(1e6 * math.log10(n_docs / df[t])) for t in qex]
        ictf_u = [half_away(1e6 * math.log10(c_total / cf[t])) for t in qex]
        scq_u = [
            half_away(
                1e6
                * (
                    (1.0 + math.log(float(cf[t])))
                    * math.log(1.0 + float(n_docs) / float(df[t]))
                )
            )
            for t in qex
        ]
        scs_c = sum(
            qtf
            * half_away(
                1e6
                * math.log10(
                    (float(qtf) * float(c_total)) / (float(ql) * float(cf[t]))
                )
            )
            for t, qtf in qex.items()
        )
        n = len(qex)
        out[qid] = (
            n,
            ql,
            round(half_away(sum(idf_u) / n) / 1e6, 6),
            round(max(idf_u) / 1e6, 6),
            round(half_away(sum(ictf_u) / n) / 1e6, 6),
            round(half_away(scs_c / ql) / 1e6, 6),
            round(sum(scq_u) / 1e6, 6),
        )
    return out


def test_preretrieval_qpp_matches_python_model(spark, vb_index):
    from mircv_project_spark.operators.qpp import preretrieval_qpp

    idx, _ = vb_index
    got = {
        r["qid"]: (
            r["n_terms"],
            r["ql"],
            r["avg_idf"],
            r["max_idf"],
            r["avg_ictf"],
            r["scs"],
            r["scq_sum"],
        )
        for r in preretrieval_qpp(idx, QUERY_SET).collect()
    }
    flat_rows = [
        (r["term"], r["docid"], r["tf"], r["doc_len"])
        for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_preqpp(flat_rows, idx.n_docs, queries)
    assert got == exp


def test_preretrieval_qpp_touches_no_postings(spark, vb_index):
    """The whole point: the plan must not scan the flat postings — the
    only inputs are the lexicon aggregate and the tiny query table."""
    from mircv_project_spark.operators.qpp import preretrieval_qpp
    from mircv_project_spark.plans import checks

    idx, _ = vb_index
    plan = checks.plan_text(preretrieval_qpp(idx, QUERY_SET))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_postretrieval_qpp_matches_python_model(spark, vb_index):
    """WIG/NQC recomputed in Python from the engine's own round-6 run
    must match the operator exactly (integer micro discipline)."""
    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.operators.qpp import postretrieval_qpp

    idx, _ = vb_index
    run = topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10)
    sus: dict[str, list[int]] = {}
    for r in run.collect():
        sus.setdefault(r["qid"], []).append(int(round(r["score"] * 1e6)))
    qt = topk.query_terms(QUERY_SET, idx.parse)
    vocab = {r["term"] for r in idx.lexicon.select("term").collect()}
    nterms = {}
    for q, t, _ in qt:
        if t in vocab:
            nterms.setdefault(q, set()).add(t)

    got = {
        r["qid"]: (
            r["k_used"], r["n_terms"], r["s_sum"], r["s_sq"],
            r["wig"], r["nqc"],
        )
        for r in postretrieval_qpp(idx, QUERY_SET, k=10).collect()
    }
    assert set(got) == set(sus)
    for qid, su in sus.items():
        k_used = len(su)
        s, q2 = sum(su), sum(x * x for x in su)
        n = len(nterms[qid])
        wig = round(s / (k_used * math.sqrt(n) * 1e6), 6)
        nqc = 0.0 if s <= 0 else round(
            math.sqrt(float(k_used * q2 - s * s)) / float(s), 6
        )
        assert got[qid] == (k_used, n, s, q2, wig, nqc), qid
