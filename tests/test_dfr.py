"""PL2 (DFR) ranking vs an independent pure-Python replication of the
pinned chain (operators/dfr.py docstring) over the sf0.001 corpus;
oracle equality at sf0.01 is covered by the gate entry pl2_topk."""

import math
from collections import defaultdict

from mircv_project_spark.operators.dfr import L2, LOG2E, TWO_PI, pl2_topk
from mircv_project_spark.operators.topk import query_terms
from mircv_project_spark.oracle import QUERY_SET


def _half_away(x):
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _python_pl2(flat_rows, n_docs, avgdl, queries, k=10):
    cf = defaultdict(int)
    postings = defaultdict(list)
    for term, docid, tf, dl in flat_rows:
        cf[term] += tf
        postings[term].append((docid, tf, dl))

    out = {}
    for qid, term_tfs in queries.items():
        qex = {t: n for t, n in term_tfs.items() if t in cf}
        if not qex:
            continue
        micro = defaultdict(int)
        for t, qtf in qex.items():
            lam = float(cf[t]) / float(n_docs)
            for docid, tf, dl in postings[t]:
                g = math.log10(1.0 + avgdl / float(dl))
                tfn = (float(tf) * g) / L2
                t1 = (tfn * math.log10(tfn / lam)) / L2
                t2 = (lam - tfn) * LOG2E
                t3 = (0.5 * math.log10(TWO_PI * tfn)) / L2
                w = ((t1 + t2) + t3) / (tfn + 1.0)
                micro[docid] += qtf * _half_away(w * 1e6)
        ranked = sorted(micro.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [
            (str(d - 1), r + 1, round(m / 1e6, 6))
            for r, (d, m) in enumerate(ranked)
        ]
    return out


def test_pl2_matches_independent_python_model(spark, vb_index):
    idx, _ = vb_index
    got = defaultdict(list)
    for r in pl2_topk(idx, QUERY_SET, k=10).orderBy("qid", "rank").collect():
        got[r["qid"]].append((r["docno"], r["rank"], r["score"]))
    flat_rows = [
        (r["term"], r["docid"], r["tf"], r["doc_len"])
        for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_pl2(flat_rows, idx.n_docs, idx.avgdl, queries)
    assert dict(got) == exp


def test_pl2_differs_from_bm25_somewhere(spark, vb_index):
    """PL2 is a genuinely different model — on the pinned query set it
    must not be a rank-identical clone of BM25 (else the gate adds no
    coverage)."""
    from mircv_project_spark.operators import scoring, topk

    idx, _ = vb_index
    pl2 = {
        (r["qid"], r["rank"]): r["docno"]
        for r in pl2_topk(idx, QUERY_SET, k=10).collect()
    }
    bm = {
        (r["qid"], r["rank"]): r["docno"]
        for r in topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10).collect()
    }
    common = set(pl2) & set(bm)
    assert common and any(pl2[key] != bm[key] for key in common)


def test_pl2_literal_constants_match_math():
    """The base-conversion constants are pinned as LITERALS on both
    engine sides (JVM log2-via-ln differs in the last ulp from C
    log2) — guard that the literals are the correctly-rounded doubles
    they claim to be."""
    assert L2 == math.log10(2.0)
    assert LOG2E == 1.0 / math.log(2.0)
    assert TWO_PI == 2.0 * math.pi


def _python_dph(flat_rows, n_docs, avgdl, queries, k=10):
    cf = defaultdict(int)
    postings = defaultdict(list)
    for term, docid, tf, dl in flat_rows:
        cf[term] += tf
        postings[term].append((docid, tf, dl))

    out = {}
    for qid, term_tfs in queries.items():
        qex = {t: n for t, n in term_tfs.items() if t in cf}
        if not qex:
            continue
        micro = defaultdict(int)
        for t, qtf in qex.items():
            for docid, tf, dl in postings[t]:
                if tf == dl:
                    continue  # the pinned zero contribution
                tf_d, dl_d = float(tf), float(dl)
                f = tf_d / dl_d
                norm = ((1.0 - f) * (1.0 - f)) / (tf_d + 1.0)
                t1 = (
                    tf_d
                    * math.log10(
                        ((tf_d * avgdl) / dl_d)
                        * (float(n_docs) / float(cf[t]))
                    )
                ) / L2
                t2 = (
                    0.5 * math.log10((TWO_PI * tf_d) * (1.0 - f))
                ) / L2
                w = norm * (t1 + t2)
                micro[docid] += qtf * _half_away(w * 1e6)
        ranked = sorted(micro.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[qid] = [
            (str(d - 1), r + 1, round(m / 1e6, 6))
            for r, (d, m) in enumerate(ranked)
        ]
    return out


def test_dph_matches_independent_python_model(spark, vb_index):
    from mircv_project_spark.operators.dfr import dph_topk

    idx, _ = vb_index
    got = defaultdict(list)
    for r in dph_topk(idx, QUERY_SET, k=10).orderBy("qid", "rank").collect():
        got[r["qid"]].append((r["docno"], r["rank"], r["score"]))
    flat_rows = [
        (r["term"], r["docid"], r["tf"], r["doc_len"])
        for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_dph(flat_rows, idx.n_docs, idx.avgdl, queries)
    assert dict(got) == exp
