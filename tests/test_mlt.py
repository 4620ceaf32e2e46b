"""More-like-this vs an independent pure-Python replication of the
micro-quantized tf-idf cosine (operators/mlt.py docstring) over the
sf0.001 corpus; oracle equality at sf0.01 is covered by the gate
entry more_like_this."""

import math
from collections import defaultdict

from mircv_project_spark.operators.mlt import more_like_this
from mircv_project_spark.oracle import MLT_K, MLT_PROBE_DOCNOS


def _wq(tf, df, n_docs):
    return math.floor(
        1e6 * (1.0 + math.log10(tf)) * math.log10(n_docs / df) + 0.5
    )


def _python_mlt(flat_rows, n_docs, probe_docnos, k):
    df = defaultdict(int)
    for term, _, _ in flat_rows:
        df[term] += 1
    vec = defaultdict(dict)  # docid -> {term: wq}
    for term, docid, tf in flat_rows:
        vec[docid][term] = _wq(tf, df[term], n_docs)
    nrm = {
        d: math.sqrt(float(sum(w * w for w in v.values())))
        for d, v in vec.items()
    }
    out = {}
    for pd in probe_docnos:
        pid = pd + 1
        pv = vec.get(pid)
        if not pv:
            continue
        sims = []
        for d, v in vec.items():
            if d == pid:
                continue
            dot = sum(w * pv[t] for t, w in v.items() if t in pv)
            if dot:
                sims.append((round(dot / (nrm[pid] * nrm[d]), 6), d))
        sims.sort(key=lambda x: (-x[0], x[1]))
        out[str(pd)] = [
            (str(d - 1), i + 1, c) for i, (c, d) in enumerate(sims[:k])
        ]
    return out


def test_mlt_matches_independent_python_model(spark, vb_index):
    idx, _ = vb_index
    got = more_like_this(idx, MLT_PROBE_DOCNOS, k=MLT_K).collect()
    flat_rows = [
        (r["term"], r["docid"], r["tf"]) for r in idx.flat.collect()
    ]
    exp = _python_mlt(flat_rows, idx.n_docs, MLT_PROBE_DOCNOS, MLT_K)
    got_by_p = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["probe_docno"], r["rank"])):
        got_by_p[r["probe_docno"]].append((r["docno"], r["rank"], r["cos"]))
    assert dict(got_by_p) == exp


def test_mlt_self_similarity_excluded_and_scores_bounded(spark, vb_index):
    idx, _ = vb_index
    rows = more_like_this(idx, MLT_PROBE_DOCNOS, k=MLT_K).collect()
    assert rows
    for r in rows:
        assert r["probe_docno"] != r["docno"]
        assert 0.0 <= r["cos"] <= 1.000001
