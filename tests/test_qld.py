"""Dirichlet query-likelihood (operators/qld.py) vs an independent
pure-Python model over the sf0.001 corpus, plus edge semantics the
oracle gate can't isolate (filtered candidates, in-lexicon |q|)."""

import math

import pytest

from mircv_project_spark import oracle
from mircv_project_spark.functions.tokenizer import tokenize
from mircv_project_spark.operators.qld import QLD_MU, qld_topk


def _python_qld(docs_tokens, queries, k, mu):
    """Independent model: dict-based postings, same micro quantization."""
    cf, dl = {}, {}
    postings = {}
    for docid, toks in docs_tokens.items():
        dl[docid] = len(toks)
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
            postings.setdefault(t, {}).setdefault(docid, 0)
            postings[t][docid] += 1
    c_total = float(sum(dl.values()))

    def half_away(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    out = {}
    for qid, text in queries:
        counts = {}
        for tok in tokenize(text, parse=False):
            counts[tok] = counts.get(tok, 0) + 1
        counts = {t: c for t, c in counts.items() if t in cf}
        if not counts:
            out[qid] = []
            continue
        q_total = sum(counts.values())
        micro = {}
        for t, qtf in counts.items():
            for d in postings[t]:
                wd = half_away(
                    math.log10(1.0 + (float(postings[t][d]) * c_total) / (mu * float(cf[t])))
                    * 1e6
                )
                micro[d] = micro.get(d, 0) + qtf * wd
        for d in micro:
            micro[d] += q_total * half_away(
                math.log10(mu / (dl[d] + mu)) * 1e6
            )
        ranked = sorted(micro.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [
            (str(d - 1), i + 1, round(m / 1e6, 6))
            for i, (d, m) in enumerate(ranked)
        ]
    return out


@pytest.fixture(scope="module")
def small_index(vb_index):
    return vb_index[0]


def test_qld_matches_python_model(spark, small_index):
    idx = small_index
    rows = idx.tokenized.select("docid", "terms").collect()
    docs_tokens = {
        r["docid"]: [t["term"] for t in r["terms"] for _ in range(t["tf"])]
        for r in rows
    }
    expect = _python_qld(docs_tokens, oracle.QUERY_SET, oracle.TOPK_K, QLD_MU)

    got = {}
    for r in qld_topk(idx, oracle.QUERY_SET, k=oracle.TOPK_K).collect():
        got.setdefault(r["qid"], []).append((r["docno"], r["rank"], r["score"]))
    for qid in got:
        got[qid].sort(key=lambda x: x[1])

    for qid, _ in oracle.QUERY_SET:
        assert got.get(qid, []) == expect[qid], qid


def _python_qljm(docs_tokens, queries, k):
    """Independent Jelinek-Mercer model (lambda=0.5: odds factor 1,
    query constant = |q| * -301030)."""
    cf, dl = {}, {}
    postings = {}
    for docid, toks in docs_tokens.items():
        dl[docid] = len(toks)
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
            postings.setdefault(t, {}).setdefault(docid, 0)
            postings[t][docid] += 1
    c_total = float(sum(dl.values()))

    def half_away(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    out = {}
    for qid, text in queries:
        counts = {}
        for tok in tokenize(text, parse=False):
            counts[tok] = counts.get(tok, 0) + 1
        counts = {t: c for t, c in counts.items() if t in cf}
        if not counts:
            out[qid] = []
            continue
        q_total = sum(counts.values())
        micro = {}
        for t, qtf in counts.items():
            for d in postings[t]:
                wd = half_away(
                    math.log10(
                        1.0
                        + (float(postings[t][d]) * c_total)
                        / (float(dl[d]) * float(cf[t]))
                    )
                    * 1e6
                )
                micro[d] = micro.get(d, 0) + qtf * wd
        for d in micro:
            micro[d] += q_total * -301030
        ranked = sorted(micro.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [
            (str(d - 1), i + 1, round(m / 1e6, 6))
            for i, (d, m) in enumerate(ranked)
        ]
    return out


def test_qljm_matches_python_model(spark, small_index):
    from mircv_project_spark.operators.qld import qljm_topk

    idx = small_index
    rows = idx.tokenized.select("docid", "terms").collect()
    docs_tokens = {
        r["docid"]: [t["term"] for t in r["terms"] for _ in range(t["tf"])]
        for r in rows
    }
    expect = _python_qljm(docs_tokens, oracle.QUERY_SET, oracle.TOPK_K)

    got = {}
    for r in qljm_topk(idx, oracle.QUERY_SET, k=oracle.TOPK_K).collect():
        got.setdefault(r["qid"], []).append((r["docno"], r["rank"], r["score"]))
    for qid in got:
        got[qid].sort(key=lambda x: x[1])

    for qid, _ in oracle.QUERY_SET:
        assert got.get(qid, []) == expect[qid], qid


def test_qljm_lambda_constant_matches_log10(spark):
    # the pinned literal IS round(1e6 * log10(0.5)) — if this drifts,
    # someone changed lambda without re-deriving the constant
    from mircv_project_spark.operators.qld import JM_LAMBDA, JM_LOG_LAMBDA_MICRO

    assert JM_LAMBDA == 0.5
    assert JM_LOG_LAMBDA_MICRO == round(math.log10(0.5) * 1e6)


def test_qljm_rank_differs_from_dirichlet_somewhere(spark, small_index):
    """JM normalizes by dl inside the log while Dirichlet adds a
    separate length part — on a length-varied corpus the two must not
    be rank-identical everywhere (otherwise the gate adds nothing)."""
    from mircv_project_spark.operators.qld import qljm_topk

    a = {
        (r["qid"], r["rank"]): r["docno"]
        for r in qld_topk(small_index, oracle.QUERY_SET, k=10).collect()
    }
    b = {
        (r["qid"], r["rank"]): r["docno"]
        for r in qljm_topk(small_index, oracle.QUERY_SET, k=10).collect()
    }
    assert a != b


def test_qld_drops_out_of_lexicon_terms(spark, small_index):
    # q07 mixes a missing term with an existing one: |q| must count only
    # the in-lexicon token, so scores equal the single-term query's.
    single = qld_topk(small_index, [("x", "spark")], k=5).collect()
    mixed = qld_topk(small_index, [("x", "warpcore spark")], k=5).collect()
    assert [(r["docno"], r["score"]) for r in single] == [
        (r["docno"], r["score"]) for r in mixed
    ]


def test_qld_all_missing_terms_empty(spark, small_index):
    assert qld_topk(small_index, [("x", "warpcore flux")], k=5).count() == 0


def _python_qlad(docs_tokens, queries, k):
    """Independent absolute-discount model (delta=0.5 folded into the
    integer forms 2*tf-1 and du/(2*dl))."""
    cf, dl, du = {}, {}, {}
    postings = {}
    for docid, toks in docs_tokens.items():
        dl[docid] = len(toks)
        du[docid] = len(set(toks))
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
            postings.setdefault(t, {}).setdefault(docid, 0)
            postings[t][docid] += 1
    c_total = float(sum(dl.values()))

    def half_away(x):
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    out = {}
    for qid, text in queries:
        counts = {}
        for tok in tokenize(text, parse=False):
            counts[tok] = counts.get(tok, 0) + 1
        counts = {t: c for t, c in counts.items() if t in cf}
        if not counts:
            out[qid] = []
            continue
        q_total = sum(counts.values())
        micro = {}
        for t, qtf in counts.items():
            for d in postings[t]:
                wd = half_away(
                    math.log10(
                        1.0
                        + (float(2 * postings[t][d] - 1) * c_total)
                        / (float(du[d]) * float(cf[t]))
                    )
                    * 1e6
                )
                micro[d] = micro.get(d, 0) + qtf * wd
        for d in micro:
            micro[d] += q_total * half_away(
                math.log10(float(du[d]) / (2.0 * float(dl[d]))) * 1e6
            )
        ranked = sorted(micro.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [
            (str(d - 1), i + 1, round(m / 1e6, 6))
            for i, (d, m) in enumerate(ranked)
        ]
    return out


def test_qlad_matches_python_model(spark, small_index):
    from mircv_project_spark.operators.qld import qlad_topk

    idx = small_index
    rows = idx.tokenized.select("docid", "terms").collect()
    docs_tokens = {
        r["docid"]: [t["term"] for t in r["terms"] for _ in range(t["tf"])]
        for r in rows
    }
    expect = _python_qlad(docs_tokens, oracle.QUERY_SET, oracle.TOPK_K)

    got = {}
    for r in qlad_topk(idx, oracle.QUERY_SET, k=oracle.TOPK_K).collect():
        got.setdefault(r["qid"], []).append((r["docno"], r["rank"], r["score"]))
    for qid in got:
        got[qid].sort(key=lambda x: x[1])

    for qid, _ in oracle.QUERY_SET:
        assert got.get(qid, []) == expect[qid], qid
