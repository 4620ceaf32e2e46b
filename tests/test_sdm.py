"""Sequential Dependence Model (operators/sdm.py).

Brute-force Python reference on a hand-sized corpus (same pins: mu,
W, integer lambda triple, micro quantization) + structural identities:
single-term queries are unigram-only, zero-cf bigram features
contribute nothing, and OOV unigrams drop.
"""

import math

import pytest
from pyspark.sql import functions as F

from mircv_project_spark.operators.positional import (
    build_positional_postings,
)
from mircv_project_spark.operators.sdm import (
    SDM_MU,
    SDM_W,
    sdm_topk,
)
from mircv_project_spark.functions.tokenizer import tokenize

DOCS = [
    (1, "fast table scan over the fast table"),
    (2, "table scan table scan table scan"),
    (3, "the quick brown fox jumps over a lazy dog"),
    (4, "fast query fast query plans"),
    (5, "scan table fast"),
    (6, "completely unrelated words here nothing shared"),
]


def _round_half_up(x: float) -> int:
    # Spark F.round / DuckDB round: half away from zero
    import decimal

    return int(
        decimal.Decimal(x).quantize(0, rounding=decimal.ROUND_HALF_UP)
    )


def brute_sdm(docs, queries, k=10, mu=SDM_MU, width=SDM_W):
    toks = {i: tokenize(t, False) for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    c_total = float(sum(dl.values()))
    cf: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            cf[t] = cf.get(t, 0) + 1

    def feat(tf: int, cfx: int, d: int) -> int:
        x = (float(tf) + (mu * float(cfx)) / c_total) / (float(dl[d]) + mu)
        return _round_half_up(math.log10(x) * 1e6)

    def o_tf(d, a, b):
        ps = toks[d]
        return sum(
            1
            for i, t in enumerate(ps)
            if t == a and i + 1 < len(ps) and ps[i + 1] == b
        )

    def u_tf(d, a, b):
        pa = [i for i, t in enumerate(toks[d]) if t == a]
        pb = [i for i, t in enumerate(toks[d]) if t == b]
        return sum(
            1 for p in pa for q in pb if q != p and abs(q - p) <= width - 1
        )

    out = []
    for qid, qtext in queries:
        qtoks = tokenize(qtext, False)
        uni = [t for t in qtoks if t in cf]
        cands = sorted(
            d for d, ts in toks.items() if any(t in ts for t in set(uni))
        )
        bigr = list(zip(qtoks, qtoks[1:]))
        ocf = {bg: sum(o_tf(d, *bg) for d in toks) for bg in set(bigr)}
        ucf = {bg: sum(u_tf(d, *bg) for d in toks) for bg in set(bigr)}
        rows = []
        for d in cands:
            t_micro = sum(
                feat(toks[d].count(t), cf[t], d) for t in uni
            )
            o_micro = sum(
                feat(o_tf(d, *bg), ocf[bg], d) if ocf[bg] > 0 else 0
                for bg in bigr
            )
            u_micro = sum(
                feat(u_tf(d, *bg), ucf[bg], d) if ucf[bg] > 0 else 0
                for bg in bigr
            )
            micro = 6 * t_micro + o_micro + u_micro
            rows.append((d, micro))
        rows.sort(key=lambda r: (-r[1], r[0]))
        for rank, (d, micro) in enumerate(rows[:k], 1):
            out.append((qid, d, rank, round(micro / 1e6, 6)))
    return out


@pytest.fixture(scope="module")
def pos_store(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_positional_postings(docs).persist()


def run(spark, pos_store, queries, k=10):
    got = sdm_topk(pos_store, queries, k=k)
    return [
        (r["qid"], r["id"], r["rank"], r["score"])
        for r in got.orderBy("qid", "rank").collect()
    ]


def test_sdm_matches_bruteforce(spark, pos_store):
    queries = [
        ("q1", "fast table scan"),
        ("q2", "table scan"),
        ("q3", "quick dog"),
    ]
    assert run(spark, pos_store, queries) == brute_sdm(DOCS, queries)


def test_single_term_is_unigram_only(spark, pos_store):
    # one-token query: no bigrams form; micro = 6 * unigram sum
    got = run(spark, pos_store, [("q", "table")])
    want = brute_sdm(DOCS, [("q", "table")])
    assert got == want
    assert len(got) == 3  # docs 1, 2, 5 contain 'table'


def test_zero_cf_bigram_contributes_zero(spark, pos_store):
    # 'dog fox' never occurs adjacent or within a window in doc 3
    # (order is fox..dog, uw8 still matches) — craft a pair with no
    # co-occurrence anywhere: 'quick nothing'
    got = run(spark, pos_store, [("q", "quick nothing")])
    want = brute_sdm(DOCS, [("q", "quick nothing")])
    assert got == want


def test_oov_unigrams_drop(spark, pos_store):
    got = run(spark, pos_store, [("q", "zzzmissing table")])
    want = brute_sdm(DOCS, [("q", "zzzmissing table")])
    assert got == want
    assert got  # 'table' still matches


def test_all_oov_query_empty(spark, pos_store):
    assert run(spark, pos_store, [("q", "zzz yyy")]) == []
