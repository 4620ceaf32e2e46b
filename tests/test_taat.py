"""TAAT accumulator retrieval (operators/taat.py): exact when
unbounded, graceful under an accumulator cap (Continue strategy)."""

import numpy as np
import pytest

from mircv_project_spark.functions import codecs
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.maxscore import maxscore_topk, round6
from mircv_project_spark.operators.taat import taat_topk, taat_topk_df
from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
from mircv_project_spark.sources.index_store import IndexReader
from tests.conftest import build_small_index as _build
from tests.conftest import cmp_rank_frames as _cmp
from tests.test_bmw import _brute, _mk_postings

ALL_QUERIES = QUERY_SET + CONJ_QUERY_SET


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_taat_unbounded_equals_exhaustive(spark, vb_index, standard, conjunctive):
    idx, reader = vb_index
    ex = topk.exhaustive_topk(idx, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    ta = taat_topk_df(reader, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    _cmp(ex, ta)


@pytest.mark.parametrize("codec", [codecs.GAMMA, codecs.EF])
def test_taat_codecs_rank_identical(spark, codec):
    idx = _build(spark, parse=False, codec=codec)
    reader = IndexReader.from_memory(idx)
    ex = topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10)
    ta = taat_topk_df(reader, QUERY_SET, scoring.BM25, k=10)
    _cmp(ex, ta)


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_taat_randomized_vs_brute(monkeypatch, standard, conjunctive):
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)
    for seed in range(25):
        rng = np.random.default_rng(2000 + seed)
        n_docs = int(rng.integers(30, 400))
        dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
        avgdl = dls.mean()
        n_terms = int(rng.integers(1, 5))
        tps, raws, idfs = {}, [], []
        for t in range(n_terms):
            df = int(rng.integers(1, n_docs + 1))
            tp, raw = _mk_postings(rng, n_docs, dls, df, codecs.VB)
            tps[f"t{t}"] = tp
            raws.append(raw)
            idfs.append(tp.idf)
        toks = [f"t{t}" for t in range(n_terms)]
        k = int(rng.integers(1, 15))
        want = _brute(raws, idfs, standard, avgdl, k, conjunctive)
        got = taat_topk(
            tps, toks, codecs.VB, standard, n_docs, avgdl, k, conjunctive
        )
        assert [(d, round6(s)) for d, s in got] == want, f"seed={seed}"
        ms = maxscore_topk(
            tps, toks, codecs.VB, standard, n_docs, avgdl, k, conjunctive
        )
        assert [(d, round6(s)) for d, s in ms] == want


def test_taat_bounded_continue_recall(vb_index):
    """CONTINUE strategy: rarest-first processing means a generous cap
    keeps high recall vs the exact ranking, a tiny cap still returns
    results, and every returned doc's SCORE is exact (accumulators
    absorb all later updates)."""
    from mircv_project_spark.operators.maxscore import maxscore_topk_df

    _, reader = vb_index
    exact = maxscore_topk_df(reader, QUERY_SET, scoring.BM25, k=10).collect()
    exact_by_q = {}
    exact_score = {}
    for r in exact:
        exact_by_q.setdefault(r["qid"], set()).add(r["docno"])
        exact_score[(r["qid"], r["docno"])] = r["score"]

    # this corpus is near-uniform-tf (docs are close substitutes), so
    # recall under a cap tracks cap/corpus-size roughly linearly:
    # measured 0.27/0.5/0.75/1.0 at caps 100/200/300/400 over 500 docs.
    # Pin the monotone staircase rather than one arbitrary floor.
    last = 0.0
    for cap, floor in ((200, 0.45), (300, 0.7), (400, 0.95)):
        capped = taat_topk_df(
            reader, QUERY_SET, scoring.BM25, k=10, acc_cap=cap
        ).collect()
        hits = sum(
            1 for r in capped if r["docno"] in exact_by_q.get(r["qid"], set())
        )
        recall = hits / len(exact)
        assert recall >= max(floor, last), (cap, recall)
        last = recall
    capped = taat_topk_df(reader, QUERY_SET, scoring.BM25, k=10, acc_cap=200).collect()
    for r in capped:  # nominated docs carry their exact score
        key = (r["qid"], r["docno"])
        if key in exact_score:
            assert r["score"] == exact_score[key]

    tiny = taat_topk_df(reader, QUERY_SET, scoring.BM25, k=10, acc_cap=5).collect()
    assert tiny  # still serves under a 5-accumulator budget


def test_taat_duplicate_tokens_double_score(monkeypatch):
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)
    rng = np.random.default_rng(7)
    n_docs = 100
    dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
    tp, raw = _mk_postings(rng, n_docs, dls, 40, codecs.VB)
    avgdl = dls.mean()
    got = taat_topk(
        {"t": tp}, ["t", "t"], codecs.VB, scoring.BM25, n_docs,
        avgdl, 5, False,
    )
    want = _brute([raw, raw], [tp.idf, tp.idf], scoring.BM25, avgdl, 5, False)
    assert [(d, round6(s)) for d, s in got] == want
