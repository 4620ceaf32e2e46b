"""Plain WAND (operators/wand.py) — rank-identity, third pruning family.

WAND prunes with global term UBs only, so like MaxScore/BMW it must
reproduce the exhaustive distributed ranking exactly: every query, both
standards, both modes, multiple codecs, and a randomized multi-block
property sweep against brute force and MaxScore."""

import numpy as np
import pytest

from mircv_project_spark.functions import codecs
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.maxscore import (
    PostingCursor,
    maxscore_topk,
    round6,
)
from mircv_project_spark.operators.wand import wand, wand_topk_df
from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
from mircv_project_spark.sources.index_store import IndexReader
from tests.conftest import build_small_index as _build
from tests.conftest import cmp_rank_frames as _cmp
from tests.test_bmw import _brute, _mk_postings

ALL_QUERIES = QUERY_SET + CONJ_QUERY_SET


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_wand_equals_exhaustive(spark, vb_index, standard, conjunctive):
    idx, reader = vb_index
    ex = topk.exhaustive_topk(idx, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    wd = wand_topk_df(reader, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    _cmp(ex, wd)


@pytest.mark.parametrize("codec", [codecs.GAMMA, codecs.EF])
def test_wand_codecs_rank_identical(spark, codec):
    idx = _build(spark, parse=False, codec=codec)
    reader = IndexReader.from_memory(idx)
    ex = topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10)
    wd = wand_topk_df(reader, QUERY_SET, scoring.BM25, k=10)
    _cmp(ex, wd)


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_wand_randomized_vs_brute_and_maxscore(monkeypatch, standard, conjunctive):
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)  # force splits
    for seed in range(25):
        rng = np.random.default_rng(1000 + seed)
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
        got = wand(
            [PostingCursor(tps[t], codecs.VB, standard, n_docs, avgdl) for t in toks],
            k,
            conjunctive,
        )
        assert [(d, round6(s)) for d, s in got] == want, f"seed={seed} WAND != brute"
        ms = maxscore_topk(
            tps, toks, codecs.VB, standard, n_docs, avgdl, k, conjunctive
        )
        assert [(d, round6(s)) for d, s in ms] == want, f"seed={seed} maxscore"


def test_wand_duplicate_tokens_double_score(monkeypatch):
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)
    rng = np.random.default_rng(7)
    n_docs = 100
    dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
    tp, raw = _mk_postings(rng, n_docs, dls, 40, codecs.VB)
    avgdl = dls.mean()
    got = wand(
        [PostingCursor(tp, codecs.VB, scoring.BM25, n_docs, avgdl) for _ in range(2)],
        5,
        False,
    )
    want = _brute([raw, raw], [tp.idf, tp.idf], scoring.BM25, avgdl, 5, False)
    assert [(d, round6(s)) for d, s in got] == want
