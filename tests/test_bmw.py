"""Block-Max WAND (operators/bmw.py) — rank-identity + pruning proof.

BMW is rank-safe dynamic pruning, so it must reproduce the exhaustive
distributed ranking exactly (the same bar operators/maxscore.py is held
to): every query, both standards, both modes, multiple codecs.  The
pruning itself is proven structurally — a skewed regime where a
near-stopword's blocks mostly never decode.
"""

import math

import numpy as np
import pytest

from mircv_project_spark import config
from mircv_project_spark.functions import codecs
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.bmw import BMWCursor, block_max_wand, bmw_topk_df
from mircv_project_spark.operators.maxscore import (
    TermPostings,
    maxscore_topk,
    round6,
)
from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
from mircv_project_spark.sources.index_store import IndexReader
from tests.conftest import build_small_index as _build
from tests.conftest import cmp_rank_frames as _cmp

ALL_QUERIES = QUERY_SET + CONJ_QUERY_SET


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_bmw_equals_exhaustive(spark, vb_index, standard, conjunctive):
    idx, reader = vb_index
    ex = topk.exhaustive_topk(idx, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    bw = bmw_topk_df(reader, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    _cmp(ex, bw)


@pytest.mark.parametrize("codec", [codecs.GAMMA, codecs.EF])
def test_bmw_codecs_rank_identical(spark, codec):
    idx = _build(spark, parse=False, codec=codec)
    reader = IndexReader.from_memory(idx)
    ex = topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10)
    bw = bmw_topk_df(reader, QUERY_SET, scoring.BM25, k=10)
    _cmp(ex, bw)


# ------------------------- driver-level property -------------------------


def _tp_from_arrays(docids, tfs, dl, n_docs, avgdl, codec):
    docids = np.asarray(docids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dl = np.asarray(dl, dtype=np.int64)
    df = len(docids)
    idf = math.log10(n_docs / df)
    bj = config.BM25_ONE_MINUS_B + config.BM25_B * (dl / avgdl)
    bm_coeff = tfs / (config.BM25_K1 * bj + tfs)
    tf_coeff = 1 + np.log10(tfs)
    return TermPostings(
        term="",
        df=df,
        idf=idf,
        bm25_ub=float(bm_coeff.max() * idf),
        tfidf_ub=float(tf_coeff.max() * idf),
        blocks=codecs.encode_posting_blocks(docids, tfs, dl, codec=codec),
    ), (docids, tfs, dl)


def _mk_postings(rng, n_docs, dls, df, codec):
    docids = np.sort(
        rng.choice(np.arange(1, n_docs + 1), size=df, replace=False)
    ).astype(np.int64)
    tfs = rng.integers(1, 20, size=df).astype(np.int64)
    return _tp_from_arrays(docids, tfs, dls[docids - 1], n_docs, dls.mean(), codec)


def _brute(raw_lists, idfs, standard, avgdl, k, conjunctive):
    scores: dict[int, float] = {}
    counts: dict[int, int] = {}
    for (docids, tfs, dl), idf in zip(raw_lists, idfs):
        for d, tf, l in zip(docids, tfs, dl):
            if standard == scoring.BM25:
                bj = config.BM25_ONE_MINUS_B + config.BM25_B * (l / avgdl)
                s = (tf / (config.BM25_K1 * bj + tf)) * idf
            else:
                s = (1 + math.log10(tf)) * idf
            d = int(d)
            scores[d] = scores.get(d, 0.0) + s
            counts[d] = counts.get(d, 0) + 1
    items = [
        (d, s)
        for d, s in scores.items()
        if not conjunctive or counts[d] == len(raw_lists)
    ]
    items.sort(key=lambda t: (-round6(t[1]), t[0]))
    return [(d, round6(s)) for d, s in items[:k]]


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_bmw_randomized_vs_brute_and_maxscore(monkeypatch, standard, conjunctive):
    """Many random multi-block corpora: BMW == brute-force == MaxScore
    under the (rounded desc, docid asc) ranking, both modes."""
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)  # force splits
    for seed in range(25):
        rng = np.random.default_rng(seed)
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
        got = block_max_wand(
            [BMWCursor(tps[t], codecs.VB, standard, n_docs, avgdl) for t in toks],
            k,
            conjunctive,
        )
        got = [(d, round6(s)) for d, s in got]
        assert got == want, f"seed={seed} BMW != brute"
        ms = maxscore_topk(
            tps, toks, codecs.VB, standard, n_docs, avgdl, k, conjunctive
        )
        assert [(d, round6(s)) for d, s in ms] == want, f"seed={seed} maxscore"


def test_bmw_duplicate_tokens_double_score(monkeypatch):
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)
    rng = np.random.default_rng(7)
    n_docs = 100
    dls = rng.integers(1, 200, size=n_docs).astype(np.int64)
    tp, raw = _mk_postings(rng, n_docs, dls, 40, codecs.VB)
    avgdl = dls.mean()
    # token repeated twice -> every contribution doubles
    got = block_max_wand(
        [BMWCursor(tp, codecs.VB, scoring.BM25, n_docs, avgdl) for _ in range(2)],
        5,
        False,
    )
    want = _brute([raw, raw], [tp.idf, tp.idf], scoring.BM25, avgdl, 5, False)
    assert [(d, round6(s)) for d, s in got] == want


def test_bmw_block_metadata_bounds():
    """Per-block (max_tf, min_dl) metadata exists and really bounds the
    block's scores (the shallow-probe safety invariant)."""
    rng = np.random.default_rng(3)
    ids = np.cumsum(rng.integers(1, 9, size=2000).astype(np.uint64))
    tfs = rng.integers(1, 30, size=2000)
    dls = rng.integers(1, 500, size=2000)
    blocks = codecs.encode_posting_blocks(ids, tfs, dls, codec=codecs.VB)
    assert len(blocks) > 1
    for b in blocks:
        _, btf, bdl = codecs.decode_block(b, codec=codecs.VB)
        assert b["max_tf"] == int(btf.max())
        assert b["min_dl"] == int(bdl.min())


def _counting(loads):
    class CountingCursor(BMWCursor):
        __slots__ = ()

        def _load(self, bi):
            loads["n"] += 1
            super()._load(bi)

    return CountingCursor


def test_bmw_frontier_crosses_cold_run_without_decoding(monkeypatch):
    """A near-stopword whose head block is warm (tf=8) and whose ~134
    remaining blocks are uniformly cold (tf=1): once the heap holds the
    three warm docs, the shallow frontier must cross the ENTIRE cold
    tail metadata-only — the payloads never decode."""
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)
    n_docs = 20000
    df = 18000
    docids = np.arange(1, df + 1)
    tfs = np.ones(df, dtype=np.int64)
    tfs[:3] = 8  # warm head: docids 1..3
    dl = np.full(df, 100, dtype=np.int64)
    tp, raw = _tp_from_arrays(docids, tfs, dl, n_docs, 100.0, codecs.VB)
    assert len(tp.blocks) > 100

    loads = {"n": 0}
    got = block_max_wand(
        [_counting(loads)(tp, codecs.VB, scoring.BM25, n_docs, 100.0)], 3, False
    )
    want = _brute([raw], [tp.idf], scoring.BM25, 100.0, 3, False)
    assert [(d, round6(s)) for d, s in got] == want
    assert [d for d, _ in got] == [1, 2, 3]
    # block 0 decodes (init + the three warm evaluations), block 1 at
    # most (the next() off block 0's edge) — the cold run never does
    assert loads["n"] <= 2, loads


def test_bmw_pivot_terminates_on_exhausted_rare_list(monkeypatch):
    """Rare high-idf term early in the id space + flat stopword: after
    the rare docs score, theta exceeds the stopword's global UB and the
    pivot loop must terminate without touching the stopword tail."""
    monkeypatch.setattr(codecs, "BLOCK_THRESHOLD_BYTES", 64)
    n_docs = 20000
    dl_flat = 100
    c_ids = np.arange(1, 18001)
    common_tp, common_raw = _tp_from_arrays(
        c_ids, np.ones(18000), np.full(18000, dl_flat), n_docs, 100.0, codecs.VB
    )
    r_ids = np.array([10, 20, 30])
    rare_tp, rare_raw = _tp_from_arrays(
        r_ids, np.full(3, 20), np.full(3, dl_flat), n_docs, 100.0, codecs.VB
    )
    loads = {"n": 0}
    cls = _counting(loads)
    got = block_max_wand(
        [cls(tp, codecs.VB, scoring.BM25, n_docs, 100.0)
         for tp in (common_tp, rare_tp)],
        3,
        False,
    )
    want = _brute(
        [common_raw, rare_raw], [common_tp.idf, rare_tp.idf],
        scoring.BM25, 100.0, 3, False,
    )
    assert [(d, round6(s)) for d, s in got] == want
    assert [d for d, _ in got] == [10, 20, 30]
    total = len(common_tp.blocks) + len(rare_tp.blocks)
    assert total > 100
    assert loads["n"] <= 3, (loads["n"], total)  # head blocks only
