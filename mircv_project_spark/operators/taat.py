"""Term-at-a-time (TAAT) accumulator retrieval, rank-identical when
unbounded.

The third index-traversal strategy beside document-at-a-time
(operators/maxscore.py MaxScore, operators/wand.py WAND,
operators/bmw.py Block-Max WAND — the reference's own family,
``queryProcessor/Scorer.java``) and score-at-a-time
(operators/impact.py impact-ordered SAAT): classic TAAT with
accumulators in the Moffat & Zobel mold ("Self-indexing inverted files
for fast text retrieval", TOIS 1996).

Terms process in ASCENDING df order (rarest first — their postings
nominate the highest-idf accumulators before any common term floods the
table); each term's whole posting list streams once, adding
qtf * score into a per-doc accumulator.  ``acc_cap`` bounds the
accumulator table with the CONTINUE strategy: once the table is full,
no NEW accumulators are created but existing ones keep absorbing
updates — recall degrades gracefully on common-term-only docs while
every already-nominated doc's score stays exact.

acc_cap=None is exact: every posting accumulates, and the final
ranking applies the exhaustive rounding/tie rules (round(score, 6)
desc, docid asc) — the gate regime, sharing the exhaustive SQL oracle.
The bounded regime's recall floor lives in tests/test_taat.py.

Duplicate query tokens open one accumulation pass per OCCURRENCE
(double-scoring, as in the reference's getPostingLists); conjunctive
mode requires a doc present in EVERY cursor's list (strict
intersection — the maxscore.max_score contract).
"""

from __future__ import annotations

import numpy as np

from .maxscore import (
    PostingCursor,
    TermPostings,
    maxscore_topk_df,
    round6,
)
from . import scoring  # noqa: F401


def _term_arrays(tp: TermPostings, codec: str, standard: str,
                 n_docs: int, avgdl: float):
    """Full (docids, scores) of one term's list as flat numpy arrays —
    reuses PostingCursor's memoized per-block decode + score vectors
    (read-only; the arrays concatenate, never mutate the cache)."""
    cur = PostingCursor(tp, codec, standard, n_docs, avgdl)
    ids, scores = [], []
    bi = 0
    while bi < len(tp.blocks):
        cur._load(bi)
        ids.append(cur._ids)
        scores.append(np.asarray(cur._scores, dtype=np.float64))
        bi += 1
    if not ids:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    return np.concatenate(ids), np.concatenate(scores)


def taat_topk(
    term_postings: dict[str, TermPostings],
    query_tokens: list[str],
    codec: str,
    standard: str,
    n_docs: int,
    avgdl: float,
    k: int,
    conjunctive: bool,
    acc_cap: int | None = None,
) -> list[tuple[int, float]]:
    """[(docid, raw_score)] sorted by (-round(score,6), docid), length
    <= k — the maxscore.max_score contract."""
    toks = [t for t in query_tokens if t in term_postings]
    if not toks or k <= 0:
        return []
    # rarest-first processing order (df asc, term asc for determinism)
    toks.sort(key=lambda t: (term_postings[t].df, t))

    acc: dict[int, float] = {}
    cnt: dict[int, int] = {}
    for t in toks:
        ids, scores = _term_arrays(
            term_postings[t], codec, standard, n_docs, avgdl
        )
        for d, s in zip(ids.tolist(), scores.tolist()):
            a = acc.get(d)
            if a is None:
                if acc_cap is not None and len(acc) >= acc_cap:
                    continue  # CONTINUE strategy: no new accumulators
                acc[d] = s
                cnt[d] = 1
            else:
                acc[d] = a + s
                cnt[d] += 1

    n_req = len(toks)
    items = [
        (d, s)
        for d, s in acc.items()
        if not conjunctive or cnt[d] == n_req
    ]
    items.sort(key=lambda t: (-round6(t[1]), t[0]))
    return items[:k]


def taat_topk_fn(acc_cap: int | None = None):
    """maxscore_topk_df-compatible scorer with a bound accumulator cap."""

    def fn(tp, toks, codec, standard, n_docs, avgdl, k, conjunctive):
        return taat_topk(
            tp, toks, codec, standard, n_docs, avgdl, k, conjunctive,
            acc_cap=acc_cap,
        )

    return fn


def taat_topk_df(
    reader,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
    conjunctive: bool = False,
    acc_cap: int | None = None,
):
    """Batch evaluation over an IndexReader -> DataFrame(qid, docno,
    rank, score), row-identical to exhaustive_topk when acc_cap is None
    (same fetch, rounding and tie rules — shared plumbing)."""
    return maxscore_topk_df(
        reader, queries, standard, k, conjunctive,
        _topk_fn=taat_topk_fn(acc_cap),
    )
