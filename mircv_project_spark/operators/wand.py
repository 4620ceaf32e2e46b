"""Plain WAND dynamic-pruning top-k (DAAT), rank-identical.

The third dynamic-pruning family beside MaxScore (operators/maxscore.py
— the reference's own ``queryProcessor/Scorer.java:85-162``) and
Block-Max WAND (operators/bmw.py): WAND as published (Broder, Carmel,
Herscovici, Soffer, Zien — "Efficient query evaluation using a two-level
retrieval process", CIKM 2003).  It prunes with GLOBAL term upper
bounds only (the lexicon's bm25_ub/tfidf_ub,
``model/LexiconEntry.java:40-42``) and needs no per-block metadata at
all — which is exactly why it stays a separate serve path instead of a
BMW flag: it is the classic baseline the block-max papers compare
against, and it runs against any store whose lists carry no block-max
arrays.

Pivot walk: cursors sorted by current docid; the pivot is the shortest
prefix whose UB sum could still round into the heap
(``>= theta - ROUND_EPS`` — the same half-quantum guard as
maxscore/bmw, because the final ranking compares round(score, 6)).
Docs before the pivot doc are skipped wholesale via nextGEQ; when the
lists up to the pivot align, the doc is fully evaluated, else the
largest-UB lagging list jumps forward (fastest theta growth).

Rank-safety contract identical to maxscore.max_score / bmw: heap orders
(round6(score), -docid), output sorted (-round6, docid), conjunctive =
strict intersection.  Same top-k as operators/topk.exhaustive_topk on
both standards, every codec — shared oracle.
"""

from __future__ import annotations

import heapq

from . import scoring  # noqa: F401  (re-export convention of the DAAT family)
from .maxscore import (
    MAX_DOCID,
    ROUND_EPS,
    PostingCursor,
    TermPostings,
    maxscore_topk_df,
    round6,
)


def _push(heap: list, k: int, docid: int, score: float) -> float:
    heapq.heappush(heap, (round6(score), -docid, score))
    if len(heap) > k:
        heapq.heappop(heap)
    return heap[0][0] if len(heap) == k else 0.0


def wand(
    cursors: list[PostingCursor], k: int, conjunctive: bool = False
) -> list[tuple[int, float]]:
    """[(docid, raw_score)] sorted by (-round(score,6), docid), length
    <= k — the same contract as maxscore.max_score / bmw.block_max_wand."""
    if not cursors or k <= 0:
        return []
    if conjunctive:
        return _wand_conjunctive(cursors, k)

    heap: list[tuple[float, int, float]] = []
    theta = 0.0
    live = [c for c in cursors if c.docid() != MAX_DOCID]
    while live:
        live.sort(key=lambda c: c.docid())
        while live and live[-1].docid() == MAX_DOCID:
            live.pop()
        if not live:
            break

        full = len(heap) == k
        acc = 0.0
        p = -1
        for i, c in enumerate(live):
            acc += c.ub
            if not full or acc >= theta - ROUND_EPS:
                p = i
                break
        if p < 0:
            break  # no remaining doc can round into the heap
        d = live[p].docid()
        q = p
        while q + 1 < len(live) and live[q + 1].docid() == d:
            q += 1

        if live[0].docid() == d:
            score = 0.0
            for i in range(q + 1):
                score += live[i].score()
            theta = _push(heap, k, d, score)
            for i in range(q + 1):
                live[i].next()
        else:
            j = max(
                (i for i in range(p) if live[i].docid() < d),
                key=lambda i: live[i].ub,
            )
            live[j].next_geq(d)

    out = [(-negid, raw) for _rounded, negid, raw in heap]
    out.sort(key=lambda t: (-round6(t[1]), t[0]))
    return out


def _wand_conjunctive(cursors: list[PostingCursor], k: int) -> list[tuple[int, float]]:
    """Conjunctive DAAT on the alignment frontier d = max(current
    docids).  The only rank-safe global-UB prune here is total: once
    the heap is full and the sum of EVERY cursor's UB cannot round
    into it, no remaining doc can either (a single-term theta is not
    rank-safe in conjunctive mode — the maxscore.py pin)."""
    heap: list[tuple[float, int, float]] = []
    theta = 0.0
    ub_total = sum(c.ub for c in cursors)
    while True:
        if len(heap) == k and ub_total < theta - ROUND_EPS:
            break
        d = 0
        for c in cursors:
            cd = c.docid()
            if cd == MAX_DOCID:
                d = MAX_DOCID
                break
            d = max(d, cd)
        if d == MAX_DOCID:
            break
        aligned = True
        for c in cursors:
            c.next_geq(d)
            if c.docid() != d:
                aligned = False
                break
        if not aligned:
            continue
        score = 0.0
        for c in cursors:
            score += c.score()
        theta = _push(heap, k, d, score)
        for c in cursors:
            c.next()

    out = [(-negid, raw) for _rounded, negid, raw in heap]
    out.sort(key=lambda t: (-round6(t[1]), t[0]))
    return out


def wand_topk(
    term_postings: dict[str, TermPostings],
    query_tokens: list[str],
    codec: str,
    standard: str,
    n_docs: int,
    avgdl: float,
    k: int,
    conjunctive: bool,
) -> list[tuple[int, float]]:
    """One query end-to-end: one cursor PER TOKEN OCCURRENCE (duplicate
    query tokens double-score, as in the reference's getPostingLists),
    missing terms dropped, WAND over the rest."""
    cursors = [
        PostingCursor(term_postings[t], codec, standard, n_docs, avgdl)
        for t in query_tokens
        if t in term_postings
    ]
    return wand(cursors, k, conjunctive)


def wand_topk_df(
    reader,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
    conjunctive: bool = False,
):
    """Batch evaluation over an IndexReader -> DataFrame(qid, docno,
    rank, score), row-identical to exhaustive_topk / maxscore_topk_df
    (same fetch, rounding and tie rules — shared plumbing)."""
    return maxscore_topk_df(
        reader, queries, standard, k, conjunctive, _topk_fn=wand_topk
    )
