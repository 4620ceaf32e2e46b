"""Block-Max WAND dynamic-pruning top-k (DAAT), rank-identical.

The north-star pairs two dynamic-pruning families — "block-max
WAND/MaxScore pruning".  operators/maxscore.py re-implements the
reference's own MaxScore (``queryProcessor/Scorer.java:85-162``); this
module adds the other family from the public literature: Block-Max WAND
(Ding & Suel, "Faster top-k document retrieval using block-max
indexes", SIGIR 2011), which the reference does not have but whose
block-max metadata its BlockDescriptor skip pointers
(``model/BlockDescriptor.java:70-76``) already anticipate.

Two pruning levels per pivot candidate d:

1. WAND pivot over GLOBAL term upper bounds (the lexicon's
   bm25_ub/tfidf_ub — ``model/LexiconEntry.java:40-42``): sort cursors
   by current docid, pivot = first prefix whose UB sum can reach theta;
   everything before the pivot doc is skipped wholesale.
2. SHALLOW block-max check: before decoding anything, each cursor
   resolves the block that would contain d from metadata only
   (max_doc_id skip array + per-block (max_tf, min_dl) — the BM25
   coefficient is increasing in tf and decreasing in dl, so
   score(max_tf, min_dl) bounds every posting in the block for any
   avgdl).  If the block-level sum cannot reach theta, the whole
   aligned block range [d, min block boundary] is skipped without
   decoding a single payload.

Rank-safety: identical guard discipline to operators/maxscore.py — the
final ranking compares round(score, 6), so every prune tests
``bound < theta - ROUND_EPS`` (a doc below that line rounds strictly
below the k-th rounded score and can neither displace nor tie it), and
the heap orders (round6(score), -docid) exactly like the exhaustive
oracle.  Both standards, both modes, every codec: same top-k as
operators/topk.exhaustive_topk.

Execution locality mirrors MaxScore: sequential per query on the driver
over lexicon-pruned posting lists (bucket partition pruning + parquet
min/max limit the scan to the query terms); the distributed rank-safe
fallback for head terms is operators/topk.py.
"""

from __future__ import annotations

import heapq
from bisect import bisect_left

import numpy as np

from .. import config
from . import scoring
from .maxscore import (
    MAX_DOCID,
    ROUND_EPS,
    PostingCursor,
    TermPostings,
    maxscore_topk_df,
    round6,
)


class BMWCursor(PostingCursor):
    """PostingCursor + per-block score-bound metadata (bmax/bub).

    Shallow probes (``_shallow_frontier``) never touch payload bytes:
    they binary-search the per-list max_doc_id skip array and read the
    precomputed per-block score bound — the deep pointer (and its
    lazily-decoded block) is left where it is.

    The (bmax, bub) pair is memoized on TermPostings keyed
    (standard, avgdl) — the PostingCursor._decoded discipline: shared
    READ-ONLY across cursors/queries, so a warm batch builds each
    term's metadata arrays once instead of once per query (round-6;
    BMW was 4-7x slower than WAND on the same warm cache and most of
    the gap was this per-query rebuild plus numpy scalar overhead in
    the frontier walk — bmax is kept as a plain list for C bisect).
    """

    __slots__ = ("bmax", "bub", "min_bub")

    def __init__(self, tp: TermPostings, codec: str, standard: str,
                 n_docs: int, avgdl: float):
        super().__init__(tp, codec, standard, n_docs, avgdl)
        key = ("bmw_meta", standard, avgdl)
        meta = tp._decoded.get(key)
        if meta is None:
            bmax = [b["max_doc_id"] for b in tp.blocks]
            max_tf = np.array([b["max_tf"] for b in tp.blocks], dtype=np.float64)
            if standard == scoring.BM25:
                # same constants AND op order as PostingCursor.score /
                # operators/scoring.py (rank-identity critical)
                min_dl = np.array(
                    [b["min_dl"] for b in tp.blocks], dtype=np.float64
                )
                bj = config.BM25_ONE_MINUS_B + (config.BM25_B * (min_dl / avgdl))
                bub = (
                    max_tf / ((config.BM25_K1 * bj) + max_tf)
                ) * tp.idf
            else:
                bub = (1 + np.log10(max_tf)) * tp.idf
            blist = bub.tolist()
            # min over the list's block bounds: when the pivot prefix's
            # min-bound sum already reaches theta, NO position can be
            # shallow-skipped (bsum >= sum of mins everywhere), so the
            # caller skips the frontier walk outright — the common case
            # on near-uniform-tf corpora, where the walk is pure
            # overhead (conservative: skipping only skips an
            # OPTIMIZATION, every candidate still scores fully)
            meta = (bmax, blist, min(blist) if blist else 0.0)
            tp._decoded[key] = meta
        self.bmax, self.bub, self.min_bub = meta

def _shallow_frontier(
    lists: list[BMWCursor], d: int, cap: int, theta: float,
    require_all: bool = False,
) -> int:
    """Smallest docid x in [d, cap) where the combined per-block score
    bound of ``lists`` could still reach theta — or ``cap`` when no such
    x exists below it.  Pure metadata walk over the block-max arrays
    (one interval per block edge); cold RUNS of blocks are crossed
    without decoding anything, so the caller's single deep next_geq
    lands directly on the first plausible block (Ding & Suel's
    candidate-selection move).

    ``require_all`` (conjunctive): a list with no block reaching x means
    no qualifying doc >= x at all -> MAX_DOCID (terminate)."""
    sbis = [bisect_left(c.bmax, d) for c in lists]
    cur = d
    while True:
        bsum = 0.0
        boundary = MAX_DOCID
        for c, s in zip(lists, sbis):
            if s < len(c.bmax):
                bsum += c.bub[s]  # plain floats/ints: no numpy scalars
                if c.bmax[s] < boundary:
                    boundary = c.bmax[s]
            elif require_all:
                return MAX_DOCID
        if bsum >= theta - ROUND_EPS:
            return cur
        if boundary == MAX_DOCID or boundary + 1 >= cap:
            return cap
        cur = boundary + 1
        for j, c in enumerate(lists):
            if sbis[j] < len(c.bmax) and c.bmax[sbis[j]] < cur:
                sbis[j] += 1


def _evaluate(live: list[BMWCursor], q: int) -> float:
    """Full score of the doc all of live[0..q] are aligned on."""
    score = 0.0
    for i in range(q + 1):
        score += live[i].score()
    return score


def _push(heap: list, k: int, docid: int, score: float) -> float:
    """Heap add with the exhaustive boundary rule (round desc, docid
    asc); returns the new theta (0.0 while the heap is short)."""
    heapq.heappush(heap, (round6(score), -docid, score))
    if len(heap) > k:
        heapq.heappop(heap)
    return heap[0][0] if len(heap) == k else 0.0


def block_max_wand(
    cursors: list[BMWCursor], k: int, conjunctive: bool = False
) -> list[tuple[int, float]]:
    """Returns [(docid, raw_score)] sorted by (-round(score,6), docid),
    length <= k — the same contract (and the same conjunctive
    strict-intersection semantics) as maxscore.max_score."""
    if not cursors or k <= 0:
        return []
    if conjunctive:
        return _bmw_conjunctive(cursors, k)

    heap: list[tuple[float, int, float]] = []
    theta = 0.0
    live = [c for c in cursors if c.docid() != MAX_DOCID]
    while live:
        live.sort(key=lambda c: c.docid())
        while live and live[-1].docid() == MAX_DOCID:
            live.pop()
        if not live:
            break

        # --- WAND pivot over global term UBs ---
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
        # lists beyond the pivot already sitting on d contribute to both
        # the bound and the evaluation (sorted: they are contiguous)
        q = p
        while q + 1 < len(live) and live[q + 1].docid() == d:
            q += 1

        # --- shallow block-max check (no decode) ---
        if full:
            smin = 0.0
            for i in range(q + 1):
                smin += live[i].min_bub
            if smin >= theta - ROUND_EPS:
                nxt = d  # no position is shallow-skippable; skip the walk
            else:
                cap = live[q + 1].docid() if q + 1 < len(live) else MAX_DOCID
                nxt = _shallow_frontier(live[: q + 1], d, cap, theta)
            if nxt > d:
                # nothing in [d, nxt) can make the heap — one deep jump
                # straight to the first plausible block (or to where the
                # next list joins the pivot set and the bound changes)
                for i in range(q + 1):
                    live[i].next_geq(nxt)
                continue

        if live[0].docid() == d:
            # all lists up to q aligned: evaluate d fully
            theta = _push(heap, k, d, _evaluate(live, q))
            for i in range(q + 1):
                live[i].next()
        else:
            # advance the largest-UB lagging list to d (classic WAND
            # picker: fastest theta growth, most skipping)
            j = max(
                (i for i in range(p) if live[i].docid() < d),
                key=lambda i: live[i].ub,
            )
            live[j].next_geq(d)

    out = [(-negid, raw) for rounded, negid, raw in heap]
    out.sort(key=lambda t: (-round6(t[1]), t[0]))
    return out


def _bmw_conjunctive(cursors: list[BMWCursor], k: int) -> list[tuple[int, float]]:
    """Conjunctive DAAT with shallow block-max pruning.

    A doc qualifies only if present in EVERY cursor's list (strict
    matched == n, the documented divergence from the reference's
    partial-score quirk — see maxscore.max_score docstring), so the
    candidate stream is the alignment frontier d = max(current docids);
    before decoding toward d, the block-level bound decides whether the
    whole aligned block range can be skipped."""
    heap: list[tuple[float, int, float]] = []
    theta = 0.0
    while True:
        d = 0
        for c in cursors:
            cd = c.docid()
            if cd == MAX_DOCID:
                d = MAX_DOCID
                break
            d = max(d, cd)
        if d == MAX_DOCID:
            break

        if len(heap) == k:
            nxt = _shallow_frontier(
                cursors, d, MAX_DOCID, theta, require_all=True
            )
            if nxt == MAX_DOCID:
                break  # some list holds nothing >= the frontier: done
            if nxt > d:
                # no doc in [d, nxt) can reach theta even if every list
                # aligned there — cross the cold range metadata-only
                for c in cursors:
                    c.next_geq(nxt)
                continue

        aligned = True
        for c in cursors:
            c.next_geq(d)
            if c.docid() != d:
                aligned = False  # d dropped; frontier recomputes
                break
        if not aligned:
            continue
        score = 0.0
        for c in cursors:
            score += c.score()
        theta = _push(heap, k, d, score)
        for c in cursors:
            c.next()

    out = [(-negid, raw) for rounded, negid, raw in heap]
    out.sort(key=lambda t: (-round6(t[1]), t[0]))
    return out


def bmw_topk(
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
    missing terms dropped, Block-Max WAND over the rest."""
    cursors = [
        BMWCursor(term_postings[t], codec, standard, n_docs, avgdl)
        for t in query_tokens
        if t in term_postings
    ]
    return block_max_wand(cursors, k, conjunctive)


def bmw_topk_df(
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
        reader, queries, standard, k, conjunctive, _topk_fn=bmw_topk
    )
