"""TextRank keyword extraction (graph.textrank_keywords): brute-force
Python reference with the same integer pins (rha, 7/8 damping, micro
state), plus structural edges: single-distinct-term docs are base-only,
zero-token docs vanish.

The test corpus avoids 3+ identical-char runs: the operator tokenizes
with textnorm.tokens_col (oracle-compatible T1-T5, NO T6 run-collapse)
while this reference uses the full tokenizer — the same no-op-on-this-
corpus assumption test_oracle_assumptions guards for the driver data."""

from mircv_project_spark.functions.tokenizer import tokenize
from mircv_project_spark.operators.graph import (
    PR_MICRO,
    TEXTRANK_ITERS,
    textrank_keywords,
)

DOCS = [
    (1, "fast table scan fast table merge scan scan"),
    (2, "solo"),
    (3, "same same same"),
    (4, "the quick brown fox jumps over the lazy dog the end"),
    (5, ""),
]


def rha(a: int, b: int) -> int:
    return (2 * a + b) // (2 * b)


def brute_textrank(docs, k=3, iters=TEXTRANK_ITERS):
    out = []
    for did, text in docs:
        toks = tokenize(text, False)
        if not toks:
            continue
        nodes = sorted(set(toks))
        n = len(nodes)
        w: dict[tuple[str, str], int] = {}
        for a, b in zip(toks, toks[1:]):
            if a == b:
                continue
            w[(a, b)] = w.get((a, b), 0) + 1
            w[(b, a)] = w.get((b, a), 0) + 1
        ow = {u: sum(x for (a, _), x in w.items() if a == u) for u in nodes}
        pr = {v: rha(PR_MICRO, n) for v in nodes}
        for _ in range(iters):
            infl = {v: 0 for v in nodes}
            for (a, b), x in w.items():
                infl[b] += rha(pr[a] * x, ow[a])
            pr = {
                v: rha(PR_MICRO, 8 * n)
                + (rha(7 * infl[v], 8) if infl[v] else 0)
                for v in nodes
            }
        ranked = sorted(nodes, key=lambda v: (-pr[v], v))[:k]
        for r, v in enumerate(ranked, 1):
            out.append((did, v, pr[v], r))
    return sorted(out)


def test_textrank_matches_bruteforce(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r["id"], r["term"], r["pr_micro"], r["rank"])
        for r in textrank_keywords(docs).collect()
    )
    assert got == brute_textrank(DOCS)


def test_textrank_single_and_isolated(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {
        (r["id"], r["term"]): r["pr_micro"]
        for r in textrank_keywords(docs).collect()
    }
    # doc 2 ("solo") and doc 3 ("same" x3 — one distinct term, no
    # non-self adjacency): after 3 iterations the rank is the pure
    # base term rha(1e6 / 8)
    assert rows[(2, "solo")] == rha(PR_MICRO, 8)
    assert rows[(3, "same")] == rha(PR_MICRO, 8)
    # the empty doc emits nothing
    assert not any(i == 5 for i, _ in rows)
