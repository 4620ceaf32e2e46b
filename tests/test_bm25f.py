"""BM25F passage retrieval vs an independent pure-Python replication
of the field-weighted sliding-window model (operators/bm25f.py
docstring) over the sf0.001 corpus; oracle equality at sf0.01 is
covered by the gate entry bm25f_topk."""

import math
from collections import defaultdict

from mircv_project_spark.operators.bm25f import (
    PASS_SMAX,
    PASS_TURNS,
    W_ASSISTANT,
    bm25f_topk,
)
from mircv_project_spark.operators.topk import query_terms
from mircv_project_spark.oracle import QUERY_SET


def _python_bm25f(doc_rows, flat_rows, queries, k):
    """doc_rows: [(docid, docno, conv_id, turn_idx, doc_len)],
    flat_rows: [(term, docid, tf)]."""
    meta = {d: (c, t) for d, _, c, t, _ in doc_rows}
    w = {
        d: (W_ASSISTANT if int(n) % 4 == 1 else 1)
        for d, n, _, _, _ in doc_rows
    }

    def windows(turn):
        return range(max(0, turn - (PASS_TURNS - 1)), min(PASS_SMAX, turn) + 1)

    dlw = defaultdict(int)
    for d, _, c, t, dl in doc_rows:
        for ws in windows(t):
            dlw[(c, ws)] += w[d] * dl
    tfw = defaultdict(int)  # (term, conv, ws) -> weighted tf
    for term, docid, tf in flat_rows:
        c, t = meta[docid]
        for ws in windows(t):
            tfw[(term, c, ws)] += w[docid] * tf
    df = defaultdict(int)
    post = defaultdict(list)
    for (term, c, ws), v in tfw.items():
        df[term] += 1
        post[term].append((c, ws, v))
    n_pass = len(dlw)
    avgdlw = sum(dlw.values()) / n_pass

    out = {}
    for qid, term_tfs in queries.items():
        raw = defaultdict(float)
        for t, qtf in term_tfs.items():
            if t not in post:
                continue
            idf = math.log10(n_pass / df[t])
            for c, ws, v in post[t]:
                coeff = v / (
                    (1.5 * (0.3 + (0.7 * (dlw[(c, ws)] / avgdlw)))) + v
                )
                raw[(c, ws)] += qtf * (coeff * idf)
        ranked = sorted(
            ((round(s, 6), c, ws) for (c, ws), s in raw.items()),
            key=lambda x: (-x[0], x[1], x[2]),
        )
        if ranked:
            out[qid] = [
                (c, ws, i + 1, s) for i, (s, c, ws) in enumerate(ranked[:k])
            ]
    return out


def test_bm25f_matches_independent_python_model(spark, vb_index):
    idx, _ = vb_index
    got = bm25f_topk(idx, QUERY_SET, k=10).collect()
    doc_rows = [
        (r["docid"], r["docno"], r["conv_id"], r["turn_idx"], r["doc_len"])
        for r in idx.doc_index.collect()
    ]
    flat_rows = [
        (r["term"], r["docid"], r["tf"]) for r in idx.flat.collect()
    ]
    queries = {}
    for qid, term, qtf in query_terms(QUERY_SET, idx.parse):
        queries.setdefault(qid, {})[term] = qtf
    exp = _python_bm25f(doc_rows, flat_rows, queries, 10)
    got_by_q = defaultdict(list)
    for r in sorted(got, key=lambda r: (r["qid"], r["rank"])):
        got_by_q[r["qid"]].append(
            (r["conv_id"], r["w_start"], r["rank"], r["score"])
        )
    assert dict(got_by_q) == exp


def test_bm25f_weighting_changes_the_ranking(spark, vb_index):
    """Sanity: with w(assistant)=1 the model degenerates to unweighted
    passage BM25 — the 2x weighting must actually move scores or
    order, else the gate tests nothing field-specific."""
    import mircv_project_spark.operators.bm25f as m

    idx, _ = vb_index
    weighted = {
        (r["qid"], r["rank"]): (r["conv_id"], r["w_start"], r["score"])
        for r in bm25f_topk(idx, QUERY_SET, k=10).collect()
    }
    orig = m.W_ASSISTANT
    try:
        m.W_ASSISTANT = 1
        flat = {
            (r["qid"], r["rank"]): (r["conv_id"], r["w_start"], r["score"])
            for r in bm25f_topk(idx, QUERY_SET, k=10).collect()
        }
    finally:
        m.W_ASSISTANT = orig
    assert weighted != flat


def test_bm25f_scores_are_not_all_zero(spark, vb_index):
    """The passage unit exists precisely because conversation-level
    idf collapses on this corpus — guard that passage idf is live."""
    idx, _ = vb_index
    rows = bm25f_topk(idx, QUERY_SET, k=10).collect()
    assert any(r["score"] > 0 for r in rows)


def test_conv_maxp_is_max_over_member_turns(spark, vb_index):
    """The pooled conv score must equal the max round-6 turn score of
    its members, and the best_docno must be that turn."""
    from collections import defaultdict

    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.operators.bm25f import conv_maxp_topk

    idx, _ = vb_index
    turns = topk.exhaustive_topk(
        idx, QUERY_SET, scoring.BM25, k=1_000_000
    ).collect()
    conv_of = {
        str(r["docid"] - 1): r["conv_id"] for r in idx.doc_index.collect()
    }
    best = {}
    for r in sorted(turns, key=lambda r: (r["qid"], -r["score"], int(r["docno"]))):
        key = (r["qid"], conv_of[r["docno"]])
        if key not in best:
            best[key] = (r["docno"], r["score"])
    exp = defaultdict(list)
    for (qid, conv), (dn, s) in best.items():
        exp[qid].append((s, conv, dn))
    expected = {}
    for qid, rows in exp.items():
        rows.sort(key=lambda x: (-x[0], x[1]))
        expected[qid] = [
            (conv, dn, i + 1, s) for i, (s, conv, dn) in enumerate(rows[:10])
        ]
    got = defaultdict(list)
    for r in sorted(
        conv_maxp_topk(idx, QUERY_SET, k=10).collect(),
        key=lambda r: (r["qid"], r["rank"]),
    ):
        got[r["qid"]].append(
            (r["conv_id"], r["best_docno"], r["rank"], r["score"])
        )
    assert dict(got) == expected


def test_collapse_conv_score_is_best_turn_and_inner_order(spark, vb_index):
    """Collapse pins: conversation rank ordered by its BEST turn's
    round-6 score (ties conv_id asc); inner hits are the conv's top
    turns in (score desc, docno asc) order, at most 2 per conv."""
    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.operators.bm25f import bm25_topk_collapse
    from mircv_project_spark.oracle import QUERY_SET

    idx, _ = vb_index
    rows = bm25_topk_collapse(idx, QUERY_SET, k=10).collect()
    assert rows

    # independent model from the full turn ranking
    full = topk.exhaustive_topk(
        idx, QUERY_SET, scoring.BM25, k=2_000_000_000
    ).collect()
    dmap = {
        str(r["docid"] - 1): r["conv_id"] for r in idx.doc_index.collect()
    }
    by_conv = {}
    for r in full:
        key = (r["qid"], dmap[r["docno"]])
        by_conv.setdefault(key, []).append((-r["score"], int(r["docno"])))
    for v in by_conv.values():
        v.sort()
    # expected conv ranking per qid
    exp = {}
    for (qid, conv), v in by_conv.items():
        exp.setdefault(qid, []).append((v[0][0], conv))
    for qid in exp:
        exp[qid].sort()
    got = {}
    for r in rows:
        got.setdefault((r["qid"], r["conv_id"]), {})[r["inner_rank"]] = (
            r["docno"], r["score"], r["rank"]
        )
    for (qid, conv), inner in got.items():
        assert set(inner) <= {1, 2}
        # conv rank matches the independent ordering
        want_rank = exp[qid].index((-inner[1][1], conv)) + 1
        assert inner[1][2] == want_rank, (qid, conv)
        # inner hits are the conv's best turns in pinned order
        want = by_conv[(qid, conv)][: len(inner)]
        for i, (negs, docno_int) in enumerate(want, start=1):
            assert inner[i][0] == str(docno_int)
            assert inner[i][1] == -negs


def test_term_vectors_match_flat(spark, vb_index):
    """Term vectors restate the flat postings + lexicon exactly for
    the probe docs."""
    from mircv_project_spark.operators.queryops import doc_term_vectors
    from mircv_project_spark.oracle import MLT_PROBE_DOCNOS

    idx, _ = vb_index
    got = {
        (r["docno"], r["term"]): (r["tf"], r["df"], r["cf"], r["doc_len"])
        for r in doc_term_vectors(idx, MLT_PROBE_DOCNOS).collect()
    }
    assert got
    ids = {d + 1 for d in MLT_PROBE_DOCNOS}
    lex = {
        r["term"]: (r["df"], r["cf"]) for r in idx.lexicon.collect()
    }
    exp = {}
    for r in idx.flat.collect():
        if r["docid"] in ids:
            df, cf = lex[r["term"]]
            exp[(str(r["docid"] - 1), r["term"])] = (
                r["tf"], df, cf, r["doc_len"]
            )
    assert got == exp
