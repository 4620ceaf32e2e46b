"""Bigram-LM operators (operators/lm.py): the distributed perplexity
and importance scores must match an independent pure-Python model built
from the same pinned formulas, and behave sensibly (in-distribution
docs score lower perplexity; target-like docs score higher importance).
"""

import math
import re
from collections import Counter

from mircv_project_spark.operators import lm as L

PUNCT = r"[!-/:-@\[-`{-~]"


def _toks(text: str) -> list[str]:
    cleaned = re.sub(PUNCT, " ", re.sub(r"<[^>]+>", " ", text)).lower()
    return [
        t
        for t in cleaned.split(" ")
        if t and len(t) < 64 and not re.search(r"[^\x00-\x7F]", t)
    ]


def _model(docs: dict[int, str]):
    """Independent reference: per-doc bigram counts + corpus tables."""
    bgd = {}
    vocab = set()
    for did, text in docs.items():
        toks = _toks(text)
        vocab.update(toks)
        bgd[did] = Counter(
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        )
    bgc = Counter()
    for c in bgd.values():
        bgc.update(c)
    ctx = Counter()
    for g, n in bgc.items():
        ctx[g.split(" ")[0]] += n
    return bgd, bgc, ctx, len(vocab)


def _w_micro(c2: int, c1: int, v: int) -> int:
    # banker's-free round-half-away-from-zero, matching Spark/DuckDB
    x = math.log10((c2 + 0.5) / (c1 + 0.5 * v)) * 1e6
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_bigram_lm_perplexity_matches_reference_model(spark):
    docs = {
        0: "the cat sat on the mat",
        1: "the cat ate the fish",
        2: "dogs chase the cat",
        3: "quantum flux harmonics destabilize the manifold",  # OOV-ish
        4: "the",  # single token: no bigrams, no row
        5: "",  # empty: no row
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = {r.id: r for r in L.bigram_lm_perplexity(df).collect()}
    assert set(got) == {0, 1, 2, 3}

    bgd, bgc, ctx, v = _model(docs)
    for did in got:
        want_n = sum(bgd[did].values())
        want_lp = sum(
            c * _w_micro(bgc[g], ctx[g.split(" ")[0]], v)
            for g, c in bgd[did].items()
        )
        assert got[did].n_bigrams == want_n
        assert got[did].logp_micro == want_lp
        want_ppl = round(10 ** (-want_lp / (want_n * 1e6)), 6)
        assert abs(got[did].ppl - want_ppl) < 1e-6

    # semantic sanity: the OOV-ish doc is the highest-perplexity one
    assert max(got, key=lambda d: got[d].ppl) == 3
    # perplexities are positive and finite
    assert all(0 < r.ppl < 1e9 for r in got.values())


def test_lm_importance_matches_reference_model(spark):
    # target sources: src0/src5 (K % 5 == 0); target docs speak "alpha
    # beta gamma", background docs speak "delta epsilon zeta"
    rows = [
        (0, "alpha beta gamma alpha beta", "src0"),
        (1, "alpha beta gamma gamma alpha", "src5"),
        (2, "delta epsilon zeta delta epsilon", "src1"),
        (3, "delta epsilon zeta zeta delta", "src2"),
        (4, "alpha beta gamma alpha", "src3"),  # target-LIKE, bg source
        (5, "delta epsilon zeta", "src10"),  # bg-LIKE, target source
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.id: r for r in L.lm_importance(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 5}

    docs = {r[0]: r[1] for r in rows}
    tids = {r[0] for r in rows if int(re.search(r"(\d+)$", r[2]).group(1)) % 5 == 0}
    bgd, bgc, ctx, v = _model(docs)
    bgc_t = Counter()
    for did in tids:
        bgc_t.update(bgd[did])
    ctx_t = Counter()
    for g, n in bgc_t.items():
        ctx_t[g.split(" ")[0]] += n
    for did in docs:
        want = sum(
            c
            * (
                _w_micro(bgc_t[g], ctx_t[g.split(" ")[0]], v)
                - _w_micro(bgc[g], ctx[g.split(" ")[0]], v)
            )
            for g, c in bgd[did].items()
        )
        assert got[did].imp_micro == want, did

    # selection semantics: per-bigram average ratio ranks target-style
    # text above background-style text, regardless of the doc's source
    avg = {d: got[d].imp_micro / got[d].n_bigrams for d in got}
    assert min(avg[d] for d in (0, 1, 4)) > max(avg[d] for d in (2, 3, 5))


def _round_half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_pmi_collocations_matches_reference_model(spark):
    # "new york" is a strong collocation (always adjacent); "the the"
    # never occurs; "of the" is frequent but both words are everywhere,
    # so its PMI is low.  min_count=2 excludes the one-off "big apple".
    docs = {
        0: "new york is the city of the lights of the north",
        1: "i love new york and the food of the city",
        2: "new york new york the big apple of the east",
        3: "the city of the north loves the city of the south",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    got = L.pmi_collocations(df, min_count=2, k=5).collect()

    # independent model with the pinned double parenthesization
    toks = {d: _toks(t) for d, t in docs.items()}
    cu = Counter(t for ts in toks.values() for t in ts)
    u_tot = float(sum(cu.values()))
    grams = Counter(
        f"{ts[i]} {ts[i + 1]}"
        for ts in toks.values()
        for i in range(len(ts) - 1)
    )
    n_tot = float(sum(grams.values()))

    def pmi_micro(g: str) -> int:
        w1, w2 = g.split(" ")
        ratio = ((grams[g] * u_tot) * u_tot) / (
            (n_tot * float(cu[w1])) * float(cu[w2])
        )
        return _round_half_away(math.log10(ratio) * 1e6)

    want = sorted(
        ((g, c, pmi_micro(g)) for g, c in grams.items() if c >= 2),
        key=lambda r: (-r[2], r[0]),
    )[:5]
    assert [(r.gram, r.c2, r.pmi_micro) for r in got] == want
    # the always-adjacent pair tops the ranking; the floor held
    assert got[0].gram == "new york"
    assert all(r.c2 >= 2 for r in got)


def test_segment_queries_merges_planted_collocation(spark):
    """A bigram occurring >= 5 times with positive PMI merges into one
    segment; other adjacencies stay separate."""
    from mircv_project_spark.operators.lm import segment_queries

    filler = [
        (100 + i, f"filler{i} words about various other topics {i}", "en",
         "s", 0)
        for i in range(10)
    ]
    rows = [
        (i, f"the neural network model number {i}", "en", "s", 0)
        for i in range(6)
    ] + filler
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.qid, r.seg_idx): r.segment
        for r in segment_queries(
            docs, [("q1", "deep neural network stack")]
        ).collect()
    }
    segs = [got[("q1", i)] for i in range(len(got))]
    assert "neural network" in segs          # the planted collocation
    assert segs[0] == "deep"                 # no merge without stats
    assert "deep neural" not in segs


def test_vocab_kl_drift_sanity(spark):
    """Identical halves -> kl == 0 exactly (every term's log ratio is
    ~0 up to the count asymmetry); a shifted second half -> kl > 0."""
    from mircv_project_spark.operators.lm import vocab_kl_drift

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    same = spark.createDataFrame(
        [(i, "alpha beta gamma", "en", "s", 0) for i in range(10)], schema
    )
    r = vocab_kl_drift(same).collect()[0]
    assert r.kl == 0.0 and r.v == 3 and r.n_old == r.n_new == 15

    shifted = spark.createDataFrame(
        [(i, "alpha beta gamma", "en", "s", 0) for i in range(5)]
        + [(5 + i, "delta epsilon zeta", "en", "s", 0) for i in range(5)],
        schema,
    )
    r2 = vocab_kl_drift(shifted).collect()[0]
    assert r2.kl > 0.1 and r2.v == 6
