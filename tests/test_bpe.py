"""BPE merge learning (operators/bpe.py): the distributed trainer must
match an independent pure-Python greedy BPE implementation (position
counting, (count desc, pair asc) ties, left-to-right non-overlapping
merge), and the doubled-space replace must be exactly that merge."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mircv_project_spark.operators import bpe as B


def _ref_bpe(vocab: dict[str, int], n: int):
    """Independent reference trainer (lists, not strings)."""
    syms = {w: list(w) for w in vocab}
    merges = []
    for step in range(1, n + 1):
        counts: Counter = Counter()
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += c
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((step, a, b, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


VOCAB = {
    "lower": 5,
    "lowest": 2,
    "newer": 6,
    "wider": 3,
    "new": 2,
    "aaaa": 4,  # within-word repeats: 3 positions of (a, a) per copy
    "banana": 1,
}


def test_matches_reference_trainer(spark):
    vdf = spark.createDataFrame(list(VOCAB.items()), "term string, cnt long")
    got = [
        (r.step, r.lhs, r.rhs, r.cnt)
        for r in B.bpe_train(spark, vdf, n_merges=6)
        .orderBy("step")
        .collect()
    ]
    want, _ = _ref_bpe(VOCAB, 6)
    assert got == want


def test_overlap_counting_and_greedy_merge(spark):
    # "aaaa" x4: (a,a) counted at 3 positions per copy = 12, beating
    # "banana"'s pairs; the merge is greedy left-to-right: aaaa -> aa aa
    vdf = spark.createDataFrame(
        [("aaaa", 4), ("banana", 1)], "term string, cnt long"
    )
    m = B.bpe_train(spark, vdf, n_merges=1).collect()[0]
    assert (m.lhs, m.rhs, m.cnt) == ("a", "a", 12)
    rows = {
        r.term: r.s
        for r in vdf.select(
            "term",
            B.merge_sym_col(B.chars_sym_col(F.col("term")), "a", "a").alias(
                "s"
            ),
        ).collect()
    }
    assert rows["aaaa"] == "aa aa"
    assert rows["banana"] == "b a n a n a"  # no adjacent (a, a)


def test_merge_has_no_boundary_false_positives(spark):
    # symbols "xa" and "b" must NOT match the pair (a, b)
    df = spark.createDataFrame([("xa b c",)], "sym string")
    out = df.select(B.merge_sym_col(F.col("sym"), "a", "b").alias("s")).collect()
    assert out[0].s == "xa b c"
    # but a genuine (a, b) merges, keeping its neighbors intact
    df2 = spark.createDataFrame([("x a b a b",)], "sym string")
    out2 = df2.select(B.merge_sym_col(F.col("sym"), "a", "b").alias("s")).collect()
    assert out2[0].s == "x ab ab"


def test_exhaustion_raises(spark):
    vdf = spark.createDataFrame([("ab", 1)], "term string, cnt long")
    with pytest.raises(ValueError, match="exhausted"):
        B.bpe_train(spark, vdf, n_merges=3)  # only 1 merge possible


def test_segment_matches_reference_final_state(spark):
    vdf = spark.createDataFrame(list(VOCAB.items()), "term string, cnt long")
    want_merges, want_syms = _ref_bpe(VOCAB, 6)
    merges = [(a, b) for _, a, b, _ in want_merges]
    got = {
        r.word: (r.sym, r.n_sym)
        for r in B.bpe_segment(vdf, merges).collect()
    }
    assert got == {
        w: (" ".join(s), len(s)) for w, s in want_syms.items()
    }
