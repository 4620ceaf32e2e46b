"""Spell correction (operators/spell.py): the deletion-neighborhood
equi-join must equal the brute-force Levenshtein <= 1 join (recall-1
construction), ranking pins must hold, and the candidate join must be
a broadcast hash join — never a cartesian/BNLJ scan of the vocabulary.
"""

import pytest

from mircv_project_spark.operators import spell as S


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


VOCAB = [
    ("spark", 40),
    ("spars", 7),  # substitution neighbor of "spark"
    ("sparks", 3),  # insertion neighbor
    ("spar", 5),  # deletion neighbor
    ("shark", 9),  # substitution neighbor
    ("stark", 9),  # substitution neighbor, cnt tie with shark
    ("sprak", 2),  # transposition: shares a deletion key, Levenshtein 2
    ("join", 30),
    ("joint", 4),
    ("zebra", 1),
]


@pytest.fixture(scope="module")
def vocab_df(spark):
    return spark.createDataFrame(VOCAB, "term string, cnt long")


def test_matches_bruteforce_lev1(spark, vocab_df):
    queries = spark.createDataFrame(
        [("spark",), ("joni",), ("qqqqq",)], "qterm string"
    )
    got = {
        (r.qterm, r.term): (r.dist, r.cnt)
        for r in S.spell_correct(vocab_df, queries, topk=100).collect()
    }
    want = {
        (q, t): (_lev(q, t), c)
        for q in ("spark", "joni", "qqqqq")
        for t, c in VOCAB
        if _lev(q, t) <= 1
    }
    assert got == want
    # the transposition is NOT in the result despite sharing a key
    assert ("spark", "sprak") not in got
    # "qqqqq" has no neighbors at all
    assert not any(q == "qqqqq" for q, _ in got)


def test_ranking_pins(spark, vocab_df):
    queries = spark.createDataFrame([("spark",)], "qterm string")
    rows = S.spell_correct(vocab_df, queries, topk=3).collect()
    ranked = [(r.term, r.dist, r.cnt) for r in rows]
    # dist 0 exact hit first regardless of cnt; then cnt desc;
    # shark/stark tie at cnt 9 -> term asc; top-3 cuts the rest
    assert ranked == [("spark", 0, 40), ("shark", 1, 9), ("stark", 1, 9)]


def test_middle_deletion_typos_pin(spark, vocab_df):
    got = {r.qterm for r in S.middle_deletion_typos(vocab_df).collect()}
    want = set()
    for t, _ in VOCAB:
        if len(t) >= 5:
            p = (len(t) + 1) // 2  # 1-based middle
            want.add(t[: p - 1] + t[p:])
    assert got == want
    # explicit examples: "spark" len 5, pos (5+1)//2 = 3, deletes 'a'
    # -> "sprk"; "join" (len 4) generates no typo
    assert "sprk" in got
    assert all(len(q) >= 4 for q in got)


def test_candidate_join_is_broadcast_hash(spark, vocab_df):
    queries = spark.createDataFrame([("spark",)], "qterm string")
    plan = S.spell_correct(vocab_df, queries)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_complete_prefix_ranking_and_plan(spark, vocab_df):
    got = S.complete_prefix(vocab_df, ["sp", "j", "zz", "spark"], topk=3)
    rows = [(r.prefix, r.term, r.cnt, r.rank) for r in got.collect()]
    want = []
    for p in ["j", "sp", "spark", "zz"]:
        comps = sorted(
            [(t, c) for t, c in VOCAB if t.startswith(p)],
            key=lambda tc: (-tc[1], tc[0]),
        )[:3]
        want += [(p, t, c, i + 1) for i, (t, c) in enumerate(comps)]
    assert sorted(rows) == sorted(want)
    assert not any(p == "zz" for p, *_ in rows)
    # the candidate joins are broadcast hash equi-joins, never a
    # startswith BNLJ over the vocabulary
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
