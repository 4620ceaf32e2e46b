"""Unit semantics for the curation operators (operators/curation.py):
benchmark decontamination, Gopher repetition stats, PII scrubbing,
deterministic domain-mix sampling.  End-to-end oracle equality is
covered by test_correctness_gate (entries decontaminate /
repetition_stats / pii_scrub / domain_mix_sample); these tests pin the
edge semantics the gate corpus can't reach (short docs, zero-gram docs,
rate-0/1 strata, scrub idempotence) and the plan shapes the 100-TB
story depends on (broadcast candidate join, no corpus-side BNLJ)."""

import pytest

from mircv_project_spark.operators.curation import (
    decontaminate,
    domain_mix_sample,
    pii_scrub,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- decontaminate


def test_decontaminate_flags_quoting_docs_only(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally unrelated words here nothing shared at all today friend"),
        ],
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma delta epsilon zeta eta theta",)], "text string"
    )
    got = {r["id"]: (r["contam_hits"], r["contaminated"]) for r in
           decontaminate(docs, bench, n=8).collect()}
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_decontaminate_short_docs_and_bench_are_safe(spark):
    # docs / bench texts below the n-gram order produce no grams (and no
    # crash): the sequence(1,0)-descends pitfall is guarded in grams_col
    docs = _docs(spark, [(1, "too short"), (2, ""), (3, "a b c d e f g h")])
    bench = spark.createDataFrame([("tiny",), ("a b c d e f g h",)], "text string")
    got = {r["id"]: r["contaminated"] for r in
           decontaminate(docs, bench, n=8).collect()}
    assert got == {1: False, 2: False, 3: True}


def test_decontaminate_counts_distinct_shared_grams(spark):
    # doc repeats the quoted span twice -> still counted once (distinct)
    span = "q w e r t y u i"
    docs = _docs(spark, [(7, f"{span} {span}")])
    bench = spark.createDataFrame([(span,)], "text string")
    [row] = decontaminate(docs, bench, n=8).collect()
    assert row["contam_hits"] == 1 and row["contaminated"]


def test_decontaminate_candidate_join_is_broadcast(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -------------------------------------------------------------- repetition_stats


def test_repetition_stats_hand_computed(spark):
    docs = _docs(
        spark,
        [
            # bigrams: [a a, a a, a b] -> top 'a a' 2/3; trigrams
            # [a a a, a a b] distinct 2/2 -> dup 0.0
            (1, "a a a b"),
            # bigrams: [x y, y x, x y] -> top 2/3; trigrams
            # [x y x, y x y] -> dup 0.0
            (2, "x y x y"),
            # all same token: bigrams [z z]*4 top 4/4=1.0; trigrams
            # [z z z]*3 distinct 1 -> dup 1 - 1/3
            (3, "z z z z z"),
        ],
    )
    got = {r["id"]: r for r in repetition_stats(docs).collect()}
    assert got[1]["n_2grams"] == 3
    assert got[1]["top_2gram_frac"] == pytest.approx(round(2 / 3, 6))
    assert got[1]["dup_3gram_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == pytest.approx(round(2 / 3, 6))
    assert got[3]["top_2gram_frac"] == 1.0
    assert got[3]["dup_3gram_frac"] == pytest.approx(round(1 - 1 / 3, 6))


def test_repetition_stats_degenerate_docs(spark):
    docs = _docs(spark, [(1, "solo"), (2, ""), (3, "two words")])
    got = {r["id"]: r for r in repetition_stats(docs).collect()}
    # every doc reports, zero-gram docs report zeros (not NULL, not missing)
    assert set(got) == {1, 2, 3}
    assert got[1]["n_2grams"] == 0 and got[1]["top_2gram_frac"] == 0.0
    assert got[2]["dup_3gram_frac"] == 0.0
    assert got[3]["n_2grams"] == 1 and got[3]["top_2gram_frac"] == 1.0
    assert got[3]["dup_3gram_frac"] == 0.0  # one trigram? no — only 2 tokens
    # 2 tokens -> zero trigrams -> 0.0 by the zero guard


# ------------------------------------------------------------------- pii_scrub


def test_pii_scrub_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail a.b-c_d@ex-ample.co.uk and other@x.io please"),
            (2, "call +12345678 or +123456789012345 now"),
            (3, "hosts 10.0.0.1 and 192.168.255.254 up"),
            (4, "clean text with no pii at all"),
        ],
    )
    got = {r["id"]: r for r in pii_scrub(docs).collect()}
    assert got[1]["n_emails"] == 2 and got[1]["clean_text"] == "mail <EMAIL> and <EMAIL> please"
    assert got[2]["n_phones"] == 2 and got[2]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert got[3]["n_ips"] == 2 and got[3]["clean_text"] == "hosts <IP> and <IP> up"
    assert got[4]["n_emails"] == got[4]["n_ips"] == got[4]["n_phones"] == 0
    assert got[4]["clean_text"] == "clean text with no pii at all"


def test_pii_scrub_is_idempotent(spark):
    docs = _docs(spark, [(1, "reach me at who@where.org or +4915112345678 or 10.1.2.3")])
    once = pii_scrub(docs).select("id", "clean_text")
    twice = pii_scrub(once, id_col="id", text_col="clean_text").collect()[0]
    assert twice["clean_text"] == once.collect()[0]["clean_text"]
    assert twice["n_emails"] == twice["n_phones"] == twice["n_ips"] == 0


def test_pii_scrub_phone_needs_plus_and_length(spark):
    # bare digit runs and short +runs are NOT phones (years, ids stay)
    docs = _docs(spark, [(1, "in 2024 order 123456789 ref +1234567 ok")])
    [row] = pii_scrub(docs).collect()
    assert row["n_phones"] == 0
    assert row["clean_text"].endswith("ref +1234567 ok")


# ----------------------------------------------------------- domain_mix_sample


def _mix_docs(spark):
    rows = [(i, f"d{i % 3}") for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_domain_mix_rate_bounds_are_exact(spark):
    out = domain_mix_sample(
        _mix_docs(spark), {"d0": 0.0, "d1": 1.0, "d2": 0.5}
    ).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert not any(r["kept"] for r in by_dom["d0"])  # rate 0: nothing
    assert all(r["kept"] for r in by_dom["d1"])  # rate 1: everything
    kept2 = sum(r["kept"] for r in by_dom["d2"])
    assert 0 < kept2 < len(by_dom["d2"])  # rate 0.5: a strict subset


def test_domain_mix_is_deterministic_and_partitioning_invariant(spark):
    docs = _mix_docs(spark)
    rates = {"d0": 0.3, "d1": 0.7, "d2": 0.5}
    a = sorted((r["id"], r["kept"]) for r in domain_mix_sample(docs, rates).collect())
    b = sorted(
        (r["id"], r["kept"])
        for r in domain_mix_sample(docs.repartition(13), rates).collect()
    )
    assert a == b


def test_domain_mix_unknown_domain_samples_at_zero(spark):
    out = domain_mix_sample(_mix_docs(spark), {"d1": 1.0}).collect()
    assert all(not r["kept"] for r in out if r["domain"] != "d1")
    assert all(r["rate"] == 0.0 for r in out if r["domain"] != "d1")


# --------------------------------------------------------------- boilerplate


def test_boilerplate_threshold_is_exact(spark):
    from mircv_project_spark.operators.curation import boilerplate_stats

    # 'x y z' occurs in 3 docs (>= min_docs -> boiler); 'p q r' in only
    # 2 (not boiler); doc 4 has no grams at all (short) -> all zeros
    docs = _docs(
        spark,
        [
            (1, "x y z tail one"),
            (2, "x y z tail two"),
            (3, "x y z p q r"),
            (4, "p q r something else"),
            (5, "so short"),
        ],
    )
    got = {r["id"]: (r["n_grams"], r["boiler_grams"], r["boiler_frac"])
           for r in boilerplate_stats(docs, n=3, min_docs=3).collect()}
    assert got[5] == (0, 0, 0.0)
    # doc 1: grams {x y z, y z tail, z tail one} -> only 'x y z' boiler
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[3][1] == 1  # 'x y z' yes, 'p q r' (2 docs) no
    assert got[4][1] == 0


def test_boilerplate_counts_docs_not_occurrences(spark):
    from mircv_project_spark.operators.curation import boilerplate_stats

    # one doc repeating a gram 5 times is ONE distinct-doc occurrence:
    # corpus-wide count stays below min_docs -> not boilerplate
    docs = _docs(spark, [(1, "a b c a b c a b c a b c a b c"), (2, "a b c only")])
    got = {r["id"]: r["boiler_grams"]
           for r in boilerplate_stats(docs, n=3, min_docs=3).collect()}
    assert got == {1: 0, 2: 0}


# --------------------------------------------------------------- budget_pack


def _mix_docs(spark):
    # 3 domains x 14 docs with repeated texts -> quality TIES inside a
    # domain (id is the tie-break) and varied bpe costs
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "a b",
        "payments 12345 67890 order 4242 total 999",
        "the of and to in is that it for the of and to in is that it for",
        "short note",
        "reasonable sentence with several ordinary words inside it for scoring",
    ]
    rows = []
    did = 0
    for dom in ("d0", "d1", "d2"):
        for i in range(14):
            rows.append((did, texts[i % len(texts)], dom))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_budget_pack_prefix_sum_is_partitioning_invariant(spark):
    """The distributed prefix sum must equal the naive global cumsum in
    (domain, quality desc, id) order — at EVERY partition count, ties
    included."""
    import pandas as pd

    from mircv_project_spark.operators.curation import budget_pack

    docs = _mix_docs(spark)
    outs = {}
    for p in (1, 3, 16):
        pdf = (
            budget_pack(docs, budget=30, num_partitions=p)
            .toPandas()
            .sort_values("id", ignore_index=True)
        )
        outs[p] = pdf
    for p in (3, 16):
        pd.testing.assert_frame_equal(outs[p], outs[1])
    chk = outs[1].sort_values(
        ["domain", "quality", "id"], ascending=[True, False, True],
        ignore_index=True,
    )
    expect = chk.groupby("domain")["bpe_est"].cumsum()
    assert (chk["cum_bpe"].values == expect.values).all()
    assert (chk["kept"] == (chk["cum_bpe"] <= 30)).all()
    assert chk["kept"].any() and not chk["kept"].all()


def test_budget_pack_plan_has_no_full_domain_window(spark):
    """The scale claim, pinned on the plan: the exchange is RANGE
    partitioning on the full sort key and the window operator's
    partition spec includes the partition id — never a bare
    Window.partitionBy(domain) that would funnel a whole domain into
    one task."""
    from mircv_project_spark.operators.curation import budget_pack
    from mircv_project_spark.plans import checks

    df = budget_pack(_mix_docs(spark), budget=30, num_partitions=4)
    text = checks.plan_text(df, "extended")
    assert "rangepartitioning" in text.lower(), text
    import re

    windows = [l for l in text.splitlines() if re.search(r"\bWindow\b", l)]
    assert windows, text
    for w in windows:
        assert "pid" in w, w


# ------------------------------------------------------------ export_shards


def test_export_shards_dense_cover_and_invariance(spark):
    from mircv_project_spark.operators.curation import export_shards
    from tests.conftest import SF_SMALL

    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = export_shards(docs).collect()
    # every doc exactly once
    assert len(out) == docs.count()
    assert len({r["id"] for r in out}) == len(out)
    # pos is dense 1..n within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic under a different input partitioning
    out2 = export_shards(docs.repartition(13)).collect()
    assert {(r["id"], r["shard"], r["pos"]) for r in out2} == {
        (r["id"], r["shard"], r["pos"]) for r in out
    }
    # the md5 key spreads docs across all 16 shards on 500 docs
    assert len(by_shard) == 16


# -------------------------------------------------------------- train_split


def test_train_split_partitions_and_determinism(spark):
    from mircv_project_spark.operators.curation import (
        domain_mix_sample,
        train_split,
    )
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = train_split(docs).collect()
    assert len(out) == docs.count()
    by_split = {}
    for r in out:
        by_split.setdefault(r["split"], set()).add(r["id"])
    # disjoint cover
    assert sum(len(v) for v in by_split.values()) == len(out)
    assert set(by_split) == {"train", "val", "test"}
    # ~10%/10% within generous bounds on 500 docs
    assert 20 <= len(by_split["val"]) <= 90
    assert 20 <= len(by_split["test"]) <= 90
    # deterministic under repartitioning
    out2 = train_split(docs.repartition(7)).collect()
    assert {(r["id"], r["split"]) for r in out2} == {
        (r["id"], r["split"]) for r in out
    }
    # independent coin from domain_mix_sample (different salt): the
    # split keys and mix keys disagree somewhere
    mix = {
        r["id"]: r["sample_key"]
        for r in domain_mix_sample(docs, {"src0": 1.0}).collect()
    }
    split_keys = {r["id"]: r["split_key"] for r in out}
    assert any(mix[i] != split_keys[i] for i in mix)


def test_pack_sequences_hand_case(spark):
    """pack_sequences at window=4 vs an independent hashlib model:
    md5-keyed order, exact prefix sum, floor-div window membership,
    zero-token sentinel."""
    import hashlib
    import math

    from mircv_project_spark.operators.curation import pack_sequences

    rows = [
        (0, "alpha beta"),          # bpe 2+1 = 3
        (1, "gamma delta epsilon"), # bpe 2+2+2 = 6
        (2, "x"),                   # bpe 1
        (3, ""),                    # bpe 0 -> (-1, -1, 0)
        (4, "abcdefgh ij"),         # bpe 2+1 = 3
    ]
    W = 4

    def key(i):
        return int(hashlib.md5(f"pack-{i}".encode()).hexdigest()[:15], 16)

    def bpe(text):
        return sum(math.ceil(len(t) / 4) for t in text.split() if t)

    order = sorted((r[0] for r in rows), key=lambda i: (key(i), i))
    want, cum = {}, 0
    for i in order:
        b = bpe(dict(rows)[i])
        if b > 0:
            want[i] = (key(i), b, cum, cum // W, (cum + b - 1) // W,
                       (cum + b - 1) // W - cum // W + 1)
        else:
            want[i] = (key(i), b, cum, -1, -1, 0)
        cum += b

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.pack_key, r.bpe_est, r.start_tok, r.first_win,
               r.last_win, r.n_wins)
        for r in pack_sequences(df, window=W).collect()
    }
    assert got == want
    # something actually spans a boundary (the operator's design point)
    assert any(g[5] > 1 for g in got.values())


def test_adaptive_quality_filter_median_rule(spark):
    """Per-domain median calibration: within each domain roughly half
    keeps; the boundary doc (quality == p50) is KEPT; domains are
    independent."""
    from mircv_project_spark.operators.curation import adaptive_quality_filter

    rows = []
    # domain A: 3 docs of clearly increasing quality (longer = better
    # up to saturation); domain B: 2 docs
    rows.append((0, "word " * 1, "A"))
    rows.append((1, "the quick brown fox jumps over the lazy dog again", "A"))
    rows.append((2, "the and for with this that " * 5, "A"))
    rows.append((3, "x", "B"))
    rows.append((4, "the fast table scan is a good plan for the data", "B"))
    df = spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string",
    )
    got = {r.id: r for r in adaptive_quality_filter(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for dom in ("A", "B"):
        members = [r for r in got.values() if r.domain == dom]
        p50 = members[0].domain_p50
        assert all(r.domain_p50 == p50 for r in members)
        for r in members:
            assert r.keep == (r.quality >= p50)
    # 3-doc domain: interpolated median == middle value -> boundary kept
    mid = sorted((got[i].quality for i in (0, 1, 2)))[1]
    assert got[0].domain_p50 == round(mid, 6)
    assert sum(got[i].keep for i in (0, 1, 2)) == 2


def test_weighted_sample_properties(spark):
    """E-S mechanics: a doc with overwhelming weight always wins its
    group, zero-weight docs are excluded, and the sample is
    partitioning-invariant (content-keyed coin)."""
    from mircv_project_spark.operators.curation import weighted_sample

    rows = [(i, "t", "en", "g", 10) for i in range(50)]
    rows.append((999, "t", "en", "g", 10_000_000))  # overwhelming weight
    rows.append((998, "t", "en", "g", 0))           # excluded (w <= 0)
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = weighted_sample(docs, n=5).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert len(ids) == 5
    assert 999 in ids      # ln(u)/1e7 ~ 0 beats every w=10 key
    assert 998 not in ids  # zero weight excluded

    a = sorted(map(tuple, weighted_sample(docs, n=5).collect()))
    b = sorted(map(tuple, weighted_sample(docs.repartition(13), n=5).collect()))
    assert a == b
