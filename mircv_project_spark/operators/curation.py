"""Corpus-curation operators a pretraining-data pipeline runs beyond
dedup: benchmark decontamination, repetition statistics (the Gopher
filters), PII detection + scrubbing, and deterministic domain-mix
sampling.

No analog in the reference (a pure IR engine); these extend the
training-data family (operators/dedup.py, textstats.py, pipeline.py)
and follow the same contract: pure Catalyst column expressions (no
Python in the hot path), every semantics restatable in DuckDB SQL for
the correctness gate, and a 100-TB-shaped plan:

- ``decontaminate``: the benchmark shingle set is tiny next to the
  corpus, so candidates come from ONE broadcast hash equi-join on the
  n-gram key (corpus side streams; no shuffle of the corpus beyond the
  per-doc hit count, which map-side combines on doc id).
- ``repetition_stats``: one (id, gram) shuffle with map-side partial
  aggregation, then an id-grained rollup — bounded per-doc state, no
  per-row O(len^2) higher-order-function scans, so arbitrarily long
  documents stay safe.
- ``pii_scrub``: map-only (regex count + ordered replace), no shuffle.
- ``domain_mix_sample``: map-only keyed coin (md5-derived 60-bit hash
  taken mod 1e6 against a per-domain rate), reproducible across runs,
  cluster sizes, and partitionings — the property that makes corpus
  mixtures re-buildable.
- ``boilerplate_stats``: cross-doc repeated n-grams (site chrome /
  license headers) — gram-keyed count with the table filtered to the
  boilerplate survivors before the join back.
- ``budget_pack``: per-domain token-budget selection as a DISTRIBUTED
  PREFIX SUM (range partition + broadcast per-partition offsets), not
  a per-domain window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import grams_col, hash60_col, tokens_col
from .textstats import _QS_STOPS

# decontamination n-gram order: 8-grams are the usual published
# contamination window (long enough that chance overlap on a natural
# corpus is negligible, short enough to catch partial quoting)
DECON_NGRAM = 8

# PII patterns — RE2-safe (no backreferences / lookaround) so the exact
# same pattern strings run in Spark (Java regex) and DuckDB (RE2).
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PII_PHONE = "\\+[0-9]{8,15}"
# replacement order is part of the semantics: emails first (their local
# part may contain digit runs), then IPs (dotted quads), then phones
# (remaining +digit runs) — each stage sees the previous stage's output
PII_STAGES = [
    ("n_emails", PII_EMAIL, "<EMAIL>"),
    ("n_ips", PII_IPV4, "<IP>"),
    ("n_phones", PII_PHONE, "<PHONE>"),
]

MIX_MOD = 1_000_000  # sampling-key modulus (rate resolution 1e-6)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DECON_NGRAM,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """-> (id, contam_hits, contaminated) for EVERY input doc:
    contam_hits = number of DISTINCT word n-grams the doc shares with
    any benchmark text, contaminated = contam_hits > 0.

    The standard pre-training decontamination test (docs that quote an
    eval benchmark must not be trained on): both sides tokenize with
    the shared T1-T5 normalization, the benchmark's distinct n-grams
    broadcast, and the corpus side joins on the n-gram string key.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    doc_sh = toks.select(
        "id", F.explode(F.array_distinct(grams_col(F.col("toks"), n))).alias("gram")
    )
    bench_sh = (
        benchmark.select(tokens_col(F.col(bench_text_col)).alias("btoks"))
        .select(F.explode(grams_col(F.col("btoks"), n)).alias("gram"))
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "gram")
        .groupBy("id")
        .agg(F.count("*").alias("contam_hits"))
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("contam_hits"), F.lit(0)).cast("long").alias("contam_hits"),
            (F.coalesce(F.col("contam_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, n_2grams, top_2gram_frac, dup_3gram_frac): the Gopher
    repetition filters — the fraction of bigram occurrences taken by
    the single most frequent bigram, and the fraction of trigram
    occurrences that are repeats (1 - distinct/total).  Zero-gram docs
    report 0.0 for both fractions.

    The bigram mode needs a per-(doc, gram) count, done as an explode +
    two-level aggregation (map-side combine on both) rather than a
    per-row higher-order-function scan, so per-task cost stays linear
    in document length.  The trigram distinct/total ratio is computed
    map-side on the same tokens projection and rides through the
    explode (constant per doc, recovered with first())."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    g3 = grams_col(F.col("toks"), 3)
    staged = toks.select(
        "id",
        grams_col(F.col("toks"), 2).alias("g2"),
        F.size(g3).alias("total3"),
        F.size(F.array_distinct(g3)).alias("d3"),
    )
    dup3 = F.round(
        F.when(
            F.col("total3") > 0,
            F.lit(1.0) - F.col("d3") / F.col("total3").cast("double"),
        ).otherwise(F.lit(0.0)),
        6,
    )
    exploded = staged.select(
        "id", dup3.alias("dup3"), F.explode_outer("g2").alias("gram")
    )
    per_gram = exploded.groupBy("id", "gram").agg(
        F.count("*").alias("cnt"), F.first("dup3").alias("dup3")
    )
    real = F.when(F.col("gram").isNull(), F.lit(0)).otherwise(F.col("cnt"))
    per_doc = per_gram.groupBy("id").agg(
        F.sum(real).alias("total2"),
        F.max(real).alias("top2"),
        F.first("dup3").alias("dup3"),
    )
    top_frac = F.round(
        F.when(
            F.col("total2") > 0, F.col("top2") / F.col("total2").cast("double")
        ).otherwise(F.lit(0.0)),
        6,
    )
    return per_doc.select(
        "id",
        F.col("total2").cast("long").alias("n_2grams"),
        top_frac.alias("top_2gram_frac"),
        F.col("dup3").alias("dup_3gram_frac"),
    )


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, n_emails, n_ips, n_phones, clean_text): detect and
    redact the three classic PII shapes.  Counts are measured on the
    ORIGINAL text; the scrubbed text applies the PII_STAGES
    replacements in order (email -> IP -> phone), each pattern global.
    Map-only: no shuffle, whole-stage codegen end to end."""
    out = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(text_col).alias("_text")
    )
    counts = [
        F.size(F.regexp_extract_all("_text", F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(cname)
        for cname, pat, _ in PII_STAGES
    ]
    clean = F.col("_text")
    for _, pat, rep in PII_STAGES:
        clean = F.regexp_replace(clean, pat, rep)
    return out.select("id", *counts, clean.alias("clean_text"))


def domain_mix_sample(
    docs: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    domain_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """-> (id, domain, sample_key, rate, kept) for EVERY input doc:
    deterministic stratified sampling for corpus mixing — keep a doc
    iff hash60(salt-id) mod 1e6 < rate(domain) * 1e6.

    The hash is md5-derived (functions/textnorm.hash60_col), so the
    decision is a pure function of (salt, id, rates): re-running the
    pipeline, changing parallelism, or resuming from checkpoint yields
    the SAME sample — the property that makes a trained-on corpus
    reproducible.  Domains absent from `rates` sample at 0.0.  The
    callers' sample is `.where("kept")`; all rows are returned so the
    verdict itself is auditable (and oracle-checkable)."""
    rate = F.lit(0.0)
    for dom, r in sorted(rates.items()):
        rate = F.when(F.col("domain") == dom, F.lit(float(r))).otherwise(rate)
    key = hash60_col(F.concat(F.lit(f"{salt}-"), F.col("id").cast("string"))) % MIX_MOD
    return (
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(domain_col).alias("domain"),
        )
        .withColumn("rate", F.round(rate, 6))
        .withColumn("sample_key", key.cast("long"))
        .withColumn(
            "kept", F.col("sample_key") < F.round(F.col("rate") * MIX_MOD).cast("long")
        )
    )


# cross-doc boilerplate: a word n-gram is "boilerplate" when it occurs
# in at least BOILER_MIN_DOCS distinct documents (site chrome, license
# headers, navigation text — the repeated-across-docs counterpart of
# repetition_stats' within-doc filters)
BOILER_NGRAM = 3
BOILER_MIN_DOCS = 3

# per-domain token budget for budget_pack (BPE-estimate tokens)
PACK_BUDGET = 1000


def boilerplate_stats(
    docs: DataFrame,
    n: int = BOILER_NGRAM,
    min_docs: int = BOILER_MIN_DOCS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, n_grams, boiler_grams, boiler_frac) for EVERY input doc:
    n_grams = the doc's DISTINCT word n-gram count, boiler_grams = how
    many of those occur in >= ``min_docs`` distinct docs corpus-wide,
    boiler_frac = their ratio (0.0 for gram-less docs).

    Scale shape: one (id, gram) explode of per-doc DISTINCT grams
    (persisted — three consumers), a gram-keyed count with map-side
    partial aggregation, the count table FILTERED to the boilerplate
    subset before the join back (the corpus-wide gram table is huge;
    the >= min_docs survivors are a small fraction), and an id-grained
    rollup.  Heavy-hitter grams (the very thing this detects) skew the
    gram shuffle — AQE skew-join handles the join-back side.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    dg = toks.select(
        "id", F.explode(F.array_distinct(grams_col(F.col("toks"), n))).alias("gram")
    ).persist()
    totals = dg.groupBy("id").agg(F.count("*").alias("n_grams"))
    boiler = (
        dg.groupBy("gram")
        .agg(F.count("*").alias("nd"))  # (id, gram) rows are distinct
        .where(F.col("nd") >= min_docs)
        .select("gram")
    )
    hits = dg.join(boiler, "gram").groupBy("id").agg(
        F.count("*").alias("boiler_grams")
    )
    out = (
        docs.select(F.col(id_col).cast("long").alias("id"))
        .join(totals, "id", "left")
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("boiler_grams", F.lit(0)).cast("long").alias("boiler_grams"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0,
        F.col("boiler_grams") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.withColumn("boiler_frac", F.round(frac, 6))


def budget_pack(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    num_partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """-> (id, domain, quality, bpe_est, cum_bpe, kept) for EVERY input
    doc: within each domain, docs are ordered (quality desc, id asc)
    and kept while the running BPE-token total stays <= ``budget`` —
    the deterministic "fill each domain's token budget with its best
    docs" mixing step.  quality and bpe_est restate the
    textstats.quality_score / token_counts formulas verbatim (same op
    order, round 6).

    Scale shape — a distributed prefix sum, NOT a per-domain window: a
    naive Window.partitionBy(domain) materializes every row of a domain
    in ONE task (a deal-breaker for a domain holding billions of docs).
    Instead: range-partition on the exact sort key (domain, quality
    desc, id), collect per-(domain, partition) subtotals (#domains x
    #partitions tiny rows — the operator's only driver-side state),
    broadcast the running offsets back, and cumsum inside each
    partition under Window.partitionBy(domain, pid) — every window
    group is bounded by the partition size, so the plan scales with
    partition count, not domain size.  Range partitioning guarantees
    in-partition order is a contiguous slice of the global order, which
    makes offset + local cumsum == global cumsum.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(domain_col).alias("domain"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    # same counts AND op order as textstats.quality_score/token_counts
    nn = F.size("toks")
    tok_chars = F.aggregate("toks", F.lit(0), lambda a, x: a + F.length(x))
    digit_chars = F.aggregate(
        "toks", F.lit(0), lambda a, x: a + F.length(F.regexp_replace(x, "[^0-9]", ""))
    )
    stop_hits = F.size(F.filter("toks", lambda x: x.isin(*_QS_STOPS)))
    bpe = F.aggregate(
        "toks", F.lit(0), lambda a, x: a + F.ceil(F.length(x) / F.lit(4)).cast("int")
    )
    stage1 = toks.select(
        "id", "domain",
        nn.alias("n"), tok_chars.alias("tok_chars"),
        digit_chars.alias("digit_chars"), stop_hits.alias("stop_hits"),
        bpe.cast("long").alias("bpe_est"),
    )
    nf = F.col("n").cast("double")
    mean_len = F.when(F.col("n") > 0, F.col("tok_chars") / nf).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        F.col("tok_chars") > 0,
        F.col("digit_chars") / F.col("tok_chars").cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(F.col("n") > 0, F.col("stop_hits") / nf).otherwise(F.lit(0.0))
    quality = F.round(
        F.lit(0.4) * F.least(nf / F.lit(20.0), F.lit(1.0))
        + F.lit(0.2)
        * F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio)
        + F.lit(0.2) * F.least(stop_ratio * 5.0, F.lit(1.0)),
        6,
    )
    stats = stage1.select("id", "domain", quality.alias("quality"), "bpe_est")

    ordered = (
        stats.repartitionByRange(
            num_partitions, F.col("domain"), F.col("quality").desc(), F.col("id")
        )
        .withColumn("pid", F.spark_partition_id())
        .persist()  # two jobs consume this exact partitioning
    )
    subtotals = ordered.groupBy("domain", "pid").agg(
        F.sum("bpe_est").alias("s")
    ).collect()
    by_dom: dict[str, list] = {}
    for r in subtotals:
        by_dom.setdefault(r["domain"], []).append((int(r["pid"]), int(r["s"])))
    off_rows = []
    for dom, lst in by_dom.items():
        acc = 0
        for pid, s in sorted(lst):
            off_rows.append((dom, pid, acc))
            acc += s
    offsets = docs.sparkSession.createDataFrame(
        off_rows, "domain string, pid int, off long"
    )
    w = (
        Window.partitionBy("domain", "pid")
        .orderBy(F.col("quality").desc(), F.col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ordered.join(F.broadcast(offsets), ["domain", "pid"])
        .withColumn("cum_bpe", (F.col("off") + F.sum("bpe_est").over(w)).cast("long"))
        .select(
            "id", "domain", "quality", "bpe_est", "cum_bpe",
            (F.col("cum_bpe") <= F.lit(int(budget))).alias("kept"),
        )
    )


SHARD_COUNT = 16
SHARD_SALT = "shard"


def export_shards(
    docs: DataFrame,
    n_shards: int = SHARD_COUNT,
    salt: str = SHARD_SALT,
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, shard, pos): the deterministic global shuffle + shard
    assignment every training-data export runs — key = hash60(salt-id)
    (functions/textnorm.hash60_col, md5-derived), shard = key mod
    n_shards, pos = the doc's rank within its shard ordered
    (key asc, id asc).  A pure function of (salt, id, n_shards):
    re-running, resuming, or changing parallelism reproduces the
    identical shard layout, and the md5 key decorrelates neighbors so
    each shard is an unbiased sample of the corpus (the property batch
    training needs from "shuffled" data).

    Scale shape: one hash shuffle on ``shard``; ``pos`` is a per-shard
    window, so a task's work is corpus/n_shards rows — at 100 TB you
    size n_shards (tens of thousands of shards of ~1-4 GB) exactly so
    this holds, which is the same knob the downstream trainer wants
    anyway.  No global sort, no driver traffic."""
    key = hash60_col(F.concat(F.lit(f"{salt}-"), F.col(id_col).cast("string")))
    keyed = docs.select(
        F.col(id_col).cast("long").alias("id"),
        key.alias("skey"),
    ).withColumn("shard", (F.col("skey") % F.lit(int(n_shards))).cast("long"))
    w = Window.partitionBy("shard").orderBy(
        F.col("skey").asc(), F.col("id").asc()
    )
    return keyed.select(
        "id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


SPLIT_SALT = "split"
SPLIT_VAL_PPM = 100_000   # 10% validation
SPLIT_TEST_PPM = 100_000  # 10% test


def train_split(
    docs: DataFrame,
    val_ppm: int = SPLIT_VAL_PPM,
    test_ppm: int = SPLIT_TEST_PPM,
    salt: str = SPLIT_SALT,
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, split_key, split): deterministic train/val/test
    assignment — key = hash60(salt-id) mod 1e6; [0, test) -> 'test',
    [test, test+val) -> 'val', rest -> 'train'.  The same md5-keyed
    coin as domain_mix_sample, so membership is a pure function of
    (salt, id, ppm thresholds): reproducible across runs, cluster
    sizes, and resume, and independent of the mix-sampling coin (a doc
    kept by one salt is unbiased under the other).  Map-only — no
    shuffle at any scale."""
    key = (
        hash60_col(F.concat(F.lit(f"{salt}-"), F.col(id_col).cast("string")))
        % MIX_MOD
    )
    t, v = int(test_ppm), int(test_ppm) + int(val_ppm)
    return docs.select(
        F.col(id_col).cast("long").alias("id"), key.alias("split_key")
    ).withColumn(
        "split",
        F.when(F.col("split_key") < t, "test")
        .when(F.col("split_key") < v, "val")
        .otherwise("train"),
    )


PACK_WINDOW = 256
PACK_SALT = "pack"


def pack_sequences(
    docs: DataFrame,
    window: int = PACK_WINDOW,
    salt: str = PACK_SALT,
    num_partitions: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, pack_key, bpe_est, start_tok, first_win, last_win,
    n_wins): GPT-style concat-and-chunk sequence packing — documents
    are laid end-to-end in a deterministic shuffled order (pack_key =
    hash60('pack-'||id), ties id asc — export_shards' coin under its
    own salt, so the packing order is reproducible across runs,
    parallelism, and resume, and independent of the shard/split coins)
    and the concatenated BPE-token stream is cut into fixed ``window``-
    token training sequences.  start_tok = this doc's offset in the
    stream (exact global prefix sum); first_win/last_win = the window
    indices its tokens land in (floor-div — docs SPAN boundaries by
    design, nothing is padded or dropped); n_wins = how many training
    sequences contain a piece of this doc.  Zero-token docs occupy no
    window: (first_win, last_win, n_wins) = (-1, -1, 0).

    bpe_est restates the textstats.token_counts BPE formula verbatim
    (pinned — same as budget_pack).  Everything is exact integer
    arithmetic; window = 256 pinned in the gate.

    Scale shape: the same distributed prefix sum as budget_pack but
    GLOBAL — range-partition on the exact order key (pack_key, id),
    per-partition subtotals (num_partitions driver rows), broadcast
    offsets back, cumsum inside each partition.  No global window, no
    single-task domain.  Window membership is then map-side floor
    arithmetic.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    bpe = F.aggregate(
        "toks",
        F.lit(0),
        lambda a, x: a + F.ceil(F.length(x) / F.lit(4)).cast("int"),
    )
    keyed = toks.select(
        "id",
        bpe.cast("long").alias("bpe_est"),
        hash60_col(
            F.concat(F.lit(f"{salt}-"), F.col("id").cast("string"))
        ).alias("pack_key"),
    )
    ordered = (
        keyed.repartitionByRange(num_partitions, "pack_key", "id")
        .withColumn("pid", F.spark_partition_id())
        .persist()  # two jobs consume this exact partitioning
    )
    try:
        subtotals = ordered.groupBy("pid").agg(
            F.sum("bpe_est").alias("s")
        ).collect()
        acc, off_rows = 0, []
        for pid, s in sorted((int(r["pid"]), int(r["s"])) for r in subtotals):
            off_rows.append((pid, acc))
            acc += s
        offsets = docs.sparkSession.createDataFrame(
            off_rows, "pid int, off long"
        )
        w = (
            Window.partitionBy("pid")
            .orderBy("pack_key", "id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = F.col("off") + F.sum("bpe_est").over(w)
        start = (cum - F.col("bpe_est")).cast("long")
        wint = int(window)
        out = (
            ordered.join(F.broadcast(offsets), "pid")
            .withColumn("start_tok", start)
            .withColumn(
                "first_win",
                F.when(
                    F.col("bpe_est") > 0,
                    F.expr(f"start_tok div {wint}"),
                )
                .otherwise(F.lit(-1))
                .cast("long"),
            )
            .withColumn(
                "last_win",
                F.when(
                    F.col("bpe_est") > 0,
                    F.expr(f"(start_tok + bpe_est - 1) div {wint}"),
                )
                .otherwise(F.lit(-1))
                .cast("long"),
            )
            .select(
                "id",
                "pack_key",
                "bpe_est",
                "start_tok",
                "first_win",
                "last_win",
                F.when(
                    F.col("bpe_est") > 0,
                    F.col("last_win") - F.col("first_win") + 1,
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("n_wins"),
            )
            .localCheckpoint()
        )
    finally:
        ordered.unpersist()
    return out


QCAL_PCT = 0.5


def adaptive_quality_filter(
    docs: DataFrame,
    pct: float = QCAL_PCT,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """-> (id, domain, quality, domain_p50, keep): domain-RELATIVE
    quality calibration — keep a doc iff its quality clears its own
    domain's interpolated median (keep = quality >= round(p50, 6),
    boundary kept).  An absolute threshold over-prunes domains whose
    register is naturally informal (code, forums) and under-prunes
    formal ones; calibrating per domain is the standard fix.

    quality is textstats.quality_score's pinned formula (shared call,
    not a restatement); both engines linear-interpolate the median and
    round 6 (Spark percentile <-> DuckDB quantile_cont — the
    event_props_rollup precedent).

    Scale shape: one tokenizer pass (inside quality_score), one
    per-domain agg — exact percentile is the one O(group)-memory piece,
    same caveat as events.event_props_rollup (swap approx_percentile at
    real scale); thresholds are #domains rows, broadcast back."""
    from .textstats import quality_score

    q = quality_score(docs, id_col, text_col).select("id", "quality")
    dom = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(domain_col).alias("domain"),
    )
    dq = q.join(dom, "id")
    thr = dq.groupBy("domain").agg(
        F.round(F.percentile("quality", F.lit(float(pct))), 6).alias(
            "domain_p50"
        )
    )
    return dq.join(F.broadcast(thr), "domain").select(
        "id",
        "domain",
        "quality",
        "domain_p50",
        (F.col("quality") >= F.col("domain_p50")).alias("keep"),
    )


WS_SALT = "wsample"
WS_N = 20
_WS_SCALE = 1_000_000_000_000.0  # 1e12: ln(u)/w quantization (micro is too coarse for large w)


def weighted_sample(
    docs: DataFrame,
    n: int = WS_N,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, n per group — the
    Efraimidis-Spirakis (2006) one-pass reservoir scheme with the
    repo's deterministic-coin discipline instead of a RNG:

        u(id)  = (hash60('wsample-' || id) + 1) / 2^60   in (0, 1]
        key    = u^(1/w)  — rank by the monotone ln form ln(u)/w,
                 quantized to round(1e12 · ln(u)/w) BIGINT (ties id
                 asc); the top-n keys per group are exactly a
                 w-weighted sample without replacement.

    Heavier docs draw keys nearer 0 (ln u < 0 shrinks under /w), so
    selection probability scales with weight — the quality-weighted
    corpus subsampling step of a training pipeline, reproducible
    across runs/partitionings because the coin is content-keyed.

    Zero/negative weights are excluded up front (E-S requires w > 0 —
    pinned, restated in the oracle).

    -> (source, id, w, key_q, rank); rank = (key_q desc, id asc) <= n.

    Scale shape: one map-side key computation + one per-group top-n
    window (or the partial-k-min pattern at extreme group counts)."""
    base = docs.select(
        F.col(group_col).alias("source"),
        F.col(id_col).cast("long").alias("id"),
        F.col(weight_col).cast("double").alias("w"),
    ).where(F.col("w") > 0)
    u = (
        hash60_col(F.concat(F.lit(WS_SALT + "-"), F.col("id").cast("string")))
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    key_q = F.round(F.lit(_WS_SCALE) * F.log(u) / F.col("w")).cast("long")
    keyed = base.withColumn("key_q", key_q)
    win = Window.partitionBy("source").orderBy(
        F.col("key_q").desc(), F.col("id").asc()
    )
    return (
        keyed.withColumn("rank", F.row_number().over(win).cast("long"))
        .where(F.col("rank") <= n)
        .select("source", "id", "w", "key_q", "rank")
    )


CHUNK_W = 32  # tokens per chunk
CHUNK_S = 16  # stride (W/2 -> 50% overlap)


def doc_chunks(
    docs: DataFrame,
    window: int = CHUNK_W,
    stride: int = CHUNK_S,
) -> DataFrame:
    """-> (doc_id, chunk_idx, start_tok, n_toks, chunk_text): fixed-
    width overlapping token chunks per document — the RAG/embedding
    chunker of a training-data pipeline (every retrieval-augmented
    corpus build slices documents into model-window pieces with
    overlap so no boundary context is lost).

    Pinned semantics (restated verbatim in oracle._DOC_CHUNKS_SQL —
    change both sides or neither): tokens = textnorm.tokens_col (the
    oracle-side pipeline, the textrank pin); chunk starts = 0, S, 2S,
    ... while start < n_tokens (so the final partial chunk is KEPT —
    chunk count = floor((n-1)/S) + 1); chunk = tokens[start+1 ..
    start+W] (1-based slice, clamped at the end); chunk_text = the
    space-joined slice; zero-token docs emit NO rows; chunk_idx =
    start / S.

    Scale shape (100 TB): pure Catalyst — one projection materializes
    the tokenizer (the re-evaluation gotcha), one explode of the
    per-doc start list (fan-out n/S rows per doc), no shuffle at all;
    chunking parallelizes embarrassingly and column-prunes to (doc_id,
    text)."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        tokens_col(F.col("text")).alias("toks"),
    ).withColumn("n", F.size("toks"))
    starts = toks.where(F.col("n") > 0).select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
        ).alias("start_tok"),
    )
    chunk = F.slice(F.col("toks"), F.col("start_tok") + 1, window)
    return starts.select(
        "doc_id",
        (F.col("start_tok") / F.lit(stride)).cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_toks"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ----------------------- T5 span corruption masking -----------------------
#
# Deterministic span-corruption mask selection (Raffel et al., JMLR
# 2020 — T5's denoising objective): each token position flips a salted
# coin; fired positions open a SPAN_LEN-token mask window, overlapping
# or ADJACENT windows merge into one span (T5 merges touching spans —
# the dup_spans island rule: break only on a strict gap,
# pos > prev_end + 1).  Salt 'span-' keeps the coins independent of the
# shard/split/pack/mix/wsample salts.
#
# Gate pins (change both sides or neither): tokens = the oracle-side
# pipeline (tokens_col), positions 0-based, coin fires iff
# hash60('span-' || doc_id || '-' || pos) % 1e6 < SPAN_PPM
# (SPAN_PPM = 150000), window [p, min(p + SPAN_LEN - 1, n - 1)] with
# SPAN_LEN = 3, spans ordered by start (span_idx 1-based), zero-token
# docs and docs with no fired coin emit nothing.
#
# Scale: one tokenize pass, one explode bounded by SPAN_LEN x fired
# positions, one per-doc window — no joins, no driver state.

SPAN_SALT = "span-"
SPAN_LEN = 3
SPAN_PPM = 150_000


def span_corruption(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, span_idx, start_pos, end_pos, span_len): merged mask
    spans per document under the deterministic salted coin."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).withColumn("n", F.size("toks"))
    pos = (
        toks.where(F.col("n") > 0)
        .select("id", "n", F.posexplode("toks").alias("p", "t"))
        .drop("t")
    )
    coin = hash60_col(
        F.concat(
            F.lit(SPAN_SALT),
            F.col("id").cast("string"),
            F.lit("-"),
            F.col("p").cast("string"),
        )
    ) % 1_000_000
    fired = pos.where(coin < SPAN_PPM)
    masked = fired.select(
        "id",
        F.explode(
            F.sequence(
                F.col("p"),
                F.least(F.col("p") + F.lit(SPAN_LEN - 1), F.col("n") - 1),
            )
        ).alias("m"),
    ).distinct()
    w = Window.partitionBy("id").orderBy("m")
    isl = masked.withColumn(
        "brk",
        F.when(F.col("m") > F.lag("m", 1, -2).over(w) + 1, 1).otherwise(0),
    ).withColumn(
        "grp",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = isl.groupBy("id", "grp").agg(
        F.min("m").cast("long").alias("start_pos"),
        F.max("m").cast("long").alias("end_pos"),
        F.count("*").cast("long").alias("span_len"),
    )
    wo = Window.partitionBy("id").orderBy("start_pos")
    return spans.select(
        "id",
        F.row_number().over(wo).cast("long").alias("span_idx"),
        "start_pos",
        "end_pos",
        "span_len",
    )


# ------------------------- stratified sampling -------------------------

SSAMP_SALT = "ssamp-"
SSAMP_K = 20


def stratified_sample(
    docs: DataFrame,
    k: int = SSAMP_K,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """-> (source, doc_id, h, pos): k-per-source uniform sample — the
    stratified eval/inspection sampler every curation pipeline runs
    (equal-size per-domain samples regardless of domain skew).

    Pins (restated in oracle._STRATIFIED_SAMPLE_SQL — change both
    sides or neither): key = hash60('ssamp-' || doc_id) (salt
    independent of the shard/split/pack/mix/wsample/qsk coins), the k
    smallest keys per source win, pos = row_number under (h asc,
    doc_id asc).  The bottom-k-by-hash rule is the quantile_sketch
    sample law: mergeable (bottom-k of a union == bottom-k of
    per-part bottom-ks), identical under any partitioning.

    Scale shape: mapInPandas partial bottom-k per Arrow batch (the
    sketches._partial_kmin_v kernel — bounded memory, map-side), then
    one window over <= k-per-batch survivors; the full table never
    shuffles."""
    from pyspark.sql import Window

    from .sketches import _partial_kmin_v

    base = docs.select(
        F.col(source_col).alias("source"),
        hash60_col(
            F.concat(F.lit(SSAMP_SALT), F.col(id_col).cast("string"))
        ).alias("h"),
        F.col(id_col).cast("long").alias("v"),
    )
    partial = base.mapInPandas(
        _partial_kmin_v(k), schema="source string, h long, v long"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("h").asc(), F.col("v").asc()
    )
    return (
        partial.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select(
            "source",
            F.col("v").alias("doc_id"),
            "h",
            F.col("pos").cast("long").alias("pos"),
        )
    )
