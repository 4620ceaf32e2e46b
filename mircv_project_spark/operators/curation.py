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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import grams_col, hash60_col, tokens_col

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
