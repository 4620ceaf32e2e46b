"""End-to-end training-corpus cleaning: the composite decision a
pretraining-data pipeline actually applies — near-dup removal, language
filter, quality floor, token budget — as ONE operator over the
documents table, emitting a per-doc verdict (kept / drop reason) plus
the columns downstream sampling needs.

Composition shape (the 100-TB plan):

- All per-doc text statistics (language marker hits, quality terms,
  BPE-ish token estimate) are fused into a SINGLE tokenizer pass — one
  materialized tokens projection feeds every stat expression, instead
  of re-running the regex pipeline per joined operator (the individual
  operators in textstats.py stay independently usable and oracle-gated;
  this module reuses their constants and formulas verbatim).
- The near-dup keep-list rides the banded MinHash-LSH candidate path
  (dedup.minhash_lsh_pairs -> dedup.dedup_keep_list): bucket equi-join
  + exact verify + join-based min-label components — no all-pairs scan.
- The final assembly is one equi-join of the stats projection with the
  keep-list on doc id.

Drop-reason priority is duplicate > language > quality: a duplicate of
a low-quality foreign doc reports 'duplicate' (dedup runs first in real
pipelines so survivor stats describe the deduped corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from .dedup import dedup_keep_list, minhash_lsh_pairs
from .textstats import BPE_CHUNK, LANG_MARKERS, LANG_ORDER, _QS_STOPS

QUALITY_FLOOR = 0.8
KEEP_LANG = "en"


def training_corpus(
    docs: DataFrame,
    jaccard_threshold: float = 0.8,
    quality_floor: float = QUALITY_FLOOR,
    lang: str = KEEP_LANG,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, component, lang_pred, quality, bpe_est, status, kept)
    for EVERY input doc.  status in ('duplicate','language','quality',
    'ok'); kept = status == 'ok'.  Same formulas (and 6-decimal
    rounding) as lang_id / quality_score / token_counts, evaluated in
    one pass over one tokens projection."""

    def _hit_filter(words: list[str]):
        return lambda t: t.isin(*words)

    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    # stage 1: every raw count from the single tokens column (one
    # tokenizer evaluation per row — the projection materializes it)
    n = F.size("toks")
    tok_chars = F.aggregate("toks", F.lit(0), lambda a, x: a + F.length(x))
    digit_chars = F.aggregate(
        "toks", F.lit(0), lambda a, x: a + F.length(F.regexp_replace(x, "[^0-9]", ""))
    )
    stop_hits = F.size(F.filter("toks", _hit_filter(_QS_STOPS)))
    bpe = F.aggregate(
        "toks", F.lit(0), lambda a, x: a + F.ceil(F.length(x) / F.lit(BPE_CHUNK)).cast("int")
    )
    stage1 = toks.select(
        "id",
        *[
            F.size(F.filter("toks", _hit_filter(LANG_MARKERS[lg]))).alias(f"h_{lg}")
            for lg in LANG_ORDER
        ],
        n.alias("n"),
        tok_chars.alias("tok_chars"),
        digit_chars.alias("digit_chars"),
        stop_hits.alias("stop_hits"),
        bpe.cast("long").alias("bpe_est"),
    )
    # stage 2: scores from the counts (same op order as textstats.py)
    best = F.greatest(*[F.col(f"h_{lg}") for lg in LANG_ORDER])
    pred = F.when(best == 0, F.lit("unknown"))
    for lg in LANG_ORDER:
        pred = pred.when(F.col(f"h_{lg}") == best, F.lit(lg))
    nf = F.col("n").cast("double")
    mean_len = F.when(F.col("n") > 0, F.col("tok_chars") / nf).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        F.col("tok_chars") > 0, F.col("digit_chars") / F.col("tok_chars").cast("double")
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
    stats = stage1.select(
        "id", pred.alias("lang_pred"), quality.alias("quality"), "bpe_est"
    )

    keep = dedup_keep_list(
        docs, minhash_lsh_pairs(docs, jaccard_threshold, id_col, text_col), id_col
    )
    status = (
        F.when(~F.col("keep"), F.lit("duplicate"))
        .when(F.col("lang_pred") != lang, F.lit("language"))
        .when(F.col("quality") < quality_floor, F.lit("quality"))
        .otherwise(F.lit("ok"))
    )
    return (
        keep.join(stats, "id")
        .withColumn("status", status)
        .select(
            "id",
            "component",
            "lang_pred",
            "quality",
            "bpe_est",
            "status",
            (F.col("status") == "ok").alias("kept"),
        )
    )
