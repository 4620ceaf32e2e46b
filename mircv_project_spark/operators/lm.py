"""Distributed n-gram language-model operators for corpus quality
filtering and data selection.

Two operators the big pretraining pipelines run that the IR reference
(a query engine) has no analog for:

- `bigram_lm_perplexity` — train an add-alpha-smoothed bigram LM over
  the corpus itself and score every document's log-probability /
  perplexity under it (the CCNet/KenLM-style quality filter: documents
  far from the corpus distribution score high perplexity and get
  dropped or down-weighted).
- `lm_importance` — DSIR-flavored importance weights (Xie et al. 2023):
  the per-document log-likelihood RATIO between a target-domain bigram
  LM and the background (whole-corpus) LM.  Data selection keeps the
  documents whose ratio is highest, i.e. those that look most like the
  target domain.
- `pmi_collocations` — corpus-wide collocation mining: the top-k word
  bigrams by pointwise mutual information (Church & Hanks 1990) above
  a minimum count floor.  Pipelines use the result as a phrase
  vocabulary (multi-word tokenizer entries) and as a corpus-drift
  diagnostic.

Exactness contract (the hash-gate trick shared with the codec gates):
every per-bigram weight is quantized to integer MICRO-log10 units
(w_micro = round(log10(p) * 1e6) as BIGINT) BEFORE the per-document
sum, so the document aggregate is exact integer arithmetic — order-
independent across shuffle partitions and across engines.  A float sum
of raw logs would be order-dependent at the 6th decimal; a sum of
BIGINTs cannot be.  Only the final perplexity (one pow of an exact
rational) is float, rounded to 6 like every other gate output.

Scale shape (100 TB): one tokenizer pass per document (the tokens
projection is persisted — two consumers, see the Catalyst gotcha in
CLAUDE.md); bigram and context counts are map-side-combined groupBys
keyed by gram / first word; the weight table joins doc grams on an
equi-key (the vocabulary is far too large to broadcast; stopword-bigram
skew is AQE skew-join territory); V and N are scalar aggregates.
Nothing is per-row Python and nothing is a window over a whole corpus.

Smoothing: add-alpha with LM_ALPHA = 0.5 (exactly representable in
binary — do NOT "tune" it to a non-dyadic value without re-proving
float parity), vocabulary = distinct normalized tokens corpus-wide,
P(w2 | w1) = (c(w1 w2) + 0.5) / (c(w1 ·) + 0.5 * V), where c(w1 ·) is
the number of bigram occurrences whose context is w1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.textnorm import grams_col, tokens_col

LM_ALPHA = 0.5
LM_MICRO = 1_000_000  # integer log10 quantum: 1e-6

# pmi_collocations gate pins (restated verbatim in the oracle — change
# both sides or neither): count floor, top-k, and the EXACT double
# expression whose single log10 feeds the micro quantizer:
# ((c2 * U) * U) / ((N * cu1) * cu2) with every factor cast to double
# BEFORE the multiplies (BIGINT products would overflow at corpus
# scale) and the multiplication order pinned — IEEE double arithmetic
# is deterministic, so both engines hand log10 the identical double.
PMI_MIN_COUNT = 5
PMI_K = 50

# lm_importance's pinned target-domain definition on the driver corpus:
# sources srcK with K % 5 == 0 (src0, src5, src10, src15 — 20% of the
# corpus; echoes domain_mix_sample's source-derived pinning).  The
# oracle restates the same predicate verbatim — change both or neither.
TARGET_SOURCE_MOD = 5


def _doc_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> persisted (id, toks, grams): one tokenizer evaluation per doc,
    materialized because both the vocabulary count and the bigram counts
    consume it (re-running the regex pipeline per branch is the 10x
    Catalyst trap)."""
    staged = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    return staged.select(
        "id", "toks", grams_col(F.col("toks"), 2).alias("grams")
    ).persist(StorageLevel.MEMORY_AND_DISK)


def _gram_weights(bgd: DataFrame, vocab_size: float, alpha: float) -> DataFrame:
    """(id, gram, c) doc-level bigram counts -> (gram, w_micro): the
    quantized log10 conditional probability of every gram under the
    add-alpha LM trained on those counts.  Both corpus tables derive
    from the doc-level counts (no second token pass)."""
    bgc = bgd.groupBy("gram").agg(F.sum("c").alias("c2"))
    ctx = (
        bgc.select(F.split("gram", " ").getItem(0).alias("w1"), "c2")
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    return (
        bgc.withColumn("w1", F.split("gram", " ").getItem(0))
        .join(ctx, "w1")
        .select(
            "gram",
            F.round(
                F.log10(
                    (F.col("c2") + F.lit(alpha))
                    / (F.col("c1") + F.lit(alpha * vocab_size))
                )
                * F.lit(float(LM_MICRO))
            )
            .cast("long")
            .alias("w_micro"),
        )
    )


def bigram_lm_perplexity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, n_bigrams, logp_micro, ppl): each document scored under
    the corpus's own add-alpha bigram LM.  logp_micro is the EXACT
    integer sum of quantized per-bigram log10 probabilities (micro
    units); ppl = round(10^(-logp_micro / (n_bigrams * 1e6)), 6).
    Documents with fewer than 2 tokens have no bigrams and emit no row.
    """
    tg = _doc_bigrams(docs, id_col, text_col)
    try:
        vocab = float(
            tg.select(F.explode("toks").alias("t")).agg(
                F.countDistinct("t")
            ).collect()[0][0]
        )
        # persisted: the weights branch AND the scoring join both read
        # this shuffle output — without the cache the (id, gram) agg
        # runs twice
        bgd = (
            tg.select("id", F.explode("grams").alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count("*").alias("c"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            wts = _gram_weights(bgd, vocab, LM_ALPHA)
            agg = (
                bgd.join(wts, "gram")
                .groupBy("id")
                .agg(
                    F.sum("c").alias("n_bigrams"),
                    F.sum(F.col("c") * F.col("w_micro")).alias("logp_micro"),
                )
            )
            out = agg.select(
                "id",
                F.col("n_bigrams").cast("long").alias("n_bigrams"),
                F.col("logp_micro").cast("long").alias("logp_micro"),
                F.round(
                    F.pow(
                        F.lit(10.0),
                        -F.col("logp_micro").cast("double")
                        / (
                            F.col("n_bigrams").cast("double")
                            * F.lit(float(LM_MICRO))
                        ),
                    ),
                    6,
                ).alias("ppl"),
            )
            out = out.localCheckpoint()  # cut lineage before unpersisting
        finally:
            bgd.unpersist()
    finally:
        tg.unpersist()
    return out


def lm_importance(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """-> (id, n_bigrams, imp_micro): DSIR-style importance weight —
    the exact integer sum over the document's bigrams of
    (w_target - w_background) in micro-log10 units, where both LMs are
    add-alpha bigram models sharing the corpus-wide vocabulary (so every
    background bigram has positive target probability: unseen grams get
    c2=0 / c1=0 under the target counts, never a hole).  Positive
    imp_micro = the document looks more like the target domain than the
    background; selection keeps the top of this ranking.

    The target domain is the rows whose source number is divisible by
    TARGET_SOURCE_MOD ('src0', 'src5', ...).  The weight tables are
    built over the BACKGROUND gram set (a superset of the target's), so
    one gram-keyed equi-join scores every document."""
    tg = _doc_bigrams(docs, id_col, text_col)
    try:
        vocab = float(
            tg.select(F.explode("toks").alias("t")).agg(
                F.countDistinct("t")
            ).collect()[0][0]
        )
        src = docs.select(
            F.col(id_col).cast("long").alias("id"),
            (
                F.regexp_extract(F.col(source_col), r"(\d+)$", 1).cast("long")
                % TARGET_SOURCE_MOD
                == 0
            ).alias("is_target"),
        )
        bgd_all = (
            tg.select("id", F.explode("grams").alias("gram"))
            .groupBy("id", "gram")
            .agg(F.count("*").alias("c"))
            .join(src, "id")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        w_bg = None
        try:
            # two consumers (the gram universe for the target LM and
            # the delta join) — cache or the weight aggs run twice
            w_bg = _gram_weights(
                bgd_all.select("id", "gram", "c"), vocab, LM_ALPHA
            ).persist(StorageLevel.MEMORY_AND_DISK)
            # target LM over the SAME gram universe: left-join target
            # counts onto the background gram set, zeros where unseen
            bgc_t = (
                bgd_all.where("is_target")
                .groupBy("gram")
                .agg(F.sum("c").alias("c2t"))
            )
            grams_all = w_bg.select(
                "gram", F.split("gram", " ").getItem(0).alias("w1")
            )
            ctx_t = (
                bgc_t.select(
                    F.split("gram", " ").getItem(0).alias("w1"), "c2t"
                )
                .groupBy("w1")
                .agg(F.sum("c2t").alias("c1t"))
            )
            w_t = (
                grams_all.join(bgc_t, "gram", "left")
                .join(ctx_t, "w1", "left")
                .select(
                    "gram",
                    F.round(
                        F.log10(
                            (F.coalesce(F.col("c2t"), F.lit(0)) + F.lit(LM_ALPHA))
                            / (
                                F.coalesce(F.col("c1t"), F.lit(0))
                                + F.lit(LM_ALPHA * vocab)
                            )
                        )
                        * F.lit(float(LM_MICRO))
                    )
                    .cast("long")
                    .alias("wt_micro"),
                )
            )
            delta = w_t.join(w_bg, "gram").select(
                "gram", (F.col("wt_micro") - F.col("w_micro")).alias("d_micro")
            )
            agg = (
                bgd_all.join(delta, "gram")
                .groupBy("id")
                .agg(
                    F.sum("c").alias("n_bigrams"),
                    F.sum(F.col("c") * F.col("d_micro")).alias("imp_micro"),
                )
            )
            out = agg.select(
                "id",
                F.col("n_bigrams").cast("long").alias("n_bigrams"),
                F.col("imp_micro").cast("long").alias("imp_micro"),
            ).localCheckpoint()
        finally:
            if w_bg is not None:
                w_bg.unpersist()
            bgd_all.unpersist()
    finally:
        tg.unpersist()
    return out


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = PMI_MIN_COUNT,
    k: int = PMI_K,
) -> DataFrame:
    """-> (gram, c2, pmi_micro): the top-`k` word bigrams by pointwise
    mutual information among those occurring at least `min_count`
    times, ranked (pmi_micro desc, gram asc) — a deterministic total
    order, so the k-cut is engine-independent.

    PMI(w1 w2) = log10( P(w1 w2) / (P(w1) P(w2)) ) with P(w1 w2) =
    c2/N over adjacent-position bigram occurrences and P(w) = cu/U over
    token occurrences, evaluated as ONE log10 of the pinned double
    ratio ((c2*U)*U) / ((N*cu1)*cu2) and quantized to integer micro
    units (the module-wide hash-gate contract).

    Scale shape (100 TB): one tokenizer pass (persisted — the unigram
    and bigram branches both consume it); unigram/bigram counts are
    map-side-combined groupBys; U and N are scalar aggregates collected
    once; the two cu lookups are key equi-joins against the unigram
    table (vocabulary too large to broadcast in general — AQE decides);
    the k-cut is a TakeOrdered (per-partition top-k then merge), never
    a global sort materialization.
    """
    tg = _doc_bigrams(docs, id_col, text_col)
    try:
        uni = (
            tg.select(F.explode("toks").alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("cu"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            bgc = (
                tg.select(F.explode("grams").alias("gram"))
                .groupBy("gram")
                .agg(F.count("*").alias("c2"))
                .where(F.col("c2") >= min_count)
            )
            totals = (
                uni.agg(F.sum("cu").alias("u_tot")).collect()[0],
                tg.select(
                    F.explode("grams").alias("gram")
                ).count(),
            )
            u_tot = float(totals[0]["u_tot"])
            n_tot = float(totals[1])
            num = (F.col("c2").cast("double") * F.lit(u_tot)) * F.lit(u_tot)
            den = (F.lit(n_tot) * F.col("cu1").cast("double")) * F.col(
                "cu2"
            ).cast("double")
            scored = (
                bgc.withColumn("w1", F.split("gram", " ").getItem(0))
                .withColumn("w2", F.split("gram", " ").getItem(1))
                .join(uni.select(F.col("t").alias("w1"), F.col("cu").alias("cu1")), "w1")
                .join(uni.select(F.col("t").alias("w2"), F.col("cu").alias("cu2")), "w2")
                .select(
                    "gram",
                    F.col("c2").cast("long").alias("c2"),
                    F.round(F.log10(num / den) * F.lit(float(LM_MICRO)))
                    .cast("long")
                    .alias("pmi_micro"),
                )
            )
            out = (
                scored.orderBy(F.col("pmi_micro").desc(), F.col("gram").asc())
                .limit(k)
                .localCheckpoint()
            )
        finally:
            uni.unpersist()
    finally:
        tg.unpersist()
    return out


SUGGEST_K = 3


def next_term_suggest(
    docs: DataFrame,
    seeds: list[str],
    k: int = SUGGEST_K,
    text_col: str = "text",
) -> DataFrame:
    """-> (ctx, suggestion, cnt, srank): for each seed term, the top-k
    most frequent FOLLOWING tokens in the corpus (query-completion by
    bigram continuation — the "users also typed" serve path, the
    simplest useful LM head over the same bigram stream the perplexity
    filter consumes).

    Pins (restated in the oracle): counts are corpus-wide bigram
    occurrence counts (duplicates kept — the occurrence stream, not the
    distinct set), rank = (cnt desc, suggestion asc), seeds absent from
    any bigram emit nothing.

    Scale shape: one tokenizer pass, map-side-combined bigram counts
    (the only shuffle), seed filter broadcast; the rank window sees
    only the seeds' continuation sets."""
    spark = docs.sparkSession
    grams = docs.select(
        F.explode(grams_col(tokens_col(F.col(text_col)), 2)).alias("gram")
    )
    cnt = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    parts = F.split(F.col("gram"), " ")
    pairs = cnt.select(
        parts.getItem(0).alias("ctx"),
        parts.getItem(1).alias("suggestion"),
        "cnt",
    )
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "ctx string")
    cand = pairs.join(F.broadcast(seeds_df), "ctx")
    w = Window.partitionBy("ctx").orderBy(
        F.col("cnt").desc(), F.col("suggestion").asc()
    )
    return (
        cand.withColumn("srank", F.row_number().over(w).cast("long"))
        .where(F.col("srank") <= k)
        .select("ctx", "suggestion", F.col("cnt").cast("long").alias("cnt"), "srank")
    )


def segment_queries(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    min_count: int = PMI_MIN_COUNT,
) -> DataFrame:
    """-> (qid, seg_idx, segment): query segmentation by corpus
    collocation statistics — adjacent query tokens merge into one
    segment when their bigram is a POSITIVE-PMI collocation (>=
    min_count corpus occurrences AND pmi_micro > 0), the classic
    statistical query-understanding step ("new york times" retrieved
    as units, not bags; Bergsma & Wang EMNLP 2007 use association
    scores exactly this way).

    Pinned semantics (restated in oracle._segment_queries_sql —
    change both sides or neither): the pmi formula/quantizer is
    pmi_collocations' VERBATIM (same floor, same double
    parenthesization, NO k-cut — the collocation SET, not the top
    list); query tokens = the T1-T5 pipeline in order; break BEFORE
    position i iff i == 0 or (term_{i-1}, term_i) is not in the set;
    seg_idx = running break count - 1; segment = the space-joined run.
    The greedy left-to-right rule is expressed as a WINDOW (running
    sum of break flags), not an iteration — exact on both engines.

    Scale shape: the collocation set build is pmi_collocations' plan;
    the query side is driver-tiny."""
    spark = docs.sparkSession
    tg = _doc_bigrams(docs, "doc_id", "text")
    try:
        uni = (
            tg.select(F.explode("toks").alias("t"))
            .groupBy("t")
            .agg(F.count("*").alias("cu"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            bgc = (
                tg.select(F.explode("grams").alias("gram"))
                .groupBy("gram")
                .agg(F.count("*").alias("c2"))
                .where(F.col("c2") >= min_count)
            )
            u_tot = float(uni.agg(F.sum("cu")).collect()[0][0])
            n_tot = float(
                tg.select(F.explode("grams").alias("gram")).count()
            )
            num = (F.col("c2").cast("double") * F.lit(u_tot)) * F.lit(u_tot)
            den = (F.lit(n_tot) * F.col("cu1").cast("double")) * F.col(
                "cu2"
            ).cast("double")
            colls = (
                bgc.withColumn("w1", F.split("gram", " ").getItem(0))
                .withColumn("w2", F.split("gram", " ").getItem(1))
                .join(
                    uni.select(F.col("t").alias("w1"), F.col("cu").alias("cu1")),
                    "w1",
                )
                .join(
                    uni.select(F.col("t").alias("w2"), F.col("cu").alias("cu2")),
                    "w2",
                )
                .where(
                    F.round(F.log10(num / den) * F.lit(float(LM_MICRO)))
                    .cast("long")
                    > 0
                )
                .select("gram")
            )
            qdf = spark.createDataFrame(queries, "qid string, qtext string")
            qt = qdf.select(
                "qid",
                F.posexplode(tokens_col(F.col("qtext"))).alias("pos", "term"),
            )
            w = Window.partitionBy("qid").orderBy("pos")
            gram = F.concat_ws(" ", F.lag("term").over(w), F.col("term"))
            flagged = (
                qt.withColumn("gram", gram)
                .join(
                    colls.withColumn("merge", F.lit(1)), "gram", "left"
                )
                .withColumn(
                    "brk",
                    F.when(
                        (F.col("pos") == 0) | F.col("merge").isNull(), 1
                    ).otherwise(0),
                )
            )
            seg = (
                F.sum("brk").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                )
                - 1
            )
            out = (
                flagged.withColumn("seg_idx", seg.cast("long"))
                .groupBy("qid", "seg_idx")
                .agg(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "term"))
                            ),
                            lambda x: x["term"],
                        ),
                        " ",
                    ).alias("segment")
                )
                .localCheckpoint()
            )
        finally:
            uni.unpersist()
    finally:
        tg.unpersist()
    return out


def vocab_kl_drift(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """-> one row (v, n_old, n_new, s_micro, kl): add-one-smoothed
    KL(P_new || P_old) between the term distributions of the corpus's
    two doc_id halves — the distribution-shift monitor a continuously
    fed training pipeline alarms on (vocabulary drift as ONE number
    beside lexicon_diff's per-term report).

    Pinned semantics (restated in oracle._VOCAB_KL_SQL — change both
    sides or neither): halves split at count(*)//2 by doc_id (the
    streaming-gate split law); counts = T1-T5 token OCCURRENCES; V =
    the UNION vocabulary; add-one smoothing on both sides; per-term
    contribution cq = round(1e6 * log10( ((cn+1)_d * (N_old+V)_d) /
    ((co+1)_d * (N_new+V)_d) )) BIGINT with factors cast to DOUBLE
    before multiplying (the clarity/pmi discipline), weighted by the
    exact integer (cn+1) and summed exactly; only the final kl =
    S / ((N_new+V) * 1e6) is float (round 6).  The smoothing means
    absent-in-new terms still contribute (cn+1 = 1) — pure-loss terms
    are part of drift."""
    spark = docs.sparkSession
    n_docs = docs.count()
    split = n_docs // 2
    toks = docs.select(
        (F.col("doc_id") < F.lit(split)).alias("old"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts = toks.groupBy("t").agg(
            F.sum(F.when(F.col("old"), 1).otherwise(0)).cast("long").alias("co"),
            F.sum(F.when(F.col("old"), 0).otherwise(1)).cast("long").alias("cn"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            tot = counts.agg(
                F.count("*").cast("long").alias("v"),
                F.sum("co").cast("long").alias("n_old"),
                F.sum("cn").cast("long").alias("n_new"),
            ).collect()[0]
            v, n_old, n_new = int(tot.v), int(tot.n_old), int(tot.n_new)
            do, dn = float(n_old + v), float(n_new + v)
            cq = F.round(
                F.log10(
                    ((F.col("cn") + F.lit(1)).cast("double") * F.lit(do))
                    / ((F.col("co") + F.lit(1)).cast("double") * F.lit(dn))
                )
                * F.lit(1e6)
            ).cast("long")
            s = counts.select(
                ((F.col("cn") + F.lit(1)) * cq).alias("w")
            ).agg(F.sum("w").cast("long").alias("s")).collect()[0].s
            # kl derives in a CATALYST round (HALF_UP) — a Python
            # round() would be a third, banker's, rounding (the
            # streaming_kmv lesson)
            return spark.createDataFrame(
                [(v, n_old, n_new, int(s))],
                "v long, n_old long, n_new long, s_micro long",
            ).select(
                "v",
                "n_old",
                "n_new",
                "s_micro",
                F.round(
                    F.col("s_micro")
                    / ((F.col("n_new") + F.col("v")).cast("double")
                       * F.lit(1e6)),
                    6,
                ).alias("kl"),
            )
        finally:
            counts.unpersist()
    finally:
        toks.unpersist()
