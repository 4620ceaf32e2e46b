"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure Catalyst column expressions over the normalized token array
(functions/textnorm.py) — whole-stage codegen, zero Python per row —
and each restatable in DuckDB SQL for the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import tokens_col
from .scoring import idf_col

# marker-word profiles for the n-gram/stopword language heuristic —
# tiny public function-word lists; argmax with deterministic tie order
# (en > de > es > fr > unknown)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"],
}
LANG_ORDER = ["en", "de", "es", "fr"]

# quality-score stopwords: the English marker list doubles as the
# stopword-ratio probe (full 1297-word list is used by the IR engine;
# this op needs an oracle-restatable small set)
_QS_STOPS = LANG_MARKERS["en"]

# BPE-ish token estimate: word chunks of <=4 chars — a deterministic
# proxy for subword token counts (ceil(len/4) per word)
BPE_CHUNK = 4


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, lang_pred, lang_hits): marker-word hit counts per
    language; argmax with LANG_ORDER tie-break; 'unknown' when no
    marker hits at all."""
    def _hit_filter(words: list[str]):
        return lambda t: t.isin(*words)

    # staged projections: tokens -> per-language hit counts -> argmax.
    # Each stage references the previous stage's columns as attributes,
    # so the tokenizer regex pipeline evaluates once per row instead of
    # being inlined into every downstream use.
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("tokens"),
    )
    hits = toks.select(
        "id",
        *[
            F.size(F.filter(F.col("tokens"), _hit_filter(LANG_MARKERS[lg]))).alias(
                f"h_{lg}"
            )
            for lg in LANG_ORDER
        ],
    )
    best = F.greatest(*[F.col(f"h_{lg}") for lg in LANG_ORDER])
    scored = hits.withColumn("best", best)
    pred = F.when(F.col("best") == 0, F.lit("unknown"))
    for lg in LANG_ORDER:
        pred = pred.when(F.col(f"h_{lg}") == F.col("best"), F.lit(lg))
    return scored.select(
        "id",
        pred.alias("lang_pred"),
        F.col("best").cast("long").alias("lang_hits"),
    )


def quality_expr(toks) -> "F.Column":
    """The ONE copy of the round-6 composite quality formula over a
    MATERIALIZED tokens column (callers must project the tokenizer
    into a column first — the Catalyst re-evaluation gotcha).  Shared
    by quality_score, training_corpus and dialogue.preference_pairs so
    the formula cannot drift (the oracle restates it verbatim)."""
    n = F.size(toks)
    tok_chars = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    digit_chars = F.aggregate(
        toks,
        F.lit(0),
        lambda a, x: a + F.length(F.regexp_replace(x, "[^0-9]", "")),
    )
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_QS_STOPS)))
    nf = n.cast("double")
    mean_len = F.when(n > 0, tok_chars / nf).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        tok_chars > 0, digit_chars / tok_chars.cast("double")
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, stop_hits / nf).otherwise(F.lit(0.0))
    len_term = F.least(nf / F.lit(20.0), F.lit(1.0))
    wordlen_term = F.when(
        (mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.4) * len_term
        + F.lit(0.2) * wordlen_term
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio)
        + F.lit(0.2) * F.least(stop_ratio * 5.0, F.lit(1.0)),
        6,
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, n_tokens, mean_token_len, digit_ratio, stopword_ratio,
    quality double): length/character/stopword heuristics composed into
    a [0,1] quality score (the usual pretraining-corpus filters)."""
    t = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("text"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    n = F.size("toks")
    tok_chars = F.aggregate("toks", F.lit(0), lambda a, x: a + F.length(x))
    digit_chars = F.aggregate(
        "toks",
        F.lit(0),
        lambda a, x: a + F.length(F.regexp_replace(x, "[^0-9]", "")),
    )
    stop_hits = F.size(F.filter("toks", lambda x: x.isin(*_QS_STOPS)))
    nf = n.cast("double")
    mean_len = F.when(n > 0, tok_chars / nf).otherwise(F.lit(0.0))
    digit_ratio = F.when(tok_chars > 0, digit_chars / tok_chars.cast("double")).otherwise(
        F.lit(0.0)
    )
    stop_ratio = F.when(n > 0, stop_hits / nf).otherwise(F.lit(0.0))
    quality = quality_expr(F.col("toks"))  # the one shared formula
    return t.select(
        "id",
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, ws_tokens, norm_tokens, bpe_est): whitespace-split count,
    normalized-token count, and a BPE-ish subword estimate
    (sum of ceil(len/4) over normalized tokens)."""
    staged = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(text_col).alias("_text"),
        tokens_col(F.col(text_col)).alias("tokens"),
    )
    ws = F.size(F.filter(F.split(F.col("_text"), r"\s+"), lambda x: x != ""))
    bpe = F.aggregate(
        F.col("tokens"),
        F.lit(0),
        lambda a, x: a + F.ceil(F.length(x) / F.lit(BPE_CHUNK)).cast("int"),
    )
    return staged.select(
        "id",
        ws.cast("long").alias("ws_tokens"),
        F.size("tokens").cast("long").alias("norm_tokens"),
        bpe.cast("long").alias("bpe_est"),
    )


def fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, fp): md5 fingerprint of the normalized token stream —
    whitespace/markup/case-insensitive exact-dup key (the rolling-hash
    winnowing variant lives in operators/dedup.simhash + minhash)."""
    norm = F.concat_ws(" ", tokens_col(F.col(text_col)))
    return docs.select(
        F.col(id_col).cast("long").alias("id"), F.md5(norm).alias("fp")
    )


KEYWORDS_K = 3


def top_keywords(
    docs: DataFrame, k: int = KEYWORDS_K, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, term, tf, score, krank): each doc's top-k terms by
    tf x idf (idf = log10(N/df), the engine's reference formula —
    operators/scoring.py), ranked on the ROUND-6 score with term-asc
    tie-break so the ordering is reproducible across engines.  Docs
    with no tokens emit no rows (nothing to rank).

    Scale shape: one (id, term) shuffle with map-side combine for tf,
    one term-keyed rollup for df (derived from the tf table — no second
    pass over the raw tokens), a term-keyed equi-join of the two (the
    vocabulary is far too large to broadcast; stopword-skewed keys are
    AQE skew-join territory), and a per-doc window bounded by the doc's
    distinct-term count."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    terms = toks.select("id", F.explode("toks").alias("term"))
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))  # tf rows are per-doc
    n_docs = docs.count()
    scored = tf.join(dft, "term").select(
        "id",
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.round(F.col("tf") * idf_col(F.col("df"), n_docs), 6).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("krank", F.row_number().over(w).cast("long"))
        .where(F.col("krank") <= k)
        .select("id", "term", "tf", "score", "krank")
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """-> per-conversation rollup over the transcript table:
    (conv_id, n_turns, n_assistant, n_tool, n_tokens, first_us,
    last_us).  The corpus-health summary a transcript pipeline runs
    first — turn mix, tool-call rate, token volume, time span.

    All-integer aggregate (counts + epoch-micro min/max) — exact across
    engines and shuffle orders.  Pins (restated in the oracle):
    n_tokens = sum of T1-T5 token counts over ALL turns (blank turns
    count 0, NULL texts contribute nothing, all-NULL conversations
    coalesce to 0); n_tool counts turns with a non-null tool.

    Scale shape: one map-side tokenize (the count never materializes
    the token array past the projection) + one conv_id-keyed partial
    agg — the groupBy key is the table's natural clustering, so with a
    conv_id-bucketed layout this is map-only."""
    per = transcripts.select(
        "conv_id",
        F.when(F.col("role") == "assistant", 1).otherwise(0).alias("is_asst"),
        F.when(F.col("tool").isNotNull(), 1).otherwise(0).alias("has_tool"),
        F.size(tokens_col(F.col("text"))).alias("ntok"),
        F.unix_micros(F.col("ts")).alias("us"),
    )
    return (
        per.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("is_asst").cast("long").alias("n_assistant"),
            F.sum("has_tool").cast("long").alias("n_tool"),
            F.coalesce(F.sum("ntok"), F.lit(0)).cast("long").alias("n_tokens"),
            F.min("us").cast("long").alias("first_us"),
            F.max("us").cast("long").alias("last_us"),
        )
    )


WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 5  # k-grams per winnowing window
_WIN_POS_BITS = 20  # positions packed into the key's low bits
_WIN_POS_MOD = 1 << _WIN_POS_BITS
_WIN_HASH_MOD = 1 << 40


def winnow_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, pos, fp): MOSS winnowing (Schleimer, Wilkerson, Aiken
    SIGMOD 2003) — the guaranteed-coverage local fingerprint selection
    for plagiarism/overlap detection: from each window of WINNOW_W
    consecutive token WINNOW_K-gram hashes, select the minimum (ties:
    RIGHTMOST position — the robust-winnowing rule), emit the distinct
    selected (position, hash) pairs.  Any shared substring of
    >= W + K - 1 tokens is guaranteed to share a fingerprint; the
    whole-doc ``fingerprint`` misses partial overlap, simhash/minhash
    lose locality.

    Exactness contract (restated in oracle._winnow_sql — change both
    or neither): gram hash h = hash60('win-' || gram) % 2^40; the
    min-with-rightmost-tie inside ONE window min comes from the packed
    key K = h * 2^20 + (2^20 - 1 - pos) — minimizing K minimizes h
    and, on ties, maximizes pos (docs with >= 2^20 grams are out of
    contract: a "document" here is a transcript turn).  Window starts
    are gram positions w <= n_grams - W (0-based); docs with fewer
    than W grams emit NO rows (shorter than the winnowing guarantee
    threshold, the MOSS rule).  All arithmetic is exact BIGINT —
    unpack via integer div/mod, never float division (K spans 60
    bits; a double round-trip corrupts above 2^53).

    Scale shape: one posexplode of the fused gram projection, one
    per-doc window (ROWS frame of W rows — grams are densely
    positioned by construction), one distinct.  Work is O(tokens) per
    doc with no corpus-wide state; the selected-fingerprint table is
    the input to an equi-join dedup (group by fp) exactly like the
    minhash band join."""
    from ..functions.textnorm import grams_col, hash60_col

    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    grams = toks.select(
        "id", F.posexplode(grams_col(F.col("toks"), WINNOW_K)).alias("pos", "gram")
    )
    h40 = hash60_col(F.concat(F.lit("win-"), F.col("gram"))) % F.lit(_WIN_HASH_MOD)
    keyed = grams.select(
        "id",
        "pos",
        (
            h40 * F.lit(_WIN_POS_MOD)
            + (F.lit(_WIN_POS_MOD - 1) - F.col("pos"))
        ).alias("kk"),
    )
    wn = Window.partitionBy("id")
    wp = Window.partitionBy("id").orderBy("pos").rowsBetween(0, WINNOW_W - 1)
    sel = (
        keyed.withColumn("n", F.count("*").over(wn))
        .withColumn("mk", F.min("kk").over(wp))
        .where(F.col("pos") <= F.col("n") - F.lit(WINNOW_W))
        .select("id", "mk")
        .distinct()
    )
    return sel.select(
        "id",
        (F.lit(_WIN_POS_MOD - 1) - (F.col("mk") % F.lit(_WIN_POS_MOD)))
        .cast("long")
        .alias("pos"),
        F.shiftright(F.col("mk"), _WIN_POS_BITS).cast("long").alias("fp"),
    )


WP_MAXDF = 10  # fingerprints in more docs than this are boilerplate
WP_MIN = 2  # report pairs sharing at least this many fingerprints


def winnow_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id_a, id_b, n_shared): document pairs sharing winnowing
    fingerprints — the MOSS report stage on top of
    winnow_fingerprints (Schleimer et al. SIGMOD 2003 run pair
    scoring exactly this way): n_shared = DISTINCT fingerprint VALUES
    common to both docs, pairs with n_shared >= 2 emitted, id_a <
    id_b.

    Pinned semantics (restated in oracle._winnow_pairs_sql — change
    both sides or neither): fingerprint table = winnow_fingerprints'
    pinned selection collapsed to distinct (id, fp); fingerprints
    present in MORE THAN 10 documents are dropped BEFORE pairing
    (MOSS's ignore-common-code rule — template boilerplate would
    otherwise dominate every pair AND blow up the join fanout);
    threshold n_shared >= 2.

    Scale shape (100 TB): the df cap is what bounds the self-join —
    each surviving fingerprint fans out <= maxdf^2 pairs, the minhash
    bucket-cap discipline; everything else is equi-joins and
    aggregates."""
    fps = winnow_fingerprints(docs, id_col, text_col).select(
        "id", "fp"
    ).distinct()
    df = fps.groupBy("fp").agg(F.count("*").alias("d"))
    kept = fps.join(df.where(F.col("d") <= WP_MAXDF), "fp").select(
        "id", "fp"
    )
    a = kept.select(F.col("id").alias("id_a"), "fp")
    b = kept.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= WP_MIN)
    )


def token_fertility(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (source, n_docs, ws_total, bpe_total, fert_micro): per-source
    tokenizer FERTILITY — subword tokens per whitespace word, the
    metric every LLM data pipeline tracks per domain (high-fertility
    domains eat context budget; Scao et al. BLOOM report it per
    language exactly this way).

    Pinned semantics (restated in oracle._TOKEN_FERTILITY_SQL — change
    both sides or neither): ws / bpe formulas are token_counts'
    VERBATIM (whitespace split with empties dropped; bpe_est = sum of
    ceil(len/4) over T1-T5 tokens); fert_micro = (2*1e6*bpe_total +
    ws_total) DIV (2*ws_total), the integer round-half-away rate.

    Scale shape: one partial-aggregating groupBy(source) over the
    fused per-doc projection."""
    per_doc = token_counts(docs, id_col, text_col).join(
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(source_col).alias("source"),
        ),
        "id",
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("ws_tokens").cast("long").alias("ws_total"),
            F.sum("bpe_est").cast("long").alias("bpe_total"),
        )
        .select(
            "source",
            "n_docs",
            "ws_total",
            "bpe_total",
            F.expr(
                "(2 * 1000000 * bpe_total + ws_total) DIV (2 * ws_total)"
            ).cast("long").alias("fert_micro"),
        )
    )


def corpus_manifest(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (source, n_docs, xor_h, min_id, max_id): a deterministic
    per-source content manifest — the reproducibility receipt a data
    pipeline publishes next to every corpus snapshot so any consumer
    can verify bit-level identity without re-shipping the data
    (row-count alone misses edits; this xor-of-content-hashes form
    catches any changed/added/dropped document).

    Pinned semantics (restated in oracle._CORPUS_MANIFEST_SQL —
    change both sides or neither): per-doc digest h = hash60('mf-' ||
    doc_id || '-' || md5(text)) — the salted md5-derived 60-bit value
    (always positive, the bloom word discipline); xor_h = the bit_xor
    aggregate (commutative/associative/order-independent — exactly
    why a manifest can be computed distributed); min/max doc_id ride
    as range audit columns.

    Scale shape (100 TB): ONE partial-aggregating groupBy(source) —
    xor combines map-side; no sort, no collect."""
    from ..functions.textnorm import hash60_col

    h = hash60_col(
        F.concat(
            F.lit("mf-"),
            F.col(id_col).cast("string"),
            F.lit("-"),
            F.md5(F.col(text_col).cast("binary")),
        )
    )
    return docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.bit_xor(h).cast("long").alias("xor_h"),
        F.min(F.col(id_col)).cast("long").alias("min_id"),
        F.max(F.col(id_col)).cast("long").alias("max_id"),
    )


def readability_scores(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """-> (source, n_docs, n_words, n_sents, n_syll, fre): per-source
    Flesch Reading Ease — the classic readability feature quality-
    filtering stacks compute beside length/stopword ratios (Flesch
    1948; the C4/Gopher-style cascades carry exactly this family).

    Pinned semantics (restated in oracle._READABILITY_SQL — change
    both sides or neither): words = the token_counts whitespace
    formula; sentences per doc = greatest(#runs of [.!?]+, 1) — the
    floor makes punctuation-free corpora well-defined (each doc
    counts as one sentence); syllables = #runs of [aeiouy]+ in the
    lowercased text (the standard vowel-group estimate); per-source
    sums exact BIGINT; fre = round(206.835 - 1.015 * (w_d / s_d)
    - 84.6 * (syl_d / w_d), 6) with the literals and parenthesization
    pinned — ONE float expression at the end.

    Scale shape: one partial-aggregating groupBy(source) over a fused
    per-doc projection."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).cast("long")
    sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("long")
    syll = F.regexp_count(
        F.lower(F.col(text_col)), F.lit(r"[aeiouy]+")
    ).cast("long")
    agg = (
        docs.select(
            F.col(source_col).alias("source"),
            ws.alias("w"),
            sents.alias("s"),
            syll.alias("y"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("s").cast("long").alias("n_sents"),
            F.sum("y").cast("long").alias("n_syll"),
        )
    )
    fre = F.round(
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sents").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syll").cast("double") / F.col("n_words").cast("double")),
        6,
    )
    return agg.select(
        "source", "n_docs", "n_words", "n_sents", "n_syll", fre.alias("fre")
    )


# Tukey fence multiplier: the textbook 1.5 flags nothing on the
# synthetic corpus's thin-tailed length law (0 rows at sf0.001/0.1),
# so the GATE pins the stricter 0.75 fence — non-empty at every
# driver SF (18/14/3 rows measured) while remaining a true
# tail-flagging regime; production callers pass 1.5.
OUTLIER_FENCE_K = 0.75


def length_outliers(
    docs: DataFrame,
    value_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    fence_k: float = OUTLIER_FENCE_K,
) -> DataFrame:
    """-> (source, doc_id, n_chars, lo_fence, hi_fence, side): per-source
    Tukey-fence length outliers — the corpus-QA pass that flags
    truncated shards and concatenation bugs before training.

    Pins (restated in oracle._LENGTH_OUTLIERS_SQL — change both sides
    or neither): q1/q3 = linear-interpolated quartiles over the
    source's values (Spark percentile == DuckDB quantile_cont at round
    6 — the event_props_rollup pin), both rounded 6 BEFORE the fence
    arithmetic, fences = q1 - 1.5*iqr / q3 + 1.5*iqr each rounded 6
    (one float expression per fence, identical parenthesization),
    outlier iff value < lo_fence OR value > hi_fence STRICT, side =
    'low'/'high'.

    Scale shape: one per-source aggregate (exact percentile is the
    O(group) piece — swap approx_percentile at 100 TB) broadcast back
    over the scan; no window over the full table."""
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(value_col).cast("long").alias("v"),
    )
    qs = base.groupBy("source").agg(
        F.round(F.percentile(F.col("v"), F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile(F.col("v"), F.lit(0.75)), 6).alias("q3"),
    )
    fences = qs.select(
        "source",
        F.round(
            F.col("q1") - F.lit(fence_k) * (F.col("q3") - F.col("q1")), 6
        ).alias("lo_fence"),
        F.round(
            F.col("q3") + F.lit(fence_k) * (F.col("q3") - F.col("q1")), 6
        ).alias("hi_fence"),
    )
    return (
        base.join(F.broadcast(fences), "source")
        .where(
            (F.col("v") < F.col("lo_fence")) | (F.col("v") > F.col("hi_fence"))
        )
        .select(
            "source",
            "doc_id",
            F.col("v").alias("n_chars"),
            "lo_fence",
            "hi_fence",
            F.when(F.col("v") < F.col("lo_fence"), F.lit("low"))
            .otherwise(F.lit("high"))
            .alias("side"),
        )
    )


FH_DIM = 1_024
FH_SALT = "fh-"
FH_SIGN_SALT = "fhs-"


def feature_hashing(
    docs: DataFrame,
    dim: int = FH_DIM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, idx, val): signed feature-hashing vectorizer
    (Weinberger et al., ICML 2009 — the "hashing trick"): every token
    occurrence lands in bucket hash60('fh-' || t) % dim with sign +1
    iff hash60('fhs-' || t) is even (the AMS sign discipline, distinct
    salt), val = the exact integer signed sum; zero cells absent.
    The fixed-width sparse featurizer in front of any linear model —
    no vocabulary pass, mergeable by addition, dimension pinned.

    Pins (restated in oracle._FEATURE_HASHING_SQL — change both sides
    or neither): dim = 1024, salts 'fh-'/'fhs-' (independent of every
    other coin), duplicates KEPT (occurrence stream), val != 0 rows
    only.

    Scale shape: one tokenize pass, one (id, idx) partial-agg shuffle
    — map-side combine does the summing."""
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(tokens_col(F.col(text_col))).alias("t"),
    )
    from ..functions.textnorm import hash60_col

    idx = (hash60_col(F.concat(F.lit(FH_SALT), F.col("t"))) % dim).cast(
        "long"
    )
    sign = F.when(
        hash60_col(F.concat(F.lit(FH_SIGN_SALT), F.col("t"))) % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        toks.select("id", idx.alias("idx"), sign.alias("s"))
        .groupBy("id", "idx")
        .agg(F.sum("s").cast("long").alias("val"))
        .where(F.col("val") != 0)
    )
