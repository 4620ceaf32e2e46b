"""Query performance prediction — the Clarity score.

Clarity (Cronen-Townsend, Zhou, Croft 2002): the KL divergence
between the query's relevance-model term distribution (estimated from
the first-pass top docs) and the collection language model.  High
clarity = the top docs talk about something specific; low clarity =
the ranking is collection-like noise.  Engines use it to route hard
queries (expansion, fallback, human review) — a QPP primitive the
reference lacks.

Chain (all pinned, restated verbatim in oracle._clarity_sql):

1. fb = first-pass BM25 top QPP_FB_DOCS with their ROUNDED scores —
   identical to RM3's stage 1;
2. relevance model, micro-quantized to exact integers (the lm.py
   discipline): wq(t) = round(1e6 · Σ_d score(d) · tf(t,d)/dl(d)) as
   BIGINT, keeping terms with wq >= 1 (a wq=0 term has p(t|q) below
   quantization — and log of 0 is undefined);
3. W = Σ_t wq — exact BIGINT normalizer;
4. per-term KL contribution in integer micro-log10 units:
   cq(t) = round(1e6 · log10((wq·CF) / (W·cf_t))) as BIGINT, the
   factors cast to double BEFORE multiplying (BIGINT products
   overflow at scale — the pmi_collocations pin), CF = Σ lexicon cf
   (total token count);
5. S = Σ_t wq · cq — exact BIGINT; clarity = round(S / (W · 1e6), 6)
   (one double division), reported in log10 units.

Output: (qid, n_terms, w_total, clarity) — the integer audit columns
ride along so the gate hash covers the exact aggregates, not just the
rounded scalar.

Scale shape (100 TB): stage 1 is the standard exhaustive/pruned top-k;
the feedback fetch is a broadcast docid semi-join on the flat postings
(forward index at scale); everything after aggregates ≤ fb_docs · dl
terms per query — driver-trivial, fully Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .topk import exhaustive_topk

QPP_FB_DOCS = 10
_MICRO = 1_000_000.0


def clarity_scores(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    fb_docs: int = QPP_FB_DOCS,
) -> DataFrame:
    """-> DataFrame(qid string, n_terms long, w_total long,
    clarity double)."""
    spark = index.flat.sparkSession
    empty = "qid string, n_terms long, w_total long, clarity double"

    first = exhaustive_topk(index, queries, scoring.BM25, k=fb_docs)
    if not first.head(1):
        return spark.createDataFrame([], empty)
    fb = first.select(
        "qid", (F.col("docno").cast("long") + 1).alias("docid"), "score"
    )

    cf_total = index.lexicon.agg(F.sum("cf").alias("cf")).collect()[0]["cf"]
    w_raw = (
        index.flat.join(F.broadcast(fb), "docid")
        .groupBy("qid", "term")
        .agg(
            F.sum(
                F.col("score") * F.col("tf") / F.col("doc_len")
            ).alias("w")
        )
    )
    wq = w_raw.select(
        "qid",
        "term",
        F.round(F.lit(_MICRO) * F.col("w")).cast("long").alias("wq"),
    ).where(F.col("wq") >= 1)
    wtot = wq.groupBy("qid").agg(
        F.sum("wq").alias("w_total"), F.count("*").alias("n_terms")
    )

    # factors to double BEFORE multiplying (BIGINT overflow at scale)
    cq = F.round(
        F.lit(_MICRO)
        * F.log10(
            (F.col("wq").cast("double") * F.lit(float(cf_total)))
            / (F.col("w_total").cast("double") * F.col("cf").cast("double"))
        )
    ).cast("long")
    contrib = (
        wq.join(F.broadcast(index.lexicon.select("term", "cf")), "term")
        .join(F.broadcast(wtot), "qid")
        .select("qid", (F.col("wq") * cq).alias("c"))
    )
    s = contrib.groupBy("qid").agg(F.sum("c").alias("s"))
    return (
        s.join(wtot, "qid")
        .select(
            "qid",
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("w_total").cast("long").alias("w_total"),
            F.round(
                F.col("s").cast("double")
                / (F.col("w_total").cast("double") * F.lit(_MICRO)),
                6,
            ).alias("clarity"),
        )
    )


def preretrieval_qpp(
    index: InvertedIndex, queries: list[tuple[str, str]]
) -> DataFrame:
    """Pre-retrieval query-performance predictors — the statistics an
    engine computes BEFORE running the query to decide routing/expansion
    (He & Ounis 2004 "Inferring Query Performance Using Pre-retrieval
    Predictors"; Zhao, Scholer & Tsegay 2008 for SCQ).  Everything
    derives from the lexicon + collection stats alone: no postings
    scan, no first pass — the broker-side complement to the
    post-retrieval ``clarity_scores``.

    Per query (one row; queries with zero in-lexicon terms emit none):

    - ``n_terms``   distinct in-lexicon query terms;
    - ``ql``        total in-lexicon token count (multiplicity kept —
                    the |q| the SCS normalizer needs);
    - ``avg_idf`` / ``max_idf``  over idf_micro = round(1e6 ·
      log10(n_docs_d / df_d)) BIGINT per distinct term;
    - ``avg_ictf``  over ictf_micro = round(1e6 · log10(C_d / cf_d))
      (inverse collection term frequency);
    - ``scs``       simplified clarity score = Σ_t (qtf/ql) ·
      log10((qtf·C)/(ql·cf_t)): per-term cq_micro = round(1e6 ·
      log10((qtf_d · C) / (ql_d · cf_d))) BIGINT — factors cast to
      double BEFORE multiplying (the pmi/clarity pin) — then the exact
      integer S = Σ qtf·cq_micro and ONE double division
      round(S / (ql · 1e6), 6);
    - ``scq_sum``   Σ_t round(1e6 · (1.0 + ln(cf_d)) · ln(1.0 +
      n_docs_d / df_d)) / 1e6 — the collection-query similarity; ln
      parity across engines is the same 1-ulp class the log10 gates
      pin (weighted_sample's ln discipline).

    Averages (and scs) round the exact micro sum divided by its TINY
    integer normalizer (n_terms / ql, often 2) to an INTEGER micro
    value first — half away from zero on all three engines — then the
    final /1e6 is boundary-free.  A one-step round(S/(n·1e6), 6) lands
    EXACTLY on a 5e-7 half whenever n | 2S (hit immediately at
    sf0.001), where Spark/DuckDB HALF_UP and Python banker's diverge;
    clarity_scores tolerates the one-step form only because its W
    normalizer is micro-scale huge.

    Pins restated verbatim in oracle._preretrieval_qpp_sql (change
    both or neither): idf/ictf over DISTINCT terms, scs over
    multiplicity, all parenthesizations above.

    Scale shape: a |query terms|-row broadcast join into the lexicon
    scan (term-pruned by the join key) + one per-qid aggregate —
    touches zero postings, which is the entire point of pre-retrieval
    prediction at 100 TB."""
    from .topk import query_terms

    spark = index.flat.sparkSession
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame(
            [],
            "qid string, n_terms long, ql long, avg_idf double,"
            " max_idf double, avg_ictf double, scs double, scq_sum double",
        )
    qt = spark.createDataFrame(qt_rows, "qid string, term string, qtf int")
    lex = index.lexicon.select("term", "df", "cf")
    joined = lex.join(F.broadcast(qt), "term")

    ql_w = F.sum("qtf").over(Window.partitionBy("qid"))
    n_docs_d = F.lit(float(index.n_docs))
    c_d = F.lit(float(index.sum_doc_len))
    idf_micro = F.round(
        F.lit(_MICRO) * F.log10(n_docs_d / F.col("df").cast("double"))
    ).cast("long")
    ictf_micro = F.round(
        F.lit(_MICRO) * F.log10(c_d / F.col("cf").cast("double"))
    ).cast("long")
    scq_micro = F.round(
        F.lit(_MICRO)
        * (
            (F.lit(1.0) + F.log(F.col("cf").cast("double")))
            * F.log(F.lit(1.0) + n_docs_d / F.col("df").cast("double"))
        )
    ).cast("long")
    cq_micro = F.round(
        F.lit(_MICRO)
        * F.log10(
            (F.col("qtf").cast("double") * c_d)
            / (F.col("ql").cast("double") * F.col("cf").cast("double"))
        )
    ).cast("long")

    staged = joined.withColumn("ql", ql_w).select(
        "qid",
        "qtf",
        F.col("ql").cast("long").alias("ql"),
        idf_micro.alias("idf_u"),
        ictf_micro.alias("ictf_u"),
        scq_micro.alias("scq_u"),
        (F.col("qtf").cast("long") * cq_micro).alias("scs_c"),
    )
    agg = staged.groupBy("qid").agg(
        F.count("*").alias("n_terms"),
        F.max("ql").alias("ql"),
        F.sum("idf_u").alias("idf_s"),
        F.max("idf_u").alias("idf_m"),
        F.sum("ictf_u").alias("ictf_s"),
        F.sum("scq_u").alias("scq_s"),
        F.sum("scs_c").alias("scs_s"),
    )
    def _avg6(sum_col: str, n_col: str):
        u = F.round(
            F.col(sum_col).cast("double") / F.col(n_col).cast("double")
        ).cast("long")
        return F.round(u.cast("double") / F.lit(_MICRO), 6)

    return agg.select(
        "qid",
        F.col("n_terms").cast("long").alias("n_terms"),
        F.col("ql").cast("long").alias("ql"),
        _avg6("idf_s", "n_terms").alias("avg_idf"),
        F.round(F.col("idf_m").cast("double") / F.lit(_MICRO), 6).alias("max_idf"),
        _avg6("ictf_s", "n_terms").alias("avg_ictf"),
        _avg6("scs_s", "ql").alias("scs"),
        F.round(F.col("scq_s").cast("double") / F.lit(_MICRO), 6).alias("scq_sum"),
    )


def postretrieval_qpp(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    k: int = QPP_FB_DOCS,
) -> DataFrame:
    """Post-retrieval query-performance predictors from the score
    distribution of the first-pass top-k — the cheap complement to the
    full Clarity KL: WIG (Zhou & Croft, SIGIR 2007) and NQC (Shtok,
    Kurland, Carmel & Raiber, TOIS 2012).  Both read NOTHING beyond
    the ranking the engine already produced.

    Per query with >= 1 result (one row):

    - ``wig`` = (1/(k_used * sqrt(n_terms))) * sum of top-k BM25 scores
      — the Weighted Information Gain with the corpus-score baseline at
      0 (the standard BM25 simplification: corpus "document" score is
      not defined for BM25, and the constant shift cancels in the
      per-corpus calibration WIG feeds);
    - ``nqc`` = stddev(top-k scores) / mean(top-k scores) — the
      Normalized Query Commitment with mean-of-the-run normalization
      (the collection-score-free variant): high commitment = the
      ranking is peaked, low = collection-like noise.

    Exactness contract (restated in oracle._postretrieval_qpp_sql —
    change both or neither):
    - scores are the ROUND-6 ranking scores, so su = round(1e6*score)
      BIGINT is exact; S = sum su and Q = sum su*su are exact integer
      aggregates (su < 2^27 on any BM25 corpus, so Q fits BIGINT with
      34 bits to spare at k = 10);
    - n_terms = DISTINCT in-lexicon query terms (the preretrieval pin);
    - wig = round(S / (k_used * sqrt(n_terms) * 1e6), 6) — sqrt of a
      small integer is IEEE-exact, ONE double division;
    - nqc via the integer variance identity k*Q - S^2 (exact BIGINT):
      nqc = round(sqrt(double(k*Q - S^2)) / double(S), 6) — IEEE sqrt
      is correctly rounded on both engines, ONE division; S = 0 (an
      all-zero-score run) pins nqc = 0.0;
    - the integer audit columns (s_sum, s_sq) ride in the output so
      the gate hash covers the exact aggregates.

    -> (qid, k_used long, n_terms long, s_sum long, s_sq long,
    wig double, nqc double).

    Scale shape: one pass over k rows per query on top of the existing
    serve path, plus the preretrieval-style broadcast lexicon probe
    for n_terms — no postings beyond the ranking itself."""
    from .topk import exhaustive_topk, query_terms

    spark = index.flat.sparkSession
    empty = (
        "qid string, k_used long, n_terms long, s_sum long, s_sq long,"
        " wig double, nqc double"
    )
    run = exhaustive_topk(index, queries, scoring.BM25, k=k)
    if not run.head(1):
        return spark.createDataFrame([], empty)

    su = F.round(F.col("score") * F.lit(_MICRO)).cast("long")
    agg = (
        run.select("qid", su.alias("su"))
        .groupBy("qid")
        .agg(
            F.count("*").alias("k_used"),
            F.sum("su").alias("s_sum"),
            F.sum(F.col("su") * F.col("su")).alias("s_sq"),
        )
    )

    qt_rows = query_terms(queries, index.parse)
    qt = spark.createDataFrame(
        [(q, t) for q, t, _ in qt_rows], "qid string, term string"
    )
    nt = (
        index.lexicon.select("term")
        .join(F.broadcast(qt), "term")
        .groupBy("qid")
        .agg(F.count_distinct("term").alias("n_terms"))
    )

    var_num = (F.col("k_used") * F.col("s_sq") - F.col("s_sum") * F.col("s_sum"))
    return (
        agg.join(nt, "qid")
        .select(
            "qid",
            F.col("k_used").cast("long").alias("k_used"),
            F.col("n_terms").cast("long").alias("n_terms"),
            F.col("s_sum").cast("long").alias("s_sum"),
            F.col("s_sq").cast("long").alias("s_sq"),
            F.round(
                F.col("s_sum").cast("double")
                / (
                    F.col("k_used").cast("double")
                    * F.sqrt(F.col("n_terms").cast("double"))
                    * F.lit(_MICRO)
                ),
                6,
            ).alias("wig"),
            F.when(F.col("s_sum") <= 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.sqrt(var_num.cast("double"))
                    / F.col("s_sum").cast("double"),
                    6,
                )
            )
            .alias("nqc"),
        )
    )
