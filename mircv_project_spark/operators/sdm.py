"""Sequential Dependence Model (SDM) ranking over the positional store.

Metzler & Croft, "A Markov Random Field Model for Term Dependencies"
(SIGIR 2005): the classic term-dependency ranker the reference engine
(bag-of-words BM25/TFIDF only, queryProcessor/Scorer.java:41-43,26-32)
cannot express.  Three Dirichlet-smoothed language-model features are
combined per (query, doc):

    score = lam_T * sum_t  f(tf_t,  cf_t)          (unigrams)
          + lam_O * sum_b  f(o_tf_b, o_cf_b)       (ordered bigrams,
                                                    exact adjacency #1)
          + lam_U * sum_b  f(u_tf_b, u_cf_b)       (unordered windows,
                                                    #uw8)

    f(tf, cf) = log10( (tf + (mu * cf) / C) / (dl + mu) )

with (lam_T, lam_O, lam_U) = (0.75, 0.125, 0.125) and mu = 2048.  The
ordered feature counts positions p of t1 with p+1 in positions(t2);
the unordered feature counts position pairs (p from t1, q from t2)
with q <> p and |q - p| <= W-1 (W = 8).  Feature statistics come from
the SAME positional store the phrase/proximity operators read
(operators/positional.py): cf_t = sum of len(positions), dl = per-doc
token count, C = corpus token count (a production deployment reads
dl/C from the doc_index/stats tables instead of re-aggregating; the
store-only form keeps this operator self-contained).

Exactness contract (the repo-wide lm.py discipline — change the oracle
too or neither):

- every feature is quantized to integer micro-log10 units
  (round(log10(.) * 1e6) as BIGINT, half away from zero on both
  engines) BEFORE any sum, so the per-doc aggregate is exact integer
  arithmetic and shuffle-order-independent at round 6;
- the lambda weights are applied as the INTEGER triple (6, 1, 1) with
  a single final /8 — micro_total = 6*T + O + U ranks identically to
  the 0.75/0.125/0.125 float combination and stays exact;
- smoothing parenthesization pinned: (tf_double + (mu * cf_double) /
  C_double) / (dl_double + mu), factors cast to double BEFORE
  multiplying (BIGINT mu*cf overflows at corpus scale);
- unigram features: query tokens NOT in the lexicon are dropped
  (standard OOV discipline, same as operators/qld.py); bigram features
  form over ADJACENT RAW query tokens and contribute 0 whenever the
  feature's corpus frequency is 0 (covers both the never-co-occurring
  and the OOV-member cases — standard SDM drops zero-cf features);
- candidates = docs matching >= 1 in-lexicon unigram (DAAT practice);
  smoothing then scores every feature on every candidate, tf
  defaulting to 0;
- ranking on the integer micro total desc, id asc; the emitted score
  is the 8x-SCALED objective round(micro / 1e6, 6) — dividing by 8
  first puts 1/8 of all rows on an exact .5 tie at the 6th decimal
  (micro = 4 mod 8), the midpoint-rounding trap round6 guards against
  elsewhere; the x8 scaling is rank-identical and tie-free by
  construction (micro is an integer, so micro/1e6 has exactly six
  decimals).

Scale shape (100 TB): corpus stats are two map-side-combined
aggregations of the store; per-query work is bounded by the union of
the query terms' posting rows (equi-joins on term, then id), the
candidate set never exceeds that union, and the only window runs per
qid over candidates.  No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..functions.tokenizer import tokenize

SDM_MU = 2048.0
SDM_W = 8
SDM_K = 10
# integer lambda triple: (6, 1, 1) / 8 == (0.75, 0.125, 0.125)
_LAM_T, _LAM_O, _LAM_U = 6, 1, 1
_MICRO = 1e6

_SDM_SCHEMA = "qid string, id bigint, rank bigint, score double"


def _wm_col(tf_col, cf_col, dl_col, mu: float, c_total: float):
    """Micro-quantized Dirichlet feature (the pinned parenthesization)."""
    x = (
        tf_col.cast("double")
        + (F.lit(mu) * cf_col.cast("double")) / F.lit(c_total)
    ) / (dl_col.cast("double") + F.lit(mu))
    return F.round(F.log10(x) * F.lit(_MICRO)).cast("long")


def _ordered_count(ps1, ps2):
    """#1(t1 t2): positions p of t1 with p+1 in positions(t2)."""

    def adj(p):
        def is_next(q):
            return q == p + F.lit(1)

        return F.exists(ps2, is_next)

    return F.size(F.filter(ps1, adj)).cast("long")


def _uw_count(ps1, ps2, w: int):
    """#uwW(t1, t2): pairs (p, q), q <> p, |q - p| <= W-1."""

    def per_anchor(acc, p):
        def near(q):
            return (q != p) & (F.abs(q - p) <= F.lit(w - 1))

        return acc + F.size(F.filter(ps2, near)).cast("long")

    return F.aggregate(ps1, F.lit(0).cast("long"), per_anchor)


def sdm_topk(
    pos_df: DataFrame,
    queries: list[tuple[str, str]],
    k: int = SDM_K,
    mu: float = SDM_MU,
    width: int = SDM_W,
) -> DataFrame:
    """-> (qid string, id bigint, rank bigint, score double)."""
    spark = pos_df.sparkSession

    parsed: list[tuple[str, list[str]]] = []
    for qid, text in queries:
        toks = tokenize(text, False)
        if toks:
            parsed.append((qid, toks))
    if not parsed:
        return spark.createDataFrame([], _SDM_SCHEMA)

    pos = pos_df.select("term", "id", "positions")

    # corpus stats: C (token count) and per-candidate dl ride one
    # map-side-combined agg each; cf only for the query vocabulary.
    vocab = sorted({t for _, toks in parsed for t in toks})
    c_total = float(
        pos.agg(F.sum(F.size("positions"))).collect()[0][0] or 0
    )
    if c_total == 0.0:
        return spark.createDataFrame([], _SDM_SCHEMA)
    cf_rows = (
        pos.where(F.col("term").isin(vocab))
        .groupBy("term")
        .agg(F.sum(F.size("positions")).cast("long").alias("cf"))
        .collect()
    )
    cf = {r["term"]: int(r["cf"]) for r in cf_rows}

    # unigram query table: in-lexicon tokens with multiplicity
    qt_rows = []
    for qid, toks in parsed:
        counts: dict[str, int] = {}
        for t in toks:
            if t in cf:
                counts[t] = counts.get(t, 0) + 1
        for t, qtf in sorted(counts.items()):
            qt_rows.append((qid, t, qtf, cf[t]))
    if not qt_rows:
        return spark.createDataFrame([], _SDM_SCHEMA)
    qt = spark.createDataFrame(
        qt_rows, "qid string, term string, qtf long, cf long"
    )

    # bigram query table: adjacent RAW token pairs with multiplicity
    qb_rows = []
    for qid, toks in parsed:
        bcounts: dict[tuple[str, str], int] = {}
        for a, b in zip(toks, toks[1:]):
            bcounts[(a, b)] = bcounts.get((a, b), 0) + 1
        for (a, b), btf in sorted(bcounts.items()):
            qb_rows.append((qid, a, b, btf))

    # candidates (>=1 in-lexicon unigram) with doc length attached
    dl_df = pos.groupBy("id").agg(
        F.sum(F.size("positions")).cast("long").alias("dl")
    )
    cand = (
        pos.join(F.broadcast(qt.select("qid", "term")), "term")
        .select("qid", "id")
        .distinct()
        .join(dl_df, "id")
    )

    # ---- unigram leg -------------------------------------------------
    tf_uni = pos.join(
        F.broadcast(qt.select("term").distinct()), "term"
    ).select("term", "id", F.size("positions").cast("long").alias("tf"))
    t_sum = (
        cand.join(F.broadcast(qt), "qid")
        .join(tf_uni, ["term", "id"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0).cast("long")))
        .withColumn("wm", _wm_col(F.col("tf"), F.col("cf"), F.col("dl"), mu, c_total))
        .groupBy("qid", "id")
        .agg(F.sum(F.col("qtf") * F.col("wm")).alias("t_micro"))
    )

    # ---- bigram legs -------------------------------------------------
    if qb_rows:
        qb = spark.createDataFrame(
            qb_rows, "qid string, t1 string, t2 string, btf long"
        )
        bigset = qb.select("t1", "t2").distinct()
        p1 = pos.select(
            F.col("term").alias("t1"), "id", F.col("positions").alias("ps1")
        )
        p2 = pos.select(
            F.col("term").alias("t2"), "id", F.col("positions").alias("ps2")
        )
        b_doc = (
            p1.join(F.broadcast(bigset), "t1")
            .join(p2, ["t2", "id"])
            .select(
                "t1",
                "t2",
                "id",
                _ordered_count(F.col("ps1"), F.col("ps2")).alias("o_tf"),
                _uw_count(F.col("ps1"), F.col("ps2"), width).alias("u_tf"),
            )
        )
        bcf = b_doc.groupBy("t1", "t2").agg(
            F.sum("o_tf").alias("o_cf"), F.sum("u_tf").alias("u_cf")
        )
        qbc = (
            qb.join(bcf, ["t1", "t2"], "left")
            .withColumn("o_cf", F.coalesce(F.col("o_cf"), F.lit(0).cast("long")))
            .withColumn("u_cf", F.coalesce(F.col("u_cf"), F.lit(0).cast("long")))
        )
        zero = F.lit(0).cast("long")
        b_scored = (
            cand.join(F.broadcast(qbc), "qid")
            .join(b_doc, ["t1", "t2", "id"], "left")
            .withColumn("o_tf", F.coalesce(F.col("o_tf"), zero))
            .withColumn("u_tf", F.coalesce(F.col("u_tf"), zero))
            .withColumn(
                "o_wm",
                F.when(
                    F.col("o_cf") > 0,
                    _wm_col(F.col("o_tf"), F.col("o_cf"), F.col("dl"), mu, c_total),
                ).otherwise(zero),
            )
            .withColumn(
                "u_wm",
                F.when(
                    F.col("u_cf") > 0,
                    _wm_col(F.col("u_tf"), F.col("u_cf"), F.col("dl"), mu, c_total),
                ).otherwise(zero),
            )
            .groupBy("qid", "id")
            .agg(
                F.sum(F.col("btf") * F.col("o_wm")).alias("o_micro"),
                F.sum(F.col("btf") * F.col("u_wm")).alias("u_micro"),
            )
        )
    else:
        b_scored = None

    scored = t_sum
    if b_scored is not None:
        scored = scored.join(b_scored, ["qid", "id"], "left")
    else:
        scored = scored.withColumn("o_micro", F.lit(None).cast("long"))
        scored = scored.withColumn("u_micro", F.lit(None).cast("long"))
    zero = F.lit(0).cast("long")
    scored = scored.withColumn(
        "micro",
        F.lit(_LAM_T) * F.col("t_micro")
        + F.lit(_LAM_O) * F.coalesce(F.col("o_micro"), zero)
        + F.lit(_LAM_U) * F.coalesce(F.col("u_micro"), zero),
    )

    w = Window.partitionBy("qid").orderBy(F.col("micro").desc(), F.col("id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            F.col("id").cast("long").alias("id"),
            "rank",
            F.round(F.col("micro") / F.lit(_MICRO), 6).alias("score"),
        )
    )
