"""Literal substring search (grep-at-scale) over the document corpus.

The reference engine tokenizes everything (search_engine/src/main/...
preprocessing), so raw substring lookup — patterns crossing token
boundaries, partial words, exact byte sequences — is a capability its
index cannot serve.  This operator answers "docs whose RAW text
contains the literal pattern", ranked by occurrence count, with the
classic trigram-index plan (the pg_trgm / Google Code Search shape):

1. pattern trigrams: every length-3 substring of each pattern
   (patterns are pinned in oracle.SUBSTR_SET, min length 3);
2. doc trigram stream restricted to the union of pattern trigrams
   (an array_intersect against the driver-small trigram set — the
   full trigram index never materializes for serving a query batch);
3. per-trigram document frequency, then the SUBSTR_RARE rarest
   trigrams per pattern (df asc, trigram asc) — the standard
   rarest-first pruning, exact because "contains pattern" implies
   "contains every pattern trigram" (candidates are a superset for
   ANY trigram subset);
4. candidates = docs containing ALL selected trigrams (distinct-
   trigram equi-join, count == n_selected);
5. exact verify on candidates only: n_hits = (len(text) −
   len(replace(text, pat))) / len(pat) — the NON-overlapping
   occurrence count, identical arithmetic in DuckDB; n_hits >= 1
   recovers exactly the contains() semantics.

Rank = row_number over (n_hits desc, doc_id asc) per qid, top
SUBSTR_K; patterns matching no doc emit no rows.  All five stages
restated by the oracle as a direct contains() scan — equality holds
because the trigram prune has recall 1 by construction.

Scale shape (100 TB): one scan computes the (doc, trigram) pairs for
the query batch's trigrams only; the df agg and the candidate join
are keyed on trigram (selected lists are the rarest — skew-safe by
construction); the verify join touches candidate docs only.  In a
standing deployment the (trigram, doc) postings would be a persisted
index; the plan below is the inline build + serve of the same shape.
Nothing is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUBSTR_K = 10
SUBSTR_RARE = 4  # rarest trigrams kept per pattern


def _pattern_trigrams(patterns: list[tuple[str, str]]) -> list[tuple[str, str, str]]:
    rows = []
    for qid, pat in patterns:
        if len(pat) < 3:
            raise ValueError(f"pattern {pat!r} shorter than a trigram")
        for t in sorted({pat[i : i + 3] for i in range(len(pat) - 2)}):
            rows.append((qid, pat, t))
    return rows


def substring_topk(
    docs: DataFrame,
    patterns: list[tuple[str, str]],
    k: int = SUBSTR_K,
    n_rare: int = SUBSTR_RARE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (qid, id, n_hits, rank): top-k docs per literal pattern by
    non-overlapping occurrence count over the raw text, ties id asc."""
    spark = docs.sparkSession
    prows = _pattern_trigrams(patterns)
    if not prows:
        return spark.createDataFrame(
            [], "qid string, id long, n_hits long, rank long"
        )
    ptri = spark.createDataFrame(prows, "qid string, pat string, tri string")
    tri_lits = F.array(
        *[F.lit(t) for t in sorted({t for _, _, t in prows})]
    )

    text = F.col(text_col)
    # all distinct trigrams of the doc, pruned to the query batch's
    # trigram set before the explode (length guard: sequence() DESCENDS
    # below its start — see textnorm.grams_col)
    tri_stream = F.when(
        F.length(text) >= 3,
        F.array_intersect(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length(text) - F.lit(2)),
                    _tri_at(text),
                )
            ),
            tri_lits,
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_tri = (
        docs.select(
            F.col(id_col).cast("long").alias("id"), tri_stream.alias("tris")
        )
        .select("id", F.explode("tris").alias("tri"))
        .persist()  # df pass + candidate pass read it
    )
    try:
        tri_df = doc_tri.groupBy("tri").agg(F.count("*").alias("df"))
        w_rare = Window.partitionBy("qid").orderBy(
            F.col("df").asc(), F.col("tri").asc()
        )
        # trigrams absent from every doc have df 0 — their pattern can
        # match nothing; the inner join drops them and with them every
        # candidate (correct: a missing trigram disproves containment)
        sel = (
            ptri.join(F.broadcast(tri_df), "tri")
            .withColumn("rr", F.row_number().over(w_rare))
            .where(F.col("rr") <= n_rare)
        )
        n_sel = sel.groupBy("qid", "pat").agg(F.count("*").alias("n_need"))
        hit = (
            doc_tri.join(
                F.broadcast(sel.select("qid", "tri")), "tri"
            )
            .groupBy("qid", "id")
            .agg(F.count("*").alias("n_have"))
        )
        # a pattern with fewer than n_rare distinct trigrams still
        # needs ALL of them — n_need is per-pattern, not the constant
        cand = hit.join(F.broadcast(n_sel), "qid").where(
            F.col("n_have") == F.col("n_need")
        )
        verified = (
            cand.join(
                docs.select(
                    F.col(id_col).cast("long").alias("id"), text.alias("_t")
                ),
                "id",
            )
            .withColumn(
                "n_hits",
                (
                    (F.length("_t") - F.length(F.replace(F.col("_t"), F.col("pat"))))
                    / F.length("pat")
                ).cast("long"),
            )
            .where(F.col("n_hits") >= 1)
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("n_hits").desc(), F.col("id").asc()
        )
        return (
            verified.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("qid", "id", "n_hits", "rank")
            .localCheckpoint()  # result is tiny; release the persist
        )
    finally:
        doc_tri.unpersist()


def _tri_at(text):
    """Closure helper (a default-arg lambda flips Spark's HOF arity
    inference — CLAUDE.md gotcha)."""

    def go(i):
        return text.substr(i, F.lit(3))

    return go


def regex_topk(
    docs: DataFrame,
    patterns: list[tuple[str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Regex search over RAW text (distributed grep), ranked by match
    count — the substring operator's generalization for patterns a
    literal scan cannot express.

    Semantics (pinned, restated verbatim in oracle; change both sides
    or neither): case-sensitive, n_hits = number of NON-overlapPING
    left-to-right matches (both engines' regexp_extract_all walk),
    rank (n_hits desc, id asc) top k per pattern, zero-match patterns
    emit nothing.  Patterns are pinned in oracle.REGEX_SET and use only
    the subset with identical Java-regex (Spark) and RE2 (DuckDB)
    semantics — literals, character classes, +, alternation groups; no
    backreferences / lookaround / word boundaries.

    Scale shape: one map-only regex pass per pattern over the text
    column (the pattern table is a driver-small constant folded into
    the projection — no join at all), then the shared per-qid rank
    window over matching docs only.  A standing deployment would put a
    trigram prefilter in front (substring_topk's plan); the direct
    scan is the exact baseline and the right shape for ad-hoc
    patterns."""
    spark = docs.sparkSession
    parts = []
    for qid, pat in patterns:
        parts.append(
            docs.select(
                F.lit(qid).alias("qid"),
                F.col(id_col).cast("long").alias("id"),
                F.size(
                    F.expr(
                        f"regexp_extract_all({text_col}, '{pat}', 0)"
                    )
                ).cast("long").alias("n_hits"),
            ).where(F.col("n_hits") >= 1)
        )
    if not parts:
        return spark.createDataFrame(
            [], "qid string, id long, n_hits long, rank bigint"
        )
    m = parts[0]
    for p in parts[1:]:
        m = m.unionByName(p)
    w = Window.partitionBy("qid").orderBy(
        F.col("n_hits").desc(), F.col("id").asc()
    )
    return (
        m.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("qid", "id", "n_hits", "rank")
    )
