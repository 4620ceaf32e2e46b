"""Boolean query syntax: Lucene-style ``+must -not should`` retrieval.

The reference's only boolean control is the all-or-nothing conjunctive
flag (``QueryProcessorMain.java:60-61``); real query languages mix
per-term operators.  Semantics (pinned, restated in
oracle._boolean_topk_sql — change both or neither):

- a query is whitespace-split into words; a leading ``+`` marks MUST,
  a leading ``-`` marks MUST_NOT, otherwise SHOULD.  Each word then
  runs through the standard tokenizer; the operator applies to every
  token the word yields;
- candidates = docs matching >= 1 MUST or SHOULD term, restricted to
  docs containing ALL in-lexicon MUST terms, minus docs containing ANY
  in-lexicon MUST_NOT term;
- out-of-lexicon terms are silently dropped from their role — the
  reference's missing-term convention (Q8) extended per-operator
  (an OOV MUST does not empty the result; an OOV NOT excludes
  nothing);
- score = BM25/TFIDF sum over matched MUST + SHOULD terms with query
  multiplicity, rank (round(score,6) desc, docid asc).

Scale shape: scoring is the shared exhaustive tail; the MUST
constraint is the conjunctive nmatch test counting MUST hits only;
exclusion is one left-anti join against the MUST_NOT terms' postings
(bounded by those terms' df) on (qid, docid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from ..functions.tokenizer import tokenize
from .index_build import InvertedIndex
from .topk import _EMPTY_SCHEMA, ROUND_DECIMALS


def parse_boolean_query(text: str, parse: bool) -> dict[str, list[str]]:
    """-> {'must': [...], 'should': [...], 'not': [...]} token lists
    (multiplicity kept within must/should)."""
    out: dict[str, list[str]] = {"must": [], "should": [], "not": []}
    for word in text.split():
        if word.startswith("+"):
            role, word = "must", word[1:]
        elif word.startswith("-"):
            role, word = "not", word[1:]
        else:
            role = "should"
        out[role].extend(tokenize(word, parse))
    return out


def boolean_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
) -> DataFrame:
    """-> DataFrame(qid string, docno string, rank long, score double)."""
    spark = index.flat.sparkSession
    parsed = {qid: parse_boolean_query(text, index.parse) for qid, text in queries}

    all_terms = sorted(
        {t for p in parsed.values() for lst in p.values() for t in lst}
    )
    if not all_terms:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    lex = (
        index.lexicon.where(F.col("term").isin(all_terms))
        .select("term", "df")
        .collect()
    )
    df_by_term = {r["term"]: r["df"] for r in lex}

    score_rows = []  # (qid, term, qtf, df, is_must)
    not_rows = []  # (qid, term)
    n_must: dict[str, int] = {}
    for qid, p in parsed.items():
        counts: dict[str, list[int]] = {}
        for t in p["must"]:
            if t in df_by_term:
                counts.setdefault(t, [0, 0])
                counts[t][0] += 1
        for t in p["should"]:
            if t in df_by_term:
                counts.setdefault(t, [0, 0])
                counts[t][1] += 1
        n_must[qid] = sum(1 for c in counts.values() if c[0] > 0)
        for t, (m, s_) in counts.items():
            score_rows.append((qid, t, m + s_, df_by_term[t], m > 0))
        for t in set(p["not"]):
            if t in df_by_term:
                not_rows.append((qid, t))
    if not score_rows:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    qt = spark.createDataFrame(
        score_rows, "qid string, term string, qtf int, df long, is_must boolean"
    )
    matched = index.flat.join(F.broadcast(qt), "term")

    if standard == scoring.BM25:
        s = scoring.bm25_col(
            F.col("tf"), F.col("doc_len"), F.col("df"), index.n_docs, index.avgdl
        )
    else:
        s = scoring.tfidf_col(F.col("tf"), F.col("df"), index.n_docs)
    scored = (
        matched.withColumn("contrib", F.col("qtf") * s)
        .groupBy("qid", "docid")
        .agg(
            F.sum("contrib").alias("raw_score"),
            F.sum(F.when(F.col("is_must"), 1).otherwise(0)).alias("nmust"),
        )
    )
    req = F.create_map(*[F.lit(x) for kv in n_must.items() for x in kv])
    scored = scored.where(F.col("nmust") == req[F.col("qid")])

    if not_rows:
        nt = spark.createDataFrame(not_rows, "qid string, term string")
        excluded = index.flat.join(F.broadcast(nt), "term").select(
            "qid", "docid"
        )
        scored = scored.join(excluded, ["qid", "docid"], "left_anti")

    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("score", F.round(F.col("raw_score"), ROUND_DECIMALS))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            (F.col("docid") - 1).cast("string").alias("docno"),
            "rank",
            "score",
        )
    )
