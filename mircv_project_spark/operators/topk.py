"""Exhaustive distributed top-k retrieval (the rank-safe oracle path).

MaxScore (operators/maxscore.py) must return exactly this ranking —
dynamic pruning is rank-safe (``queryProcessor/Scorer.java:85-162``).
This path is itself fully distributed and is the scale fallback for
query loads where posting lists are too large to pull to the driver:
broadcast the (tiny) query-term table, score matched postings JVM-side,
one shuffle on (qid, docid), per-query top-k window.

Reference query semantics replicated exactly:
- query tokens run through the SAME tokenizer pipeline (Q1);
- terms missing from the lexicon are silently dropped
  (``QueryProcessorMain.java:139-154``: loadFromDisk -> null -> skipped);
- duplicate query tokens open duplicate cursors, so a term occurring
  q times in the query contributes q * termscore (no dedup in
  ``getPostingLists``);
- conjunctive mode requires the doc to appear in every posting list of
  the *existing* query terms (Q8);
- ties broken deterministically by ascending docid (the reference heap
  compares score only — Scorer.java:205-208 — so equal-score order is
  implementation-defined; we pin docid order, SURVEY §5 risk register).

Scores are rounded to 6 decimals for cross-engine comparison; ranking
uses the rounded score so rank and value agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize
from . import scoring
from .index_build import InvertedIndex

ROUND_DECIMALS = 6


def query_terms(queries: list[tuple[str, str]], parse: bool) -> list[tuple[str, str, int]]:
    """(qid, text) -> [(qid, term, qtf)] with multiplicity preserved."""
    rows = []
    for qid, text in queries:
        counts: dict[str, int] = {}
        for tok in tokenize(text, parse):
            counts[tok] = counts.get(tok, 0) + 1
        rows.extend((qid, term, qtf) for term, qtf in counts.items())
    return rows


_EMPTY_SCHEMA = "qid string, docno string, rank long, score double"


def _resolve_query_terms(spark, qt_rows, df_by_term):
    """Attach df, drop missing terms, compute conjunctive requirements."""
    qt_rows = [(q, t, c, df_by_term[t]) for q, t, c in qt_rows if t in df_by_term]
    if not qt_rows:
        return None, None
    n_required: dict[str, int] = {}
    for q, _, _, _ in qt_rows:
        n_required[q] = n_required.get(q, 0) + 1
    qt = spark.createDataFrame(qt_rows, "qid string, term string, qtf int, df long")
    return qt, n_required


def _score_and_rank(
    matched: DataFrame,
    standard: str,
    n_docs: int,
    avgdl: float,
    k: int,
    conjunctive: bool,
    n_required: dict[str, int],
) -> DataFrame:
    """(qid, qtf, df, docid, tf, doc_len) rows -> top-k result frame.
    Shared by the flat (pre-compression) and block-store query paths."""
    if standard == scoring.BM25:
        s = scoring.bm25_col(
            F.col("tf"), F.col("doc_len"), F.col("df"), n_docs, avgdl
        )
    elif standard == scoring.TFIDF:
        s = scoring.tfidf_col(F.col("tf"), F.col("df"), n_docs)
    else:
        raise ValueError(f"unknown standard {standard!r}")

    scored = (
        matched.withColumn("contrib", F.col("qtf") * s)
        .groupBy("qid", "docid")
        .agg(F.sum("contrib").alias("raw_score"), F.count("*").alias("nmatch"))
    )
    if conjunctive:
        req = F.create_map(*[F.lit(x) for kv in n_required.items() for x in kv])
        scored = scored.where(F.col("nmatch") == req[F.col("qid")])

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


def exhaustive_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """-> DataFrame(qid string, docno string, rank long, score double)."""
    spark = index.flat.sparkSession
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    # resolve df for each query term driver-side (tiny); missing terms drop
    terms = sorted({t for _, t, _ in qt_rows})
    lex = (
        index.flat.where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    )
    qt, n_required = _resolve_query_terms(
        spark, qt_rows, {r["term"]: r["df"] for r in lex}
    )
    if qt is None:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    matched = index.flat.join(F.broadcast(qt), "term")
    return _score_and_rank(
        matched, standard, index.n_docs, index.avgdl, k, conjunctive, n_required
    )


def topk_from_blocks(
    reader,
    queries: list[tuple[str, str]],
    standard: str = scoring.BM25,
    k: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """Distributed top-k reading the COMPRESSED block store — the scale
    query path for posting lists too large to pull to the driver.

    Plan: bucket/term-pruned scan of the run-grained postings table ->
    explode blocks -> Arrow-batched block decode (one numpy decode per
    block, rows regenerated via mapInPandas) -> broadcast-join the tiny
    query-term table -> same shared scoring/agg/rank tail as the flat
    path.  Rank-identical to exhaustive_topk and MaxScore; exercised
    against the same DuckDB oracle (bm25_topk_compressed)."""
    import pandas as pd

    from ..functions import codecs as C

    spark = reader.postings.sparkSession
    qt_rows = query_terms(queries, reader.parse)
    if not qt_rows:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    terms = sorted({t for _, t, _ in qt_rows})

    lex = reader._prune(reader.lexicon, terms).select("term", "df").collect()
    qt, n_required = _resolve_query_terms(
        spark, qt_rows, {r["term"]: r["df"] for r in lex}
    )
    if qt is None:
        return spark.createDataFrame([], _EMPTY_SCHEMA)

    blocks = reader._prune(reader.postings, terms).select(
        "term", F.explode("blocks").alias("b")
    )
    codec = reader.codec

    def decode(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for term, b in zip(pdf["term"], pdf["b"]):
                ids, tfs, dls = C.decode_block(b, codec=codec)
                outs.append(
                    pd.DataFrame(
                        {
                            "term": term,
                            "docid": ids.astype("int64"),
                            "tf": tfs.astype("int32"),
                            "doc_len": dls.astype("int32"),
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    flat = blocks.mapInPandas(
        decode, "term string, docid long, tf int, doc_len int"
    )
    matched = flat.join(F.broadcast(qt), "term")
    return _score_and_rank(
        matched, standard, reader.n_docs, reader.avgdl, k, conjunctive, n_required
    )


def trec_format(results: DataFrame, standard: str) -> DataFrame:
    """Project to the reference's TREC output shape
    (``QueryProcessorMain.java:112-118``): qid Q0 docno rank score STANDARD."""
    return results.select(
        "qid",
        F.lit("Q0").alias("q0"),
        "docno",
        "rank",
        "score",
        F.lit(standard.upper()).alias("standard"),
    )
