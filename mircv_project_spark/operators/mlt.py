"""More-like-this: lexical document similarity over the inverted index.

The Lucene-family serve op the reference lacks: given a probe
document, rank the corpus by tf-idf cosine similarity computed
entirely from postings (no embeddings).  Exactness discipline:

- per-(doc, term) weight wq = round(1e6 · (1 + log10 tf) ·
  log10(N/df)) as BIGINT — the same micro-quantized tf-idf vector as
  operators/rocchio.py, so dot products are EXACT integer sums
  (shuffle-order-independent);
- ||d|| = sqrt(Σ wq²) — sqrt is correctly-rounded IEEE-754 on both
  engines, so the only floats are one sqrt per doc, one multiply and
  one divide per pair, then round 6;
- cos(p, d) = dot / (||p||·||d||), rank (cos6 desc, docid asc),
  probe excluded, top k; probes pinned in oracle.MLT_PROBE_DOCNOS
  (docno = the raw documents.doc_id).

All stages restated verbatim in oracle._mlt_sql.

Scale shape (100 TB): probe vectors are driver-small (one doc's
terms) and broadcast; the candidate scan is one postings equi-join on
the probes' terms (docs sharing no term never appear — the inverted
index IS the pruning); per-doc norms are one partial agg over the
flat postings, joined only onto scored candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .index_build import InvertedIndex
from .rocchio import _wq_col

MLT_K = 10


def more_like_this(
    index: InvertedIndex,
    probe_docnos: list[int],
    k: int = MLT_K,
) -> DataFrame:
    """-> DataFrame(probe_docno string, docno string, rank long,
    cos double)."""
    spark = index.flat.sparkSession
    empty = "probe_docno string, docno string, rank long, cos double"
    if not probe_docnos:
        return spark.createDataFrame([], empty)

    # micro-quantized tf-idf vectors (df rides the broadcast lexicon)
    vec = index.flat.join(
        F.broadcast(index.lexicon.select("term", "df")), "term"
    ).select("term", "docid", _wq_col(index.n_docs).alias("wq"))

    probe_ids = [int(d) + 1 for d in probe_docnos]  # docno = docid - 1
    pvec = vec.where(F.col("docid").isin(probe_ids)).select(
        F.col("docid").alias("pid"), "term", F.col("wq").alias("pwq")
    )
    norms = vec.groupBy("docid").agg(
        F.sqrt(F.sum(F.col("wq") * F.col("wq")).cast("double")).alias("nrm")
    )

    dots = (
        vec.join(F.broadcast(pvec), "term")
        .where(F.col("docid") != F.col("pid"))
        .groupBy("pid", "docid")
        .agg(F.sum(F.col("wq") * F.col("pwq")).alias("dot"))
    )
    pnorm = norms.select(
        F.col("docid").alias("pid"), F.col("nrm").alias("pnrm")
    )
    cos = F.round(
        F.col("dot").cast("double") / (F.col("pnrm") * F.col("nrm")), 6
    )
    scored = (
        dots.join(F.broadcast(pnorm), "pid")
        .join(norms, "docid")
        .select("pid", "docid", cos.alias("cos"))
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("cos").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            (F.col("pid") - 1).cast("string").alias("probe_docno"),
            (F.col("docid") - 1).cast("string").alias("docno"),
            "rank",
            "cos",
        )
    )


def vsm_cosine_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    k: int = MLT_K,
) -> DataFrame:
    """Classic Salton vector-space cosine retrieval (SMART; Salton,
    Wong & Yang 1975) — the textbook VSM ranker beside the
    probabilistic (BM25), LM (QLD/JM/AD) and DFR (PL2/DPH) families:
    query and documents as tf-idf vectors, score = full cosine
    including the DOC-NORM denominator (what separates VSM from the
    dot-product-style TFIDF standard already in scoring.py — long
    documents are norm-penalized).

    -> (qid, docno, rank, score).

    Exactness contract (the more_like_this/rocchio discipline — the
    weight formula IS rocchio._wq_col, imported not restated): weights
    micro-quantized round(1e6·(1+log10 tf)·log10(N/df)) BIGINT for
    BOTH the query (tf = qtf) and doc sides; dot = exact BIGINT sum;
    norms = ONE IEEE sqrt of the exact BIGINT sum of squares per
    vector; score = round(dot / (qnrm·dnrm), 6) — one divide; rank
    (score desc, docid asc); OOV query terms drop via the lexicon
    join; candidates = docs sharing >= 1 in-lexicon term.  Restated
    verbatim in oracle._vsm_topk_sql (change both sides or neither).

    Scale shape (100 TB): doc vectors and norms are one
    postings-grain aggregate each (norms are index-build
    materializable); the query side is a broadcast; candidates arrive
    through the term equi-join — the inverted-index prune."""
    from .topk import _EMPTY_SCHEMA, query_terms

    spark = index.flat.sparkSession
    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return spark.createDataFrame([], _EMPTY_SCHEMA)
    qt = spark.createDataFrame(qt_rows, "qid string, term string, tf int")

    lex = F.broadcast(index.lexicon.select("term", "df"))
    qvec = qt.join(lex, "term").select(
        "qid", "term", _wq_col(index.n_docs).alias("wq")
    )
    qnorm = qvec.groupBy("qid").agg(
        F.sqrt(F.sum(F.col("wq") * F.col("wq")).cast("double")).alias("qnrm")
    )
    dvec = index.flat.join(lex, "term").select(
        "term", "docid", _wq_col(index.n_docs).alias("wd")
    )
    dnorm = dvec.groupBy("docid").agg(
        F.sqrt(F.sum(F.col("wd") * F.col("wd")).cast("double")).alias("dnrm")
    )
    dots = (
        dvec.join(F.broadcast(qvec), "term")
        .groupBy("qid", "docid")
        .agg(F.sum(F.col("wd") * F.col("wq")).alias("dot"))
    )
    score = F.round(
        F.col("dot").cast("double") / (F.col("qnrm") * F.col("dnrm")), 6
    )
    scored = (
        dots.join(F.broadcast(qnorm), "qid")
        .join(dnorm, "docid")
        .select("qid", "docid", score.alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("docid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "qid",
            (F.col("docid") - 1).cast("string").alias("docno"),
            "rank",
            "score",
        )
    )
