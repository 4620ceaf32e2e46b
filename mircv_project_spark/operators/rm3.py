"""RM3 pseudo-relevance-feedback query expansion on the flat index.

Beyond the reference's query surface (its queryProcessor stops at
DAAT/MaxScore ranking — queryProcessor/Scorer.java); RM3 is the
classic second-pass retrieval every IR stack layers on top, built here
entirely from the operators the engine already pins: the first pass IS
``exhaustive_topk`` (same round-6 ranking, same docid tie rule), and
the final pass reuses ``_score_and_rank`` with fractional term weights
instead of integer query tfs.

Chain (every ranking boundary rounds to 6 decimals with a
deterministic tie order, restated verbatim in the DuckDB oracle):

1. first pass: BM25 top ``fb_docs`` per query (rounded scores).
2. relevance model: w(t|q) = sum over feedback docs of
   score(d) * tf(t,d) / |d| — score ROUNDED (stage-1 output), the
   per-term sum rounded to 6 before ranking; top ``fb_terms`` terms by
   (w6 desc, term asc).
3. interpolation: weight(t) = lam * qtf/|q|  +  (1-lam) * w6/W, where
   |q| sums qtf over the query's in-lexicon terms and W sums the
   selected w6 — lam = 0.5 is exactly representable, so both engines
   compute bit-identical weights.
4. final pass: weighted BM25 over the flat postings, top-k with the
   engine's standard (round-6 desc, docid asc) rule.

Scale shape: stage 2 filters the flat postings by ~``nq * fb_docs``
docids (broadcast semi-join) — at 100 TB you'd serve this from a
doc-keyed FORWARD index instead of a postings scan (same information,
opposite key; the tokenized table already materializes it); stages 3-4
are the same broadcast-join + single (qid, docid) shuffle as every
other query path.  Nothing new shuffles at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import scoring
from .index_build import InvertedIndex
from .topk import _score_and_rank, exhaustive_topk, query_terms

RM3_FB_DOCS = 10
RM3_FB_TERMS = 5
RM3_LAMBDA = 0.5


def rm3_topk(
    index: InvertedIndex,
    queries: list[tuple[str, str]],
    k: int = 10,
    fb_docs: int = RM3_FB_DOCS,
    fb_terms: int = RM3_FB_TERMS,
    lam: float = RM3_LAMBDA,
    standard: str = scoring.BM25,
) -> DataFrame:
    """-> DataFrame(qid string, docno string, rank long, score double)
    — the RM3-expanded ranking (see module docstring for the pinned
    chain).  Queries whose terms all miss the lexicon produce no rows;
    queries with an empty feedback set fall back to the
    original-terms-only interpolation (lam side alone)."""
    spark = index.flat.sparkSession

    first = exhaustive_topk(index, queries, standard, k=fb_docs)
    fb = first.select(
        "qid",
        (F.col("docno").cast("long") + 1).alias("docid"),
        "score",
    )
    # relevance-model weights from the feedback docs' term vectors;
    # the broadcast join prunes the flat scan to the fb docids
    fbt = index.flat.join(F.broadcast(fb), "docid").select(
        "qid",
        "term",
        (F.col("score") * F.col("tf") / F.col("doc_len")).alias("c"),
    )
    wexp = fbt.groupBy("qid", "term").agg(F.round(F.sum("c"), 6).alias("w6"))
    w_win = Window.partitionBy("qid").orderBy(
        F.col("w6").desc(), F.col("term").asc()
    )
    wsel = (
        wexp.withColumn("trank", F.row_number().over(w_win))
        .where(F.col("trank") <= int(fb_terms))
        .drop("trank")
    )
    wnorm = wsel.groupBy("qid").agg(F.sum("w6").alias("wsum"))

    qt_rows = query_terms(queries, index.parse)
    if not qt_rows:
        return first.limit(0)
    orig = spark.createDataFrame(
        [(q, t, int(n)) for q, t, n in qt_rows],
        "qid string, term string, qtf long",
    )
    # qexist semantics: original terms restricted to the lexicon before
    # |q| is computed (matches the first pass and the oracle)
    origx = orig.join(index.lexicon.select("term"), "term")
    qlen = origx.groupBy("qid").agg(F.sum("qtf").cast("double").alias("ql"))
    o_side = origx.join(qlen, "qid").select(
        "qid", "term", (F.lit(lam) * F.col("qtf") / F.col("ql")).alias("wo")
    )
    e_side = wsel.join(wnorm, "qid").select(
        "qid",
        "term",
        (F.lit(1.0 - lam) * F.col("w6") / F.col("wsum")).alias("we"),
    )
    qw = (
        o_side.join(e_side, ["qid", "term"], "full")
        .select(
            "qid",
            "term",
            (
                F.coalesce("wo", F.lit(0.0)) + F.coalesce("we", F.lit(0.0))
            ).alias("qtf"),  # _score_and_rank's weight column
        )
    )
    qwd = qw.join(index.lexicon.select("term", "df"), "term")
    matched = index.flat.join(F.broadcast(qwd), "term")
    return _score_and_rank(
        matched, standard, index.n_docs, index.avgdl, k, False, {}
    )
