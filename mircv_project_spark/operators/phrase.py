"""Exact phrase queries over the document corpus.

The reference engine is bag-of-words only — its index stores no
positions (search_engine/src/main/.../model/InvertedIndex.java keeps
(docId, tf) pairs), so phrase matching is a genuine capability gap a
switching user would hit.  This operator answers "docs containing the
exact token sequence", ranked by occurrence count, WITHOUT a positional
index: a phrase of n tokens is exactly an n-gram equality over the
per-doc n-gram stream (`textnorm.grams_col`, duplicates kept), so
counting matches is one explode + one broadcast equi-join + one
(qid, id) groupBy per DISTINCT phrase length.

Semantics (pinned in the gate, restated verbatim by the oracle):
occurrences may overlap (every window position counts — "spark spark
spark" contains "spark spark" twice); rank = row_number over
(n_hits desc, id asc) per qid, top k = PHRASE_K; phrases with no
matching doc emit no rows.

Scale shape (100 TB): one tokenizer pass into a persisted tokens
projection consumed once per distinct phrase length (in practice 2-3
lengths); the phrase table is broadcast (queries are driver-small);
the only shuffle is the (qid, id) count agg, keyed well below corpus
cardinality.  Nothing is per-row Python.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textnorm import grams_col, tokens_col
from ..functions.tokenizer import tokenize

# the gate's pinned (qid, phrase) set and k live in oracle.PHRASE_SET /
# PHRASE_K beside QUERY_SET/PROBE_IDS (oracle.py must stay import-free
# of operator modules); callers pass them in
PHRASE_K = 10


def phrase_topk(
    docs: DataFrame,
    phrases: list[tuple[str, str]],
    k: int = PHRASE_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (qid, id, n_hits, rank): top-k docs per phrase by exact
    (possibly overlapping) occurrence count, ties id asc."""
    by_n: dict[int, list[tuple[str, str]]] = {}
    for qid, p in phrases:
        ptoks = tokenize(p, False)
        if ptoks:
            by_n.setdefault(len(ptoks), []).append((qid, " ".join(ptoks)))
    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    ).persist()  # one branch per distinct phrase length reads it
    try:
        branches = []
        for n, plist in sorted(by_n.items()):
            ph = docs.sparkSession.createDataFrame(
                plist, "qid string, gram string"
            )
            grams = toks.select(
                "id", F.explode(grams_col(F.col("toks"), n)).alias("gram")
            )
            branches.append(
                grams.join(F.broadcast(ph), "gram")
                .groupBy("qid", "id")
                .agg(F.count("*").alias("n_hits"))
            )
        allm = reduce(DataFrame.unionByName, branches)
        w = Window.partitionBy("qid").orderBy(
            F.col("n_hits").desc(), F.col("id").asc()
        )
        out = (
            allm.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "qid",
                "id",
                F.col("n_hits").cast("long").alias("n_hits"),
                F.col("rank").cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    finally:
        toks.unpersist()
    return out
