"""Champion lists (operators/champion.py): salted two-stage exactness,
serve-path recall vs the exhaustive ranking, and pruning effect."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from mircv_project_spark import oracle
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.champion import (
    CHAMPION_M,
    champion_lists,
    champion_topk,
)


def test_salted_two_stage_equals_plain_window(vb_index):
    idx, _ = vb_index
    got = champion_lists(idx.flat, idx.avgdl, m=4, salt=16).select(
        "term", "docid"
    )
    coeff = scoring.bm25_coeff_col(F.col("tf"), F.col("doc_len"), idx.avgdl)
    w = Window.partitionBy("term").orderBy(
        coeff.desc(), F.col("docid").asc()
    )
    want = (
        idx.flat.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
        .select("term", "docid")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_champion_actually_prunes(vb_index):
    idx, _ = vb_index
    m = 4
    full = idx.flat.count()
    kept = champion_lists(idx.flat, idx.avgdl, m=m).count()
    assert kept < full  # sf0.001 has terms with df > 4


def test_single_term_query_exact(vb_index):
    """idf is constant per term, so a term's true BM25 top-k is its
    top-k by coeff — champions with m >= k reproduce it exactly."""
    idx, _ = vb_index
    qs = [("s1", "spark"), ("s2", "vector"), ("s3", "join")]
    exact = topk.exhaustive_topk(idx, qs, scoring.BM25, k=10)
    approx = champion_topk(idx, qs, scoring.BM25, k=10, m=CHAMPION_M)
    e = sorted((r["qid"], r["rank"], r["docno"], r["score"]) for r in exact.collect())
    a = sorted((r["qid"], r["rank"], r["docno"], r["score"]) for r in approx.collect())
    assert e == a


def test_serve_path_recall_floor(vb_index):
    """Overlap@10 vs exhaustive BM25 on the multi-term query set.  (The
    gate entry is exact vs its own pruned oracle; THIS is the
    approximation measurement.)  The synthetic corpus is near-worst-case
    for static pruning — tf is close to uniform, so per-term impact is
    nearly flat and a multi-term winner (sum of mediocre contributions)
    often sits outside every term's top-m.  The floor records the
    measured behavior in that regime; single-term queries are exact by
    construction (test above), which is the structural guarantee."""
    idx, _ = vb_index
    exact = topk.exhaustive_topk(idx, oracle.QUERY_SET, scoring.BM25, k=10)
    approx = champion_topk(idx, oracle.QUERY_SET, scoring.BM25, k=10, m=CHAMPION_M)
    e = {}
    for r in exact.collect():
        e.setdefault(r["qid"], set()).add(r["docno"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["qid"], set()).add(r["docno"])
    overlaps = [
        len(e[q] & a.get(q, set())) / len(e[q]) for q in e if e[q]
    ]
    assert sum(overlaps) / len(overlaps) >= 0.4, overlaps
