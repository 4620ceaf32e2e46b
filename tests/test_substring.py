"""Trigram-pruned substring search vs a brute-force contains() scan
(the prune must be invisible — recall 1 by construction), plus the
pruning actually pruning and the short-pattern guard."""

import pytest
from pyspark.sql import functions as F

from mircv_project_spark.operators.substring import (
    SUBSTR_RARE,
    substring_topk,
)
from mircv_project_spark.oracle import SUBSTR_K, SUBSTR_SET

SF_SMALL = "/root/testdata/sf0.001"


def _brute(spark, docs, patterns, k):
    """Independent model: plain contains() scan per pattern, same
    n_hits arithmetic, Python-side ranking."""
    out = []
    rows = docs.select("doc_id", "text").collect()
    for qid, pat in patterns:
        hits = []
        for r in rows:
            t = r["text"]
            if pat in t:
                n = (len(t) - len(t.replace(pat, ""))) // len(pat)
                hits.append((n, r["doc_id"]))
        hits.sort(key=lambda x: (-x[0], x[1]))
        for rank, (n, did) in enumerate(hits[:k], 1):
            out.append((qid, did, n, rank))
    return sorted(out)


def test_substring_matches_brute_force(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = sorted(
        (r["qid"], r["id"], r["n_hits"], r["rank"])
        for r in substring_topk(docs, SUBSTR_SET, k=SUBSTR_K).collect()
    )
    assert got == _brute(spark, docs, SUBSTR_SET, SUBSTR_K)


def test_substring_prune_shrinks_candidates(spark):
    """Restates the operator's candidate rule (ALL of the SUBSTR_RARE
    rarest trigrams, df asc / trigram asc) and checks it is both sound
    (superset of the true matches) and selective (well under the
    corpus) for a selective pattern."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_docs = docs.count()
    pat = "he fast k"  # selective: 6 hits at sf0.001
    tris = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    dfs = {
        t: docs.where(F.col("text").contains(t)).count() for t in tris
    }
    sel = sorted(tris, key=lambda t: (dfs[t], t))[:SUBSTR_RARE]
    cand = docs.where(
        F.expr(" AND ".join(f"contains(text, '{t}')" for t in sel))
    ).count()
    matched = docs.where(F.col("text").contains(pat)).count()
    assert 1 <= matched <= cand
    assert cand < n_docs / 2


def test_substring_short_pattern_rejected(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    with pytest.raises(ValueError):
        substring_topk(docs, [("q", "ab")])


def test_substring_no_match_pattern_emits_no_rows(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = substring_topk(docs, [("q", "zzqx never here")], k=5).collect()
    assert got == []
