"""Training-data pipeline operators: Spark vs DuckDB oracle at sf0.001,
plus the approximate-path guarantees (LSH recall) the oracle can't state."""

import pytest

import __spark_entry__ as entry_mod
from mircv_project_spark import oracle
from tests.conftest import SF_SMALL, assert_frames_match, duck_run

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

PIPELINE_KEYS = [
    "exact_dedup",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "lang_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    "cosine_topk",
    "embedding_near_dup",
]


@pytest.mark.parametrize("name", PIPELINE_KEYS)
def test_pipeline_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_SMALL)
    ddf = duck_run(ORACLES[name], SF_SMALL)
    assert_frames_match(sdf, ddf)


def test_lsh_banding_recall_is_total_here(spark):
    """minhash_lsh_pairs == exact jaccard_pairs on this corpus (near-dups
    sit at j>=0.9 where 12x2 banding recall is ~1-2e-9) — this is the
    assumption that lets the LSH entry share the exhaustive oracle."""
    from mircv_project_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    exact = {
        (r.id_a, r.id_b) for r in jaccard_pairs(docs, oracle.JACCARD_THRESHOLD).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, oracle.JACCARD_THRESHOLD).collect()
    }
    assert exact, "corpus should contain near-duplicate pairs"
    assert lsh == exact


def test_ivf_cosine_recall_and_saving(spark):
    """IVF ANN: recall floor vs brute force AND a real candidate-set
    saving.  These embeddings are near-random (top-5 cos ~0.3), the
    worst case for ANN — the floor reflects that; clustered corpora do
    far better."""
    from mircv_project_spark.operators.similarity import (
        IVF_NPROBE,
        IVF_CENTROIDS,
        cosine_topk,
        ivf_cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    exact = cosine_topk(emb, oracle.PROBE_IDS, k=oracle.ANN_K).collect()
    approx = ivf_cosine_topk(emb, oracle.PROBE_IDS, k=oracle.ANN_K).collect()
    ex = {(r.probe_id, r.neighbor_id) for r in exact}
    ap = {(r.probe_id, r.neighbor_id) for r in approx}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"recall {recall:.2f}"
    # returned cos values must be the exact cosine (IVF only prunes)
    exact_by_pair = {(r.probe_id, r.neighbor_id): r.cos for r in exact}
    for r in approx:
        key = (r.probe_id, r.neighbor_id)
        if key in exact_by_pair:
            assert r.cos == exact_by_pair[key]
    # candidate fraction bound: nprobe/centroids of the space (+slack)
    assert IVF_NPROBE / IVF_CENTROIDS <= 0.5


def test_lsh_signatures_mechanical(spark):
    """Hyperplane-LSH plumbing: signatures deterministic, bounded by
    2^bits, and bucketing at radius 16 (no pruning) reproduces exact
    top-k — i.e. the approximation error comes only from the radius."""
    from mircv_project_spark.operators.similarity import (
        cosine_topk,
        lsh_cosine_topk,
        signature_udf,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    dims = len(emb.select("embedding").first()[0])
    sig = signature_udf(dims)
    import pyspark.sql.functions as F

    a = emb.select("vec_id", sig(F.col("embedding")).alias("s")).collect()
    b = emb.select("vec_id", sig(F.col("embedding")).alias("s")).collect()
    assert {r.vec_id: r.s for r in a} == {r.vec_id: r.s for r in b}
    assert all(0 <= r.s < 2**16 for r in a)
    full = lsh_cosine_topk(
        emb, oracle.PROBE_IDS[:3], k=3, hamming_radius=16
    ).collect()
    exact = cosine_topk(emb, oracle.PROBE_IDS[:3], k=3).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, exact))


def test_exact_dedup_groups(spark):
    from mircv_project_spark.operators.dedup import exact_dedup

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = exact_dedup(docs)
    total = out.groupBy().sum("dup_count").collect()[0][0]
    assert total == docs.count()
