"""Hybrid RRF retrieval (operators/hybrid.py): fusion really mixes the
two systems, the probe never self-matches, and contributions are the
pinned integers."""

from pyspark.sql import functions as F

from mircv_project_spark import oracle
from mircv_project_spark.operators import scoring
from mircv_project_spark.operators.hybrid import (
    HYBRID_POOL,
    RRF_C,
    hybrid_rrf_topk,
)
from mircv_project_spark.operators.similarity import cosine_topk
from mircv_project_spark.operators.topk import exhaustive_topk


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_hybrid_excludes_probe_and_mixes_systems(spark, vb_index):
    idx, _ = vb_index
    probes = oracle.PROBE_IDS
    out = hybrid_rrf_topk(idx, _emb(spark), _docs(spark), probes, k=10)
    rows = out.collect()
    by_qid = {}
    for r in rows:
        assert r["docno"] != r["qid"]  # self excluded
        by_qid.setdefault(r["qid"], []).append(r)
    assert set(by_qid) == {str(p) for p in probes}

    # fusion mixes: across all probes, the hybrid top-10 must include
    # docs from BOTH legs' top pools
    texts = {
        r["doc_id"]: r["text"]
        for r in _docs(spark).where(F.col("doc_id").isin(probes)).collect()
    }
    lex = exhaustive_topk(
        idx, [(str(p), texts[p]) for p in probes], scoring.BM25, k=HYBRID_POOL
    )
    lex_docs = {(r["qid"], r["docno"]) for r in lex.collect()}
    dns = cosine_topk(_emb(spark), probes, k=HYBRID_POOL)
    dns_docs = {
        (str(r["probe_id"]), str(r["neighbor_id"])) for r in dns.collect()
    }
    hyb = {(r["qid"], r["docno"]) for r in rows}
    assert hyb & lex_docs, "no lexical doc survived fusion"
    assert hyb & dns_docs, "no dense doc survived fusion"


def test_hybrid_score_is_exact_rrf_sum(spark, vb_index):
    """A doc in both legs scores round(1e6/(C+rl)) + round(1e6/(C+rd));
    check the max possible fused score bound and the quantization."""
    idx, _ = vb_index
    out = hybrid_rrf_topk(idx, _emb(spark), _docs(spark), oracle.PROBE_IDS, k=10)
    mx = round(round(1e6 / (RRF_C + 1)) * 2 / 1e6, 6)
    for r in out.collect():
        assert 0 < r["score"] <= mx
        # fused micro is integral: score * 1e6 is an exact integer
        assert abs(r["score"] * 1e6 - round(r["score"] * 1e6)) < 1e-6


def test_combmnz_mnz_multiplier_and_norm_bounds(spark, vb_index):
    """CombMNZ: every fused micro value is n_sys * sum(norm_u) with
    norm_u in [0, 1e6] — so scores land in [0, 4] with two systems —
    and both-system docs beat equal-score single-system docs via the
    MNZ multiplier."""
    from mircv_project_spark.operators.hybrid import hybrid_combmnz_topk

    idx, _ = vb_index
    out = hybrid_combmnz_topk(
        idx, _emb(spark), _docs(spark), oracle.PROBE_IDS
    ).collect()
    assert out
    for r in out:
        assert 0.0 <= r["score"] <= 4.0
        # fused micro is integral (exact BIGINT product of integers)
        assert abs(r["score"] * 1e6 - round(r["score"] * 1e6)) < 1e-6


def test_combmnz_excludes_probe(spark, vb_index):
    from mircv_project_spark.operators.hybrid import hybrid_combmnz_topk

    idx, _ = vb_index
    out = hybrid_combmnz_topk(
        idx, _emb(spark), _docs(spark), oracle.PROBE_IDS
    ).collect()
    for r in out:
        assert r["docno"] != r["qid"]


def test_borda_points_bounds_and_self_exclusion(spark, vb_index):
    """Borda totals are integers in [1, 2*pool]; probe never
    self-matches; single-leg docs score <= pool, dual-leg docs can
    exceed it (fusion really mixes)."""
    from mircv_project_spark.operators.hybrid import hybrid_borda_topk

    idx, _ = vb_index
    out = hybrid_borda_topk(
        idx, _emb(spark), _docs(spark), oracle.PROBE_IDS, k=10
    )
    rows = out.collect()
    assert rows
    for r in rows:
        assert r["docno"] != r["qid"]
        assert 1 <= r["borda"] <= 2 * HYBRID_POOL
    # at least one doc fused from both legs (points > pool)
    assert any(r["borda"] > HYBRID_POOL for r in rows)


def test_borda_rank1_matches_python_model(spark, vb_index):
    """Recompute Borda totals in Python from the two legs' own
    rankings; the operator's per-query winner must match exactly."""
    from mircv_project_spark.operators.hybrid import hybrid_borda_topk

    idx, _ = vb_index
    probes = oracle.PROBE_IDS
    texts = {
        r["doc_id"]: r["text"]
        for r in _docs(spark).where(F.col("doc_id").isin(probes)).collect()
    }
    lex = exhaustive_topk(
        idx,
        [(str(p), texts[p]) for p in probes],
        scoring.BM25,
        k=HYBRID_POOL + 1,
    )
    pts: dict[tuple[str, int], int] = {}
    by_q: dict[str, list] = {}
    for r in lex.collect():
        by_q.setdefault(r["qid"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        rn = 0
        for r in rs:
            if r["docno"] == qid:
                continue
            rn += 1
            if rn > HYBRID_POOL:
                break
            key = (qid, int(r["docno"]))
            pts[key] = pts.get(key, 0) + (HYBRID_POOL + 1 - rn)
    dns = cosine_topk(_emb(spark), probes, k=HYBRID_POOL)
    for r in dns.collect():
        key = (str(r["probe_id"]), int(r["neighbor_id"]))
        pts[key] = pts.get(key, 0) + (HYBRID_POOL + 1 - r["rank"])

    want = {}
    for (qid, doc), p in pts.items():
        cur = want.get(qid)
        if cur is None or (-p, doc) < (-cur[1], cur[0]):
            want[qid] = (doc, p)
    got = {
        r["qid"]: (int(r["docno"]), r["borda"])
        for r in hybrid_borda_topk(
            idx, _emb(spark), _docs(spark), probes, k=10
        ).collect()
        if r["rank"] == 1
    }
    assert got == want
