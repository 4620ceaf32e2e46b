"""Federated sharded retrieval (sources/index_store.shard_index +
operators/topk.topk_from_shards): rank identity with the single store
under the global-statistics merge, shard honesty (local stats really
are local), and docid preservation."""

import pytest

from pyspark.sql import functions as F

from mircv_project_spark.operators import scoring
from mircv_project_spark.operators.topk import (
    topk_from_blocks,
    topk_from_shards,
)
from mircv_project_spark.sources.index_store import IndexReader, shard_index
from tests.conftest import cmp_rank_frames

QUERIES = [
    ("q1", "the table"),
    ("q2", "fast scan query"),
    ("q3", "spark"),
]


@pytest.fixture(scope="module")
def sharded(spark, vb_index, tmp_path_factory):
    idx, reader = vb_index
    base = tmp_path_factory.mktemp("shardstore")
    store = str(base / "full")
    from mircv_project_spark.sources.index_store import write_index

    write_index(idx, store)
    dirs = [str(base / f"shard{s}") for s in range(3)]
    shard_index(spark, store, dirs)
    return (
        IndexReader.from_dir(spark, store),
        [IndexReader.from_dir(spark, d) for d in dirs],
    )


def test_federated_rank_identity(spark, sharded):
    full, shards = sharded
    for standard in (scoring.BM25, scoring.TFIDF):
        cmp_rank_frames(
            topk_from_shards(shards, QUERIES, standard, k=10),
            topk_from_blocks(full, QUERIES, standard, k=10),
        )


def test_federated_conjunctive_rank_identity(spark, sharded):
    full, shards = sharded
    cmp_rank_frames(
        topk_from_shards(shards, QUERIES, scoring.BM25, k=10, conjunctive=True),
        topk_from_blocks(full, QUERIES, scoring.BM25, k=10, conjunctive=True),
    )


def test_shards_partition_the_corpus_with_preserved_docids(spark, sharded):
    full, shards = sharded
    n = len(shards)
    assert sum(r.n_docs for r in shards) == full.n_docs
    assert sum(r.sum_doc_len for r in shards) == full.sum_doc_len
    for s, r in enumerate(shards):
        ids = [row["docid"] for row in r.doc_index.select("docid").collect()]
        assert ids, "empty shard"
        assert all((d - 1) % n == s for d in ids)


def test_shard_stats_are_local_so_the_merge_matters(spark, sharded):
    """A shard's stored df must cover only its subset — if shard
    lexicons already held global stats, federation would be trivial
    and the operator pointless."""
    full, shards = sharded
    gdf = {
        r["term"]: r["df"]
        for r in full.lexicon.select("term", "df").collect()
    }
    # pick the corpus's most frequent term: its df must split
    top_term = max(gdf, key=gdf.get)
    shard_dfs = []
    for r in shards:
        rows = (
            r.lexicon.where(F.col("term") == top_term)
            .select("df")
            .collect()
        )
        shard_dfs.append(int(rows[0]["df"]) if rows else 0)
    assert sum(shard_dfs) == gdf[top_term]
    assert max(shard_dfs) < gdf[top_term]


def _mini_index(spark, conv, texts):
    from pyspark.sql import functions as F

    from mircv_project_spark.operators.index_build import (
        build_index,
        filter_indexable,
    )
    from mircv_project_spark.sources.transcripts import assign_doc_ids

    rows = [(conv, i, "user", t, None, "2024-01-01 00:00:00") for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts_s string",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.to_timestamp("ts_s").alias("ts"),
    )
    return build_index(spark, assign_doc_ids(filter_indexable(df)), parse=False)


def test_cori_ranks_the_holding_shard_first(spark):
    """A term confined to one shard must pull that shard to rank 1 —
    non-holders sit at the belief floor 0.4 (df = 0 makes T = 0), the
    holder strictly above it."""
    from mircv_project_spark.operators.federation import cori_shard_scores

    a = _mini_index(
        spark,
        "conv-a",
        ["zebra stripes pattern zebra", "common words here", "more shared text"],
    )
    b = _mini_index(
        spark,
        "conv-b",
        ["common words here too", "more shared text again", "filler turn"],
    )
    readers = [IndexReader.from_memory(a), IndexReader.from_memory(b)]
    got = cori_shard_scores(readers, [("q", "zebra")]).collect()
    assert len(got) == 2
    by_rank = {r["rank"]: r for r in got}
    assert by_rank[1]["shard"] == 0
    assert by_rank[2]["score"] == 0.4  # exactly the belief floor
    assert by_rank[1]["score"] > 0.4


def test_cori_hand_computed_two_shards(spark, sharded):
    """Brute-force the belief formula in Python from the shard
    lexicons and compare exactly (micro quantization included)."""
    import decimal
    import math

    from mircv_project_spark.operators.federation import (
        CORI_B,
        CORI_B1,
        CORI_DF_K,
        CORI_DF_SCALE,
        cori_shard_scores,
    )
    from mircv_project_spark.operators.topk import query_terms

    full, shards = sharded
    ns = len(shards)
    queries = [("q1", "the table"), ("q2", "fast scan query")]
    qt = sorted({(q, t) for q, t, _ in query_terms(queries, shards[0].parse)})
    terms = sorted({t for _, t in qt})
    dfs = {}
    for sid, r in enumerate(shards):
        for row in (
            r.lexicon.where(F.col("term").isin(terms))
            .select("term", "df")
            .collect()
        ):
            dfs[(row["term"], sid)] = int(row["df"])
    cw = [float(r.sum_doc_len) for r in shards]
    avgcw = sum(cw) / float(ns)
    cf = {
        t: sum(1 for sid in range(ns) if (t, sid) in dfs) for t in terms
    }

    def q(x):
        return int(
            decimal.Decimal(x * 1e6).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    want = {}
    for qid, t in qt:
        if cf[t] == 0:
            continue
        for sid in range(ns):
            df = float(dfs.get((t, sid), 0))
            T = df / (df + CORI_DF_K + (CORI_DF_SCALE * cw[sid]) / avgcw)
            I = math.log10((ns + 0.5) / cf[t]) / math.log10(ns + 1.0)
            want[(qid, sid)] = want.get((qid, sid), 0) + q(
                CORI_B + CORI_B1 * (T * I)
            )
    got = {
        (r["qid"], r["shard"]): round(r["score"] * 1e6)
        for r in cori_shard_scores(shards, queries).collect()
    }
    assert got == {k: v for k, v in want.items()}
