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
