"""Delete (tombstone) semantics for the persisted store
(sources/index_store.py): masked reads are a pure visibility filter
(surviving scores bit-identical, stats pre-delete), vacuum makes
deletes physical (postings really gone, stats recomputed, docids
preserved).  Oracle equality at sf0.01 is covered by the gate entries
bm25_topk_deleted / bm25_topk_vacuumed."""

import tempfile

from pyspark.sql import functions as F

from mircv_project_spark import oracle
from mircv_project_spark.operators import scoring, topk
from mircv_project_spark.operators.topk import query_terms
from mircv_project_spark.sources.index_store import (
    IndexReader,
    append_tombstones,
    masked_index_view,
    read_tombstones,
    vacuum_index,
    write_index,
)


def _store_with_deletes(spark, vb_index, tmpdir):
    idx, _ = vb_index
    store = f"{tmpdir}/store"
    write_index(idx, store)
    docnos = [
        r["docno"]
        for r in idx.doc_index.where(
            (F.col("docid") - 1) % oracle.DELETE_MOD == oracle.DELETE_REM
        ).collect()
    ]
    append_tombstones(spark, store, [int(d) for d in docnos])
    return store, {int(d) for d in docnos}


def test_masked_view_is_pure_visibility_filter(spark, vb_index):
    idx, _ = vb_index
    with tempfile.TemporaryDirectory() as td:
        store, dead = _store_with_deletes(spark, vb_index, td)
        reader = IndexReader.from_dir(spark, store)
        tomb = read_tombstones(spark, store)
        terms = sorted(
            {t for _, t, _ in query_terms(oracle.QUERY_SET, False)}
        )
        view = masked_index_view(reader, tomb, terms)
        masked = topk.exhaustive_topk(
            view, oracle.QUERY_SET, scoring.BM25, k=1000
        ).collect()
        # no deleted doc ever surfaces
        assert all(int(r["docno"]) not in dead for r in masked)
        # every surviving doc keeps its EXACT pre-delete score
        base = {
            (r["qid"], r["docno"]): r["score"]
            for r in topk.exhaustive_topk(
                idx, oracle.QUERY_SET, scoring.BM25, k=1000
            ).collect()
        }
        for r in masked:
            assert r["score"] == base[(r["qid"], r["docno"])]
        # stats stayed pre-delete
        assert view.n_docs == idx.n_docs


def test_vacuum_makes_deletes_physical_and_recomputes_stats(spark, vb_index):
    idx, _ = vb_index
    with tempfile.TemporaryDirectory() as td:
        store, dead = _store_with_deletes(spark, vb_index, td)
        out = f"{td}/vacuumed"
        vacuum_index(spark, store, out)
        reader = IndexReader.from_dir(spark, out)
        # stats recomputed over survivors
        assert reader.n_docs == idx.n_docs - len(dead)
        surv_dl = (
            idx.doc_index.where(
                ~((F.col("docid") - 1) % oracle.DELETE_MOD == oracle.DELETE_REM)
            )
            .agg(F.sum("doc_len"))
            .collect()[0][0]
        )
        assert reader.sum_doc_len == surv_dl
        # deleted docids are PHYSICALLY absent from the decoded stream
        flat_ids = {
            r["docid"] for r in reader.as_index_view().flat.select("docid").distinct().collect()
        }
        assert not {d + 1 for d in dead} & flat_ids
        # surviving docids keep their ORIGINAL numbers
        orig_ids = {
            r["docid"]
            for r in idx.doc_index.where(
                ~((F.col("docid") - 1) % oracle.DELETE_MOD == oracle.DELETE_REM)
            ).collect()
        }
        got_ids = {r["docid"] for r in reader.doc_index.collect()}
        assert got_ids == orig_ids
