#!/usr/bin/env python
"""Per-phase profiling harness for the optimization round (guide §1).

NOT a replacement for bench.py (which is frozen for measurement): this
file isolates each bench phase with noop sinks / per-stage timers so
optimization work can attribute seconds to operators.  Run it ALONE —
the host throttles under concurrent load.

Usage:
    python bench_extra.py build      # synthetic 500k build, stage split
    python bench_extra.py sf        # sf build + write_index split
    python bench_extra.py serve     # cold/warm maxscore, bmw, wand, taat
    python bench_extra.py pruned    # distributed pruned path, pass split
    python bench_extra.py nrt      # NRT freshness split
Prints one JSON line per phase.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", 500_000))


def _session():
    from mircv_project_spark.session import get_spark

    return get_spark(
        f"mircv-extra-{CPUS}", master=f"local[{CPUS}]",
        shuffle_partitions=CPUS * 2,
    )


def _emit(name, payload):
    print(json.dumps({"phase": name, **payload}), flush=True)


def _job_count(spark):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    return len(tracker.getJobIdsForGroup(None) or [])


def profile_build(spark):
    from mircv_project_spark.operators.index_build import (
        build_index, filter_indexable,
    )
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids, generate_transcripts,
    )

    # warmup
    t = generate_transcripts(spark, max(2_000, TURNS // 100), seed=1)
    t = assign_doc_ids(filter_indexable(t), assume_sorted=True)
    idx = build_index(spark, t, parse=True)
    idx.lexicon.write.mode("overwrite").format("noop").save()

    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        t = generate_transcripts(spark, TURNS, seed=100 + rep)
        t = assign_doc_ids(filter_indexable(t), assume_sorted=True)
        t_assign = time.monotonic() - t0
        idx = build_index(spark, t, parse=True)
        t_build = time.monotonic() - t0 - t_assign
        idx.lexicon.write.mode("overwrite").format("noop").save()
        total = time.monotonic() - t0
        _emit(
            "build_synthetic",
            {
                "rep": rep,
                "turns": TURNS,
                "total_s": round(total, 3),
                "assign_s": round(t_assign, 3),
                "build_s": round(t_build, 3),
                "lexicon_noop_s": round(total - t_assign - t_build, 3),
                "metrics": {
                    k: (round(v, 3) if isinstance(v, float) else v)
                    for k, v in idx.metrics.items()
                },
            },
        )


def profile_sf(spark):
    from mircv_project_spark.operators.index_build import (
        build_index, filter_indexable, write_index,
    )
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids, load_transcripts,
    )

    for rep in range(2):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_DIR)))
        idx = build_index(spark, t, parse=True)
        t_build = time.monotonic() - t0
        store = tempfile.mkdtemp(prefix="mircv_extra_idx_")
        try:
            t1 = time.monotonic()
            write_index(idx, store)
            t_write = time.monotonic() - t1
            t1 = time.monotonic()
            n_postings = idx.flat.count()
            t_flat = time.monotonic() - t1
            _emit(
                "build_sf",
                {
                    "rep": rep,
                    "build_s": round(t_build, 3),
                    "write_index_s": round(t_write, 3),
                    "flat_count_s": round(t_flat, 3),
                    "n_postings": n_postings,
                    "metrics": {
                        k: (round(v, 3) if isinstance(v, float) else v)
                        for k, v in idx.metrics.items()
                    },
                },
            )
        finally:
            if rep == 0:
                shutil.rmtree(store, ignore_errors=True)
            else:
                # keep the last store for serve/pruned profiling
                print(json.dumps({"phase": "store", "path": store}), flush=True)


def _sf_store(spark):
    """Build + write the sf store once, return its path."""
    from mircv_project_spark.operators.index_build import (
        build_index, filter_indexable, write_index,
    )
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids, load_transcripts,
    )

    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_DIR)))
    idx = build_index(spark, t, parse=True)
    store = tempfile.mkdtemp(prefix="mircv_extra_idx_")
    write_index(idx, store)
    return store, idx


def profile_serve(spark):
    from mircv_project_spark.operators import scoring
    from mircv_project_spark.operators.bmw import bmw_topk_df
    from mircv_project_spark.operators.maxscore import maxscore_topk_df
    from mircv_project_spark.operators.taat import taat_topk_df
    from mircv_project_spark.operators.wand import wand_topk_df
    from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
    from mircv_project_spark.sources.index_store import IndexReader

    store, _ = _sf_store(spark)
    qset = QUERY_SET + CONJ_QUERY_SET
    try:
        t0 = time.monotonic()
        reader = IndexReader.from_dir(spark, store)
        t_open = time.monotonic() - t0
        t0 = time.monotonic()
        maxscore_topk_df(reader, qset, scoring.BM25, k=10).collect()
        t_cold = time.monotonic() - t0
        rows = {}
        for name, fn in [
            ("maxscore_warm", maxscore_topk_df),
            ("bmw_warm", bmw_topk_df),
            ("wand_warm", wand_topk_df),
            ("taat_warm", taat_topk_df),
        ]:
            ts = []
            for _ in range(3):
                t0 = time.monotonic()
                fn(reader, qset, scoring.BM25, k=10).collect()
                ts.append(round(time.monotonic() - t0, 3))
            rows[name] = ts
        _emit(
            "serve",
            {"open_s": round(t_open, 3), "cold_s": round(t_cold, 3), **rows},
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def profile_pruned(spark):
    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
    from mircv_project_spark.sources.index_store import IndexReader

    store, idx = _sf_store(spark)
    qset = QUERY_SET + CONJ_QUERY_SET
    try:
        reader = IndexReader.from_dir(spark, store)
        for rep in range(3):
            t0 = time.monotonic()
            topk.topk_from_blocks_pruned(
                reader, qset, scoring.BM25, k=10
            ).collect()
            _emit(
                "pruned_dist",
                {"rep": rep, "total_s": round(time.monotonic() - t0, 3)},
            )
        for rep in range(3):
            t0 = time.monotonic()
            topk.exhaustive_topk(idx, qset, scoring.BM25, k=10).collect()
            _emit(
                "exhaustive",
                {"rep": rep, "total_s": round(time.monotonic() - t0, 3)},
            )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def profile_nrt(spark):
    from pyspark.sql import functions as F

    from mircv_project_spark.operators import scoring
    from mircv_project_spark.operators.index_build import filter_indexable
    from mircv_project_spark.operators.maxscore import maxscore_topk_df
    from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
    from mircv_project_spark.sources.index_store import IndexReader
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids, load_transcripts,
    )
    from mircv_project_spark.streaming import incremental as S

    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_DIR)))
    qset = QUERY_SET + CONJ_QUERY_SET
    base = tempfile.mkdtemp(prefix="mircv_extra_nrt_")
    try:
        n_inp, n_delta, n_ckpt = f"{base}/in", f"{base}/delta", f"{base}/ckpt"
        convs = t.select("conv_id").distinct()
        n_convs = convs.count()
        cut = (
            convs.orderBy(F.col("conv_id").desc())
            .limit(max(1, n_convs // 100))
            .agg(F.min("conv_id"))
            .collect()[0][0]
        )
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        t.where(F.col("conv_id") < cut).select(cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(n_inp)
        S.index_delta_query(spark, n_inp, n_delta, n_ckpt, parse=True).awaitTermination(600)
        S.compact_index(spark, n_delta, parse=True)
        fresh = t.where(F.col("conv_id") >= cut).select(cols)
        fresh.count()
        t0 = time.monotonic()
        fresh.coalesce(1).write.mode("append").parquet(n_inp)
        t_w = time.monotonic()
        S.index_delta_query(spark, n_inp, n_delta, n_ckpt, parse=True).awaitTermination(600)
        t_drain = time.monotonic()
        nrt_idx = S.nrt_index(spark, n_delta, parse=True)
        nrt_reader = IndexReader.from_memory(nrt_idx)
        t_view = time.monotonic()
        maxscore_topk_df(nrt_reader, qset, scoring.BM25, k=10).collect()
        t_serve = time.monotonic()
        _emit(
            "nrt",
            {
                "total_s": round(t_serve - t0, 3),
                "write_s": round(t_w - t0, 3),
                "drain_s": round(t_drain - t_w, 3),
                "view_s": round(t_view - t_drain, 3),
                "serve_s": round(t_serve - t_view, 3),
            },
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


PHASES = {
    "build": profile_build,
    "sf": profile_sf,
    "serve": profile_serve,
    "pruned": profile_pruned,
    "nrt": profile_nrt,
}


def main():
    which = sys.argv[1:] or list(PHASES)
    spark = _session()
    for name in which:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        PHASES[name](spark)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
