#!/usr/bin/env python
"""Benchmark harness.

Headline workload (mirrors the reference's two executables):
  1. index build, parsed + compressed (VB/unary blocks), over the
     sf documents-derived transcripts AND a larger synthetic transcript
     table (deterministic generator, no external data);
  2. batch query evaluation: MaxScore top-10 BM25/TFIDF over the fixed
     query set (driver-side DAAT over the pruned posting fetch), plus
     the exhaustive distributed scorer.

Scaling evidence for the north rule (no real cluster in this sandbox):
the same synthetic build runs at two parallelism levels — local[N/4]
and local[N] — in separate subprocesses (fresh JVM each), and the JSON
reports throughput at both plus scaling efficiency
  eff = (thru_N / thru_N4) / 4.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {<step>: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
# 500k turns best-of-2: large enough that the parallel build dominates
# the ~10 s of fixed per-session orchestration (at 200k that overhead
# is ~60% of the local[32] wall time and caps apparent scaling
# efficiency at ~0.54; measured idle at 1M: 14.6k turns/s, efficiency
# 0.92 — see BASELINE.md), repeated because the shared host throttles
# this VM unpredictably (same code has measured 3x apart); best-of-2
# keeps the whole bench around ~10 min.
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", 500_000))


def _session(cores: int):
    from mircv_project_spark.session import get_spark

    return get_spark(
        f"mircv-bench-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )


def _build_synthetic(spark, n_turns: int, seed: int = 42) -> float:
    """Parsed+compressed index build over n_turns synthetic transcripts;
    returns wall seconds (forced by materializing the postings table).

    Each call must use a DISTINCT seed within a session: Spark's
    CacheManager dedupes identical logical plans, so a repeat with the
    same seed would 'build' from the previous run's cache."""
    from mircv_project_spark.operators.index_build import (
        build_index,
        filter_indexable,
    )
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids,
        generate_transcripts,
    )

    spark.catalog.clearCache()
    t0 = time.monotonic()
    t = generate_transcripts(spark, n_turns, seed=seed)
    t = assign_doc_ids(filter_indexable(t))
    idx = build_index(spark, t, parse=True)  # materializes the posting runs
    idx.lexicon.write.mode("overwrite").format("noop").save()
    return time.monotonic() - t0


REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", 2))


def _best_build(spark, n_turns: int) -> float:
    """Warm once, measure REPEATS times, keep the best.  The sandbox
    host throttles this VM unpredictably (same code measured 3x apart
    across runs); best-of-N approximates the unthrottled rate.  Seeds
    differ per run so no logical plan (and hence no cache) is shared."""
    _build_synthetic(spark, max(2_000, n_turns // 100), seed=1)
    return min(
        _build_synthetic(spark, n_turns, seed=100 + i) for i in range(REPEATS)
    )


def scale_run(cores: int, n_turns: int) -> None:
    """Subprocess entry: one synthetic build at the given parallelism."""
    spark = _session(cores)
    sec = _best_build(spark, n_turns)
    print(json.dumps({"cores": cores, "sec": sec, "turns": n_turns}))
    spark.stop()


def main() -> None:
    queries: dict[str, float] = {}
    extras: dict[str, dict] = {}

    spark = _session(CPUS)

    from mircv_project_spark.operators import scoring, topk
    from mircv_project_spark.operators.index_build import (
        build_index,
        filter_indexable,
        write_index,
    )
    from mircv_project_spark.operators.maxscore import maxscore_topk_df
    from mircv_project_spark.oracle import CONJ_QUERY_SET, QUERY_SET
    from mircv_project_spark.sources.index_store import IndexReader
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids,
        load_transcripts,
    )

    # --- 1. index build over the sf documents-derived transcripts ---
    t0 = time.monotonic()
    t = assign_doc_ids(filter_indexable(load_transcripts(spark, SF_DIR)))
    idx = build_index(spark, t, parse=True)
    store = tempfile.mkdtemp(prefix="mircv_bench_idx_")
    write_index(idx, store)
    queries["build_sf_parsed_compressed"] = time.monotonic() - t0

    # --- 2. query batches (reader over the on-disk bucketed store) ---
    reader = IndexReader.from_dir(spark, store)
    qset = QUERY_SET + CONJ_QUERY_SET
    for name, std, conj in [
        ("maxscore_bm25_top10", scoring.BM25, False),
        ("maxscore_tfidf_top10", scoring.TFIDF, False),
        ("maxscore_bm25_conjunctive", scoring.BM25, True),
    ]:
        t0 = time.monotonic()
        maxscore_topk_df(reader, qset, std, k=10, conjunctive=conj).collect()
        queries[name] = time.monotonic() - t0
    # warm repeat: the driver-side term cache (reference Lexicon cache
    # analog) serves the postings — per-query cost is pure Python DAAT
    t0 = time.monotonic()
    maxscore_topk_df(reader, qset, scoring.BM25, k=10).collect()
    queries["maxscore_bm25_top10_warm"] = time.monotonic() - t0

    t0 = time.monotonic()
    topk.exhaustive_topk(idx, qset, scoring.BM25, k=10).collect()
    queries["exhaustive_bm25_top10"] = time.monotonic() - t0

    # --- 3. synthetic build at full parallelism (headline) ---
    sec_full = _best_build(spark, BENCH_TURNS)
    queries[f"build_synthetic_{BENCH_TURNS}_local{CPUS}"] = sec_full
    spark.stop()

    # --- 4. scaling: same job at CPUS/4 cores in a fresh subprocess ---
    low = max(1, CPUS // 4)
    out = subprocess.run(
        [sys.executable, __file__, "--scale-run", str(low), str(BENCH_TURNS)],
        capture_output=True, text=True, check=True,
    )
    lowres = json.loads(out.stdout.strip().splitlines()[-1])
    queries[f"build_synthetic_{BENCH_TURNS}_local{low}"] = lowres["sec"]

    thru_full = BENCH_TURNS / sec_full
    thru_low = BENCH_TURNS / lowres["sec"]
    core_ratio = CPUS / low
    eff = (thru_full / thru_low) / core_ratio
    extras["throughput"] = {
        f"build_turns_per_sec_local{CPUS}": round(thru_full, 1),
        f"build_turns_per_sec_local{low}": round(thru_low, 1),
        "query_qps_maxscore_bm25": round(
            len(qset) / queries["maxscore_bm25_top10"], 2
        ),
    }
    extras["scaling"] = {
        "cores_low": low,
        "cores_high": CPUS,
        "throughput_low": round(thru_low, 1),
        "throughput_high": round(thru_full, 1),
        "core_ratio": core_ratio,
        "efficiency": round(eff, 3),
    }

    print(
        json.dumps(
            {
                "metric": "index build (parsed+compressed) + BM25/TFIDF MaxScore "
                "top-10 batch; scaling efficiency local[N/4]->local[N]",
                "value": round(sec_full, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in queries.items()},
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                **extras,
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-run":
        scale_run(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
