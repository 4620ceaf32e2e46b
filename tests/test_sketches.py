"""KMV distinct-count sketch (operators/sketches.py): estimator
accuracy on a large distinct universe, exact-branch behavior for small
groups, partitioning invariance of the two-stage k-min, and parity
with an independent Python model of the pinned formula."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mircv_project_spark.operators import sketches as K


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_kmv(tokens: set[str], k: int):
    hs = sorted({_h60("kmv-" + t) for t in tokens})
    if len(hs) < k:
        return float(len(hs)), (hs[-1] if hs else None)
    kth = hs[k - 1]
    return round((float(k - 1) * float(1 << 60)) / float(kth), 6), kth


def test_small_group_exact_branch_and_model_parity(spark):
    rows = [
        (0, "alpha beta gamma", "srcA"),  # 3 distinct < k
        (1, "alpha alpha beta", "srcA"),
        (2, " ".join(f"w{i}" for i in range(40)), "srcB"),  # 40 > k=16
        (3, " ".join(f"w{i}" for i in range(20, 60)), "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in K.kmv_distinct_tokens(df).collect()}

    assert got["srcA"].n_distinct == 3
    assert got["srcA"].est == 3.0  # exact branch

    toks_b = {f"w{i}" for i in range(60)}
    assert got["srcB"].n_distinct == 60
    want_est, want_kth = _ref_kmv(toks_b, K.KMV_K)
    assert got["srcB"].kth_hash == want_kth
    assert got["srcB"].est == want_est


def test_estimator_accuracy_large_universe(spark):
    # one source, 5000 distinct tokens: the k=16 estimate should land
    # within the ~1/sqrt(k-1) relative-error regime (generous 3-sigma)
    n = 5000
    text = " ".join(f"tok{i}" for i in range(n))
    df = spark.createDataFrame(
        [(0, text, "big")], "doc_id long, text string, source string"
    )
    r = K.kmv_distinct_tokens(df).collect()[0]
    assert r.n_distinct == n
    assert abs(r.est - n) / n < 3.0 / (K.KMV_K - 1) ** 0.5


def test_partitioning_invariance(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range(i, i + 30)), "s")
        for i in range(0, 200, 7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = K.kmv_distinct_tokens(df.repartition(1)).collect()
    b = K.kmv_distinct_tokens(df.repartition(16)).collect()
    assert [(r.source, r.n_distinct, r.kth_hash, r.est) for r in a] == [
        (r.source, r.n_distinct, r.kth_hash, r.est) for r in b
    ]


def test_streaming_kmv_final_state_equals_batch(spark, tmp_path):
    """Two micro-batches with overlapping and batch-2-only sources:
    every source's final (max-epoch) sketch row must equal the batch
    operator's sketch over the full corpus; a source absent from batch
    2 keeps its batch-1 row."""
    from mircv_project_spark.streaming.kmv_stream import (
        final_kmv_estimates,
        run_streaming_kmv,
    )

    rows1 = [
        (0, " ".join(f"w{i}" for i in range(30)), "en", "sA", 0),
        (1, "alpha beta gamma", "en", "sB", 0),  # absent from batch 2
    ]
    rows2 = [
        (2, " ".join(f"w{i}" for i in range(20, 50)), "en", "sA", 0),
        (3, " ".join(f"x{i}" for i in range(25)), "en", "sC", 0),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_kmv(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_kmv(spark, inp, out, ckpt).awaitTermination(120)

    raw = spark.read.parquet(out)
    # sA appears in both epochs, sB only in 1, sC only in 2
    epochs = {
        (r.source, r.epoch) for r in raw.select("source", "epoch").collect()
    }
    assert ("sA", 1) in epochs and ("sA", 2) in epochs
    assert ("sB", 1) in epochs and ("sB", 2) not in epochs
    assert ("sC", 1) in epochs

    got = {
        r.source: (r.n_sketch, r.kth_hash, r.est)
        for r in final_kmv_estimates(raw).collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        r.source: (min(K.KMV_K, r.n_distinct), r.kth_hash, r.est)
        for r in K.kmv_distinct_tokens(batch).collect()
    }
    assert got == want


def test_quantile_sketch_exact_regime_and_approx_error(spark):
    """quantile_sketch: at k >= group size the estimate equals the
    exact linear-interpolated quantile (the gate regime); at k << n
    the bottom-k-by-hash sample keeps each estimate within a loose
    rank-error band of the exact value."""
    import numpy as np

    from mircv_project_spark.operators.sketches import quantile_sketch
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    exact_rows = docs.select("source", "n_chars").collect()
    by_src = {}
    for r in exact_rows:
        by_src.setdefault(r["source"], []).append(r["n_chars"])

    big = {
        r["source"]: r
        for r in quantile_sketch(docs, k=4096).collect()
    }
    for src, vals in by_src.items():
        assert big[src]["n_sample"] == len(vals)
        assert big[src]["q50"] == round(
            float(np.percentile(sorted(vals), 50)), 6
        )

    small = {
        r["source"]: r for r in quantile_sketch(docs, k=24).collect()
    }
    for src, vals in by_src.items():
        assert small[src]["n_sample"] == min(24, len(vals))
        exact_med = float(np.percentile(sorted(vals), 50))
        spread = max(vals) - min(vals) or 1
        assert abs(small[src]["q50"] - exact_med) <= 0.5 * spread


def test_quantile_sketch_partitioning_invariant(spark):
    """The sample is keyed on a deterministic row-id hash — any
    repartitioning must produce the identical sketch."""
    from mircv_project_spark.operators.sketches import quantile_sketch
    from tests.conftest import SF_SMALL

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = sorted(map(tuple, quantile_sketch(docs, k=24).collect()))
    b = sorted(
        map(tuple, quantile_sketch(docs.repartition(17), k=24).collect())
    )
    assert a == b


def _ref_hll(tokens: set[str]):
    """Independent Python model of the pinned HLL computation."""
    regs = {}
    for t in tokens:
        h = _h60("hll-" + t)
        b, w = h % 256, h >> 8
        if w == 0:
            rho = 52
        else:
            rho = min(((w & -w).bit_length() - 1) + 1, 52)
        regs[b] = max(regs.get(b, 0), rho)
    z = (256 - len(regs)) * (1 << 52) + sum(1 << (52 - m) for m in regs.values())
    est = round((K.HLL_ALPHA * 65536.0 * float(1 << 52)) / float(z), 6)
    return len(regs), sum(regs.values()), z, est


def test_hll_model_parity_and_accuracy(spark):
    n = 5000
    rows = [
        (0, " ".join(f"tok{i}" for i in range(n)), "big"),
        (1, "alpha beta alpha", "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in K.hll_distinct_tokens(df).collect()}

    for src, toks in (
        ("big", {f"tok{i}" for i in range(n)}),
        ("tiny", {"alpha", "beta"}),
    ):
        nz, rs, z, est = _ref_hll(toks)
        r = got[src]
        assert (r.n_nonzero, r.reg_sum, r.z_scaled, r.est) == (nz, rs, z, est)
    # raw estimator accuracy on the large universe: ~1.04/sqrt(256)
    # relative error, generous 3-sigma band
    assert abs(got["big"].est - n) / n < 3 * 1.04 / 16.0
    assert got["big"].n_distinct == n


def test_hll_partitioning_invariance(spark):
    rows = [(i, f"w{i % 37} w{(i * 7) % 211}", "s") for i in range(400)]
    df1 = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).repartition(1)
    df2 = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).repartition(16)
    a = K.hll_distinct_tokens(df1).collect()[0]
    b = K.hll_distinct_tokens(df2).collect()[0]
    assert (a.n_nonzero, a.reg_sum, a.z_scaled, a.est) == (
        b.n_nonzero, b.reg_sum, b.z_scaled, b.est,
    )


def _ref_bloom_positions(term: str):
    return [
        _h60(f"bloom{i}-" + term) % K.BLOOM_BITS for i in range(K.BLOOM_K)
    ]


def test_bloom_no_false_negatives_and_model_parity(spark):
    vocab = [f"w{i}" for i in range(200)]
    rows = [(i, " ".join(vocab[i::4]), "s") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    probes = ["w0", "w7", "w199", "nothere1", "nothere2"]
    got = {r.term: r for r in K.bloom_term_filter(df, probes).collect()}

    # exact model of the filter
    bits = set()
    for t in vocab:
        bits.update(_ref_bloom_positions(t))
    for t in probes:
        want_in = int(all(p in bits for p in _ref_bloom_positions(t)))
        assert got[t].in_filter == want_in
        assert got[t].present == int(t in vocab)
        # the Bloom contract: never a false negative
        assert got[t].in_filter >= got[t].present
    assert got["w0"].n_set == len(bits)


def test_cms_overestimate_contract_and_model_parity(spark):
    rows = [
        (0, "alpha beta alpha gamma alpha", "s"),
        (1, "beta beta delta " + " ".join(f"x{i}" for i in range(50)), "s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    probes = ["alpha", "beta", "delta", "nothere"]
    got = {r.term: r for r in K.cms_term_counts(df, probes).collect()}

    # independent model of the sketch
    stream = ("alpha beta alpha gamma alpha beta beta delta "
              + " ".join(f"x{i}" for i in range(50))).split()
    counters = {}
    for t in stream:
        for i in range(K.CMS_D):
            cell = (i, _h60(f"cms{i}-" + t) % K.CMS_W)
            counters[cell] = counters.get(cell, 0) + 1
    for t in probes:
        want = min(
            counters.get((i, _h60(f"cms{i}-" + t) % K.CMS_W), 0)
            for i in range(K.CMS_D)
        )
        true = stream.count(t)
        assert got[t].est == want
        assert got[t].true_count == true
        # the CMS contract: one-sided overestimate
        assert got[t].est >= true
    assert got["alpha"].n_cells == len(counters)


def test_streaming_cms_final_state_equals_batch(spark, tmp_path):
    """Two micro-batches with overlapping and batch-2-only sources:
    every source's final (max-epoch) counter state must yield the
    batch operator's probe estimates over the full corpus — integer
    counter addition is order-free."""
    from mircv_project_spark.streaming.cms_stream import (
        final_cms_estimates,
        run_streaming_cms,
    )

    rows1 = [
        (0, "alpha beta alpha " + " ".join(f"w{i}" for i in range(30)),
         "en", "sA", 0),
        (1, "alpha beta gamma", "en", "sB", 0),  # absent from batch 2
    ]
    rows2 = [
        (2, "alpha " + " ".join(f"w{i}" for i in range(20, 50)),
         "en", "sA", 0),
        (3, " ".join(f"x{i}" for i in range(25)), "en", "sC", 0),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    probes = ["alpha", "beta", "w25", "nothere"]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_cms(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_cms(spark, inp, out, ckpt).awaitTermination(120)

    got = {
        (r.source, r.term): (r.est, r.n_cells)
        for r in final_cms_estimates(
            spark.read.parquet(out), probes
        ).collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r.source, r.term): (r.est, r.n_cells)
        for r in K.cms_term_counts(batch, probes).collect()
    }
    assert got == want
    assert got[("sA", "alpha")][0] >= 3  # 3 true occurrences in sA


def test_streaming_bloom_final_state_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """Final (max-epoch) bitset state equals the batch filter after a
    two-batch split, AND replaying batch 1's documents verbatim in
    batch 2 changes nothing — bit-or is idempotent."""
    from mircv_project_spark.streaming.bloom_stream import (
        final_bloom_membership,
        run_streaming_bloom,
    )

    rows1 = [
        (0, " ".join(f"w{i}" for i in range(30)), "en", "sA", 0),
        (1, "alpha beta gamma", "en", "sB", 0),
    ]
    rows2 = [
        (2, " ".join(f"w{i}" for i in range(30)), "en", "sA", 0),  # replay
        (3, "delta", "en", "sB", 0),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    probes = ["alpha", "w7", "delta", "nothere"]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_bloom(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_bloom(spark, inp, out, ckpt).awaitTermination(120)

    raw = spark.read.parquet(out)
    # sA's epoch-2 state must equal its epoch-1 state (pure replay)
    sa = {r.epoch: (list(r.words), list(r.bits))
          for r in raw.where(raw.source == "sA").collect()}
    assert sa[1] == sa[2]

    got = {
        (r.source, r.term): (r.in_filter, r.n_set)
        for r in final_bloom_membership(raw, probes).collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r.source, r.term): (r.in_filter, r.n_set)
        for r in K.bloom_term_filter(batch, probes).collect()
    }
    assert got == want
    assert got[("sB", "delta")][0] == 1


def test_streaming_hll_final_state_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """Final (max-epoch) registers equal the batch sketch after a
    two-batch split, AND replaying batch 1's documents verbatim in
    batch 2 changes nothing — register max is idempotent."""
    from mircv_project_spark.streaming.hll_stream import (
        final_hll_estimate,
        run_streaming_hll,
    )

    rows1 = [
        (0, " ".join(f"w{i}" for i in range(30)), "en", "sA", 0),
        (1, "alpha beta gamma", "en", "sB", 0),
    ]
    rows2 = [
        (2, " ".join(f"w{i}" for i in range(30)), "en", "sA", 0),  # replay
        (3, "delta", "en", "sB", 0),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_hll(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_hll(spark, inp, out, ckpt).awaitTermination(120)

    raw = spark.read.parquet(out)
    # sA's epoch-2 state must equal its epoch-1 state (pure replay)
    sa = {r.epoch: (list(r.buckets), list(r.ms))
          for r in raw.where(raw.source == "sA").collect()}
    assert sa[1] == sa[2]

    got = {
        r.source: (r.n_nonzero, r.reg_sum, r.z_scaled, r.est)
        for r in final_hll_estimate(raw).collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        r.source: (r.n_nonzero, r.reg_sum, r.z_scaled, r.est)
        for r in K.hll_distinct_tokens(batch).collect()
    }
    assert got == want
    assert got["sA"][0] >= 1


def test_streaming_qsk_final_state_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """Final (max-epoch) sample equals the batch bottom-k after a
    two-batch split, AND replaying batch 1's documents verbatim in
    batch 2 changes nothing — the (hash, value) dedup."""
    from mircv_project_spark.streaming.qsk_stream import (
        final_qsk_estimates,
        run_streaming_qsk,
    )

    rows1 = [(i, "x", "en", "sA", 100 + 7 * i) for i in range(20)] + [
        (100, "x", "en", "sB", 5)
    ]
    rows2 = [(i, "x", "en", "sA", 100 + 7 * i) for i in range(5)] + [  # replay
        (200 + i, "x", "en", "sB", 50 + i) for i in range(10)
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_qsk(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_qsk(spark, inp, out, ckpt).awaitTermination(120)

    raw = spark.read.parquet(out)
    got = {
        r.source: (r.n_sample, r.q25, r.q50, r.q75, r.q90)
        for r in final_qsk_estimates(raw).collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema).dropDuplicates(
        ["doc_id"]
    )
    want = {
        r.source: (r.n_sample, r.q25, r.q50, r.q75, r.q90)
        for r in K.quantile_sketch(batch).collect()
    }
    assert got == want
    assert got["sA"][0] == 20  # replays added nothing


def test_streaming_ams_final_state_equals_batch(spark, tmp_path):
    """Two micro-batches with overlapping and batch-2-only sources:
    every source's final (max-epoch) Z state must equal the batch AMS
    sketch over the full corpus — signed integer addition is
    order-free — and the derived estimate must match ams_f2_tokens
    minus the exact column."""
    from mircv_project_spark.streaming.ams_stream import (
        final_ams_estimates,
        run_streaming_ams,
    )

    rows1 = [
        (0, "alpha beta alpha " + " ".join(f"w{i}" for i in range(30)),
         "en", "sA", 0),
        (1, "alpha beta gamma", "en", "sB", 0),  # absent from batch 2
    ]
    rows2 = [
        (2, "alpha " + " ".join(f"w{i}" for i in range(20, 50)),
         "en", "sA", 0),
        (3, " ".join(f"x{i}" for i in range(25)), "en", "sC", 0),
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    inp, out, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_ams(spark, inp, out, ckpt).awaitTermination(120)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_ams(spark, inp, out, ckpt).awaitTermination(120)

    got = {
        r.source: (r.z0, r.z1, r.z2, r.z3, r.z4, r.f2_est)
        for r in final_ams_estimates(spark.read.parquet(out)).collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        r.source: (r.z0, r.z1, r.z2, r.z3, r.z4, r.f2_est)
        for r in K.ams_f2_tokens(batch).collect()
    }
    assert got == want
    assert set(got) == {"sA", "sB", "sC"}
