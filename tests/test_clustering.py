"""k-means + SemDeDup (operators/clustering.py): the distributed
all-integer Lloyd must match an independent pure-Python mirror of the
same pinned rules (init, argmin ties, half-away centroid rounding,
empty-cluster carry-over), and the SemDeDup verdict must implement
keep-the-min-id within clusters.
"""

import math

from pyspark.sql import functions as F

from mircv_project_spark.operators import clustering as C
from mircv_project_spark.plans import checks
from tests.conftest import SF_SMALL


def _quant(vec):
    out = []
    for x in vec:
        y = x * 1_000_000
        out.append(int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5)))
    return out


def _half_away(s, n):
    return (2 * s + n) // (2 * n) if s >= 0 else -((-2 * s + n) // (2 * n))


def _lloyd(vecs: dict[int, list[float]], k: int, iters: int):
    """Independent reference: same pinned rules as the operator."""
    q = {i: _quant(v) for i, v in vecs.items()}
    cents = [q[i] for i in sorted(q)[:k]]
    asg = {}
    for it in range(iters):
        asg = {}
        for i, qv in q.items():
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(qv, cv)), cid)
                for cid, cv in enumerate(cents)
            )
            asg[i] = best  # (d2, cid)
        if it == iters - 1:
            break
        new = []
        for cid, cv in enumerate(cents):
            members = [q[i] for i in q if asg[i][1] == cid]
            if not members:
                new.append(cv)  # empty cluster: unchanged
                continue
            n = len(members)
            new.append(
                [_half_away(sum(col), n) for col in zip(*members)]
            )
        cents = new
    return asg


def test_kmeans_matches_reference_model(spark):
    # three tight groups + one straggler, 4-d; ids chosen so the k=3
    # lowest-id init points land one per group
    vecs = {
        0: [0.1, 0.1, 0.0, 0.0],
        1: [0.9, 0.9, 0.0, 0.0],
        2: [-0.8, 0.5, 0.3, 0.0],
        3: [0.12, 0.08, 0.01, 0.0],
        4: [0.88, 0.91, -0.02, 0.0],
        5: [-0.79, 0.52, 0.28, 0.0],
        6: [0.5, 0.5, 0.5, 0.5],  # straggler between groups
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {r.id: r for r in C.kmeans_assign(df, k=3, iters=3).collect()}
    want = _lloyd(vecs, k=3, iters=3)
    assert set(got) == set(vecs)
    for i in vecs:
        assert (got[i].d2, got[i].cluster) == want[i], i
    # groups ended up separated
    assert got[0].cluster == got[3].cluster
    assert got[1].cluster == got[4].cluster
    assert got[2].cluster == got[5].cluster
    assert len({got[0].cluster, got[1].cluster, got[2].cluster}) == 3


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 but only two distinct locations: init takes ids 0,1,2 and
    # id-2's centroid (a duplicate of id-0's location... make it a
    # point that everything is farther from after one update)
    vecs = {
        0: [0.0, 0.0],
        1: [1.0, 1.0],
        2: [0.52, 0.52],  # nearest-to-midpoint seed that starves
        3: [0.02, 0.0],
        4: [1.0, 0.98],
        5: [0.01, 0.01],
        6: [0.99, 1.0],
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {r.id: (r.d2, r.cluster) for r in C.kmeans_assign(df, k=3, iters=4).collect()}
    want = _lloyd(vecs, k=3, iters=4)
    assert got == want


def test_kmeans_assignment_plan_is_map_only(spark):
    """The scale claim in the module docstring: with centroids as
    driver-state literals, assignment is a single scan + projection —
    no join, no Exchange anywhere in the plan."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qv = C._quantized(emb, "vec_id", "embedding")
    cluster, d2 = C._assign_cols([[0] * 64, [1000] * 64, [-1000] * 64])
    plan = checks.plan_text(qv.select("id", cluster, d2))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Scan parquet" in plan


def test_semdedup_pair_join_is_cluster_equi_join(spark):
    """The within-cluster pair scan must be an equi-join on the cluster
    key (hash or sort-merge), never a BroadcastNestedLoopJoin whose
    predicate touches every row pair."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    av = C._quantized(emb, "vec_id", "embedding").select(
        "id",
        (F.col("id") % 7).alias("cluster"),
        F.transform("qv", lambda x: x.cast("double")).alias("v"),
    )
    plan = checks.plan_text(C._dropped_ids(av, 0.35))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "cluster" in plan


def test_semdedup_drops_higher_id_within_cluster(spark):
    # the k=3 init seeds (ids 0..2) are distinct directions; the
    # near-dups sit at NON-seed ids so they land in their twin's cell
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [-1.0, 0.2, 0.3]),  # lone
        (3, [0.999, 0.01, 0.0]),  # near-dup of 0 -> dropped
        (4, [0.01, 0.999, 0.0]),  # near-dup of 1 -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.id: r for r in C.semdedup_keep(df, k=3, iters=2, tau=0.9).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    assert got[0].keep and got[1].keep and got[2].keep
    assert not got[3].keep and not got[4].keep
    # dup pairs really are co-clustered (the verdict's precondition)
    assert got[0].cluster == got[3].cluster
    assert got[1].cluster == got[4].cluster


def test_conv_mean_embeddings_array_api_matches_python(spark):
    """The array API: pooled vector = elementwise sign-aware rha mean
    of the micro-quantized members (python model on a tiny fixture)."""
    from mircv_project_spark.operators.clustering import (
        conv_mean_embeddings,
    )

    rows = [
        (0, [0.5, -0.25, 0.1], 0),
        (1, [0.1, 0.05, -0.3], 0),
        (8, [1.0, 0.0, 0.0], 1),   # second conversation (id // 8 = 1)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.conv_id: (r.n_members, list(r.pooled))
        for r in conv_mean_embeddings(df).collect()
    }

    def rha(s, n):
        return (2 * s + n) // (2 * n) if s >= 0 else -((-2 * s + n) // (2 * n))

    def q(x):
        import math
        v = x * 1e6
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    m0 = [
        rha(q(0.5) + q(0.1), 2),
        rha(q(-0.25) + q(0.05), 2),
        rha(q(0.1) + q(-0.3), 2),
    ]
    assert got["conv-000000000000"] == (2, m0)
    assert got["conv-000000000001"] == (1, [1_000_000, 0, 0])


def test_embedding_moments_assemble_exact_covariance(spark):
    """The driver-side assembly the op exists for: scaled covariance
    n*sum_ij - sum_i*sum_j (python ints, no overflow) equals numpy's
    computation on the quantized matrix exactly, and the assembled
    matrix is PSD (eigendecomposition runs)."""
    import numpy as np

    from mircv_project_spark.operators.clustering import embedding_moments

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    rows = embedding_moments(emb).collect()
    d = max(r.j for r in rows)
    n = rows[0].n
    cov = np.zeros((d, d), dtype=object)
    for r in rows:
        v = int(r.n) * int(r.sum_ij) - int(r.sum_i) * int(r.sum_j)
        cov[r.i - 1, r.j - 1] = v
        cov[r.j - 1, r.i - 1] = v

    q = np.asarray(
        [
            np.round(np.asarray(v.embedding, dtype=np.float64) * 1e6)
            for v in emb.collect()
        ],
        dtype=np.int64,
    )
    want = n * (q.T @ q) - np.outer(q.sum(0), q.sum(0))
    assert (cov.astype(np.int64) == want).all()
    evals = np.linalg.eigvalsh(cov.astype(np.float64))
    assert evals.min() >= -1e-3 * abs(evals.max())  # PSD up to fp noise
