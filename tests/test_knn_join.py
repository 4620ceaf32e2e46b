"""Exact kNN self-join (similarity.knn_join_exact): chunked partial
top-k must equal the brute-force per-vector ranking, across chunk
boundaries and at round-6 ties."""

import numpy as np
import pytest

from mircv_project_spark.operators import similarity as S


def _brute(vecs: dict[int, list[float]], k: int):
    ids = sorted(vecs)
    out = {}
    for i in ids:
        a = np.asarray(vecs[i], dtype=np.float64)
        an = a / np.linalg.norm(a)
        scored = []
        for j in ids:
            if j == i:
                continue
            b = np.asarray(vecs[j], dtype=np.float64)
            c = round(float(an @ (b / np.linalg.norm(b))), 6)
            scored.append((-c, j))
        scored.sort()
        out[i] = [(j, -nc) for nc, j in scored[:k]]
    return out


def test_matches_bruteforce_across_chunks(spark):
    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=8).tolist() for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    # chunk_size 8 forces multiple chunk pairs
    got = {}
    for r in S.knn_join_exact(df, k=3, chunk_size=8).collect():
        got.setdefault(r.id, []).append((r.rank, r.nid, r.cos6))
    # float32 storage: recompute brute force on the float32-rounded
    # vectors Spark actually reads
    vecs32 = {i: np.asarray(v, dtype=np.float32).tolist() for i, v in vecs.items()}
    want = _brute(vecs32, 3)
    for i in want:
        got_i = [ (nid, c) for _, nid, c in sorted(got[i]) ]
        assert got_i == want[i], i


def test_round6_tie_ranks_nid_asc(spark):
    # vectors 1 and 2 are identical => both cos 1.0 with vector 0;
    # the tie must rank nid asc
    rows = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [3.0, 0.0]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id, r.rank): r.nid for r in S.knn_join_exact(df, k=2).collect()
    }
    assert got[(0, 1)] == 1 and got[(0, 2)] == 2
