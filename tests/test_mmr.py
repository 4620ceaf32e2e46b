"""MMR diversified top-k vs an independent in-test greedy model.

Geometry note (why 3D): with every vector in one 2D half-plane and the
probe inside the cluster, sim(x, selected_1) tracks cos(probe, x) to
first order for EVERY candidate, so lam=0.5 MMR degenerates to pure
relevance order.  Diversity needs a candidate whose similarity to the
selected set is small relative to its relevance — here a vector rotated
out-of-plane (toward e3) vs a tight in-plane near-duplicate.  Oracle
equality at sf0.01 is the gate entry mmr_topk."""

import math

from mircv_project_spark.operators.maxscore import round6
from mircv_project_spark.operators.similarity import mmr_topk


def _vecs():
    # p = e1; a1/a2 a tight in-plane pair (0.099 / 0.1 rad toward e2);
    # b1 rotated 0.12 rad toward e3: rel(b1) < rel(a2) but
    # sim(b1, a1) ≈ cos(.099)cos(.12) << sim(a2, a1) ≈ 1
    return [
        (0, [1.0, 0.0, 0.0]),
        (1, [math.cos(0.099), math.sin(0.099), 0.0]),
        (2, [math.cos(0.100), math.sin(0.100), 0.0]),
        (3, [math.cos(0.120), 0.0, math.sin(0.120)]),
    ]


def _cos(a, b):
    num = sum(x * y for x, y in zip(a, b))
    den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
    return round(num / den, 6)


def _model(vecs, probe_id, k, pool, lam):
    v = dict(vecs)
    p = v[probe_id]
    cand = sorted(
        ((_cos(p, v[i]), -i) for i in v if i != probe_id),
        key=lambda x: (-x[0], -x[1]),
    )[:pool]
    items = [(-ni, c) for c, ni in cand]
    sel = [items[0][0]]
    out = [(probe_id, items[0][0], 1, round6(lam * items[0][1]))]
    rest = dict(items[1:])
    for step in range(2, k + 1):
        if not rest:
            break
        best = None
        for nid, c in rest.items():
            m = max(_cos(v[nid], v[s]) for s in sel)
            obj = round6(lam * c - (1.0 - lam) * m)
            key = (-obj, nid)
            if best is None or key < best[0]:
                best = (key, nid, obj)
        _, nid, obj = best
        sel.append(nid)
        del rest[nid]
        out.append((probe_id, nid, step, obj))
    return out


def test_mmr_matches_model_and_diversifies(spark):
    vecs = _vecs()
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    rows = mmr_topk(emb, [0], k=3, pool=3).collect()
    got = sorted(
        (r["probe_id"], r["neighbor_id"], r["rank"], r["obj"]) for r in rows
    )
    exp = sorted(_model(vecs, 0, 3, 3, 0.5))
    assert got == exp
    # pure cosine order is a1, a2, b1; MMR must demote the near-dup a2
    order = [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert order == [1, 3, 2]
