"""Item-co-visitation PageRank (operators/graph.py): the distributed
integer-state iterations must match an independent pure-Python model of
the pinned rules, and behave sensibly (hub items rank highest, isolated
items keep only the base term)."""

import json

from mircv_project_spark.operators import graph as G


def _rha(a: int, b: int) -> int:
    return (2 * a + b) // (2 * b)


def _ref_pagerank(user_items: list[tuple[int, int]], iters: int):
    ui = set(user_items)
    nodes = sorted({i for _, i in ui})
    n = len(nodes)
    edges: dict[tuple[int, int], int] = {}
    for u, a in ui:
        for v, b in ui:
            if u == v and a != b:
                edges[(a, b)] = edges.get((a, b), 0) + 1
    outw: dict[int, int] = {}
    for (a, _), w in edges.items():
        outw[a] = outw.get(a, 0) + w
    pr = {v: _rha(G.PR_MICRO, n) for v in nodes}
    base = _rha(G.PR_MICRO, G.PR_D_DEN * n)
    for _ in range(iters):
        infl = {v: 0 for v in nodes}
        for (a, b), w in edges.items():
            infl[b] += _rha(pr[a] * w, outw[a])
        pr = {
            v: base + (_rha(G.PR_D_NUM * infl[v], G.PR_D_DEN) if infl[v] else 0)
            for v in nodes
        }
    return pr


def _events_df(spark, user_items):
    rows = [
        (i, 1700000000000000 + i, u, "view", 1.0, json.dumps({"k": item}))
        for i, (u, item) in enumerate(user_items)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "timestamp_micros(us) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_matches_reference_model(spark):
    # hub item 0 co-visited by everyone; a 2-clique (10, 11); an
    # isolated item 99; duplicate (user, item) rows must dedup
    user_items = (
        [(u, 0) for u in range(6)]
        + [(u, u + 1) for u in range(6)]
        + [(7, 10), (7, 11), (8, 10), (8, 11)]
        + [(9, 99), (9, 99)]
    )
    df = _events_df(spark, user_items)
    got = {r.item: r.pr_micro for r in G.item_pagerank(df).collect()}
    want = _ref_pagerank(user_items, G.PR_ITERS)
    assert got == want
    # hub ranks above every spoke; isolated item got base-only rank
    assert got[0] == max(got.values())
    n = len(want)
    assert got[99] == _rha(G.PR_MICRO, G.PR_D_DEN * n)


def test_null_and_malformed_props_dropped(spark):
    rows = [
        (0, 1700000000000000, 1, "view", 1.0, json.dumps({"k": 5})),
        (1, 1700000000000001, 1, "view", 1.0, json.dumps({"x": 9})),  # no k
        (2, 1700000000000002, 1, "view", 1.0, json.dumps({"k": 6})),
        (3, 1700000000000003, 2, "view", 1.0, json.dumps({"k": 5})),
        (4, 1700000000000004, 2, "view", 1.0, json.dumps({"k": 6})),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type", "value", "props",
    )
    got = {r.item: r.pr_micro for r in G.item_pagerank(df).collect()}
    assert set(got) == {5, 6}
    want = _ref_pagerank([(1, 5), (1, 6), (2, 5), (2, 6)], G.PR_ITERS)
    assert got == want


def test_item_communities_threshold_and_labels(spark):
    """Two planted cliques joined by a weak bridge: the 0.99-quantile
    threshold keeps only the strong edges, so the cliques stay separate
    components; isolated items label themselves."""
    # clique A = items 1,2 co-visited by 10 users; clique B = 5,6 by
    # 10 users; bridge 2-5 by 1 user; isolated item 9 by 1 user
    user_items = (
        [(u, 1) for u in range(10)]
        + [(u, 2) for u in range(10)]
        + [(u + 100, 5) for u in range(10)]
        + [(u + 100, 6) for u in range(10)]
        + [(200, 2), (200, 5)]
        + [(300, 9)]
    )
    df = _events_df(spark, user_items)
    got = {r.item: r.community for r in G.item_communities(df).collect()}
    # edge weights: (1,2)=10, (5,6)=10, (2,5)=1 (plus (1,?)...); the
    # 0.99 quantile of [1, 10, 10] interpolates near 10 -> bridge cut
    assert got[1] == 1 and got[2] == 1
    assert got[5] == 5 and got[6] == 5
    assert got[9] == 9


def test_triangle_counts_planted(spark):
    """A 4-clique (items 1-4), a dangling edge (4-7), and an isolated
    item: K4 has C(3,2)=3 triangles per member; the dangling and
    isolated items count 0."""
    user_items = []
    # 4-clique: one user per pair so every pair is co-visited
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    for u, (a, b) in enumerate(pairs):
        user_items += [(u, a), (u, b)]
    user_items += [(100, 4), (100, 7)]  # dangling edge
    user_items += [(200, 9)]  # isolated
    df = _events_df(spark, user_items)
    got = {r.item: r.n_tri for r in G.triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 7: 0, 9: 0}


def test_triangle_counts_orientation_independent(spark):
    """The degree-oriented enumeration must match a brute-force count
    on a slightly irregular graph (hub + two triangles sharing it)."""
    import itertools

    user_items = []
    # hub 1 connected to 2..6; extra edges (2,3) and (5,6)
    for u, it in enumerate([2, 3, 4, 5, 6]):
        user_items += [(u, 1), (u, it)]
    user_items += [(50, 2), (50, 3), (51, 5), (51, 6)]
    df = _events_df(spark, user_items)
    got = {r.item: r.n_tri for r in G.triangle_counts(df).collect()}

    edges = {(1, i) for i in [2, 3, 4, 5, 6]} | {(2, 3), (5, 6)}
    nodes = sorted({x for e in edges for x in e})
    want = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            (min(a, b), max(a, b)) in edges
            and (min(b, c), max(b, c)) in edges
            and (min(a, c), max(a, c)) in edges
        ):
            for x in (a, b, c):
                want[x] += 1
    assert got == want


def test_item_bfs_python_model_and_isolated_seed(spark):
    """item_bfs vs a pure-Python BFS over the same strong-edge rule at
    sf0.001, plus the isolated-seed pin (dist-0 row always emitted —
    seed 9999 is not an item)."""
    import math
    from collections import defaultdict

    from mircv_project_spark.operators.graph import item_bfs
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    got = sorted(
        (r["seed"], r["item"], r["dist"])
        for r in item_bfs(ev, [0, 7, 13, 9999]).collect()
    )

    import json

    rows = ev.select("user_id", "props").collect()
    ui = {
        (r["user_id"], int(json.loads(r["props"])["k"]))
        for r in rows
        if json.loads(r["props"]).get("k") is not None
    }
    by_user = defaultdict(set)
    for u, i in ui:
        by_user[u].add(i)
    w = defaultdict(int)
    for items in by_user.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                w[(s[x], s[y])] += 1
    ws = sorted(w.values())
    # linear-interpolated 0.99 quantile (numpy 'linear' == percentile)
    import numpy as np

    q = float(np.percentile(ws, 99))
    thr = math.ceil(q - 1e-6)
    adj = defaultdict(set)
    for (a, b), v in w.items():
        if v >= thr:
            adj[a].add(b)
            adj[b].add(a)
    exp = []
    for seed in [0, 7, 13, 9999]:
        dist = {seed: 0}
        frontier = [seed]
        for hop in range(1, 4):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        exp.extend((seed, i, d) for i, d in dist.items())
    assert got == sorted(exp)
    assert (9999, 9999, 0) in got


def test_item_similarity_hand_computed(spark):
    """Tiny CF example: users {1,2} share items, cosine by hand."""
    import datetime as dt

    from mircv_project_spark.operators.graph import item_similarity_topk

    t = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # item 1: users {1,2}; item 2: users {1,2,3}; item 3: user {3}
    for u, i in [(1, 1), (2, 1), (1, 2), (2, 2), (3, 2), (3, 3)]:
        rows.append((eid, t, u, "view", 0.0, '{"k": %d}' % i))
        eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["item"], r["neighbor"]): (r["n_common"], r["sim"], r["rank"])
        for r in item_similarity_topk(ev, k=3).collect()
    }
    import math

    s12 = round(2 / math.sqrt(2 * 3), 6)
    s23 = round(1 / math.sqrt(3 * 1), 6)
    assert got == {
        (1, 2): (2, s12, 1),
        (2, 1): (2, s12, 1),
        (2, 3): (1, s23, 2),
        (3, 2): (1, s23, 1),
    }


def test_item_adamic_adar_hand_computed(spark):
    # users: u1 -> {1,2}, u2 -> {1,2,3}, u3 -> {3}
    # deg: u1=2, u2=3, u3=1
    # AA(1,2) = 1/log10(2) + 1/log10(3); AA(1,3) = 1/log10(3)
    import math

    ui = [(1, 1), (1, 2), (2, 1), (2, 2), (2, 3), (3, 3)]
    out = {
        (r.item, r.neighbor): r
        for r in G.item_adamic_adar_topk(_events_df(spark, ui)).collect()
    }

    def micro(d):
        return round(1_000_000.0 / math.log10(d))

    w2, w3 = micro(2), micro(3)
    assert out[(1, 2)].score == round((w2 + w3) / 1e6, 6)
    assert out[(1, 2)].n_common == 2
    assert out[(1, 3)].score == round(w3 / 1e6, 6)
    assert out[(3, 1)].n_common == 1
    # rank within item 1: neighbor 2 (two common users) above 3
    assert out[(1, 2)].rank == 1 and out[(1, 3)].rank == 2


def test_assoc_rules_matches_python_model(spark):
    """Rules against a brute-force Python model of the pinned
    support/confidence/lift/rank semantics (floor lowered to 2 so the
    tiny fixture emits rows)."""
    user_items = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 10), (3, 11), (3, 13),
        (4, 10), (4, 12),
        (5, 11), (5, 12),
    ]
    df = G.item_assoc_rules(_events_df(spark, user_items), min_supp=2, k=3)
    got = {
        (r.item_a, r.item_b): (
            r.supp_pair, r.supp_a, r.supp_b, r.conf_micro, r.lift, r.rank
        )
        for r in df.collect()
    }

    ui = set(user_items)
    users = {u for u, _ in ui}
    n = len(users)
    supp: dict[int, int] = {}
    for _, i in ui:
        supp[i] = supp.get(i, 0) + 1
    pair: dict[tuple[int, int], int] = {}
    for u, a in ui:
        for v, b in ui:
            if u == v and a != b:
                pair[(a, b)] = pair.get((a, b), 0) + 1
    rows = []
    for (a, b), p in pair.items():
        if p < 2:
            continue
        conf = (2 * 1_000_000 * p + supp[a]) // (2 * supp[a])
        lift = round((float(p) * float(n)) / (float(supp[a]) * float(supp[b])), 6)
        rows.append((a, b, p, supp[a], supp[b], conf, lift))
    want = {}
    by_a: dict[int, list] = {}
    for row in rows:
        by_a.setdefault(row[0], []).append(row)
    for a, rs in by_a.items():
        rs.sort(key=lambda r: (-r[5], r[1]))
        for rank, r in enumerate(rs[:3], 1):
            want[(r[0], r[1])] = (r[2], r[3], r[4], r[5], r[6], rank)
    assert got == want
    # sanity: 10 -> 11 is the strongest rule from 10 (3 of 4 holders)
    assert got[(10, 11)][5] == 1 and got[(10, 11)][3] == 750000


def test_hits_matches_python_model(spark):
    """HITS against a brute-force Python model of the pinned integer
    L-infinity iterations (auth-then-hub order, rha by the max)."""
    user_items = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 10),
        (4, 13),
    ]
    got = {
        (r.kind, r.id): r.score_micro
        for r in G.item_hits(_events_df(spark, user_items)).collect()
    }

    ui = set(user_items)
    users = sorted({u for u, _ in ui})
    items = sorted({i for _, i in ui})
    hub = {u: 1_000_000 for u in users}
    auth = {}
    for _ in range(G.HITS_ITERS):
        ra = {i: sum(hub[u] for (u, i2) in ui if i2 == i) for i in items}
        m = max(ra.values())
        auth = {i: _rha(1_000_000 * v, m) for i, v in ra.items()}
        rh = {u: sum(auth[i] for (u2, i) in ui if u2 == u) for u in users}
        m = max(rh.values())
        hub = {u: _rha(1_000_000 * v, m) for u, v in rh.items()}
    want = {("auth", i): auth[i] for i in items}
    want.update({("hub", u): hub[u] for u in users})
    assert got == want
    # item 10 (touched by 3 of 4 users) is the top authority
    assert got[("auth", 10)] == max(
        v for (k, _), v in got.items() if k == "auth"
    )
