"""Graph analytics over event-derived graphs: weighted PageRank on the
item co-visitation graph.

The graph the events table implies: items (the `props` JSON key 'k')
are nodes; an undirected weighted edge joins two items co-visited by a
user, weight = number of distinct users who touched both (the classic
item-based collaborative-filtering graph).  PageRank over it ranks
items by recommendation centrality.

Why an ITERATIVE graph algorithm can sit under the hash gate (same
trick as clustering.py's k-means): the entire state is integer.
Rank is stored in micro units (PR_MICRO); every division uses the
pure-integer round-half-away identity

    rha(a / b) = (2a + b) DIV (2b)        (a >= 0, b > 0)

so no double ever appears — per-edge contributions, the damping, and
the base term are all exact BIGINT arithmetic, order-independent
across shuffle partitions and bit-identical across engines.  A float
PageRank would be shuffle-order-dependent at the 6th decimal.

Pinned semantics (restated verbatim in the unrolled-CTE oracle —
change both sides or neither): damping d = 7/8 (DYADIC — do not tune
to 0.85 without reworking the integer identities), PR_ITERS = 3,
PR_MICRO = 1e6; pr0(v) = rha(1e6 / N); per step
    inflow(v) = sum over edges u->v of rha(pr(u) * w(u,v) / outw(u))
    pr'(v)    = rha(1e6 / (8 N)) + rha(7 * inflow(v) / 8)
isolated nodes (no edges) keep only the base term.  Mass is not
re-normalized for dangling nodes — the co-visitation graph is
symmetric, so every node with an in-edge has out-weight; isolated
nodes simply decay, and the rule is pinned identically on both sides.

Scale shape (100 TB): the user-item incidence dedup and the per-user
self-join are the item-CF shapes (bounded by per-user item counts —
heavy users are the skew to cap upstream); each iteration is one
edge-keyed join against the current rank table plus one item-keyed
agg — the standard distributed PageRank step.  Per-step ranks persist
and localCheckpoint to keep lineage flat; nothing collects to the
driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

PR_MICRO = 1_000_000
PR_ITERS = 3
PR_D_NUM = 7  # damping 7/8, dyadic
PR_D_DEN = 8


def _rha(num: Column, den: Column) -> Column:
    """Integer round-half-away division for non-negative numerators:
    (2a + b) DIV (2b), exact BIGINT arithmetic end to end."""
    a = num.cast("long")
    b = den.cast("long")
    return ((F.lit(2) * a + b) - F.pmod(F.lit(2) * a + b, F.lit(2) * b)) / (
        F.lit(2) * b
    )


def _covisit_edges(events: DataFrame) -> DataFrame:
    """-> (ia, ib, w): both directions of the undirected co-visitation
    graph; w = distinct users having both items."""
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct()
    a, b = ui.alias("a"), ui.alias("b")
    return (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("ia"), F.col("b.item").alias("ib")
        )
        .agg(F.count("*").alias("w"))
    )


def item_pagerank(
    events: DataFrame,
    iters: int = PR_ITERS,
) -> DataFrame:
    """-> (item, pr_micro): integer-state weighted PageRank over the
    item co-visitation graph after `iters` synchronous iterations."""
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct()
    nodes = ui.select("item").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    edges = None
    pr = None
    try:
        n = nodes.count()
        a, b = ui.alias("a"), ui.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
            .agg(F.count("*").alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        outw = edges.groupBy(F.col("ia").alias("item")).agg(
            F.sum("w").alias("ow")
        )
        # edges carry the source's out-weight so each iteration is one
        # join against the current ranks (outw never changes)
        ew = edges.join(outw, edges["ia"] == outw["item"]).select(
            "ia", "ib", "w", "ow"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            pr = nodes.select(
                "item",
                _rha(F.lit(PR_MICRO), F.lit(n)).cast("long").alias("pr"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
            base = int(
                (2 * PR_MICRO + PR_D_DEN * n) // (2 * PR_D_DEN * n)
            )  # rha(1e6 / (8N)), driver-side exact int
            for _ in range(iters):
                contrib = (
                    ew.join(pr, ew["ia"] == pr["item"])
                    .select(
                        F.col("ib").alias("item"),
                        _rha(F.col("pr") * F.col("w"), F.col("ow"))
                        .cast("long")
                        .alias("c"),
                    )
                    .groupBy("item")
                    .agg(F.sum("c").alias("infl"))
                )
                nxt = (
                    nodes.join(contrib, "item", "left")
                    .select(
                        "item",
                        (
                            F.lit(base)
                            + F.coalesce(
                                _rha(
                                    F.lit(PR_D_NUM)
                                    * F.col("infl"),
                                    F.lit(PR_D_DEN),
                                ).cast("long"),
                                F.lit(0),
                            )
                        ).cast("long").alias("pr"),
                    )
                    .localCheckpoint()
                )
                pr.unpersist()
                pr = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            out = pr.select(
                "item", F.col("pr").cast("long").alias("pr_micro")
            ).localCheckpoint()
        finally:
            ew.unpersist()
    finally:
        if edges is not None:
            edges.unpersist()
        if pr is not None:
            pr.unpersist()
        nodes.unpersist()
    return out


COVISIT_Q = 0.99  # strong-edge quantile for the community graph
_Q_EPS = 1e-6


def item_communities(events: DataFrame) -> DataFrame:
    """Connected components over the STRONG co-visitation edges ->
    (item, community) with community = min reachable item id;
    singletons (and items with only weak edges) label themselves.

    Edge threshold is RELATIVE (an absolute weight is corpus-size-
    dependent): keep edges with w >= ceil(q - 1e-6) where q is the
    0.99 interpolated quantile of edge weights — the epsilon guard
    keeps a sub-round-6 engine difference in the interpolation from
    flipping integer-weight boundary edges (same percentile-parity
    assumption as event_props_rollup, same guard idea as the prefix
    join's ceil).  Components = dedup.dup_components' join-based
    min-label propagation — graph machinery shared, not re-derived.

    Scale shape: the quantile is the one O(edges) aggregate (collected
    as a scalar); thresholding is a map filter; propagation rounds are
    id-keyed joins bounded by the strong-edge diameter."""
    from .dedup import dup_components

    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        a, b = ui.alias("a"), ui.alias("b")
        e = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") < F.col("b.item")),
            )
            .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
            .agg(F.count("*").alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            q = e.agg(
                F.percentile(F.col("w"), F.lit(COVISIT_Q)).alias("q")
            ).collect()[0]["q"]
            import math

            thr = int(math.ceil(q - _Q_EPS))
            pairs = e.where(F.col("w") >= thr).select(
                F.col("ia").alias("id_a"), F.col("ib").alias("id_b")
            )
            comp = dup_components(pairs)
            nodes = ui.select("item").distinct()
            out = (
                nodes.join(comp, nodes.item == comp.id, "left")
                .select(
                    "item",
                    F.coalesce(F.col("component"), F.col("item"))
                    .cast("long")
                    .alias("community"),
                )
                .localCheckpoint()
            )
        finally:
            e.unpersist()
    finally:
        ui.unpersist()
    return out


def triangle_counts(events: DataFrame) -> DataFrame:
    """-> (item, n_tri): per-item triangle count over the UNWEIGHTED
    co-visitation graph (every distinct-user co-visited pair is an
    edge).  The local clustering coefficient's numerator — the standard
    cohesion signal on an item-CF graph.

    Exactness: the output (which triangles exist) is orientation-
    independent, so the engine is free to pick the orientation that
    bounds work while the oracle uses the simple id order — both
    enumerate the same triangle set.

    Scale shape (node-iterator++ / degree orientation): orient every
    edge from its lower (degree, id) endpoint to the higher.  The
    oriented graph is a DAG where each vertex's out-degree is bounded
    by O(sqrt(E)) on any graph, so the wedge join (out-edges joined
    with out-edges on the source) never explodes on hub items the way
    an id-ordered orientation can.  Each triangle is found exactly
    once: from its unique minimal-(degree, id) vertex.  Plan: two
    shuffles (degree agg, wedge join) + one semi-join to close wedges
    against the undirected edge set.
    """
    ui = (
        events.select(
            F.col("user_id").cast("long").alias("u"),
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    a, b = ui.alias("a"), ui.alias("b")
    und = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .select(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        nodes = ui.select("item").distinct()
        deg = (
            und.select(F.col("x").alias("item"))
            .unionAll(und.select(F.col("y").alias("item")))
            .groupBy("item")
            .agg(F.count("*").alias("deg"))
        )
        # orient x->y from lower (deg, id); both endpoints need their
        # degree — two broadcast-able joins at gate scale, item-keyed
        # shuffle joins at 100 TB (deg is one row per node)
        dx = deg.select(F.col("item").alias("x"), F.col("deg").alias("degx"))
        dy = deg.select(F.col("item").alias("y"), F.col("deg").alias("degy"))
        lower_first = (F.col("degx") < F.col("degy")) | (
            (F.col("degx") == F.col("degy")) & (F.col("x") < F.col("y"))
        )
        oriented = (
            und.join(dx, "x")
            .join(dy, "y")
            .select(
                F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("s"),
                F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("d"),
            )
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            e1, e2 = oriented.alias("e1"), oriented.alias("e2")
            wedges = e1.join(
                e2,
                (F.col("e1.s") == F.col("e2.s"))
                & (F.col("e1.d") < F.col("e2.d")),
            ).select(
                F.col("e1.s").alias("a"),
                F.col("e1.d").alias("b"),
                F.col("e2.d").alias("c"),
            )
            # close the wedge against the undirected set ((b, c) is
            # already min/max ordered by the d1 < d2 wedge condition)
            tri = wedges.join(
                und,
                (wedges.b == und.x) & (wedges.c == und.y),
                "left_semi",
            ).persist(StorageLevel.MEMORY_AND_DISK)
            try:
                members = (
                    tri.select(F.col("a").alias("item"))
                    .unionAll(tri.select(F.col("b").alias("item")))
                    .unionAll(tri.select(F.col("c").alias("item")))
                    .groupBy("item")
                    .agg(F.count("*").alias("n_tri"))
                )
                out = (
                    nodes.join(members, "item", "left")
                    .select(
                        "item",
                        F.coalesce(F.col("n_tri"), F.lit(0))
                        .cast("long")
                        .alias("n_tri"),
                    )
                    .localCheckpoint()
                )
            finally:
                tri.unpersist()
        finally:
            oriented.unpersist()
    finally:
        und.unpersist()
    return out


BFS_HOPS = 3


def item_bfs(events: DataFrame, seeds: list[int], max_hops: int = BFS_HOPS) -> DataFrame:
    """-> (seed, item, dist): min-hop distances (<= max_hops) from each
    pinned seed item over the STRONG co-visitation graph — the
    traversal member of the graph family beside PageRank / triangles /
    communities.  All-integer (hop counts), so trivially hash-exact.

    Pinned semantics (restated in the unrolled-CTE oracle — change
    both sides or neither): edges/threshold are item_communities'
    exactly (half-pairs ia < ib, keep w >= ceil(q99(w) − 1e-6), then
    symmetrize); seeds always emit their dist-0 row, even isolated;
    level k = neighbors of level k−1 not seen at any earlier level
    (join-based frontier expansion — the distributed BFS step).

    Scale shape (100 TB): each hop is one edge-keyed equi-join of the
    frontier against the strong-edge table plus an anti-join against
    the visited set; frontiers localCheckpoint per hop so Catalyst
    never replans the whole chain (the dup_components lesson).  Hop
    count is a constant — no convergence loop."""
    import math

    spark = events.sparkSession
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct()
    a, b = ui.alias("a"), ui.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.u") == F.col("b.u"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
        .agg(F.count("*").alias("w"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        q = e.agg(
            F.percentile(F.col("w"), F.lit(COVISIT_Q)).alias("q")
        ).collect()[0]["q"]
        if q is None:  # no edges at all
            thr = 0
        else:
            thr = int(math.ceil(q - _Q_EPS))
        strong = e.where(F.col("w") >= thr).select("ia", "ib")
        edges = strong.unionByName(
            strong.select(
                F.col("ib").alias("ia"), F.col("ia").alias("ib")
            )
        ).localCheckpoint()
    finally:
        e.unpersist()

    dist = spark.createDataFrame(
        [(int(s), int(s), 0) for s in seeds], "seed long, item long, dist long"
    ).localCheckpoint()
    frontier = dist
    for hop in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(edges, frontier.item == edges.ia)
            .select("seed", F.col("ib").alias("item"))
            .distinct()
            .join(dist.select("seed", "item"), ["seed", "item"], "left_anti")
            .select("seed", "item", F.lit(hop).cast("long").alias("dist"))
            .localCheckpoint()
        )
        dist = dist.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return dist


ITEMSIM_K = 3


def item_similarity_topk(events: DataFrame, k: int = ITEMSIM_K) -> DataFrame:
    """-> (item, neighbor, n_common, sim, rank): item-item
    collaborative-filtering cosine over BINARY user vectors —
    sim(a, b) = |U_a ∩ U_b| / sqrt(|U_a| · |U_b|) — the recommender
    scoring the co-visitation graph ops (pagerank/communities/
    transitions) rank structure over.

    Exactness: intersection and degree counts are exact integers; the
    norm product is one sqrt of an exact integer product (factors cast
    to double BEFORE multiplying — the pmi overflow pin) and the
    division rounds to 6.  Rank (sim desc, neighbor asc) top k per
    item; items sharing no user emit nothing.

    Scale shape (100 TB): the user-item incidence dedups once; the
    per-user self-join is the item-CF candidate generator (bounded by
    per-user item counts — cap heavy users upstream, same note as
    _covisit_edges); degrees broadcast onto the pair aggregate."""
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        deg = ui.groupBy("item").agg(F.count("*").alias("d"))
        a, b = ui.alias("a"), ui.alias("b")
        common = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .groupBy(F.col("a.item").alias("item"), F.col("b.item").alias("nb"))
            .agg(F.count("*").alias("n_common"))
        )
        sim = F.round(
            F.col("n_common").cast("double")
            / F.sqrt(F.col("da").cast("double") * F.col("db").cast("double")),
            6,
        )
        scored = (
            common.join(
                F.broadcast(deg.select(F.col("item").alias("item"), F.col("d").alias("da"))),
                "item",
            )
            .join(
                F.broadcast(deg.select(F.col("item").alias("nb"), F.col("d").alias("db"))),
                "nb",
            )
            .select("item", "nb", "n_common", sim.alias("sim"))
        )
        w = Window.partitionBy("item").orderBy(
            F.col("sim").desc(), F.col("nb").asc()
        )
        out = (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                F.col("item").cast("long").alias("item"),
                F.col("nb").cast("long").alias("neighbor"),
                F.col("n_common").cast("long").alias("n_common"),
                "sim",
                "rank",
            )
            .localCheckpoint()
        )
    finally:
        ui.unpersist()
    return out


TEXTRANK_K = 3
TEXTRANK_ITERS = PR_ITERS


def textrank_keywords(
    docs: DataFrame,
    k: int = TEXTRANK_K,
    iters: int = TEXTRANK_ITERS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Graph-based keyword extraction (TextRank, Mihalcea & Tarau,
    EMNLP 2004): per document, distinct terms are nodes, an undirected
    edge joins ADJACENT distinct terms with weight = count of adjacent
    occurrences in either order, and weighted PageRank ranks terms by
    centrality — the graph sibling of textstats.top_keywords' tf-idf
    ranking (TextRank needs no corpus statistics at all: a single doc
    scores in isolation).

    -> (id, term, pr_micro, rank): top-k terms per doc after `iters`
    synchronous iterations, rank (pr_micro desc, term asc).

    Integer discipline — item_pagerank's pins, per-doc (restated
    verbatim in the unrolled-CTE oracle; change both sides or
    neither): rank state in micro BIGINTs, every division the
    round-half-away identity rha(a/b) = (2a+b) DIV (2b), damping 7/8
    dyadic, pr0 = rha(1e6/N_d), base = rha(1e6/(8 N_d)) with N_d the
    DOC's node count, inflow contributions rha(pr(u)*w/outw(u))
    quantized per edge BEFORE the sum, single-node/isolated terms keep
    only the base term.

    Scale shape: every frame is keyed (id, term) or (id, a, b) — per-
    doc graphs ride one corpus-wide shuffle per stage, iterations are
    edge-keyed joins against the current rank table (the distributed
    PageRank step), heavy docs bound work by their own length.  Ranks
    persist + localCheckpoint per step (flat lineage, the
    item_pagerank discipline)."""
    from ..functions.textnorm import tokens_col

    posx = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )
    nodes = posx.select("id", "term").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ew = None
    pr = None
    try:
        nd = nodes.groupBy("id").agg(F.count("*").cast("long").alias("n"))
        p1 = posx.select("id", "pos", F.col("term").alias("a"))
        p2 = posx.select(
            "id", (F.col("pos") - 1).alias("pos"), F.col("term").alias("b")
        )
        adj = p1.join(p2, ["id", "pos"]).where(F.col("a") != F.col("b"))
        und = (
            adj.select("id", "a", "b")
            .unionByName(
                adj.select(
                    "id", F.col("b").alias("a"), F.col("a").alias("b")
                )
            )
            .groupBy("id", "a", "b")
            .agg(F.count("*").cast("long").alias("w"))
        )
        outw = (
            und.groupBy(
                F.col("id").alias("oid"), F.col("a").alias("ou")
            )
            .agg(F.sum("w").alias("ow"))
        )
        ew = (
            und.join(
                outw,
                (und["id"] == outw["oid"]) & (und["a"] == outw["ou"]),
            )
            .select(und["id"], "a", "b", "w", "ow")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        ndn = nodes.join(nd, "id")
        pr = ndn.select(
            "id",
            "term",
            _rha(F.lit(PR_MICRO), F.col("n")).cast("long").alias("pr"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        base = _rha(F.lit(PR_MICRO), F.lit(PR_D_DEN) * F.col("n")).cast(
            "long"
        )
        for _ in range(iters):
            prj = pr.select(
                F.col("id").alias("pid"),
                F.col("term").alias("pterm"),
                "pr",
            )
            contrib = (
                ew.join(
                    prj,
                    (ew["id"] == prj["pid"]) & (ew["a"] == prj["pterm"]),
                )
                .select(
                    ew["id"],
                    F.col("b").alias("term"),
                    _rha(F.col("pr") * F.col("w"), F.col("ow"))
                    .cast("long")
                    .alias("c"),
                )
                .groupBy("id", "term")
                .agg(F.sum("c").alias("infl"))
            )
            nxt = (
                ndn.join(contrib, ["id", "term"], "left")
                .select(
                    "id",
                    "term",
                    (
                        base
                        + F.coalesce(
                            _rha(
                                F.lit(PR_D_NUM) * F.col("infl"),
                                F.lit(PR_D_DEN),
                            ).cast("long"),
                            F.lit(0).cast("long"),
                        )
                    ).cast("long").alias("pr"),
                )
                .localCheckpoint()
            )
            pr.unpersist()
            pr = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        w = Window.partitionBy("id").orderBy(
            F.col("pr").desc(), F.col("term").asc()
        )
        out = (
            pr.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                "id",
                "term",
                F.col("pr").cast("long").alias("pr_micro"),
                "rank",
            )
        )
        return out.localCheckpoint()
    finally:
        nodes.unpersist()
        if ew is not None:
            ew.unpersist()
        if pr is not None:
            pr.unpersist()


AA_K = 3
_AA_MICRO = 1_000_000.0


def item_adamic_adar_topk(events: DataFrame, k: int = AA_K) -> DataFrame:
    """-> (item, neighbor, n_common, score, rank): Adamic-Adar
    weighted item-item affinity over the user-item bipartite incidence
    (Adamic & Adar, Social Networks 2003) — the link-prediction scorer
    beside the binary-cosine CF of item_similarity_topk: each common
    user u contributes 1/log10(deg_u), so promiscuous users (many
    items) count less than selective ones.

    Exactness (restated in oracle._ITEM_AA_SQL — change both or
    neither): deg_u = distinct items per user (a user in any pair has
    deg >= 2, so log10(deg) >= log10(2) > 0 — no division hazard);
    per-user contribution micro-quantized round(1e6 / log10(deg_u))
    BIGINT BEFORE the per-pair sum (a float sum of inverse logs is
    shuffle-order-dependent at round 6; log10 parity is the accepted
    1-ulp class of the other log10 gates); score = micro-sum / 1e6
    round 6; rank (micro desc, neighbor asc) top k per item; items
    sharing no user emit nothing.

    Scale shape (100 TB): same candidate generator as
    item_similarity_topk (per-user self-join over the deduped
    incidence — cap heavy users upstream); user degrees ride the join
    before the pair aggregate, so the shuffle carries (item, nb)
    partial sums only."""
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        udeg = ui.groupBy("u").agg(F.count("*").alias("d"))
        wmicro = F.round(
            F.lit(_AA_MICRO) / F.log10(F.col("d").cast("double"))
        ).cast("long")
        a, b = ui.alias("a"), ui.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .join(udeg.withColumnRenamed("u", "du"),
                  F.col("a.u") == F.col("du"))
            .groupBy(
                F.col("a.item").alias("item"), F.col("b.item").alias("neighbor")
            )
            .agg(
                F.count("*").cast("long").alias("n_common"),
                F.sum(wmicro).cast("long").alias("micro"),
            )
        )
        w = Window.partitionBy("item").orderBy(
            F.col("micro").desc(), F.col("neighbor").asc()
        )
        out = (
            pairs.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                "item",
                "neighbor",
                "n_common",
                F.round(F.col("micro") / F.lit(_AA_MICRO), 6).alias("score"),
                "rank",
            )
            .localCheckpoint()
        )
    finally:
        ui.unpersist()
    return out


PPR_SEEDS_DEFAULT = (0, 7, 13)  # shares oracle.BFS_SEEDS


def item_personalized_pagerank(
    events: DataFrame,
    seeds: list[int] = None,
    iters: int = PR_ITERS,
) -> DataFrame:
    """-> (item, pr_micro): personalized (topic-sensitive) PageRank —
    the random walk restarts at the SEED items instead of uniformly,
    so rank mass concentrates around the seeds' neighborhood (the
    recommender's "related to these items" ranking; Haveliwala WWW
    2002).

    Inherits item_pagerank's integer discipline VERBATIM (rha
    round-half-away BIGINT division, damping 7/8, micro state, 3
    iterations, same co-visitation edges) with the ONE semantic
    change, restated in oracle._ppr_sql (change both sides or
    neither): pr0(v) = rha(1e6/|S|) for seeds else 0, and the
    teleport base rha(1e6/(8|S|)) is paid ONLY to seeds — non-seed
    nodes hold pure damped inflow, so isolated non-seeds sit at 0
    (emitted; all nodes emit a row).  |S| counts the PINNED seed list
    whether or not every seed appears in the graph.

    Scale shape: identical to item_pagerank — the seed restriction
    changes no join; each iteration is one edge⋈rank join with the
    out-weights precomputed."""
    if seeds is None:
        seeds = list(PPR_SEEDS_DEFAULT)
    ns = len(seeds)
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct()
    nodes = ui.select("item").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    edges = None
    pr = None
    try:
        a, b = ui.alias("a"), ui.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .groupBy(F.col("a.item").alias("ia"), F.col("b.item").alias("ib"))
            .agg(F.count("*").alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        outw = edges.groupBy(F.col("ia").alias("item")).agg(
            F.sum("w").alias("ow")
        )
        ew = edges.join(outw, edges["ia"] == outw["item"]).select(
            "ia", "ib", "w", "ow"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            is_seed = F.col("item").isin(list(seeds))
            pr0_val = int((2 * PR_MICRO + ns) // (2 * ns))  # rha(1e6/|S|)
            base = int(
                (2 * PR_MICRO + PR_D_DEN * ns) // (2 * PR_D_DEN * ns)
            )  # rha(1e6 / (8|S|))
            pr = nodes.select(
                "item",
                F.when(is_seed, F.lit(pr0_val))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("pr"),
            ).persist(StorageLevel.MEMORY_AND_DISK)
            for _ in range(iters):
                contrib = (
                    ew.join(pr, ew["ia"] == pr["item"])
                    .select(
                        F.col("ib").alias("item"),
                        _rha(F.col("pr") * F.col("w"), F.col("ow"))
                        .cast("long")
                        .alias("c"),
                    )
                    .groupBy("item")
                    .agg(F.sum("c").alias("infl"))
                )
                nxt = (
                    nodes.join(contrib, "item", "left")
                    .select(
                        "item",
                        (
                            F.when(is_seed, F.lit(base)).otherwise(F.lit(0))
                            + F.coalesce(
                                _rha(
                                    F.lit(PR_D_NUM) * F.col("infl"),
                                    F.lit(PR_D_DEN),
                                ).cast("long"),
                                F.lit(0),
                            )
                        ).cast("long").alias("pr"),
                    )
                    .localCheckpoint()
                )
                pr.unpersist()
                pr = nxt.persist(StorageLevel.MEMORY_AND_DISK)
            out = pr.select(
                "item", F.col("pr").cast("long").alias("pr_micro")
            ).localCheckpoint()
        finally:
            ew.unpersist()
    finally:
        if edges is not None:
            edges.unpersist()
        if pr is not None:
            pr.unpersist()
        nodes.unpersist()
    return out


ASSOC_MIN_SUPP = 5
ASSOC_K = 3
_ASSOC_MICRO = 1_000_000


def item_assoc_rules(
    events: DataFrame,
    min_supp: int = ASSOC_MIN_SUPP,
    k: int = ASSOC_K,
) -> DataFrame:
    """-> (item_a, item_b, supp_pair, supp_a, supp_b, conf_micro,
    lift, rank): association rules a -> b over the user-item baskets
    (Agrawal & Srikant, VLDB 1994 — the market-basket support /
    confidence / lift triple), the rule miner beside the
    co-visitation CF scorers.

    Basket = a user's DISTINCT item set (the item_pagerank incidence:
    item = props '$.k' cast long, nulls dropped).  supp(x) = distinct
    users holding x; supp_pair = distinct users holding both;
    N = distinct users with >= 1 item.

    Pinned semantics (restated verbatim in oracle._ASSOC_SQL — change
    both sides or neither): ORDERED pairs a != b (confidence is
    asymmetric); floor supp_pair >= 5; confidence micro-quantized by
    the INTEGER round-half-away identity conf_micro =
    (2*1e6*supp_pair + supp_a) DIV (2*supp_a) — exact BIGINT, no
    float division in the ranked quantity; lift = (pair_d * N_d) /
    (sa_d * sb_d) with every factor cast to DOUBLE before multiplying
    (the pmi parenthesization — BIGINT products overflow at scale),
    round 6 — lift is a reported measure, never ranked on; rank per
    antecedent (conf_micro desc, item_b asc) top k = 3.

    Scale shape (100 TB): the same deduped-incidence per-user
    self-join as the CF scorers (heavy users are the skew to cap
    upstream); supports ride two broadcastable item-keyed joins; the
    rank window partitions by antecedent."""
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        n_users = ui.select("u").distinct().count()
        supp = ui.groupBy("item").agg(F.count("*").cast("long").alias("s"))
        a, b = ui.alias("a"), ui.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .groupBy(
                F.col("a.item").alias("item_a"),
                F.col("b.item").alias("item_b"),
            )
            .agg(F.count("*").cast("long").alias("supp_pair"))
            .where(F.col("supp_pair") >= min_supp)
        )
        sa = supp.select(
            F.col("item").alias("item_a"), F.col("s").alias("supp_a")
        )
        sb = supp.select(
            F.col("item").alias("item_b"), F.col("s").alias("supp_b")
        )
        joined = pairs.join(sa, "item_a").join(sb, "item_b")
        conf_micro = F.expr(
            f"(2 * {_ASSOC_MICRO} * supp_pair + supp_a)"
            " DIV (2 * supp_a)"
        ).cast("long")
        lift = F.round(
            (
                F.col("supp_pair").cast("double")
                * F.lit(float(n_users))
            )
            / (
                F.col("supp_a").cast("double")
                * F.col("supp_b").cast("double")
            ),
            6,
        )
        w = Window.partitionBy("item_a").orderBy(
            F.col("conf_micro").desc(), F.col("item_b").asc()
        )
        out = (
            joined.withColumn("conf_micro", conf_micro)
            .withColumn("lift", lift)
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select(
                "item_a",
                "item_b",
                "supp_pair",
                "supp_a",
                "supp_b",
                "conf_micro",
                "lift",
                "rank",
            )
            .localCheckpoint()
        )
    finally:
        ui.unpersist()
    return out


HITS_ITERS = 3


def item_hits(events: DataFrame, iters: int = HITS_ITERS) -> DataFrame:
    """-> (kind, id, score_micro): HITS hubs & authorities (Kleinberg,
    JACM 1999) over the DIRECTED user->item incidence — users are
    hubs (good taste finds good items), items are authorities; the
    mutual-reinforcement ranking beside PageRank's random walk.

    Integer discipline (what makes an iterative algorithm
    hash-gateable — the item_pagerank trick, L-infinity normalization
    instead of L2 because max + rha stay in exact BIGINT): state is
    micro units; per iteration, IN THIS ORDER (pinned),

        raw_auth(i) = sum over u->i of hub(u)          (exact BIGINT)
        auth(i)     = rha(1e6 * raw_auth(i), max_i raw_auth)
        raw_hub(u)  = sum over u->i of auth(i)
        hub(u)      = rha(1e6 * raw_hub(u), max_u raw_hub)

    with rha(a, b) = (2a + b) DIV (2b) (round half away, non-negative)
    and hub_0(u) = 1e6.  Every node in the incidence emits (each user
    has >= 1 item and vice versa, so both maxima are > 0).  Pins
    restated verbatim in oracle._ITEM_HITS_SQL (MATERIALIZED unrolled
    CTEs — change both sides or neither): iters = 3, the auth-then-hub
    update order, the L-infinity rha normalization.  Micro-normalized
    inflows bound raw <= 1e6 * degree, so 1e6 * raw stays in BIGINT
    up to degree ~9e6; cap hub degrees upstream past that.

    Scale shape (100 TB): each iteration is two edge-keyed
    broadcast-scalar aggregates (the max is a one-row cross join) —
    the standard distributed HITS step; per-step state persists and
    localCheckpoints to keep lineage flat (the dup_components
    lesson)."""
    ui = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull()).distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hub = None
    auth = None
    try:
        hub = ui.select("u").distinct().select(
            "u", F.lit(1_000_000).cast("long").alias("h")
        ).localCheckpoint()
        for _ in range(iters):
            raw_a = (
                ui.join(hub, "u")
                .groupBy("item")
                .agg(F.sum("h").cast("long").alias("ra"))
            )
            ma = raw_a.agg(F.max("ra").alias("m"))
            new_auth = raw_a.crossJoin(F.broadcast(ma)).select(
                "item",
                _rha(
                    F.lit(1_000_000).cast("long") * F.col("ra"), F.col("m")
                ).cast("long").alias("a"),
            ).localCheckpoint()
            if auth is not None:
                auth.unpersist()
            auth = new_auth
            raw_h = (
                ui.join(auth, "item")
                .groupBy("u")
                .agg(F.sum("a").cast("long").alias("rh"))
            )
            mh = raw_h.agg(F.max("rh").alias("m"))
            new_hub = raw_h.crossJoin(F.broadcast(mh)).select(
                "u",
                _rha(
                    F.lit(1_000_000).cast("long") * F.col("rh"), F.col("m")
                ).cast("long").alias("h"),
            ).localCheckpoint()
            hub.unpersist()
            hub = new_hub
        return (
            auth.select(
                F.lit("auth").alias("kind"),
                F.col("item").alias("id"),
                F.col("a").alias("score_micro"),
            )
            .unionByName(
                hub.select(
                    F.lit("hub").alias("kind"),
                    F.col("u").alias("id"),
                    F.col("h").alias("score_micro"),
                )
            )
            .localCheckpoint()
        )
    finally:
        ui.unpersist()


LPA_ITERS = 3


def item_lpa(events: DataFrame, iters: int = LPA_ITERS) -> DataFrame:
    """-> (item, label): synchronous label propagation communities over
    the item co-visitation graph (Raghavan et al. 2007, made
    deterministic) — the modularity-free community member beside the
    threshold-components view (item_communities) and the centrality
    family (pagerank/PPR/HITS).

    Pins (restated in oracle._ITEM_LPA_SQL — change both sides or
    neither): incidence/edges = item_pagerank's derivation VERBATIM
    (distinct (user, item), directed pairs a <> b, w = common-user
    count); label_0(v) = v; each of the 3 SYNCHRONOUS iterations sets
    label(v) = the neighbor label maximizing the incident weight sum,
    ties (weight desc, label asc), isolated items keep their label; no
    self vote.  All-integer state — a synchronous integer-weight LPA
    is shuffle-order-independent, which is what lets an iterative
    community algorithm sit under the hash gate (the k-means/pagerank
    discipline).

    Scale shape: per iteration ONE (edge join labels) shuffle + one
    (src, label) agg + one window — localCheckpoint per round cuts the
    re-planned lineage (the dup_components lesson)."""
    ui = (
        events.select(
            F.col("user_id").cast("long").alias("u"),
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        a, b = ui.alias("a"), ui.alias("b")
        edges = (
            a.join(
                b,
                (F.col("a.u") == F.col("b.u"))
                & (F.col("a.item") != F.col("b.item")),
            )
            .groupBy(F.col("a.item").alias("src"), F.col("b.item").alias("dst"))
            .agg(F.count("*").cast("long").alias("w"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        items = ui.select("item").distinct().persist(StorageLevel.MEMORY_AND_DISK)
        try:
            labels = items.select("item", F.col("item").alias("label"))
            wv = Window.partitionBy("src").orderBy(
                F.col("ws").desc(), F.col("label").asc()
            )
            for _ in range(int(iters)):
                votes = (
                    edges.join(
                        labels.select(
                            F.col("item").alias("dst"),
                            F.col("label"),
                        ),
                        "dst",
                    )
                    .groupBy("src", "label")
                    .agg(F.sum("w").alias("ws"))
                )
                new = (
                    votes.withColumn("rn", F.row_number().over(wv))
                    .where(F.col("rn") == 1)
                    .select(F.col("src").alias("item"), F.col("label").alias("nl"))
                )
                labels = (
                    items.join(new, "item", "left")
                    .select(
                        "item",
                        F.coalesce(F.col("nl"), F.col("item")).alias("label"),
                    )
                    .localCheckpoint()
                )
            return labels.select(
                F.col("item").cast("long").alias("item"),
                F.col("label").cast("long").alias("label"),
            )
        finally:
            edges.unpersist()
            items.unpersist()
    finally:
        ui.unpersist()
