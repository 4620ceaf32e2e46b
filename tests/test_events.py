"""Edge semantics for the event-analytics operators
(operators/events.py).  Oracle equality end-to-end is covered by
test_correctness_gate (all ten event entries: funnel, sessions, asof,
range join, cohorts, rollup, sliding counts, gapfill, props rollup);
these pin
the boundary rules the gate corpus can't reach: strictly-after funnel
chaining, equal-timestamp determinism, exact-gap boundaries, null-ts
handling, plus a seeded-random cross-check vs a pure-Python model."""

from datetime import datetime, timedelta, timezone

from mircv_project_spark.operators.events import event_funnel, event_sessions

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
# tz-AWARE base: naive datetimes go through time.mktime (OS-local tz)
# in createDataFrame, which would break the absolute-epoch assertions
# on a non-UTC machine regardless of the pinned session tz
_T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (eid, _T0 + timedelta(seconds=sec), uid, et, val)
            for eid, sec, uid, et, val in rows
        ],
        _SCHEMA,
    )


# ------------------------------------------------------------------- funnel


def test_funnel_strictly_after_chaining(spark):
    # user 1: view(0) -> click(10) -> purchase(20): converted
    # user 2: purchase BEFORE click -> chain breaks at purchase
    # user 3: click at the SAME instant as view -> strictly-after fails
    # user 4: no view at all -> absent from the output
    ev = _ev(
        spark,
        [
            (0, 0, 1, "view", 1.0), (1, 10, 1, "click", 1.0), (2, 20, 1, "purchase", 1.0),
            (3, 0, 2, "view", 1.0), (4, 20, 2, "click", 1.0), (5, 10, 2, "purchase", 1.0),
            (6, 5, 3, "view", 1.0), (7, 5, 3, "click", 1.0),
            (8, 0, 4, "click", 1.0), (9, 10, 4, "purchase", 1.0),
        ],
    )
    got = {r["user_id"]: r for r in event_funnel(ev).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["converted"] is True
    us = 1_000_000
    assert (got[1]["t_view"], got[1]["t_click"], got[1]["t_purchase"]) == (
        1704067200 * us, 1704067210 * us, 1704067220 * us
    )
    # user 2's purchase(10) precedes click(20) -> no qualifying purchase
    assert got[2]["t_click"] == 1704067220 * us and got[2]["t_purchase"] is None
    assert got[2]["converted"] is False
    assert got[3]["t_click"] is None and got[3]["converted"] is False


def test_funnel_horizon_bounds_conversion(spark):
    ev = _ev(
        spark,
        [
            (0, 0, 1, "view", 1.0), (1, 1, 1, "click", 1.0),
            (2, 86_400, 1, "purchase", 1.0),            # exactly at horizon: in
            (3, 0, 2, "view", 1.0), (4, 1, 2, "click", 1.0),
            (5, 86_401, 2, "purchase", 1.0),            # one second past: out
        ],
    )
    got = {r["user_id"]: r["converted"] for r in event_funnel(ev).collect()}
    assert got == {1: True, 2: False}


def test_funnel_uses_first_qualifying_occurrence(spark):
    # multiple candidates per step: min strictly-after wins each time
    ev = _ev(
        spark,
        [
            (0, 50, 1, "view", 1.0), (1, 5, 1, "view", 1.0),
            (2, 3, 1, "click", 1.0), (3, 30, 1, "click", 1.0),
            (4, 40, 1, "click", 1.0), (5, 35, 1, "purchase", 1.0),
        ],
    )
    r = event_funnel(ev).collect()[0]
    us = 1_000_000
    base = 1704067200
    assert r["t_view"] == (base + 5) * us      # min view
    assert r["t_click"] == (base + 30) * us    # first click after 5
    assert r["t_purchase"] == (base + 35) * us


# ----------------------------------------------------------------- sessions


def test_sessions_gap_is_strict_and_ties_are_deterministic(spark):
    gap = 100
    ev = _ev(
        spark,
        [
            (0, 0, 1, "view", 1.5),
            (1, 100, 1, "click", 2.25),    # gap == 100: SAME session (strict >)
            (2, 201, 1, "view", 3.0),      # gap 101 > 100: breaks
            # user 2: two events at the SAME ts -> (ts, event_id) order
            (10, 0, 2, "view", 1.0),
            (11, 0, 2, "click", 2.0),
        ],
    )
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in event_sessions(ev, gap_seconds=gap).collect()
    }
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    us = 1_000_000
    base = 1704067200
    s0 = got[(1, 0)]
    assert (s0["n_events"], s0["start_us"], s0["end_us"]) == (
        2, base * us, (base + 100) * us
    )
    assert s0["total_value"] == 3.75
    s1 = got[(1, 1)]
    assert (s1["n_events"], s1["start_us"]) == (1, (base + 201) * us)
    assert got[(2, 0)]["n_events"] == 2


# -------------------------------------------------------------- as-of join


def test_asof_visibility_and_tie_rules(spark):
    from mircv_project_spark.operators.events import event_asof

    us = 1_000_000
    base = 1704067200
    ev = _ev(
        spark,
        [
            # user 1: click(10) then purchase(20) -> matches click
            (0, 10, 1, "click", 1.0), (1, 20, 1, "purchase", 1.0),
            # user 1 second purchase at the SAME us as a click -> the
            # equal-timestamp click (eid 3) IS visible (<= rule)
            (2, 30, 1, "purchase", 1.0), (3, 30, 1, "click", 1.0),
            # user 2: two clicks at the same us -> max eid wins
            (10, 5, 2, "click", 1.0), (11, 5, 2, "click", 1.0),
            (12, 9, 2, "purchase", 1.0),
            # user 3: purchase with no prior click -> nulls
            (20, 0, 3, "purchase", 1.0), (21, 10, 3, "click", 1.0),
            # view events never participate
            (30, 1, 2, "view", 1.0),
        ],
    )
    got = {r["event_id"]: r for r in event_asof(ev).collect()}
    assert set(got) == {1, 2, 12, 20}
    assert got[1]["matched_eid"] == 0 and got[1]["lag_us"] == 10 * us
    assert got[2]["matched_eid"] == 3 and got[2]["lag_us"] == 0
    assert got[12]["matched_eid"] == 11 and got[12]["matched_us"] == (base + 5) * us
    assert got[20]["matched_eid"] is None and got[20]["lag_us"] is None


def test_asof_null_ts_right_cannot_split_match_fields(spark):
    """A null-ts click must be ignored ENTIRELY: without the shared
    us-not-null guard, matched_eid could come from the null-ts click
    while matched_us comes from an earlier valid one."""
    from mircv_project_spark.operators.events import event_asof

    rows = [
        (5, _T0 + timedelta(seconds=100), 1, "click", 1.0),
        (9, None, 1, "click", 1.0),        # null ts: invisible
        (7, None, 1, "purchase", 1.0),     # null-ts left: no lag
        (8, _T0 + timedelta(seconds=200), 1, "purchase", 1.0),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    got = {r["event_id"]: r for r in event_asof(ev).collect()}
    us = 1_000_000
    base = 1704067200
    assert got[8]["matched_eid"] == 5
    assert got[8]["matched_us"] == (base + 100) * us
    # the null-ts purchase sorts last: it sees click 5, never click 9
    assert got[7]["matched_eid"] == 5 and got[7]["lag_us"] is None


# --------------------------------------------------------------- range join


def test_range_join_boundaries_and_bucket_crossing(spark):
    from mircv_project_spark.operators.events import event_range_join

    h = 100
    ev = _ev(
        spark,
        [
            # user 1: purchase(200) sees clicks at exactly us-h (100, in),
            # equal ts (200, in), and us-h-1 (99, out); a later click (201)
            # is out.  click(100) vs purchase(200) CROSSES a bucket edge
            # (buckets are width h) — the exploded probe must find it.
            (0, 99, 1, "click", 1.0), (1, 100, 1, "click", 1.0),
            (2, 200, 1, "click", 1.0), (3, 201, 1, "click", 1.0),
            (4, 200, 1, "purchase", 1.0),
            # user 2: click exactly at the horizon edge of a purchase in
            # the NEXT bucket; user 1's same-time events never cross over
            (10, 150, 2, "click", 1.0), (11, 250, 2, "purchase", 1.0),
        ],
    )
    out = event_range_join(ev, horizon_seconds=h).collect()
    pairs = {(r["event_id"], r["right_eid"]): r["lag_us"] for r in out}
    us = 1_000_000
    assert pairs == {(4, 1): 100 * us, (4, 2): 0, (11, 10): 100 * us}


def test_range_join_plan_has_no_nested_loop(spark):
    from mircv_project_spark.operators.events import event_range_join
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    plan = event_range_join(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ rollup/slide


def test_events_rollup_levels(spark):
    from mircv_project_spark.operators.events import events_rollup

    day = 86_400
    ev = _ev(
        spark,
        [
            (0, 0, 1, "view", 1.0), (1, 5, 1, "view", 2.0),
            (2, day, 1, "view", 4.0), (3, 0, 1, "click", 8.0),
        ],
    )
    got = {
        (r["event_type"], r["day"], r["lvl"]): (r["n_events"], r["total_value"])
        for r in events_rollup(ev).collect()
    }
    d0 = 19723
    assert got[("view", d0, 0)] == (2, 3.0)
    assert got[("view", d0 + 1, 0)] == (1, 4.0)
    assert got[("view", None, 1)] == (3, 7.0)       # per-type subtotal
    assert got[("click", None, 1)] == (1, 8.0)
    assert got[(None, None, 3)] == (4, 15.0)        # grand total


def test_sliding_counts_membership(spark):
    from mircv_project_spark.operators.events import events_sliding_counts

    # slide 10 s, window 40 s -> event at t=45 belongs to starts 10..40
    ev = _ev(spark, [(0, 45, 1, "view", 1.0), (1, 40, 1, "view", 1.0)])
    out = events_sliding_counts(ev, window_seconds=40, slide_seconds=10).collect()
    us = 1_000_000
    base = 1704067200
    got = {r["window_start_us"]: r["n_events"] for r in out}
    # t=45 -> starts {10,20,30,40}+base; t=40 -> starts {10,20,30,40}+base
    # (40 is included in [40, 80); 0 excluded since 0+40 <= 40)
    assert got == {(base + s) * us: 2 for s in (10, 20, 30, 40)}


# ------------------------------------------------------------------ cohorts


def test_cohort_retention_day_boundaries(spark):
    from mircv_project_spark.operators.events import cohort_retention

    day = 86_400
    # _T0 is 2024-01-01 UTC = day 19723 since epoch
    d0 = 19723
    ev = _ev(
        spark,
        [
            # user 1 first event late on day 0, active again day 2
            (0, day - 1, 1, "view", 1.0),
            (1, 2 * day, 1, "click", 1.0),
            (2, 2 * day + 5, 1, "view", 1.0),      # same offset: counted once
            # user 2 joins day 1, never returns
            (3, day, 2, "view", 1.0),
        ],
    )
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {(d0, 0): 1, (d0, 2): 1, (d0 + 1, 0): 1}


# -------------------------------------------------------------- props rollup


def test_event_props_rollup_json_and_median(spark):
    from mircv_project_spark.operators.events import event_props_rollup

    rows = [
        (0, _T0, 1, "view", 1.0, '{"k": 10}'),
        (1, _T0, 1, "view", 2.0, '{"k": 30}'),
        (2, _T0, 2, "view", 4.0, '{"k": 20}'),
        (3, _T0, 2, "click", 7.5, '{"k": 5}'),
    ]
    ev = spark.createDataFrame(
        rows, _SCHEMA + ", props string"
    )
    got = {r["event_type"]: r for r in event_props_rollup(ev).collect()}
    v = got["view"]
    assert (v["n_events"], v["n_users"], v["sum_k"], v["min_k"], v["max_k"]) == (
        3, 2, 60, 10, 30
    )
    assert v["avg_k"] == 20.0
    assert v["p50_value"] == 2.0          # exact median of {1,2,4}
    c = got["click"]
    assert (c["n_events"], c["p50_value"]) == (1, 7.5)


def test_sessions_cover_every_event_exactly_once(spark):
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    sess = event_sessions(ev)
    total = sess.groupBy().sum("n_events").collect()[0][0]
    assert total == ev.count()
    # session_idx is dense per user starting at 0
    import pyspark.sql.functions as F

    per_user = sess.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("session_idx").alias("mx"),
        F.min("session_idx").alias("mn"),
    )
    bad = per_user.where(
        (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)
    ).count()
    assert bad == 0


# ---------------------------------------------------- randomized cross-check


def test_random_streams_match_python_reference(spark):
    """200 seeded random users x ~20 events, ONE Spark pass per
    operator, each user's expected output computed by an independent
    pure-Python model — semantics coverage far beyond the driver
    corpus's timestamp law (bursts, exact-gap collisions, equal-ts
    piles, empty step types)."""
    import random

    from mircv_project_spark.operators.events import (
        event_asof,
        event_range_join,
        event_sessions,
    )

    rng = random.Random(20240818)
    rows = []
    eid = 0
    for uid in range(200):
        for _ in range(rng.randint(1, 20)):
            # coarse grid + exact multiples of the gap/horizon to force
            # boundary collisions often
            sec = rng.choice([rng.randint(0, 500), rng.randrange(0, 500, 100)])
            et = rng.choice(["view", "click", "purchase"])
            rows.append((eid, sec, uid, et, round(rng.random(), 3)))
            eid += 1
    ev = _ev(spark, rows)
    us = 1_000_000
    gap_s, h_s = 100, 100
    by_user = {}
    for e, sec, uid, et, val in rows:
        by_user.setdefault(uid, []).append((sec * us + 1704067200 * us, e, et, val))

    # --- sessions: order (us, eid), break on gap > 100 s
    exp_sessions = set()
    for uid, evs in by_user.items():
        evs = sorted((u, e, v) for u, e, et, v in evs)
        sidx, start, vals, n, prev, end = -1, None, 0.0, 0, None, None
        out = []
        for u, e, v in evs:
            if prev is None or u - prev > gap_s * us:
                if sidx >= 0:
                    out.append((uid, sidx, n, start, end, round(vals, 6)))
                sidx, start, vals, n = sidx + 1, u, 0.0, 0
            n, vals, end, prev = n + 1, vals + v, u, u
        out.append((uid, sidx, n, start, end, round(vals, 6)))
        exp_sessions.update(out)
    got = {
        (r["user_id"], r["session_idx"], r["n_events"], r["start_us"],
         r["end_us"], r["total_value"])
        for r in event_sessions(ev, gap_seconds=gap_s).collect()
    }
    assert got == exp_sessions

    # --- as-of: per purchase, latest click us<=us, max eid on tie
    exp_asof = set()
    for uid, evs in by_user.items():
        clicks = sorted((u, e) for u, e, et, _ in evs if et == "click")
        for u, e, et, _ in evs:
            if et != "purchase":
                continue
            cand = [(cu, ce) for cu, ce in clicks if cu <= u]
            if cand:
                mu = max(cu for cu, _ in cand)
                me = max(ce for cu, ce in cand if cu == mu)
                exp_asof.add((e, uid, u, me, mu, u - mu))
            else:
                exp_asof.add((e, uid, u, None, None, None))
    got = {
        (r["event_id"], r["user_id"], r["us"], r["matched_eid"],
         r["matched_us"], r["lag_us"])
        for r in event_asof(ev).collect()
    }
    assert got == exp_asof

    # --- range join: all (purchase, click) with 0 <= lag <= 100 s
    exp_rj = set()
    for uid, evs in by_user.items():
        for u, e, et, _ in evs:
            if et != "purchase":
                continue
            for cu, ce, cet, _ in evs:
                if cet == "click" and 0 <= u - cu <= h_s * us:
                    exp_rj.add((e, uid, u, ce, cu, u - cu))
    got = {
        (r["event_id"], r["user_id"], r["us"], r["right_eid"],
         r["right_us"], r["lag_us"])
        for r in event_range_join(ev, horizon_seconds=h_s).collect()
    }
    assert got == exp_rj


# ------------------------------------------------------------------ gapfill


def test_gapfill_grid_zeros_and_ffill(spark):
    from mircv_project_spark.operators.events import events_gapfill

    day = 86_400
    d0 = 19723  # 2024-01-01 UTC
    ev = _ev(
        spark,
        [
            # user 1: events on day 0 (two, close = eid 1's value via
            # same-us eid tiebreak) and day 3 — days 1-2 are gaps
            (0, 100, 1, "view", 5.0),
            (1, 100, 1, "click", 7.0),
            (2, 3 * day + 10, 1, "view", 9.0),
            # user 2: single day
            (10, day, 2, "view", 2.5),
        ],
    )
    got = {
        (r["user_id"], r["day"]): (r["n_events"], r["total_value"], r["last_value"])
        for r in events_gapfill(ev).collect()
    }
    assert set(got) == {(1, d0), (1, d0 + 1), (1, d0 + 2), (1, d0 + 3), (2, d0 + 1)}
    assert got[(1, d0)] == (2, 12.0, 7.0)          # close = higher eid at equal us
    assert got[(1, d0 + 1)] == (0, 0.0, 7.0)       # gap day: zeros + ffill
    assert got[(1, d0 + 2)] == (0, 0.0, 7.0)
    assert got[(1, d0 + 3)] == (1, 9.0, 9.0)
    assert got[(2, d0 + 1)] == (1, 2.5, 2.5)


def test_item_transitions_hand_computed(spark):
    """Null-item events are dropped BEFORE pairing (transitions skip
    them), self-transitions count, ties rank (cnt desc, next asc)."""
    import json

    from mircv_project_spark.operators.events import item_transitions

    rows = [
        # user 1: 5 -> 6 -> (null skipped) -> 6 -> 7   (5->6, 6->6, 6->7)
        (0, 1_000, 1, {"k": 5}),
        (1, 2_000, 1, {"k": 6}),
        (2, 3_000, 1, {"x": 1}),
        (3, 4_000, 1, {"k": 6}),
        (4, 5_000, 1, {"k": 7}),
        # user 2: 5 -> 6, 6 -> 8   (makes 5->6 cnt 2; 6->8 ties 6->7)
        (5, 1_000, 2, {"k": 5}),
        (6, 2_000, 2, {"k": 6}),
        (7, 3_000, 2, {"k": 8}),
        # user 3: same-us tie broken by event_id: 9 (eid 8) -> 5 (eid 9)
        (8, 7_000, 3, {"k": 9}),
        (9, 7_000, 3, {"k": 5}),
    ]
    df = spark.createDataFrame(
        [
            (eid, us, u, "view", 1.0, json.dumps(p))
            for eid, us, u, p in rows
        ],
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type", "value", "props",
    )
    got = {
        (r.cur, r.next_item): (r.cnt, r.rank)
        for r in item_transitions(df).collect()
    }
    assert got == {
        (5, 6): (2, 1),
        (6, 6): (1, 1),   # ties with 6->7, 6->8: next asc
        (6, 7): (1, 2),
        (6, 8): (1, 3),
        (9, 5): (1, 1),
    }


def test_session_paths_boundary_and_overlap(spark):
    """Paths never cross a session boundary; overlapping windows count;
    ties rank path-asc."""
    import json

    from mircv_project_spark.operators.events import session_paths

    h = 3_600_000_000  # 1h in us
    rows = [
        # user 1, one session: a b c d  -> paths a>b>c, b>c>d
        (0, 0 * h, 1, "a"), (1, 1 * h, 1, "b"),
        (2, 2 * h, 1, "c"), (3, 3 * h, 1, "d"),
        # user 1, new session after a 9h gap: a b c -> a>b>c again
        (4, 13 * h, 1, "a"), (5, 14 * h, 1, "b"), (6, 15 * h, 1, "c"),
        # user 2: only 2 events in a session -> no path; the third
        # event is 9h later, so b>c>a must NOT count
        (7, 0 * h, 2, "b"), (8, 1 * h, 2, "c"), (9, 11 * h, 2, "a"),
    ]
    df = spark.createDataFrame(
        [(eid, us, u, t, 1.0, json.dumps({"k": 1})) for eid, us, u, t in rows],
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "timestamp_micros(us) AS ts", "user_id",
        "event_type", "value", "props",
    )
    got = [(r.path, r.cnt, r.rank) for r in session_paths(df).collect()]
    assert got == [("a>b>c", 2, 1), ("b>c>d", 1, 2)]


def test_event_anomalies_python_model_and_edges(spark):
    """event_anomalies vs a pure-Python replication over sf0.001, plus
    the two contract edges: a constant-rate type never flags, and a
    zero-count hour CAN flag (silence is an anomaly)."""
    from collections import defaultdict

    from mircv_project_spark.operators.events import event_anomalies
    from tests.conftest import SF_SMALL

    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    got = sorted(
        (r["event_type"], r["hour_h"], r["cnt"], r["z2"])
        for r in event_anomalies(ev).collect()
    )

    rows = ev.select("event_type", "ts").collect()
    hs = [
        (r["event_type"], int((r["ts"].timestamp() * 1e6) // 3_600_000_000))
        for r in rows
    ]
    h0 = min(h for _, h in hs)
    h1 = max(h for _, h in hs)
    cnt = defaultdict(int)
    for t, h in hs:
        cnt[(t, h)] += 1
    types = sorted({t for t, _ in hs})
    exp = []
    for t in types:
        c = [cnt.get((t, h), 0) for h in range(h0, h1 + 1)]
        H, S, Q = float(len(c)), float(sum(c)), float(sum(x * x for x in c))
        for i, x in enumerate(c):
            dd = H * float(x) - S
            vnum = H * Q - S * S
            if dd * dd > 4.0 * vnum:
                exp.append((t, h0 + i, x, round(dd * dd / vnum, 6)))
    assert got == sorted(exp)
    assert got, "gate would be vacuous"

    # constant-rate type: one event every hour -> variance 0 -> no flag
    import datetime as dt

    const = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), 1, "steady", 0.0, "{}")
            for i in range(24)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    assert event_anomalies(const).collect() == []


def test_item_popularity_decay_hand_computed(spark):
    """Two items: 'fresh' has 1 event on the max day, 'stale' has 4
    events 2 days earlier — decay must rank fresh (1e6) over stale
    (4 * 250000 = 1e6, tie broken item asc... use 3 events to avoid
    the tie: 3 * 250000 = 750000 < 1e6)."""
    import datetime as dt

    from mircv_project_spark.operators.events import item_popularity_decayed

    d0 = dt.datetime(2024, 1, 10)
    rows = [(0, d0, 1, "view", 0.0, '{"k": 1}')]
    rows += [
        (i + 1, d0 - dt.timedelta(days=2), 1, "view", 0.0, '{"k": 2}')
        for i in range(3)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    got = [
        (r["item"], r["n_events"], r["pop_u"], r["rank"])
        for r in item_popularity_decayed(ev).collect()
    ]
    assert got == [(1, 1, 1_000_000, 1), (2, 3, 750_000, 2)]


def test_streaming_anomalies_counts_split_invariant(spark, tmp_path):
    """The final streamed counters equal the batch (type, hour)
    aggregate under a two-batch split, and the derived anomaly table
    equals the batch operator's output."""
    from mircv_project_spark.operators.events import event_anomalies
    from mircv_project_spark.streaming.anomaly_stream import (
        final_anomalies,
        run_streaming_anomaly_counts,
    )

    rows = []
    eid = 0
    # type A: quiet hours with one screaming hour (z2 caps at H-1,
    # so the span must exceed 5 hours for the threshold 4 to fire)
    for h, n in [(h, 2) for h in range(11) if h != 5] + [(5, 50)]:
        for i in range(n):
            rows.append((eid, h * 3600_000_000 + i * 1000, 1, "A", 1.0, "{}"))
            eid += 1
    for h in range(11):
        rows.append((eid, h * 3600_000_000, 2, "B", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props",
    )
    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    half = eid // 2
    df.where(f"event_id < {half}").coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)
    run_streaming_anomaly_counts(spark, inp, out, ckpt).awaitTermination(120)
    df.where(f"event_id >= {half}").coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_anomaly_counts(spark, inp, out, ckpt).awaitTermination(120)

    got = {
        (r.event_type, r.hour_h): (r.cnt, r.z2)
        for r in final_anomalies(spark.read.parquet(out)).collect()
    }
    want = {
        (r.event_type, r.hour_h): (r.cnt, r.z2)
        for r in event_anomalies(df).collect()
    }
    assert got == want
    assert ("A", 5) in got  # the screaming hour flags


def test_streaming_pivot_split_invariant(spark, tmp_path):
    """The final streamed counters equal the batch pivot under a
    two-batch split."""
    from mircv_project_spark.operators.events import event_pivot
    from mircv_project_spark.streaming.pivot_stream import (
        final_pivot,
        run_streaming_pivot,
    )

    rows = []
    for i in range(40):
        et = ["view", "click", "purchase", "signup", "error"][i % 5]
        rows.append((i, i * 1_000_000, i % 4, et, 10.25 + i, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, us long, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(timestamp_micros(us) AS TIMESTAMP_NTZ) AS ts",
        "user_id", "event_type", "value", "props",
    )
    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    df.where("event_id < 20").coalesce(1).write.mode("overwrite").parquet(inp)
    run_streaming_pivot(spark, inp, out, ckpt).awaitTermination(120)
    df.where("event_id >= 20").coalesce(1).write.mode("append").parquet(inp)
    run_streaming_pivot(spark, inp, out, ckpt).awaitTermination(120)

    got = {
        r.user_id: (r.n_view, r.n_click, r.n_purchase, r.n_signup,
                    r.n_error, r.n_total, r.purchase_cents)
        for r in final_pivot(spark.read.parquet(out)).collect()
    }
    want = {
        r.user_id: (r.n_view, r.n_click, r.n_purchase, r.n_signup,
                    r.n_error, r.n_total, r.purchase_cents)
        for r in event_pivot(df).collect()
    }
    assert got == want and got
