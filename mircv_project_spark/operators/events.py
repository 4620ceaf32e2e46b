"""Behavioral-analytics operators over the events table: ordered
funnel analysis, batch gaps-and-islands sessionization, as-of and
range (interval) joins, cohort retention, OLAP rollup, sliding-window
aggregation, and a semi-structured JSON-props rollup.

No analog in the reference (a pure IR engine); these round out the
pipeline family with the two classic user-event workloads every
large-scale analytics deployment runs, in the same contract as
operators/curation.py: pure Catalyst expressions, every semantics
restatable in DuckDB SQL for the gate, timestamps compared as integer
epoch MICROSECONDS (``unix_micros`` <-> ``epoch_us``) so no tz/format
ambiguity exists between engines.

Scale shapes:

- ``event_funnel``: one user-keyed shuffle for the first step's min,
  then one equi-join per remaining step ON THE SAME KEY — the exchanges
  reuse the user hash partitioning, so an S-step funnel is one shuffle
  of the filtered event stream per step, never a per-user collect or a
  cross-step window.  Conditional-min aggregation keeps state bounded
  per user per step.
- ``event_sessions``: the lag/cumsum gaps-and-islands form under a
  per-user window — bounded by a single user's event count (power
  users are the skew unit; at 10^9-event users you'd shard by
  (user, day) first and stitch, the same offset trick budget_pack
  uses).  One shuffle total.
- ``event_asof``: the as-of join as a tagged UNION + one per-user
  window carrying the last-seen right-side row forward — ONE shuffle
  of both streams together, never a range join (Spark would plan
  ts-inequality joins as a broadcast nested loop) and never a per-key
  sort-merge of full histories.
- ``cohort_retention``: two user-keyed exchanges that reuse the same
  hash partitioning (first-day agg, join back) + one distinct on the
  (cohort, offset, user) triple — the matrix is tiny, the work is the
  distinct's map-side combine.
- ``event_props_rollup``: pure Catalyst JSON path extraction
  (``get_json_object`` stays in codegen) + a single event_type rollup;
  exact percentile is the only O(group) memory piece — at real scale
  you'd swap ``approx_percentile`` in, which is why the exact form is
  isolated in one aggregate expression.
- ``event_range_join``: the interval join as a BUCKETIZED equi-join —
  right events keyed by their time bucket (bucket width == horizon),
  left probes exploded to the two buckets its window can span, exact
  inequality applied as a post-join filter.  Spark plans a raw
  ts-inequality join as BroadcastNestedLoopJoin (every pair scanned);
  the bucket key turns it into a shuffled hash join whose candidate
  set is only same-user events within ±1 bucket.  Each (left, right)
  pair joins on the right's unique bucket, so no dedup pass is needed.
- ``events_rollup`` / ``events_sliding_counts``: plain Catalyst
  rollup/window-bucket aggregations — partial aggregation map-side,
  one shuffle on the (small) grouping key space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FUNNEL_STEPS = ["view", "click", "purchase"]
FUNNEL_HORIZON_S = 86_400  # first->last step within 1 day
SESSION_GAP_S = 28_800  # 8 h inactivity closes a session

US_PER_DAY = 86_400 * 1_000_000


def _us_col(ts_col: str) -> Column:
    """Event time as integer epoch MICROSECONDS — the one
    semantics-critical projection every operator here shares: parquet
    stores TIMESTAMP_NTZ; the session tz is pinned UTC, so the NTZ ->
    TIMESTAMP cast reads the wall-clock as UTC, the same interpretation
    DuckDB's epoch_us applies to the naive value."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def _day_col(ts_col: str) -> Column:
    """UTC day index (days since epoch) — tz-free integer math, NOT
    date_trunc, so the oracle's floor(epoch_us/86400e6) matches."""
    return F.floor(_us_col(ts_col) / F.lit(US_PER_DAY)).cast("long")


def event_funnel(
    events: DataFrame,
    steps: list[str] | None = None,
    horizon_seconds: int = FUNNEL_HORIZON_S,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """-> (user_id, t_<step> epoch-us per step, converted) for every
    user with at least one first-step event.

    Step k's time is the MIN event time of that type STRICTLY after
    step k-1's time (the standard ordered-funnel rule); a missing step
    nulls every later step.  ``converted`` = all steps present AND
    last - first <= horizon."""
    steps = list(FUNNEL_STEPS if steps is None else steps)
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("etype"),
        _us_col(ts_col).alias("us"),
    )
    cur = (
        base.where(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t_0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = base.where(F.col("etype") == step).select("user_id", "us")
        prev_cols = [f"t_{j}" for j in range(i)]
        cur = (
            cur.join(nxt, "user_id", "left")
            .groupBy("user_id", *prev_cols)
            .agg(
                F.min(
                    F.when(F.col("us") > F.col(f"t_{i - 1}"), F.col("us"))
                ).alias(f"t_{i}")
            )
        )
    last = f"t_{len(steps) - 1}"
    converted = (
        F.col(last).isNotNull()
        & ((F.col(last) - F.col("t_0")) <= int(horizon_seconds) * 1_000_000)
    )
    named = [
        F.col(f"t_{i}").alias(f"t_{step}") for i, step in enumerate(steps)
    ]
    return cur.select("user_id", *named, converted.alias("converted"))


def event_sessions(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_S,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """-> (user_id, session_idx, n_events, start_us, end_us,
    total_value): batch gaps-and-islands sessionization — a new session
    starts when an event arrives STRICTLY more than ``gap_seconds``
    after its predecessor (same > rule as the streaming sessionizer,
    streaming/sessions.py).  Order within a user is (ts, event_id) so
    equal timestamps stay deterministic; total_value rounds to 6
    decimals on both sides of the gate."""
    gap_us = int(gap_seconds) * 1_000_000
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        _us_col(ts_col).alias("us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(value_col).cast("double").alias("value"),
    )
    # explicit NULLS LAST: Spark ASC defaults nulls-first where DuckDB
    # defaults nulls-last — a null ts would silently place on opposite
    # ends of the user's partition and shift session boundaries
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").asc_nulls_last(), F.col("eid").asc_nulls_last()
    )
    # two projections: a window function can't nest inside another
    # window aggregate, so the break flag materializes first
    prev = F.lag("us").over(w)
    flagged = base.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("us") - prev) > gap_us), 1).otherwise(0),
    )
    run = (
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    marked = flagged.withColumn("session_idx", run.cast("long"))
    return marked.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


ASOF_LEFT = "purchase"
ASOF_RIGHT = "click"


def event_asof(
    events: DataFrame,
    left_type: str = ASOF_LEFT,
    right_type: str = ASOF_RIGHT,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (event_id, user_id, us, matched_eid, matched_us, lag_us):
    for every ``left_type`` event, the most recent ``right_type`` event
    by the same user with ``right.us <= left.us`` (an equal-timestamp
    right event IS visible); ties among right events at the same us
    resolve to the LARGEST event_id.  Lefts with no prior right keep
    nulls in the matched columns.

    Implementation: tag both filtered streams (right=0, left=1), union,
    and run ``last(..., ignorenulls)`` over a per-user (us, side, eid)
    window — right-before-left at equal us encodes the <= rule, eid-asc
    makes ``last`` pick the max-eid tie winner.  One shuffle total; no
    range join."""
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("etype"),
        _us_col(ts_col).alias("us"),
        F.col(id_col).cast("long").alias("eid"),
    )
    tagged = base.where(F.col("etype").isin([left_type, right_type])).select(
        "user_id",
        "us",
        "eid",
        F.when(F.col("etype") == left_type, F.lit(1)).otherwise(F.lit(0)).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("us").asc_nulls_last(),
            F.col("side").asc(),
            F.col("eid").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # BOTH carry-forwards must share the us-not-null condition: a
    # null-ts right event has a non-null eid, and conditioning eid on
    # side alone would let last(ignorenulls) pick matched_eid from a
    # DIFFERENT right event than matched_us (same guard in the oracle)
    is_right = (F.col("side") == 0) & F.col("us").isNotNull()
    right_us = F.when(is_right, F.col("us"))
    right_eid = F.when(is_right, F.col("eid"))
    enriched = tagged.withColumn(
        "matched_us", F.last(right_us, ignorenulls=True).over(w)
    ).withColumn("matched_eid", F.last(right_eid, ignorenulls=True).over(w))
    return enriched.where(F.col("side") == 1).select(
        F.col("eid").alias("event_id"),
        "user_id",
        "us",
        "matched_eid",
        "matched_us",
        (F.col("us") - F.col("matched_us")).alias("lag_us"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """-> (cohort_day, day_offset, n_users): the classic retention
    matrix — users cohorted by the UTC day index (days since epoch) of
    their first event; a user counts toward (cohort, offset) once if
    they produced any event ``offset`` days after their cohort day."""
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        _day_col(ts_col).alias("day"),
    )
    first = base.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = (
        base.join(first, "user_id")  # same user-hash partitioning as the agg
        .select(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .distinct()
    )
    return active.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )


def event_props_rollup(
    events: DataFrame,
    type_col: str = "event_type",
    props_col: str = "props",
    value_col: str = "value",
    user_col: str = "user_id",
) -> DataFrame:
    """-> (event_type, n_events, n_users, sum_k, min_k, max_k, avg_k,
    p50_value): semi-structured rollup — the ``props`` JSON column's
    ``$.k`` field extracted via ``get_json_object`` (codegen'd JSON
    path, no Python), aggregated per event type with an EXACT median of
    ``value`` (round 6 on both engines; DuckDB ``quantile_cont``
    matches Spark's linear-interpolating ``percentile``)."""
    k = F.get_json_object(F.col(props_col), "$.k").cast("long")
    base = events.select(
        F.col(type_col).alias("event_type"),
        F.col(user_col).cast("long").alias("user_id"),
        k.alias("k"),
        F.col(value_col).cast("double").alias("value"),
    )
    return base.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.round(F.avg("k"), 6).alias("avg_k"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_value"),
    )


RANGE_HORIZON_S = 3_600  # pair each purchase with every click in the prior hour


def event_range_join(
    events: DataFrame,
    left_type: str = ASOF_LEFT,
    right_type: str = ASOF_RIGHT,
    horizon_seconds: int = RANGE_HORIZON_S,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (event_id, user_id, us, right_eid, right_us, lag_us): every
    (left, right) pair by the same user with
    ``left.us - horizon <= right.us <= left.us`` (inner-join semantics;
    both endpoints inclusive — an equal-timestamp right matches, same
    visibility rule as ``event_asof``).

    Bucketized interval join: rights keyed by ``floor(us / horizon)``,
    lefts exploded to buckets {b-1, b}; the equi-join on
    (user_id, bucket) bounds candidates to ±1 bucket per user before
    the exact inequality filter.  A plan test asserts no
    BroadcastNestedLoopJoin/CartesianProduct survives."""
    h_us = int(horizon_seconds) * 1_000_000
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("etype"),
        _us_col(ts_col).alias("us"),
        F.col(id_col).cast("long").alias("eid"),
    )
    bucket = F.floor(F.col("us") / F.lit(h_us)).cast("long")
    rights = base.where(F.col("etype") == right_type).select(
        "user_id",
        bucket.alias("bucket"),
        F.col("us").alias("right_us"),
        F.col("eid").alias("right_eid"),
    )
    lefts = base.where(F.col("etype") == left_type).select(
        "user_id",
        "us",
        "eid",
        F.explode(F.array(bucket - 1, bucket)).alias("bucket"),
    )
    joined = lefts.join(rights, ["user_id", "bucket"])
    return joined.where(
        (F.col("right_us") <= F.col("us"))
        & (F.col("right_us") >= F.col("us") - F.lit(h_us))
    ).select(
        F.col("eid").alias("event_id"),
        "user_id",
        "us",
        "right_eid",
        "right_us",
        (F.col("us") - F.col("right_us")).alias("lag_us"),
    )


def events_rollup(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """-> (event_type, day, lvl, n_events, total_value): the OLAP
    ROLLUP over (event_type, UTC day index) — per-(type, day) cells,
    per-type subtotals, and the grand total, disambiguated by
    ``lvl`` = grouping bitmask (Spark ``grouping_id`` == DuckDB
    ``GROUPING(a, b)``)."""
    base = events.select(
        F.col(type_col).alias("event_type"),
        _day_col(ts_col).alias("day"),
        F.col(value_col).cast("double").alias("value"),
    )
    return base.rollup("event_type", "day").agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


SLIDE_WINDOW_S = 3_600
SLIDE_STEP_S = 900


def events_sliding_counts(
    events: DataFrame,
    window_seconds: int = SLIDE_WINDOW_S,
    slide_seconds: int = SLIDE_STEP_S,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """-> (window_start_us, event_type, n_events): batch sliding-window
    counts via Catalyst's ``F.window`` (epoch-aligned starts, window
    [start, start + window), window/slide an exact multiple so each
    event lands in exactly window/slide windows).  The oracle restates
    the same membership rule by unnesting each event's start indices —
    the engine never materializes per-event window lists; Spark's
    Expand node does it stream-side before the one aggregation
    shuffle."""
    base = events.select(
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("timestamp").alias("tsc"),
    )
    win = F.window("tsc", f"{int(window_seconds)} seconds", f"{int(slide_seconds)} seconds")
    return (
        base.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
        )
    )


def events_gapfill(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """-> (user_id, day, n_events, total_value, last_value): per-user
    DAILY resample over each user's [first-day, last-day] span — the
    hypertable-rollup/gap-fill primitive.  Days with no events emit
    n_events = 0, total_value = 0.0, and ``last_value`` carries the
    user's most recent per-day closing value FORWARD across the gap
    (closing value = the value of the day's last event by (us, eid) —
    deterministic under equal timestamps).

    Scale shape: one (user, day) rollup, a per-user span agg, a
    ``sequence``-explode of the day grid (rows bounded by span length,
    generated executor-side — never a driver loop), a left join back on
    the SAME (user, day) key, and one ffill window per user.  Every
    exchange is user-keyed; grids for year-long spans are ~365 rows per
    user — the skew unit is span length, not event count."""
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        _day_col(ts_col).alias("day"),
        _us_col(ts_col).alias("us"),
        F.col("event_id").cast("long").alias("eid"),
        F.col(value_col).cast("double").alias("value"),
    )
    # per-(user, day) rollup; closing value = the day's last event by
    # (us desc, eid desc) — a row_number window, NOT max_by(struct):
    # DuckDB's arg_max has no struct key, and the oracle must restate
    # the identical tie rule.  The day-keyed agg reuses the window's
    # partitioning.
    w_close = Window.partitionBy("user_id", "day").orderBy(
        F.col("us").desc(), F.col("eid").desc()
    )
    daily = (
        base.withColumn("rn", F.row_number().over(w_close))
        .groupBy("user_id", "day")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
            F.max(F.when(F.col("rn") == 1, F.col("value"))).alias(
                "close_value"
            ),
        )
    )
    span = base.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        F.round(
            F.last("close_value", ignorenulls=True).over(w), 6
        ).alias("last_value"),
    )


TRANS_TOPK = 3


def item_transitions(events: DataFrame, topk: int = TRANS_TOPK) -> DataFrame:
    """Next-item transition table (the count side of a session-based
    Markov recommender): per current item, the top-k most frequent NEXT
    items across all users.  -> (cur, next_item, cnt, rank).

    Pinned semantics (restated verbatim in the oracle — change both or
    neither): items = props '$.k' (NULL items dropped BEFORE pairing,
    so transitions skip item-less events); per user, events order by
    (us, event_id) — the suite's shared deterministic order; a
    transition is each consecutive pair (self-transitions kept); rank
    (cnt desc, next asc), top k per current item.

    Scale shape (100 TB): one user-keyed shuffle for the lead() window
    (bounded per-user partitions), then a map-side-combined pair count
    and a per-item top-k window over distinct next-items only."""
    base = events.select(
        F.col("user_id").alias("u"),
        _us_col("ts").alias("us"),
        F.col("event_id").alias("eid"),
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).where(F.col("item").isNotNull())
    w = Window.partitionBy("u").orderBy(F.col("us").asc(), F.col("eid").asc())
    pairs = (
        base.withColumn("next_item", F.lead("item").over(w))
        .where(F.col("next_item").isNotNull())
        .groupBy(F.col("item").alias("cur"), "next_item")
        .agg(F.count("*").alias("cnt"))
    )
    wr = Window.partitionBy("cur").orderBy(
        F.col("cnt").desc(), F.col("next_item").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= topk)
        .select(
            "cur",
            "next_item",
            F.col("cnt").cast("long").alias("cnt"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


PATHS_K = 10


def session_paths(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_S,
    k: int = PATHS_K,
) -> DataFrame:
    """Sequence mining over sessionized events: the top-k 3-step
    event-type paths (overlapping windows) across all sessions.
    -> (path, cnt, rank) with path = 'a>b>c'.

    Pinned semantics (restated verbatim in the oracle — change both or
    neither): sessions use event_sessions' EXACT boundary rule (strict
    > gap on (us, event_id) NULLS LAST order); a path = three
    consecutive events of the SAME session (lead()-based, overlapping);
    rank (cnt desc, path asc) — deterministic total order — top k.

    Scale shape: one user-keyed shuffle shared by the session flags and
    the leads (same window), then a map-side-combined path count and a
    driver-bounded top-k."""
    gap_us = int(gap_seconds) * 1_000_000
    base = events.select(
        F.col("user_id").cast("long").alias("user_id"),
        _us_col("ts").alias("us"),
        F.col("event_id").cast("long").alias("eid"),
        F.col("event_type").alias("etype"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").asc_nulls_last(), F.col("eid").asc_nulls_last()
    )
    prev = F.lag("us").over(w)
    flagged = base.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("us") - prev) > gap_us), 1).otherwise(0),
    )
    run = (
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    marked = flagged.withColumn("sess", run.cast("long"))
    trip = marked.select(
        "user_id",
        "sess",
        "etype",
        F.lead("etype", 1).over(w).alias("t1"),
        F.lead("etype", 2).over(w).alias("t2"),
        F.lead("sess", 1).over(w).alias("s1"),
        F.lead("sess", 2).over(w).alias("s2"),
    ).where(
        F.col("t2").isNotNull()
        & (F.col("s1") == F.col("sess"))
        & (F.col("s2") == F.col("sess"))
    )
    counts = (
        trip.select(
            F.concat_ws(">", "etype", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counts.orderBy(F.col("cnt").desc(), F.col("path").asc())
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("path").asc())
            ).cast("long"),
        )
        .select("path", F.col("cnt").cast("long").alias("cnt"), "rank")
    )


US_PER_HOUR = 3_600_000_000
ANOM_Z2 = 4.0  # |z| > 2


def event_anomalies(events: DataFrame, z2_threshold: float = ANOM_Z2) -> DataFrame:
    """-> (event_type, hour_h, cnt, z2): hourly count anomalies per
    event type — hours whose count deviates from the type's mean by
    more than 2 population standard deviations (z² > ANOM_Z2), over
    the DENSE hour grid (zero-count hours included; silence is an
    anomaly too).

    Exactness contract: counts/H/Σc/Σc² are exact BIGINTs; the z²
    test and the reported z² cast every factor to DOUBLE BEFORE
    multiplying (the pmi discipline — BIGINT products like H·Σc²
    overflow at scale, and DuckDB promotes where Spark wraps), so
    both engines evaluate bit-identical IEEE expressions:
    z² = (H·c − S)² / (H·Q − S²), anomaly iff z² · denominator-form
    > 4 · (H·Q − S²) — a variance-0 type has H·c−S ≡ 0 and can never
    flag, so the division is always live on emitted rows.

    Scale shape (100 TB): one (type, hour) partial agg over the scan;
    the dense grid is types × hours (driver-tiny at any scale) and
    broadcast onto the counts; per-type stats are a ~|types|-row agg."""
    base = events.select(
        "event_type",
        F.floor(_us_col("ts") / F.lit(US_PER_HOUR)).cast("long").alias("h"),
    )
    cnts = base.groupBy("event_type", "h").agg(F.count("*").alias("c"))
    return anomalies_from_counts(events.sparkSession, cnts, z2_threshold)


def _dense_hour_counts(spark, cnts: DataFrame):
    """SPARSE (event_type, h, c) -> (h0, DENSE per-type hour grid with
    zero hours filled) — the ONE copy of the dense-grid construction
    (global [min, max] hour span from the counts themselves), shared
    by the anomaly derivation and the OLS trend so the grid pins
    cannot drift.  Returns (None, None) on an empty input."""
    h0, h1 = cnts.agg(F.min("h"), F.max("h")).collect()[0]
    if h0 is None:
        return None, None
    hours = spark.range(int(h0), int(h1) + 1).select(F.col("id").alias("h"))
    types = cnts.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    dense = grid.join(cnts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return int(h0), dense


def anomalies_from_counts(
    spark, cnts: DataFrame, z2_threshold: float = ANOM_Z2
) -> DataFrame:
    """SPARSE (event_type, h, c) hourly counts -> the anomaly table:
    the ONE copy of the dense-grid / z² derivation, shared by the
    batch operator and the streaming counter view so the two cannot
    drift.  The global span comes from the counts' own min/max h —
    identical to the batch events' span (an absent hour cannot extend
    it)."""
    h0, dense = _dense_hour_counts(spark, cnts)
    if h0 is None:
        return spark.createDataFrame(
            [], "event_type string, hour_h long, cnt long, z2 double"
        )
    st = dense.groupBy("event_type").agg(
        F.count("*").alias("hh"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
    )
    dd = (
        F.col("hh").cast("double") * F.col("c").cast("double")
        - F.col("s").cast("double")
    )
    vnum = (
        F.col("hh").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    )
    return (
        dense.join(F.broadcast(st), "event_type")
        .where(dd * dd > F.lit(float(z2_threshold)) * vnum)
        .select(
            "event_type",
            F.col("h").cast("long").alias("hour_h"),
            F.col("c").cast("long").alias("cnt"),
            F.round(dd * dd / vnum, 6).alias("z2"),
        )
    )


DECAY_HALF_LIFE_DAYS = 1  # dyadic: weight = 2^-age_days exactly


def item_popularity_decayed(events: DataFrame, k: int = 10) -> DataFrame:
    """-> (item, n_events, pop_u, rank): exponentially time-decayed
    item popularity — each event contributes 2^(-age_days) where
    age_days = max_day − event_day (integer UTC day indices), i.e. a
    one-day half-life.  The recommendation-freshness primitive.

    Exactness contract: 2^-a is exactly representable in double for
    a <= 1074, and both engines compute the SAME power from the SAME
    integer age, but a float SUM of many such terms is shuffle-order-
    dependent — so each contribution is quantized to integer micro
    units FIRST (round(1e6 · 2^-age) — 0 beyond age 20, documented)
    and the aggregate is an exact BIGINT sum.  Rank (pop_u desc, item
    asc), top k; reported pop = pop_u (integer micro units, exact).

    Scale shape (100 TB): max_day is one scalar agg; the decay weight
    is a map-side expression; one (item) partial agg."""
    base = events.select(
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        _day_col("ts").alias("day"),
    ).where(F.col("item").isNotNull())
    mx = base.agg(F.max("day")).collect()[0][0]
    if mx is None:
        return events.sparkSession.createDataFrame(
            [], "item long, n_events long, pop_u long, rank long"
        )
    contrib = F.round(
        F.lit(1_000_000.0)
        * F.pow(F.lit(2.0), -(F.lit(int(mx)) - F.col("day")).cast("double"))
    ).cast("long")
    agg = base.groupBy("item").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(contrib).cast("long").alias("pop_u"),
    )
    w = Window.orderBy(F.col("pop_u").desc(), F.col("item").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("item", "n_events", "pop_u", "rank")
    )


def events_cube(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """-> (event_type, day, lvl, n_events, total_value): the full OLAP
    CUBE over (event_type, UTC day index) — everything events_rollup
    emits PLUS the per-day cross-type subtotals ROLLUP cannot express
    (grouping bitmask lvl = 2 rows); same day derivation and rounding
    as the rollup gate."""
    base = events.select(
        F.col(type_col).alias("event_type"),
        _day_col(ts_col).alias("day"),
        F.col(value_col).cast("double").alias("value"),
    )
    return base.cube("event_type", "day").agg(
        F.grouping_id().cast("long").alias("lvl"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_pivot(events: DataFrame) -> DataFrame:
    """-> (user_id, n_click, n_error, n_purchase, n_signup, n_view,
    n_total, purchase_cents): the per-user activity PIVOT — event_type
    rotated into columns (the BI cross-tab / ES multi-filters agg),
    one wide row per user.

    Pinned semantics (restated verbatim in oracle._EVENT_PIVOT_SQL —
    change both sides or neither): the column set is the PINNED type
    list (an unpinned pivot would change schema when a new type
    appears — unacceptable for a gate or a production sink; unknown
    types still count toward n_total); purchase_cents quantizes each
    purchase's value to exact integer cents (round(value * 100.0)
    BIGINT) per EVENT before the sum (the relational.py money
    discipline — a float sum is shuffle-order-dependent); every user
    with >= 1 event emits.

    Scale shape (100 TB): ONE partial-aggregating groupBy(user_id)
    with conditional aggregates — map-side combine reduces each
    partition to its distinct users before the single shuffle; this
    is exactly the physical plan Spark's .pivot(col, values) API
    compiles to (PivotFirst over an Expand), minus the Expand's
    row-multiplication."""
    cents = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * F.lit(100.0)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    aggs = [
        F.sum(
            F.when(F.col("event_type") == t, 1).otherwise(0)
        ).cast("long").alias(f"n_{t}")
        for t in PIVOT_TYPES
    ]
    return events.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        *aggs,
        F.count("*").cast("long").alias("n_total"),
        F.sum(cents).cast("long").alias("purchase_cents"),
    )


HIST_BIN_CENTS = 2_000  # $20 fixed-width bins


def events_value_histogram(
    events: DataFrame, bin_cents: int = HIST_BIN_CENTS
) -> DataFrame:
    """-> (event_type, bin, n, min_cents, max_cents): fixed-width
    value histogram per event type — the ES histogram aggregation
    beside the date_histogram (turns_per_window) and percentile
    (event_props_rollup) members of the agg family.

    Pinned semantics (restated verbatim in oracle._EVENT_HIST_SQL —
    change both sides or neither): cents = per-event round(value *
    100.0) BIGINT (the event_pivot money discipline — binning the
    raw double would put boundary values engine-dependent), bin =
    cents DIV bin_cents (values are non-negative by corpus law; the
    DIV form is floor there), width 2000 cents; empty bins emit
    nothing (the dense-grid variant is event_anomalies' job);
    min/max cents ride as audit columns.

    Scale shape (100 TB): ONE partial-aggregating groupBy — map-side
    combine bounds the shuffle at (types x touched bins) rows per
    partition."""
    cents = F.round(F.col("value") * F.lit(100.0)).cast("long")
    return (
        events.select(
            "event_type",
            cents.alias("cents"),
        )
        .groupBy(
            "event_type",
            F.expr(f"cents DIV {int(bin_cents)}").cast("long").alias("bin"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").cast("long").alias("min_cents"),
            F.max("cents").cast("long").alias("max_cents"),
        )
    )


AB_SALT = "ab-"


def ab_test_report(events: DataFrame) -> DataFrame:
    """-> (variant, n_users, n_converted, conv_ppm): the A/B
    experiment readout — users deterministically coin-flipped into
    two variants, conversion = >= 1 'purchase' event, rates as exact
    integers (the analysis every event pipeline ships next to the
    funnel).

    Pinned semantics (restated verbatim in oracle._AB_TEST_SQL —
    change both sides or neither): variant = hash60('ab-' || user_id)
    % 2 (the md5-derived salted coin — the domain_mix/train_split
    discipline, independent of every other sampling salt); population
    = DISTINCT user_ids; conv_ppm = (2*1e6*n_converted + n_users) DIV
    (2*n_users) — the integer round-half-away rate, never a float.

    Scale shape (100 TB): one distinct-user aggregate with the
    conversion flag folded in (max of an indicator — map-side
    combined), then a 2-row variant aggregate."""
    from ..functions.textnorm import hash60_col

    per_user = (
        events.select(
            F.col("user_id").cast("long").alias("u"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("conv"),
        )
        .groupBy("u")
        .agg(F.max("conv").alias("conv"))
    )
    variant = hash60_col(
        F.concat(F.lit(AB_SALT), F.col("u").cast("string"))
    ) % F.lit(2)
    return (
        per_user.select(variant.cast("long").alias("variant"), "conv")
        .groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("conv").cast("long").alias("n_converted"),
        )
        .select(
            "variant",
            "n_users",
            "n_converted",
            F.expr(
                "(2 * 1000000 * n_converted + n_users) DIV (2 * n_users)"
            ).cast("long").alias("conv_ppm"),
        )
    )


def funnel_summary(events: DataFrame) -> DataFrame:
    """-> one row (n_entered, n_step2, n_step3, n_converted,
    med_convert_s): the funnel's aggregate readout — users reaching
    each step, completed conversions, and the median time-to-convert
    (the dashboard number beside ab_test_report's variant rates).

    Derives from event_funnel's per-user table (the pinned
    strictly-after chain / horizon), so the step semantics exist
    once.  Pins (restated in oracle._FUNNEL_SUMMARY_SQL): med over
    the CONVERTED users' (t_purchase - t_view) microsecond deltas via
    linear-interpolated percentile (the event_props_rollup parity
    pin), reported as round(med_us / 1e6, 6) seconds; no converted
    users -> NULL.

    Scale shape: the funnel's own shuffles plus one global aggregate
    (exact percentile is the one O(converted) piece — swap
    approx_percentile at real scale, isolated in one expression)."""
    f = event_funnel(events)
    delta = F.when(
        F.col("converted"), F.col("t_purchase") - F.col("t_view")
    )
    return f.agg(
        F.count("*").cast("long").alias("n_entered"),
        F.count("t_click").cast("long").alias("n_step2"),
        F.count("t_purchase").cast("long").alias("n_step3"),
        F.sum(F.col("converted").cast("int")).cast("long").alias(
            "n_converted"
        ),
        F.round(
            F.percentile(delta, F.lit(0.5)) / F.lit(1e6), 6
        ).alias("med_convert_s"),
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """-> (user_id, rec_days, freq, monetary_cents, r, f, m, rfm):
    RFM customer segmentation over purchase events — the classic
    behavioral quintile scoring (recency / frequency / monetary)
    every growth-analytics stack ships.

    Pinned semantics (restated verbatim in oracle._RFM_SQL — change
    both sides or neither): population = users with >= 1 'purchase';
    day = floor(epoch_us / 86400e6) (the cohort pin); rec_days =
    corpus max purchase day - the user's max purchase day; freq =
    purchase count; monetary_cents = per-event round(value * 100.0)
    BIGINT summed exactly (the event_pivot discipline); quintiles via
    ntile(5) under DETERMINISTIC total orders — r on (rec_days ASC,
    user_id ASC) (most recent = 5 after the 6-x flip), f on (freq
    DESC, user_id ASC), m on (monetary_cents DESC, user_id ASC), so
    both engines' identical ntile distribution rule (first n%5
    buckets one extra) assigns identically; r = 6 - ntile so larger
    is better on every axis; rfm = 100*r + 10*f + m.

    Scale shape: one user-keyed aggregate + three windows over the
    (small) per-user table."""
    pur = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(_us_col("ts") / F.lit(US_PER_DAY)).cast("long").alias("day"),
        F.round(F.col("value") * F.lit(100.0)).cast("long").alias("cents"),
    )
    per_user = pur.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count("*").cast("long").alias("freq"),
        F.sum("cents").cast("long").alias("monetary_cents"),
    )
    return rfm_from_user_stats(per_user)


def rfm_from_user_stats(per_user: DataFrame) -> DataFrame:
    """(user_id, last_day, freq, monetary_cents) -> the RFM table:
    the ONE copy of the quintile derivation, shared by the batch
    operator and the streaming counter view so the two cannot
    drift."""
    maxday = per_user.agg(F.max("last_day").alias("gmax"))
    base = per_user.crossJoin(F.broadcast(maxday)).select(
        "user_id",
        (F.col("gmax") - F.col("last_day")).cast("long").alias("rec_days"),
        "freq",
        "monetary_cents",
    )
    wr = Window.orderBy(F.col("rec_days").asc(), F.col("user_id").asc())
    wf = Window.orderBy(F.col("freq").desc(), F.col("user_id").asc())
    wm = Window.orderBy(
        F.col("monetary_cents").desc(), F.col("user_id").asc()
    )
    return base.select(
        "user_id",
        "rec_days",
        "freq",
        "monetary_cents",
        (F.lit(6) - F.ntile(5).over(wr)).cast("long").alias("r"),
        (F.lit(6) - F.ntile(5).over(wf)).cast("long").alias("f"),
        (F.lit(6) - F.ntile(5).over(wm)).cast("long").alias("m"),
    ).withColumn(
        "rfm",
        (F.lit(100) * F.col("r") + F.lit(10) * F.col("f") + F.col("m"))
        .cast("long"),
    )


def event_trend(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """-> (event_type, n_hours, sx, sy, sxy, sxx, slope_micro,
    mean_micro): per-type ordinary-least-squares trend of the hourly
    event count over the DENSE hour grid (zero hours included —
    silence pulls the trend down, the event_anomalies grid pin).

    All-integer exactness contract (the clarity/pmi discipline):
    x = h - h0 (0-based offsets off the global grid start), exact
    BIGINT sums (n, Sx, Sy, Sxy, Sxx); slope = (n·Sxy - Sx·Sy) /
    (n·Sxx - Sx²) quantized to micro with the SIGN-AWARE
    round-half-away integer division (the k-means centroid rule —
    slopes are routinely negative); mean_micro = rha(1e6·Sy, n).
    Types present in fewer than 2 grid hours cannot regress and are
    excluded (den = 0).  The raw sums ride as audit columns (the
    embedding_moments discipline).  Overflow bound: 1e6·n·Sxy must
    stay inside BIGINT — holds while hours³ x peak-count x 1e6 < 2^63
    (≈6k dense hours at count ~100); beyond that, aggregate daily
    before calling.

    Scale shape (100 TB): one (type, hour) partial agg over the scan;
    the dense grid is types x hours and the regression is one more
    tiny agg — nothing materializes per event."""
    base = events.select(
        "event_type",
        F.floor(_us_col(ts_col) / F.lit(US_PER_HOUR)).cast("long").alias("h"),
    )
    cnts = base.groupBy("event_type", "h").agg(F.count("*").alias("c"))
    return trend_from_counts(events.sparkSession, cnts)


def trend_from_counts(spark, cnts: DataFrame) -> DataFrame:
    """SPARSE (event_type, h, c) hourly counts -> the OLS trend table:
    the ONE copy of the regression derivation, shared by the batch
    operator and the streaming counter view (the
    anomalies_from_counts discipline) so the two cannot drift."""
    h0, dense = _dense_hour_counts(spark, cnts)
    if h0 is None:
        return spark.createDataFrame(
            [],
            "event_type string, n_hours long, sx long, sy long, sxy long,"
            " sxx long, slope_micro long, mean_micro long",
        )
    st = (
        dense.select(
            "event_type",
            (F.col("h") - F.lit(h0)).cast("long").alias("x"),
            F.col("c").cast("long").alias("y"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_hours"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
        .where(F.col("n_hours") >= 2)
    )
    return st.selectExpr(
        "event_type",
        "n_hours",
        "sx",
        "sy",
        "sxy",
        "sxx",
        # slope_micro: sign-aware round-half-away of 1e6*num/den
        "CAST(CASE WHEN (n_hours*sxy - sx*sy) >= 0 "
        " THEN (2*1000000*(n_hours*sxy - sx*sy) + (n_hours*sxx - sx*sx))"
        "      DIV (2*(n_hours*sxx - sx*sx)) "
        " ELSE -((2*1000000*(sx*sy - n_hours*sxy) + (n_hours*sxx - sx*sx))"
        "      DIV (2*(n_hours*sxx - sx*sx))) END AS BIGINT) AS slope_micro",
        "CAST((2*1000000*sy + n_hours) DIV (2*n_hours) AS BIGINT)"
        " AS mean_micro",
    )


def session_entry_exit(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_S,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (user_id, session_idx, entry_type, exit_type, n_events,
    duration_s): per-session landing/exit event types — the
    entry/exit-page analysis on top of the pinned sessionization
    (event_sessions' gap/order rules inherited verbatim: STRICT >
    gap, order (ts, event_id) with explicit NULLS LAST on BOTH
    directions — DuckDB defaults NULLS FIRST on DESC where Spark
    defaults NULLS LAST, the event_sessions lesson).  entry = the
    session's first event's type, exit = its last; duration_s =
    (end_us - start_us) DIV 1e6 exact BIGINT.

    Scale shape: the same single (user) window pass as
    event_sessions plus two in-partition row_numbers — no extra
    shuffle."""
    gap_us = int(gap_seconds) * 1_000_000
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        _us_col(ts_col).alias("us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col("event_type").alias("etype"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").asc_nulls_last(), F.col("eid").asc_nulls_last()
    )
    prev = F.lag("us").over(w)
    flagged = base.withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("us") - prev) > gap_us), 1).otherwise(0),
    )
    run = (
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    marked = flagged.withColumn("session_idx", run.cast("long"))
    ws_a = Window.partitionBy("user_id", "session_idx").orderBy(
        F.col("us").asc_nulls_last(), F.col("eid").asc_nulls_last()
    )
    ws_d = Window.partitionBy("user_id", "session_idx").orderBy(
        F.col("us").desc_nulls_last(), F.col("eid").desc_nulls_last()
    )
    ranked = marked.withColumn("ra", F.row_number().over(ws_a)).withColumn(
        "rd", F.row_number().over(ws_d)
    )
    return ranked.groupBy("user_id", "session_idx").agg(
        F.max(F.when(F.col("ra") == 1, F.col("etype"))).alias("entry_type"),
        F.max(F.when(F.col("rd") == 1, F.col("etype"))).alias("exit_type"),
        F.count("*").cast("long").alias("n_events"),
        F.expr("CAST((max(us) - min(us)) DIV 1000000 AS BIGINT)").alias(
            "duration_s"
        ),
    )


def event_asof_forward(
    events: DataFrame,
    left_type: str = ASOF_LEFT,
    right_type: str = ASOF_RIGHT,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (event_id, user_id, us, matched_eid, matched_us, lead_us):
    the FORWARD as-of join — for every ``left_type`` event, the
    EARLIEST ``right_type`` event by the same user with
    ``right.us >= left.us`` (an equal-timestamp right IS visible);
    ties among rights at the same us resolve to the SMALLEST event_id.
    Lefts with no later right keep nulls.  The deliberate mirror of
    event_asof (backward): both textbook directions exist, never
    "unify" them.

    Implementation: the same tagged-union single-window shape run over
    the REVERSED total order — (us DESC, side ASC, eid DESC), all
    NULLS LAST explicitly on both engines (DuckDB defaults NULLS FIRST
    on DESC) — so last(ignorenulls) picks the nearest FORWARD right,
    min-eid on ties.  One shuffle, no range join."""
    base = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(type_col).alias("etype"),
        _us_col(ts_col).alias("us"),
        F.col(id_col).cast("long").alias("eid"),
    )
    tagged = base.where(F.col("etype").isin([left_type, right_type])).select(
        "user_id",
        "us",
        "eid",
        F.when(F.col("etype") == left_type, F.lit(1)).otherwise(F.lit(0)).alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("us").desc_nulls_last(),
            F.col("side").asc_nulls_last(),
            F.col("eid").desc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = (F.col("side") == 0) & F.col("us").isNotNull()
    right_us = F.when(is_right, F.col("us"))
    right_eid = F.when(is_right, F.col("eid"))
    enriched = tagged.withColumn(
        "matched_us", F.last(right_us, ignorenulls=True).over(w)
    ).withColumn("matched_eid", F.last(right_eid, ignorenulls=True).over(w))
    return enriched.where(F.col("side") == 1).select(
        F.col("eid").alias("event_id"),
        "user_id",
        "us",
        "matched_eid",
        "matched_us",
        (F.col("matched_us") - F.col("us")).alias("lead_us"),
    )
