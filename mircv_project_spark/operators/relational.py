"""Relational OLAP queries over the TPC-H-shaped tables — the classic
warehouse surface of the analytics engine (scan → filter → join →
group-aggregate), expressed as plain Catalyst plans.

The reference engine is IR-only; these exercise the half of "analytics
engine" its users get for free by being on Spark: whole-stage-codegen
aggregation, equi-joins with AQE, predicate pushdown to parquet.

Exactness contract: money/quantity aggregates are FLOAT SUMS in the
textbook formulations — shuffle-order-dependent at round 6 — so every
per-row measure is quantized to an exact integer FIRST (cents for raw
columns, micro-units for derived expressions; the per-row double
expression is identical on both engines, and integer sums are
order-independent).  Averages are then derived from the exact integer
sums, one double division each, round 6.  Multiplication order is
pinned: (price * (1 - disc)) then * (1 + tax) — restated verbatim in
the oracle.

Pinned gate params: ship cutoff 1998-09-02, Q3 segment 'BUILDING' and
order/ship cutoff 1998-01-01, top-k = 10 with (revenue desc, orderkey
asc) ties.  Date columns are TIMESTAMP_NTZ, so scan filters compare
the column against an NTZ literal directly — tz-independent by type
AND parquet-pushable (an `unix_micros(cast(...))` wrapper would block
pushdown; the *_US constants are the same instants as naive epochs,
which is what the DuckDB oracle's epoch_us comparisons use).
Projected epoch columns still use the events-suite unix_micros
convention.

Scale shape (100 TB): Q1 is scan+filter+partial-agg into ~4 groups
(the NTZ filter and the 7-column projection push down to parquet —
plan-tested).  Q3 is
two equi-joins on their natural keys — no broadcast hints: customer
and orders are NOT driver-small at scale; AQE picks broadcast when a
side is (and handles skew).  Q4 is a left-semi join (existence only —
never materializes matching lineitem multiplicity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHIP_CUTOFF = "1998-09-02 00:00:00"  # naive epoch 904694400000000 us
Q3_CUTOFF = "1998-01-01 00:00:00"  # naive epoch 883612800000000 us
Q3_SEGMENT = "BUILDING"
Q3_K = 10


def _us(col: str):
    """tz-free epoch micros (same convention as operators/events.py:
    Spark unix_micros on the naive value == DuckDB epoch_us)."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _ntz(s: str):
    """Foldable TIMESTAMP_NTZ literal — comparisons against an NTZ
    column are tz-independent and reach the parquet scan as
    PushedFilters."""
    return F.to_timestamp_ntz(F.lit(s))


def _cents(col: str):
    return F.round(F.col(col) * F.lit(100.0)).cast("long")


def _micro(expr):
    return F.round(expr * F.lit(1_000_000.0)).cast("long")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary of
    lines shipped on or before the cutoff.  Integer sums (cents /
    micro-units), averages derived from them (round 6)."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    base = (
        lineitem.where(F.col("l_shipdate") <= _ntz(SHIP_CUTOFF))
        .select(
            "l_returnflag",
            "l_linestatus",
            _cents("l_quantity").alias("qty_c"),
            _cents("l_extendedprice").alias("price_c"),
            _micro(F.col("l_discount")).alias("disc_u"),
            _micro(disc_price).alias("disc_price_u"),
            _micro(charge).alias("charge_u"),
        )
    )
    agg = base.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("count_order"),
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("price_c").alias("sum_base_c"),
        F.sum("disc_price_u").alias("sum_disc_price_u"),
        F.sum("charge_u").alias("sum_charge_u"),
        F.sum("disc_u").alias("sum_disc_u"),
    )
    n = F.col("count_order").cast("double")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.col("count_order").cast("long").alias("count_order"),
        F.col("sum_qty_c").cast("long").alias("sum_qty_c"),
        F.col("sum_base_c").cast("long").alias("sum_base_c"),
        F.col("sum_disc_price_u").cast("long").alias("sum_disc_price_u"),
        F.col("sum_charge_u").cast("long").alias("sum_charge_u"),
        F.round(F.col("sum_qty_c") / (n * F.lit(100.0)), 6).alias("avg_qty"),
        F.round(F.col("sum_base_c") / (n * F.lit(100.0)), 6).alias("avg_price"),
        F.round(F.col("sum_disc_u") / (n * F.lit(1_000_000.0)), 6).alias(
            "avg_disc"
        ),
    )


def top_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = Q3_SEGMENT,
    k: int = Q3_K,
) -> DataFrame:
    """TPC-H Q3 shape: top-k unshipped-revenue orders for one market
    segment — orders placed before the cutoff with lines shipped after
    it; revenue = exact micro-unit sum of price*(1-disc)."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < _ntz(Q3_CUTOFF)).select(
        "o_orderkey",
        "o_custkey",
        _us("o_orderdate").alias("orderdate_us"),
        "o_orderpriority",
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    lines = lineitem.where(F.col("l_shipdate") > _ntz(Q3_CUTOFF)).select(
        "l_orderkey", _micro(disc_price).alias("rev_u")
    )
    joined = (
        lines.join(ords, lines.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "orderdate_us", "o_orderpriority")
        .agg(F.sum("rev_u").alias("revenue_u"))
    )
    return (
        joined.orderBy(F.col("revenue_u").desc(), F.col("o_orderkey").asc())
        .limit(k)
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.col("revenue_u").cast("long").alias("revenue_u"),
            F.col("orderdate_us").cast("long").alias("orderdate_us"),
            "o_orderpriority",
        )
    )


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders having at least one
    line shipped strictly after the order date (existence via left-semi
    join — multiplicity never materializes)."""
    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    l = lineitem.select("l_orderkey", "l_shipdate")
    hit = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .select("o_orderpriority", F.col("order_count").cast("long").alias("order_count"))
    )


Q5_REGION = "ASIA"
Q5_LO = "1996-01-01 00:00:00"  # naive epoch 820454400000000 us
Q5_HI = "1997-01-01 00:00:00"  # naive epoch 852076800000000 us


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = Q5_REGION,
) -> DataFrame:
    """TPC-H Q5 shape: per-nation revenue from orders placed in
    [Q5_LO, Q5_HI) where customer and supplier share the nation,
    restricted to one region.  -> (n_name, revenue_u), exact micro-unit
    sums.

    Scale shape: region (5 rows) and nation (25) are the textbook
    explicitly-broadcast dims — they prune customer BEFORE the big
    joins; supplier is broadcast too (supplier << lineitem in TPC-H's
    own scaling).  The two big joins (orders⋈customer, lineitem⋈orders)
    stay key-partitioned equi-joins; the s_nationkey = c_nationkey
    equality rides the lineitem⋈supplier join as a residual so no
    row-pair blowup.  Order-date filter is an NTZ literal — pushed to
    the orders scan."""
    nat = (
        nation.join(
            F.broadcast(
                region.where(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", "c_nationkey", "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= _ntz(Q5_LO))
        & (F.col("o_orderdate") < _ntz(Q5_HI))
    ).select("o_orderkey", "o_custkey")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    lines = lineitem.select(
        "l_orderkey", "l_suppkey", _micro(disc_price).alias("rev_u")
    )
    sup = supplier.select("s_suppkey", "s_nationkey")
    return (
        lines.join(ords, lines.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(sup),
            (lines.l_suppkey == sup.s_suppkey)
            & (sup.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum("rev_u").alias("revenue_u"))
        .select("n_name", F.col("revenue_u").cast("long").alias("revenue_u"))
    )


Q6_LO = "1996-01-01 00:00:00"  # naive epoch 820454400000000 us
Q6_HI = "1997-01-01 00:00:00"  # naive epoch 852076800000000 us
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07  # raw-double bounds, inclusive
Q6_QTY = 24.0


def forecast_revenue_change(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: the what-if revenue from dropping small
    discounts — ONE scan, every predicate pushed to parquet, a single
    global integer sum.  Discount bounds compare the RAW double column
    (both engines read identical parquet doubles; no quantize-then-
    compare drift at the boundary).  -> (revenue_u, n_lines)."""
    base = lineitem.where(
        (F.col("l_shipdate") >= _ntz(Q6_LO))
        & (F.col("l_shipdate") < _ntz(Q6_HI))
        & (F.col("l_discount") >= F.lit(Q6_DISC_LO))
        & (F.col("l_discount") <= F.lit(Q6_DISC_HI))
        & (F.col("l_quantity") < F.lit(Q6_QTY))
    )
    return base.agg(
        F.sum(_micro(F.col("l_extendedprice") * F.col("l_discount")))
        .cast("long")
        .alias("revenue_u"),
        F.count("*").cast("long").alias("n_lines"),
    )


Q10_LO = "1996-01-01 00:00:00"
Q10_HI = "1996-07-01 00:00:00"  # naive epoch 836179200000000 us
Q10_K = 20


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = Q10_K,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned
    items ('R' lines of orders placed in [Q10_LO, Q10_HI)); nation is
    the broadcast dim; the two big joins stay key-partitioned
    equi-joins for AQE.  Rank (revenue desc, custkey asc).
    -> (c_custkey, c_name, n_name, acctbal_c, revenue_u)."""
    ords = orders.where(
        (F.col("o_orderdate") >= _ntz(Q10_LO))
        & (F.col("o_orderdate") < _ntz(Q10_HI))
    ).select("o_orderkey", "o_custkey")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    lines = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", _micro(disc_price).alias("rev_u")
    )
    cust = customer.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "n_name", _cents("c_acctbal").alias("acctbal_c"))
    return (
        lines.join(ords, lines.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name", "acctbal_c")
        .agg(F.sum("rev_u").alias("revenue_u"))
        .orderBy(F.col("revenue_u").desc(), F.col("c_custkey").asc())
        .limit(k)
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            "n_name",
            F.col("acctbal_c").cast("long").alias("acctbal_c"),
            F.col("revenue_u").cast("long").alias("revenue_u"),
        )
    )


Q14_LO = "1996-01-01 00:00:00"
Q14_HI = "1996-02-01 00:00:00"  # naive epoch 823132800000000 us
Q14_PROMO = "PROMO"  # exact p_type equality (synthetic types are words)


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promo-part share of one ship-month's revenue.
    Part is the broadcast dim; both sums are exact micro-unit integers
    and the share is ONE double division, round 6.
    -> (promo_revenue_u, total_revenue_u, promo_share)."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    lines = lineitem.where(
        (F.col("l_shipdate") >= _ntz(Q14_LO))
        & (F.col("l_shipdate") < _ntz(Q14_HI))
    ).select("l_partkey", _micro(disc_price).alias("rev_u"))
    joined = lines.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        lines.l_partkey == F.col("p_partkey"),
    )
    agg = joined.agg(
        F.sum(
            F.when(F.col("p_type") == Q14_PROMO, F.col("rev_u")).otherwise(
                F.lit(0)
            )
        ).alias("promo_u"),
        F.sum("rev_u").alias("total_u"),
    )
    return agg.select(
        F.col("promo_u").cast("long").alias("promo_revenue_u"),
        F.col("total_u").cast("long").alias("total_revenue_u"),
        F.round(
            F.lit(100.0) * F.col("promo_u").cast("double")
            / F.col("total_u").cast("double"),
            6,
        ).alias("promo_share"),
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING zero-order customers (the left join is the point of the
    query).  All-integer — trivially exact across engines.
    -> (c_count, custdist), ordered by (custdist desc, c_count desc).

    Scale shape: one outer equi-join on custkey (AQE picks the
    strategy), one count per customer, one tiny re-agg over at most
    max-order-count distinct groups."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            customer.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .select(
            F.col("c_count").cast("long").alias("c_count"),
            F.col("custdist").cast("long").alias("custdist"),
        )
    )


Q18_QTY_CENTS = 200 * 100  # orders with total quantity > 200 (exact cents)
Q18_K = 10


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    k: int = Q18_K,
) -> DataFrame:
    """TPC-H Q18 shape: top-k largest orders by total price among
    orders whose summed line quantity exceeds the threshold.  Quantity
    sums in exact cents; the threshold compare is integer (> 20000
    cents == > 200.0) so no float boundary exists.  Ties pinned
    (totalprice_c desc, o_orderkey asc).

    Scale shape: the quantity sum is a lineitem-only partial agg on
    l_orderkey (map-side combine), the HAVING filter runs before any
    join, and only qualifying orders join customer/orders."""
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_cents("l_quantity")).alias("sum_qty_c"))
        .where(F.col("sum_qty_c") > F.lit(Q18_QTY_CENTS))
    )
    joined = (
        qty.join(orders, qty.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").cast("long").alias("c_custkey"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            _us("o_orderdate").alias("orderdate_us"),
            _cents("o_totalprice").alias("totalprice_c"),
            F.col("sum_qty_c").cast("long").alias("sum_qty_c"),
        )
    )
    return joined.orderBy(
        F.col("totalprice_c").desc(), F.col("o_orderkey").asc()
    ).limit(k)


# Q19 predicate bands: (brand, max p_size, qty lo, qty hi) — size from
# 1, quantity endpoints inclusive, compared on the RAW parquet doubles
# (the Q6 pin: quantize-then-compare would drift at the bounds).
# Brands/sizes chosen to be non-empty on the driver corpora at every SF
# (the synthetic part table has brands Brand#1..25).
Q19_BANDS = [
    ("Brand#11", 20, 1.0, 15.0),
    ("Brand#12", 30, 10.0, 30.0),
    ("Brand#13", 40, 20.0, 45.0),
]


def discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from lines matching any of three
    (brand, size, quantity) bands — the classic OR-of-ANDs predicate
    that exercises disjunctive pushdown over a join.
    -> one row (revenue_u, n_lines), exact micro-unit sum.

    Scale shape: the part-side predicate (brand IN ... AND size <=
    max) prunes part BEFORE the join; the quantity bounds (>= min lo,
    <= max hi across bands) prune lineitem at the scan; the exact
    band pairing is evaluated on the joined rows."""
    band = None
    for brand, size_hi, qlo, qhi in Q19_BANDS:
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1)
            & (F.col("p_size") <= size_hi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )
        band = cond if band is None else (band | cond)
    brands = [b for b, _, _, _ in Q19_BANDS]
    max_size = max(s for _, s, _, _ in Q19_BANDS)
    qlo_min = min(q for _, _, q, _ in Q19_BANDS)
    qhi_max = max(q for _, _, _, q in Q19_BANDS)
    p = part.where(
        F.col("p_brand").isin(brands)
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    l = lineitem.where(
        (F.col("l_quantity") >= qlo_min) & (F.col("l_quantity") <= qhi_max)
    ).select("l_partkey", "l_quantity", _micro(disc_price).alias("rev_u"))
    joined = l.join(p, l.l_partkey == p.p_partkey).where(band)
    return joined.agg(
        F.sum("rev_u").cast("long").alias("revenue_u"),
        F.count("*").cast("long").alias("n_lines"),
    )


Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_8"
Q7_LO = "1995-01-01 00:00:00"  # naive epoch 788918400000000 us
Q7_HI = "1997-01-01 00:00:00"  # naive epoch 852076800000000 us


def volume_shipping(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = Q7_NATION_A,
    nation_b: str = Q7_NATION_B,
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations, both
    directions, per ship year — supplier's nation on the lineitem
    side, customer's nation on the orders side.
    -> (supp_nation, cust_nation, l_year, revenue_u), exact micro sums.

    Scale shape: nation (25 rows) broadcasts onto supplier and
    customer; BOTH endpoint filters prune their fact side BEFORE the
    big joins (supplier-side via the broadcast suppkey join, customer
    rows via the nation filter), so only the two nations' rows reach
    the orderkey equi-join.  Year extraction is calendar math on the
    NTZ column — tz-free on both engines."""
    pair = [nation_a, nation_b]
    nat = nation.where(F.col("n_name").isin(pair)).select(
        "n_nationkey", "n_name"
    )
    sup = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = customer.join(
        F.broadcast(nat.select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )),
        customer.c_nationkey == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    lines = lineitem.where(
        (F.col("l_shipdate") >= _ntz(Q7_LO))
        & (F.col("l_shipdate") < _ntz(Q7_HI))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("long").alias("l_year"),
        _micro(disc_price).alias("rev_u"),
    )
    return (
        lines.join(F.broadcast(sup), lines.l_suppkey == sup.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"),
              lines.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .where(
            ((F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b))
            | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_u").cast("long").alias("revenue_u"))
    )


Q8_NATION = "NATION_8"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"
Q8_LO = "1995-01-01 00:00:00"
Q8_HI = "1997-01-01 00:00:00"


def national_market_share(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """TPC-H Q8 shape: one nation's supplier share of a region's
    revenue for one part type, per order year.
    -> (o_year, nation_u, total_u, mkt_share); integer sums, the share
    is ONE double division, round 6 (0 when the nation shipped
    nothing that year — the sums stay exact either way).

    Scale shape: part (type-filtered), supplier+nation, and the
    region-pruned nation list all broadcast; lineitem is pruned by the
    broadcast partkey join before touching orders; orders⋈customer
    stays a key-partitioned equi-join."""
    p = part.where(F.col("p_type") == Q8_TYPE).select("p_partkey")
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    asia_keys = nation.join(
        F.broadcast(region.where(F.col("r_name") == Q8_REGION).select("r_regionkey")),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("an_key"))
    cust = customer.join(
        F.broadcast(asia_keys), customer.c_nationkey == F.col("an_key")
    ).select("c_custkey")
    ords = orders.where(
        (F.col("o_orderdate") >= _ntz(Q8_LO))
        & (F.col("o_orderdate") < _ntz(Q8_HI))
    ).select(
        "o_orderkey", "o_custkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    lines = lineitem.select(
        "l_orderkey", "l_partkey", "l_suppkey", _micro(disc_price).alias("rev_u")
    )
    j = (
        lines.join(F.broadcast(p), lines.l_partkey == p.p_partkey)
        .join(F.broadcast(sup), lines.l_suppkey == sup.s_suppkey)
        .join(ords, lines.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
    )
    agg = j.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("supp_nation") == Q8_NATION, F.col("rev_u")).otherwise(F.lit(0))
        ).cast("long").alias("nation_u"),
        F.sum("rev_u").cast("long").alias("total_u"),
    )
    return agg.select(
        "o_year",
        "nation_u",
        "total_u",
        F.round(
            F.col("nation_u").cast("double") / F.col("total_u").cast("double"), 6
        ).alias("mkt_share"),
    )


Q9_NAME_PIECE = "widget"


def product_type_profit(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    part: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape (adapted: the synthetic schema has no partsupp,
    so p_retailprice stands in for ps_supplycost as the unit cost):
    profit per (supplier nation, order year) over parts whose name
    contains the pinned piece.  amount = price*(1-disc) −
    retailprice*qty, quantized to micro-units per row BEFORE the sum.
    -> (n_name, o_year, profit_u).

    Scale shape: name-filtered part and supplier⋈nation broadcast;
    lineitem pruned by the partkey broadcast join; lineitem⋈orders
    stays key-partitioned."""
    p = part.where(F.col("p_name").contains(Q9_NAME_PIECE)).select(
        "p_partkey", "p_retailprice"
    )
    sup = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey)
        .join(F.broadcast(sup), lineitem.l_suppkey == sup.s_suppkey)
        .join(
            orders.select(
                "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
            ),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum(_micro(amount)).cast("long").alias("profit_u"))
    )


Q15_LO = "1996-01-01 00:00:00"
Q15_HI = "1996-04-01 00:00:00"  # naive epoch 828316800000000 us


def top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the maximum revenue
    over one ship quarter — revenue in exact micro-units, so the max
    and the equality against it are integer-exact (every tied supplier
    is emitted, the textbook's correctness subtlety).
    -> (s_suppkey, s_name, revenue_u).

    Scale shape: per-supplier partial agg on the pruned scan, then an
    all-reduce max (a 1-row broadcast) instead of a rank shuffle."""
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= _ntz(Q15_LO))
            & (F.col("l_shipdate") < _ntz(Q15_HI))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_micro(disc_price)).alias("revenue_u"))
    )
    mx = rev.agg(F.max("revenue_u").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.revenue_u == F.col("mx"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            rev.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("revenue_u").cast("long").alias("revenue_u"),
        )
    )


Q17_BRAND = "Brand#11"


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one
    brand's parts — lines with quantity below 20% of that part's
    average quantity.  The threshold compare is cross-multiplied into
    pure integers (qty_c * 5 * cnt < sum_qty_c) so no float boundary
    exists; avg_yearly derived from the exact cents sum, round 6.
    -> one row (avg_yearly, n_lines).

    Scale shape: brand-filtered part broadcasts twice (stats pass and
    revenue pass); the per-part avg is a partial agg over the pruned
    lineitem join, itself broadcast back (group count == brand's part
    count, driver-small by the brand filter)."""
    p = part.where(F.col("p_brand") == Q17_BRAND).select("p_partkey")
    l = lineitem.join(F.broadcast(p), lineitem.l_partkey == p.p_partkey).select(
        F.col("l_partkey").alias("pk"),
        _cents("l_quantity").alias("qty_c"),
        _cents("l_extendedprice").alias("price_c"),
    )
    stats = l.groupBy("pk").agg(
        F.sum("qty_c").alias("sum_qty_c"), F.count("*").alias("cnt")
    ).select(F.col("pk").alias("spk"), "sum_qty_c", "cnt")
    small = l.join(F.broadcast(stats), l.pk == stats.spk).where(
        F.col("qty_c") * F.lit(5) * F.col("cnt") < F.col("sum_qty_c")
    )
    agg = small.agg(
        F.sum("price_c").alias("sum_price_c"), F.count("*").alias("n_lines")
    )
    return agg.select(
        F.round(
            F.coalesce(F.col("sum_price_c"), F.lit(0)).cast("double")
            / F.lit(700.0),
            6,
        ).alias("avg_yearly"),
        F.col("n_lines").cast("long").alias("n_lines"),
    )


Q12_LO = "1996-01-01 00:00:00"  # naive epoch 820454400000000 us
Q12_HI = "1997-01-01 00:00:00"  # naive epoch 852076800000000 us
Q12_LATE_US = 365 * 86_400_000_000  # "late" = shipped >365 d after order
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def shipping_priority_mix(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (adapted: the synthetic schema has no
    l_shipmode / l_commitdate / l_receiptdate — l_linestatus stands in
    for the shipmode group and "late" = shipped more than Q12_LATE_US
    after the order date): per line status, counts of late lines
    shipped in [Q12_LO, Q12_HI) split by high/low order priority.
    All-integer counts — trivially exact across engines.
    -> (l_linestatus, high_line_count, low_line_count).

    Scale shape: the ship window is an NTZ-literal filter pushed to
    the lineitem scan; the lag test needs both sides so it rides the
    orderkey equi-join as a residual; two conditional counts in one
    partial agg."""
    lines = lineitem.where(
        (F.col("l_shipdate") >= _ntz(Q12_LO))
        & (F.col("l_shipdate") < _ntz(Q12_HI))
    ).select("l_orderkey", "l_linestatus", _us("l_shipdate").alias("ship_us"))
    ords = orders.select(
        "o_orderkey", "o_orderpriority", _us("o_orderdate").alias("ord_us")
    )
    high = F.col("o_orderpriority").isin(list(Q12_HIGH_PRIORITIES))
    return (
        lines.join(ords, lines.l_orderkey == ords.o_orderkey)
        .where(F.col("ship_us") - F.col("ord_us") > F.lit(Q12_LATE_US))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, F.lit(0)).otherwise(F.lit(1)))
            .cast("long")
            .alias("low_line_count"),
        )
    )


Q21_LATE_US = 365 * 86_400_000_000  # same "late" law as Q12
Q21_K = 100


def waiting_suppliers(
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    k: int = Q21_K,
) -> DataFrame:
    """TPC-H Q21 shape (adapted: no commit/receipt dates — "kept the
    order waiting" = this supplier's line shipped more than Q21_LATE_US
    after the order date on a finished ('F') multi-supplier order where
    NO other supplier's line was late): per-supplier count of such
    lines, top-k by (numwait desc, s_name asc).  The exists /
    not-exists pair of the textbook query maps to a left-semi and a
    left-anti join; counts are pure integers.
    -> (s_name, numwait).

    Scale shape: the 'F' filter pushes to the orders scan; both
    existential probes are orderkey equi-joins with the suppkey
    inequality as a residual (hash semi/anti, never a nested loop);
    supplier broadcasts."""
    j = (
        lineitem.select("l_orderkey", "l_suppkey", _us("l_shipdate").alias("ship_us"))
        .join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", _us("o_orderdate").alias("ord_us")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("ship_us") - F.col("ord_us") > F.lit(Q21_LATE_US)).alias("late"),
        )
    )
    late = j.where(F.col("late")).select("l_orderkey", "l_suppkey")
    l2 = j.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    lone_late = late.join(
        l2,
        (late.l_orderkey == l2.o2) & (late.l_suppkey != l2.s2),
        "left_semi",
    ).join(
        l3,
        (late.l_orderkey == l3.o3) & (late.l_suppkey != l3.s3),
        "left_anti",
    )
    return (
        lone_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            lone_late.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


Q22_IDLE_CUTOFF = "1999-01-01 00:00:00"  # naive epoch 915148800000000 us


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q22 shape (adapted: the synthetic schema has no c_phone,
    so the per-nation rollup replaces the phone-prefix rollup, and
    "no orders" is pinned to "no orders since Q22_IDLE_CUTOFF" — the
    synthetic order law gives every customer early orders, which would
    make the literal textbook anti-join vacuous at every SF):
    customers with above-average positive account balance and no
    recent orders, counted per nation.  The avg compare is
    cross-multiplied into pure integers (acctbal_c * cnt_pos >
    sum_pos_c) — no float threshold; the no-recent-orders test is a
    left-anti equi-join on the date-pruned orders scan.
    -> (n_name, numcust, totacctbal_c).

    Scale shape: the positive-balance avg is a 1-row broadcast; the
    anti-join on custkey is the only shuffle; nation broadcasts."""
    c = customer.select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("acctbal_c")
    )
    pos = c.where(F.col("acctbal_c") > 0).agg(
        F.sum("acctbal_c").alias("sum_pos_c"), F.count("*").alias("cnt_pos")
    )
    rich = c.join(F.broadcast(pos), F.col("acctbal_c") * F.col("cnt_pos") > F.col("sum_pos_c"))
    idle = rich.join(
        orders.where(F.col("o_orderdate") >= _ntz(Q22_IDLE_CUTOFF)).select(
            "o_custkey"
        ),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            idle.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("acctbal_c").cast("long").alias("totacctbal_c"),
        )
    )


# ------------------- derived partsupp (Q2/Q11/Q16/Q20) -------------------
#
# The synthetic schema carries no partsupp table, so the four TPC-H
# shapes that need one (Q2 min-cost supplier, Q11 important stock,
# Q16 supplier counts, Q20 excess stock) run over a DETERMINISTICALLY
# DERIVED partsupp — a pinned law restated verbatim in every oracle
# (change both sides or neither):
#
#   m            = greatest(n_suppliers // 4, 1)
#   membership   : (p_partkey % m) == (s_suppkey % m)   -> ~4 suppliers
#                  per part, expressed as an EQUI-JOIN on the residue
#                  (never a cross join + filter)
#   ps_availqty  = (p_partkey*7  + s_suppkey*11) % 9999  + 1
#   ps_supplycost= (p_partkey*13 + s_suppkey*17) % 100000 + 100  CENTS
#
# Costs stay exact integer cents end-to-end (the relational
# discipline); n_suppliers is one count() scalar per job.

PS_PER_PART = 4
PS_QTY_MOD = 9_999
PS_COST_MOD = 100_000
Q16_SIZES = (5, 11, 17, 23, 29, 35, 41, 47)
Q16_EXCL_BRAND = "Brand#2"
Q16_EXCL_TYPE = "ECONOMY"
Q16_COMPLAINT_MOD = 13  # complaint supplier law: s_suppkey % 13 == 2
Q16_COMPLAINT_REM = 2
Q2_REGION = "EUROPE"
Q2_TYPE = "ECONOMY"
Q11_FRACTION_PPM = 100  # keep parts with value > 0.0001 of the total
Q20_NAME_PREFIX = "red"
Q20_REGION = "ASIA"
Q20_YEAR_LO = "1995-01-01 00:00:00"
Q20_YEAR_HI = "1996-01-01 00:00:00"


def derived_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """The pinned derived partsupp (module comment above).  One
    count() scalar + one residue equi-join; at 1e9 parts the join key
    is the m-residue, so each supplier co-locates with its 1/m slice
    of parts — no cross join ever materializes."""
    n_supp = supplier.count()
    m = max(int(n_supp) // PS_PER_PART, 1)
    p = part.select(
        "p_partkey", (F.col("p_partkey") % m).alias("_k")
    )
    s = supplier.select(
        "s_suppkey", (F.col("s_suppkey") % m).alias("_k")
    )
    return p.join(s, "_k").select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        (
            (F.col("p_partkey") * 7 + F.col("s_suppkey") * 11)
            % PS_QTY_MOD + 1
        ).cast("long").alias("ps_availqty"),
        (
            (F.col("p_partkey") * 13 + F.col("s_suppkey") * 17)
            % PS_COST_MOD + 100
        ).cast("long").alias("ps_supplycost_c"),
    )


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape over the derived partsupp: for ECONOMY parts
    whose size is a multiple of 10, the EUROPE supplier(s) achieving
    the MINIMUM supplycost per part — ALL min-tied suppliers emit (the
    Q15 integer-exact-max discipline, min here), then top-k under
    (acctbal_c desc, n_name asc, s_name asc, p_partkey asc).

    Scale shape: region->nation->supplier chain broadcasts (tiny
    dims), the per-part min is one window over the ps join — no
    correlated subquery re-scan."""
    from pyspark.sql import Window

    ps = derived_partsupp(part, supplier)
    eligible_p = part.where(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") % 10 == 0)
    ).select("p_partkey", "p_brand")
    sups = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == Q2_REGION)),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey", "n_name")
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey", "s_name", "n_name",
            _cents("s_acctbal").alias("acctbal_c"),
        )
    )
    joined = (
        ps.join(eligible_p, ps.ps_partkey == eligible_p.p_partkey)
        .join(sups, ps.ps_suppkey == sups.s_suppkey)
    )
    wmin = Window.partitionBy("ps_partkey")
    best = joined.withColumn(
        "min_cost_c", F.min("ps_supplycost_c").over(wmin)
    ).where(F.col("ps_supplycost_c") == F.col("min_cost_c"))
    return (
        best.select(
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            "s_name",
            "n_name",
            "acctbal_c",
            F.col("ps_supplycost_c").alias("cost_c"),
        )
        .orderBy(
            F.col("acctbal_c").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(k)
    )


def important_stock(
    part: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q11 shape over the derived partsupp: per-part stock value
    (supplycost_c x availqty, exact BIGINT) held by NATION_3
    suppliers; keep parts whose value exceeds fraction 0.0001 of the
    nation's total — compared CROSS-MULTIPLIED in integers
    (value_c * 1e4 > total_c), never a float ratio at the boundary."""
    ps = derived_partsupp(part, supplier)
    nat_sups = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    vals = (
        ps.join(nat_sups, ps.ps_suppkey == nat_sups.s_suppkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_c") * F.col("ps_availqty"))
            .cast("long")
            .alias("value_c")
        )
    )
    total = vals.agg(F.sum("value_c").cast("long").alias("total_c"))
    return (
        vals.crossJoin(F.broadcast(total))
        .where(F.col("value_c") * (1_000_000 // Q11_FRACTION_PPM) > F.col("total_c"))
        .select("ps_partkey", "value_c")
        .orderBy(F.col("value_c").desc(), F.col("ps_partkey").asc())
    )


def parts_supplier_counts(
    part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape over the derived partsupp: distinct supplier
    count per (brand, type, size) for the pinned size list, excluding
    Brand#2/ECONOMY parts and 'complaint' suppliers (the adapted law
    s_suppkey % 13 == 2 — no comment column in the synthetic schema)."""
    ps = derived_partsupp(part, supplier)
    parts = part.where(
        ~((F.col("p_brand") == Q16_EXCL_BRAND) & (F.col("p_type") == Q16_EXCL_TYPE))
        & F.col("p_size").isin(*Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ok = ps.where(
        F.col("ps_suppkey") % Q16_COMPLAINT_MOD != Q16_COMPLAINT_REM
    )
    return (
        ok.join(parts, ok.ps_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


def excess_stock_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q20 shape over the derived partsupp: ASIA-region
    suppliers (a single pinned nation is too brittle against the
    synthetic supplier law — 0 rows at sf0.01) holding a ps row for a
    'red'-prefixed part whose availqty exceeds
    half the quantity they shipped of that part during 1995 — the
    half-of-shipped threshold compared CROSS-MULTIPLIED in integers
    (200 * availqty > sum_qty_cents; qty is cents-quantized like every
    measure here).  Ship window filters push to the lineitem scan as
    NTZ literals (the relational pushdown discipline)."""
    ps = derived_partsupp(part, supplier)
    red_parts = part.where(F.col("p_name").startswith(Q20_NAME_PREFIX)).select(
        "p_partkey"
    )
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= _ntz(Q20_YEAR_LO))
            & (F.col("l_shipdate") < _ntz(Q20_YEAR_HI))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity")).cast("long").alias("sum_qty_c"))
    )
    hits = (
        ps.join(red_parts, ps.ps_partkey == red_parts.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .where(F.col("ps_availqty") * 200 > F.col("sum_qty_c"))
        .select("ps_suppkey")
        .distinct()
    )
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == Q20_REGION)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    # alias: `supplier` already feeds the derived partsupp inside
    # `hits`, so this second use must carry distinct attribute ids
    sup = supplier.alias("q20s")
    return (
        hits.join(sup, hits.ps_suppkey == F.col("q20s.s_suppkey"))
        .join(F.broadcast(nat), F.col("q20s.s_nationkey") == nat.n_nationkey)
        .select(
            F.col("q20s.s_suppkey").cast("long").alias("s_suppkey"),
            F.col("q20s.s_name").alias("s_name"),
        )
        .orderBy(F.col("s_name").asc())
    )
