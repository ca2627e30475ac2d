"""TPC-H-style relational analytics over the driver's star schema.

These exercise the engine surface the reference delegates wholesale to
Postgres — multi-table joins, grouped/rollup/distinct aggregation, window
functions, top-k — expressed so Catalyst picks the right physical plan:

- Dimension joins (region/nation/supplier/customer) are broadcast-hash: the
  small side is marked with ``F.broadcast`` where Catalyst's own threshold
  might not see it (after filters it always would, but explicit is free).
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; at 100 TB
  both sides would be bucketed by orderkey at write time to co-locate.
- Money aggregation is decimal-exact (see gold.exact_avg): floating sums are
  partition-order-dependent, which is both nondeterministic at scale and
  un-matchable against a SQL oracle.

Filters are written directly against the scan columns so they push down to
parquet (verified via .explain: PushedFilters on l_shipdate/o_orderdate/
c_mktsegment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .gold import exact_avg

DEC = "decimal(28,6)"


def _dec_sum(col) -> F.Column:
    return F.sum(col.cast(DEC)).cast("double")


def q1_pricing_summary(spark: SparkSession, sf_dir: str, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: pricing summary report. Single scan → partial agg →
    4-way shuffle on (returnflag, linestatus); the shuffle carries ~8 rows
    per partition after map-side combine."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(disc_price).alias("sum_disc_price"),
            _dec_sum(charge).alias("sum_charge"),
            exact_avg("l_quantity").alias("avg_qty"),
            exact_avg("l_extendedprice").alias("avg_price"),
            exact_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str, cutoff: str = "1998-06-30") -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers ⋈ orders ⋈ lineitem,
    revenue per order, top 10. Customer side is broadcast after the
    segment filter; orders⋈lineitem shuffles on orderkey. Top-k plans as
    TakeOrderedAndProject (no global sort)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp_ntz")
    )
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "inner",
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"), "o_orderpriority")
        .agg(_dec_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_regional_revenue(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: region → nation → customer → orders → lineitem with
    the 'local supplier' condition (s_nationkey = c_nationkey). All
    dimension hops broadcast; the single big shuffle is orders ⋈ lineitem."""
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    nat = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    dims = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey, "inner")
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey, "inner")
        .select("c_custkey", "c_nationkey", "n_name")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey, "inner")
        .join(
            F.broadcast(sup),
            (li.l_suppkey == sup.s_suppkey) & (dims.c_nationkey == sup.s_nationkey),
            "inner",
        )
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.groupBy("n_name").agg(_dec_sum(revenue).alias("revenue"))


def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregate (subtotals + grand total) — integer-exact metrics."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
    )


def distinct_customers_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate in Spark."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
        )
    )


def topk_customers_per_nation(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k per group via ranked window — the canonical OLAP pattern the
    reference's top-5-categories query approximates globally."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal", "rank")
    )


def running_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order totals with a running cumulative sum (framed window).
    Decimal accumulation keeps the prefix sums exact and deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("daily_dec"),
        F.count("*").alias("n_orders"),
    )
    w = Window.orderBy("order_date").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "order_date",
        "n_orders",
        F.col("daily_dec").cast("double").alias("daily_revenue"),
        F.sum("daily_dec").over(w).cast("double").alias("running_revenue"),
    )


def events_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event rollup — the streaming table's batch twin (tumbling
    1-day window ≡ group by date)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count("*").alias("n"),
        _dec_sum(F.col("value")).alias("total_value"),
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value")).alias("avg_value"),
    )


STRATA_K = 50


def events_stratified_sample(spark: SparkSession, sf_dir: str, k: int = STRATA_K) -> DataFrame:
    """Exact class-balanced sampling: k rows per event_type, selected by
    content-addressed md5 rank over event_id — the reproducible
    stratified sampler a training pipeline uses to balance skewed event
    classes. A seeded sample() is partition-dependent and
    engine-specific; the md5 order is a fixed uniform permutation both
    engines replay bit-identically (the text._hash_bucket idiom, full
    56-bit value — mod 2^56 is the identity on a 14-hex-digit hash).
    The per-stratum top-k compiles to WindowGroupLimit (rank pushdown,
    plan-asserted): each map task keeps at most k rows per type BEFORE
    the exchange, so the shuffle carries ~(tasks × types × k) rows, not
    the table — the same property that makes this safe on a skewed
    100 TB event log where one type dominates."""
    from .text import _hash_bucket

    ev = load_table(spark, sf_dir, "events")
    skey = _hash_bucket(1 << 56, key=F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(F.asc("skey"), F.asc("event_id"))
    return (
        ev.select("event_type", "event_id", skey.alias("skey"))
        .withColumn("srank", F.row_number().over(w).cast("int"))
        .filter(F.col("srank") <= k)
    )


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the props column (get_json_object →
    JVM-side Jackson; no Python boundary)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


COHORT_EPOCH = "2024-01-01"  # week-0 anchor for cohort arithmetic
RFM_ASOF = "1998-12-31"  # fixed "today" for recency so runs are reproducible


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, Recency (days since last order at a
    pinned as-of date), Frequency (order count) and Monetary (decimal-exact
    total spend), each bucketed into quartiles with ntile — ties broken by
    custkey so the quartile assignment is deterministic and
    SQL-reproducible. One agg shuffle + three cheap windows over the 1-row-
    per-customer aggregate (Spark reuses nothing between them — each orders
    by a different key — but the windowed table is #customers rows, not
    #orders). The classic CRM segmentation shape on the TPC-H schema."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(RFM_ASOF), F.max("o_orderdate")).cast("long").alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("monetary_dec"),
    )
    w_r = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
    w_f = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    w_m = Window.orderBy(F.desc("monetary_dec"), F.asc("o_custkey"))
    return per_cust.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
        F.ntile(4).over(w_r).alias("r_quartile"),
        F.ntile(4).over(w_f).alias("f_quartile"),
        F.ntile(4).over(w_m).alias("m_quartile"),
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the week of their
    FIRST event; each later week of activity increments the cohort's
    retention cell at its week offset. Weeks are day-number arithmetic from
    a fixed epoch using integral `div` — truncation toward zero on BOTH
    engines (Spark `div` ≡ DuckDB `//`; a float floor() would diverge from
    DuckDB's truncating `//` for pre-epoch days) and free of
    date_trunc('week') locale edge cases. Two shuffles: min-per-user, then
    the distinct (cohort, offset, user) count — both key-partitioned, no
    window over the raw stream. The classic product-analytics companion to
    `events_funnel`."""
    ev = load_table(spark, sf_dir, "events")
    week = F.expr(f"datediff(to_date(ts), date'{COHORT_EPOCH}') div 7").cast("long")
    acts = ev.select("user_id", week.alias("week_idx")).distinct()
    cohorts = acts.groupBy("user_id").agg(F.min("week_idx").alias("cohort_week"))
    return (
        acts.join(cohorts, "user_id")
        .select(
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


def events_daily_anomalies(spark: SparkSession, sf_dir: str, z_limit: float = 2.0) -> DataFrame:
    """Volume anomaly detection: flag (day, event_type) cells whose daily
    event count deviates more than `z_limit` standard deviations from that
    type's cross-day mean. Engine-exact by construction: counts are
    integers, so the per-type sum and sum-of-squares are EXACT long
    arithmetic (a naive stddev over doubles is partition-order-dependent
    and unverifiable); mean/variance/z then derive through single IEEE
    operations mirrored verbatim in the oracle. One agg shuffle + one
    per-type window over the tiny daily table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    stats = daily.select(
        "day",
        "event_type",
        "n",
        F.count("*").over(w).alias("n_days"),
        F.sum("n").over(w).alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sumsq_n"),
    )
    mean = F.col("sum_n") / F.col("n_days")
    var = F.col("sumsq_n") / F.col("n_days") - mean * mean
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        stats.filter(var > 0)
        .select(
            "day",
            "event_type",
            "n",
            mean.alias("mean_n"),
            z.alias("z_score"),
            (F.abs(z) > z_limit).alias("is_anomaly"),
        )
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user converts a
    stage only with an event STRICTLY after their previous stage's earliest
    qualifying event. Three filtered min-aggregations chained by broadcast-
    friendly per-user joins (each stage's table is one row per user —
    shrinks monotonically down the funnel); time-to-convert is averaged
    with a single integer-sum / count division, no float accumulation.

    Reference analogue: the dashboard KPI tiles
    (/root/reference/streamlit_app/dashboard.py) are single-stage counts;
    the funnel extends them to ordered multi-stage conversion."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = ev.select("user_id", "event_type", us.alias("us"))
    views = (
        base.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("view_us"))
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("us") > F.col("view_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("click_us"), F.first("view_us").alias("view_us"))
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("us") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("purchase_us"), F.first("view_us").alias("view_us"))
    )
    n_view = views.agg(F.count("*").alias("n")).select("n")
    n_click = clicks.agg(F.count("*").alias("n")).select("n")
    n_purch = purchases.agg(
        F.count("*").alias("n"),
        F.sum(F.col("purchase_us") - F.col("view_us")).alias("sum_us"),
    )
    return (
        n_view.select(F.col("n").alias("n_view_users"))
        .crossJoin(n_click.select(F.col("n").alias("n_click_after_view")))
        .crossJoin(
            n_purch.select(
                F.col("n").alias("n_full_funnel"),
                F.col("sum_us").alias("sum_convert_us"),
            )
        )
        .select(
            "n_view_users",
            "n_click_after_view",
            "n_full_funnel",
            (F.col("n_click_after_view") / F.col("n_view_users")).alias("click_rate"),
            (F.col("n_full_funnel") / F.col("n_view_users")).alias("funnel_rate"),
            (F.col("sum_convert_us") / F.col("n_full_funnel") / F.lit(1000000.0)).alias(
                "avg_convert_sec"
            ),
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: lag(ts) per user → new-session flag on
    gap > threshold → cumulative-sum session ids → per-user session stats.
    Two windows over the same (user_id, ts) partitioning — Spark reuses the
    sort, one shuffle total. At 100 TB this is exactly the batch shape;
    the streaming twin is session_window() in streaming/events.py."""
    ev = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (NTZ wall time → epoch micros under the UTC
    # session); second-truncated diffs are ambiguous at boundaries
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gapped = ev.withColumn("gap_us", us - F.lag(us).over(by_user)).withColumn(
        "new_session",
        F.when(
            F.col("gap_us").isNull() | (F.col("gap_us") > gap_minutes * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    sessions = gapped.withColumn("session_id", F.sum("new_session").over(by_user))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("events_in_session")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.max("events_in_session").alias("max_session_events"),
        F.sum("events_in_session").alias("total_events"),
    )


def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders with at least one
    late lineitem — EXISTS as a left-semi join (no row multiplication,
    no distinct needed)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    late = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer including
    zero-order customers — LEFT OUTER join preserved through a two-level
    aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips NULLs
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q18_large_volume_orders(spark: SparkSession, sf_dir: str, min_qty: int = 300) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING → filter-after-agg), joined back to customer/order detail.
    The HAVING aggregate runs first and is tiny, so the join back is
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey, "inner")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
        .select("c_custkey", "c_name", "o_orderkey", F.to_date("o_orderdate").alias("orderdate"),
                "o_totalprice", "total_qty")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: scan-only conjunctive filter + single agg — every predicate
    pushes to parquet (row-group min/max skipping at scale)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        _dec_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between supplier-nation and
    customer-nation pairs per year. Two independent nation broadcasts with
    disambiguating aliases; the fact join shuffles once on orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))


def q8_market_share(spark: SparkSession, sf_dir: str, nation: str = "NATION_3") -> DataFrame:
    """TPC-H Q8 shape: a nation's supplier share of yearly revenue —
    conditional-sum ratio over the same decimal-exact aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    per_year = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("n_name") == nation, vol)).alias("nation_dec"),
        F.sum(vol).alias("total_dec"),
    )
    return per_year.select(
        "o_year",
        F.coalesce(F.col("nation_dec").cast("double"), F.lit(0.0)).alias("nation_volume"),
        F.col("total_dec").cast("double").alias("total_volume"),
        (
            F.coalesce(F.col("nation_dec").cast("double"), F.lit(0.0))
            / F.col("total_dec").cast("double")
        ).alias("mkt_share"),
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 core pattern (two-bucket conditional counts per group),
    adapted to available columns: per linestatus, count critical
    (1-URGENT/2-HIGH) vs other-priority orders with 1997 shipments."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(crit, 1)).alias("high_line_count"),
            F.count(F.when(~crit, 1)).alias("low_line_count"),
        )
    )


def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional/total ratio with the
    part dimension broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    agg = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", vol)).alias("promo_dec"),
        F.sum(vol).alias("total_dec"),
    )
    return agg.select(
        (
            F.lit(100.0)
            * F.coalesce(F.col("promo_dec").cast("double"), F.lit(0.0))
            / F.col("total_dec").cast("double")
        ).alias("promo_revenue_pct")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str, brand: str = "Brand#3") -> DataFrame:
    """TPC-H Q17: lineitems below 20% of their part's average quantity —
    the correlated subquery becomes a per-part aggregate joined back. The
    brand-filtered part dimension is broadcast (selective filter); the
    avg_qty join-back carries NO hint — it is one row per partkey
    (O(|part|), un-broadcastable at 100 TB) and shuffles on partkey, the
    same key the aggregate just grouped by, so the extra exchange is only
    on the already-collapsed side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        exact_avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (_dec_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of bracketed (brand, size, quantity)
    predicates — Catalyst pushes the OR of conjunctions into the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity").between(1, 21)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 30)) & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 50)) & (F.col("l_quantity").between(20, 40)))
    )
    return j.filter(cond).agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no FINALIZED
    ('F') orders — scalar-subquery average (tiny cross join) + anti-join.
    (Every synthetic customer has some order, so the anti-join target is
    the filtered F-status subset to keep the result non-trivial.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        exact_avg("c_acctbal").alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(
        orders.select(F.col("o_custkey").alias("c_custkey")), on="c_custkey", how="left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        _dec_sum(F.col("c_acctbal")).alias("totacctbal"),
    )


def approx_aggregates_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for 100 TB interactive work
    (approx_count_distinct = HyperLogLog++, percentile_approx = KLL-style
    sketch) — both single-pass, mergeable, fixed-memory. Sketch outputs are
    engine-specific, so the row carries the EXACT values plus in-plan
    assertions that the sketches landed within tolerance; the oracle checks
    exact values and that the assertions hold."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("exact_median_price"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median_price"
        ),
    )
    return agg.select(
        "l_returnflag",
        "exact_orders",
        (
            F.abs(F.col("approx_orders") - F.col("exact_orders"))
            <= 0.05 * F.col("exact_orders")
        ).alias("hll_within_5pct"),
        "exact_median_price",
        (
            F.abs(F.col("approx_median_price") - F.col("exact_median_price"))
            <= 0.05 * F.col("exact_median_price")
        ).alias("quantile_within_5pct"),
    )


def q10_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned items
    in one quarter. lineitem('R') ⋈ orders(quarter) shuffles on orderkey;
    customer join shuffles on custkey; nation is broadcast. Top 20 plans as
    TakeOrderedAndProject. Parity target: the reference delegates all
    multi-way joins to Postgres (SURVEY §2.3)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_dec_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    grouped agg, then an equality join against the broadcast scalar max
    (the view + subquery of the original). The max-side is one row, so the
    'self-join on an aggregate' costs one broadcast, not a second shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q21_sole_returned_supplier(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """TPC-H Q21 shape (adapted: the synthetic lineitem has no commit/receipt
    dates, so 'late delivery' becomes returnflag='R'): for multi-supplier
    finalized orders where EXACTLY ONE supplier has returned lines, charge
    that supplier. The original's EXISTS(l2)/NOT EXISTS(l3) correlated pair
    is rewritten as per-order distinct-supplier counts — one shuffle on
    orderkey instead of two self-joins of the fact table, the rewrite that
    survives 100 TB. Oracle states the EXISTS/NOT EXISTS form to prove
    equivalence."""
    li = load_table(spark, sf_dir, "lineitem")
    r_sup = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").distinct()
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsup"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("nret"),
    )
    sole = per_order.filter((F.col("nsup") > 1) & (F.col("nret") == 1)).select("l_orderkey")
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        r_sup.join(sole, "l_orderkey")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(k)
    )


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str, part_word: str = "widget") -> DataFrame:
    """TPC-H Q9 shape (adapted: the synthetic schema has no partsupp, so
    profit = discounted revenue without the supplycost term): nation ×
    order-year profit for parts whose name contains `part_word`. The part
    filter prunes the build side before the fact join; supplier→nation are
    broadcast; lineitem ⋈ orders shuffles on orderkey."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains(part_word))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(_dec_sum(profit).alias("sum_profit"))
    )


def q16_supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp — the part↔supplier relation
    comes from observed lineitem pairs; the 'complaint supplier' NOT IN
    becomes an anti-join on negative-balance suppliers): distinct supplier
    count per (p_brand, p_type). distinct (partkey, suppkey) collapses the
    fact table before any dimension join — shrink early, join late. The
    supplier anti-join side is broadcast (small dim); the UNFILTERED part
    table is O(|part|) so its join carries no hint and shuffles on partkey
    (AQE still picks broadcast at small SF where it fits)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def daily_revenue_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day revenue deltas: lag/lead over the date-ordered daily
    aggregate. The window input is one row per date (~2.4k rows at any SF),
    so the single-partition window after the shuffle-reduced aggregate is
    benign even at 100 TB — the heavy lifting happened in the groupBy."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec")
    )
    w = Window.orderBy("order_date")
    rev = F.col("rev_dec").cast("double")
    prev = F.lag("rev_dec", 1).over(w)
    nxt = F.lead("rev_dec", 1).over(w)
    return daily.select(
        "order_date",
        rev.alias("revenue"),
        (F.col("rev_dec") - prev).cast("double").alias("delta_prev"),
        (nxt - F.col("rev_dec")).cast("double").alias("delta_next"),
        # delta is decimal-exact; the ratio is taken in double (decimal
        # division scale rules differ across engines, double '/' does not)
        F.when(
            prev.isNotNull() & (prev != 0),
            (F.col("rev_dec") - prev).cast("double") / prev.cast("double") * 100,
        ).alias("pct_change"),
    )


def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate — all 4 grouping combinations of (status, priority)
    in one pass (Spark expands to a single Expand + hash aggregate, not 4
    scans)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice")).alias("total_price"),
    )


def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hourly buckets aggregated
    from raw events, daily buckets aggregated FROM THE HOURLY ROLLUP (sums
    and counts re-aggregate losslessly — the continuous-aggregate pattern).
    As a single lazy query the union's two branches each scan raw (visible
    in PLANS.md); in production the hourly rollup is a materialized table
    (one raw scan at ingest) and the daily tier reads it — the dataflow
    here is exactly that shape, minus the persistence boundary."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("bucket_start"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast(DEC)).alias("val_dec"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", F.col("bucket_start")).alias("bucket_start"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("val_dec").alias("val_dec"))
    out_cols = [
        "resolution",
        F.col("bucket_start").cast("timestamp_ntz").alias("bucket_start"),
        "event_type",
        "n",
        F.col("val_dec").cast("double").alias("total_value"),
    ]
    return (
        hourly.withColumn("resolution", F.lit("1h")).select(*out_cols)
        .unionByName(daily.withColumn("resolution", F.lit("1d")).select(*out_cols))
    )


def trailing_week_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue via a RANGE-framed window (6 preceding days
    .. current) over the daily aggregate, keyed on integer days-since-epoch
    so the frame is value-based, not row-based — days missing from the data
    are genuinely absent from the trailing sum. Window input is one row per
    date (shuffle-reduced), so the single-partition window is benign."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec")
    )
    days = F.datediff(F.col("order_date"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(days).rangeBetween(-6, 0)
    return daily.select(
        "order_date",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.sum("rev_dec").over(w).cast("double").alias("trailing_7d_revenue"),
        F.count("*").over(w).cast("int").alias("days_present_7d"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — exactly the (status), (priority) marginals in one
    pass (one Expand + one aggregate; half the sets CUBE would compute).
    GROUPING() markers disambiguate 'subtotal' NULLs from data NULLs."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]], "o_orderstatus", "o_orderpriority"
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count("*").alias("n_orders"),
            _dec_sum(F.col("o_totalprice")).alias("total_price"),
        )
    )


# --- runtime Bloom-filter join pruning ---------------------------------------

from contextlib import contextmanager  # noqa: E402


@contextmanager
def bloom_runtime_filter_scope(spark: SparkSession):
    """Scope where Catalyst injects a runtime BLOOM FILTER from a join's
    selective (creation) side into the big (application) side's scan: the
    big side drops non-joining rows at the Filter above its scan, BEFORE
    paying the shuffle — the engine-level equivalent of Delta dynamic file
    pruning for non-partition keys.

    The two thresholds model the 100 TB decision locally: application-side
    threshold 0 (always worth it here; the default 10 GB is the
    cluster-honest guard) and broadcast disabled (at 100 TB the filtered
    orders side is NOT broadcastable — with broadcast joins Spark already
    prunes via the broadcast itself, so the bloom path is exactly the
    big-big join case). Settings are restored on exit because runtime
    filter injection happens at planning time of whatever executes inside
    the scope."""
    conf = spark.conf
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: conf.get(k, None) for k in keys}
    for k, v in keys.items():
        conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def urgent_revenue_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to URGENT orders — the selective-dim
    ⋈ big-fact shape runtime bloom filters exist for (~20% of orders are
    urgent; without the filter every lineitem row pays the shuffle). Build
    under `bloom_runtime_filter_scope` to get the might_contain() pruning
    filter on the lineitem scan (plan-asserted in tests)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"), _dec_sum(revenue).alias("revenue")
    )


# --- derived partsupp (q2/q11/q20) -------------------------------------------
#
# The driver's star schema has no partsupp table, so the three TPC-H queries
# that need one (Q2/Q11/Q20) run over a DERIVED part-supplier inventory view:
# per (partkey, suppkey), availqty = total quantity that flowed through
# lineitem and supplycost = the minimum observed unit price. Both aggregates
# are order-independent (sum of doubles is decimal-exact below; min is a
# lattice op), so the view is bit-reproducible in DuckDB and the query
# SHAPES — min-cost-per-group join-back, HAVING vs a global scalar,
# correlated per-pair aggregate semi-join — are exactly TPC-H's.


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("ps_availqty"),
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
    )


def q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str, region: str = "ASIA", p_type: str = "ECONOMY"
) -> DataFrame:
    """TPC-H Q2 shape: for each part of a type, the supplier(s) in a region
    offering the minimum supply cost. The correlated MIN subquery becomes a
    per-part aggregate over the region-filtered partsupp joined back on
    (partkey, cost) — same decorrelation Catalyst applies to the SQL form.
    Only the dimension chain (supplier→nation→region) is broadcast;
    min_cost (one row per regional part) and the type-filtered part table
    are O(|part|), so their join-backs deliberately carry NO broadcast hint
    and shuffle on partkey — at 100 TB an O(|part|) broadcast would OOM the
    executors, while AQE still converts them to broadcasts at small SF
    where they fit under the threshold."""
    ps = _derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == p_type)

    sups_in_region = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional_ps = ps.join(
        F.broadcast(sups_in_region), ps.ps_suppkey == F.col("s_suppkey")
    )
    min_cost = regional_ps.groupBy(
        F.col("ps_partkey").alias("mc_partkey")
    ).agg(F.min("ps_supplycost").alias("min_cost"))
    return (
        regional_ps.join(
            min_cost,
            (regional_ps.ps_partkey == F.col("mc_partkey"))
            & (regional_ps.ps_supplycost == F.col("min_cost")),
        )
        .join(part, regional_ps.ps_partkey == part.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_name",
            "ps_supplycost",
        )
    )


def q11_important_stock(
    spark: SparkSession, sf_dir: str, nation: str = "NATION_7", fraction: float = 0.001
) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value for one nation's suppliers,
    HAVING value > fraction * the nation's total — the scalar global
    aggregate rides a broadcast 1-row cross join, so the fact side is
    scanned once per aggregate, never collected."""
    ps = _derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == nation)
    national = ps.join(
        F.broadcast(
            supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
                "s_suppkey"
            )
        ),
        ps.ps_suppkey == F.col("s_suppkey"),
    )
    value = F.col("ps_supplycost") * F.col("ps_availqty")
    per_part = national.groupBy("ps_partkey").agg(_dec_sum(value).alias("part_value"))
    total = national.agg((_dec_sum(value) * F.lit(fraction)).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("ps_partkey", "part_value")
    )


def q20_excess_shipments(
    spark: SparkSession, sf_dir: str, part_word: str = "widget", since: str = "1998-01-01"
) -> DataFrame:
    """TPC-H Q20 shape: suppliers of matching parts whose shipments SINCE a
    date exceed half their all-time flow for that part — the correlated
    per-(part, supplier) aggregate compares against the derived availqty,
    then a two-level semi-join lifts qualifying pairs to suppliers. All
    candidate generation is equi-joins on (partkey, suppkey)/suppkey."""
    ps = _derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit(since).cast("timestamp_ntz")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains(part_word)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")

    recent = li.groupBy(
        F.col("l_partkey").alias("r_partkey"), F.col("l_suppkey").alias("r_suppkey")
    ).agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("recent_qty"))
    qualifying = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            recent,
            (ps.ps_partkey == F.col("r_partkey")) & (ps.ps_suppkey == F.col("r_suppkey")),
        )
        .filter(F.col("recent_qty") > 0.5 * F.col("ps_availqty"))
        .select(F.col("ps_suppkey").alias("q_suppkey"))
        .distinct()
    )
    return (
        supp.join(qualifying, supp.s_suppkey == F.col("q_suppkey"), "left_semi")
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name", "s_acctbal")
    )
