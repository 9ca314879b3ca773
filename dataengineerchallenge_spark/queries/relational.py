"""Relational join/set-operation battery (SURVEY.md §2.3 J1-J8, §2.7 U1-U3)
over the TPC-H-ish fixtures. Enrichment joins realize the reference's
"what additional data would help" bonus (/root/reference/README.md:42);
scale hygiene: dims are broadcast, big-big joins shuffle on their keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from dataengineerchallenge_spark.functions.exact import cents, sql_cents
from dataengineerchallenge_spark.operators.joins import (
    as_of_join,
    binned_interval_join,
    range_join,
)
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources import load_table


@register(
    "region_revenue",
    oracle=f"""
SELECT r.r_name,
       CAST(SUM({sql_cents('o.o_totalprice')}) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact ⋈ broadcast dims (customer→nation→region enrichment).

    All three dims are broadcast — zero shuffle for the joins; the only
    exchange is the final 5-group aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "priority_revenue",
    oracle=f"""
SELECT o.o_orderpriority,
       CAST(SUM({sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
)
def priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: large-large equi join (orders ⋈ lineitem) — shuffle join on the
    order key; AQE may demote SMJ to shuffled-hash at runtime."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "customer_order_counts",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
""",
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer join keeping order-less customers (count = 0)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "customers_with_open_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
""",
)
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left semi join — existence filter, emits each customer once."""
    customer = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return customer.join(
        open_orders, customer.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_orders",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: left anti join — set-minus filter. Oracle uses NOT EXISTS (not
    NOT IN) so null keys can never silently diverge from anti-join
    semantics."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "views_before_error",
    oracle="""
WITH e AS (
    SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events WHERE event_type = 'error'
), v AS (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events WHERE event_type = 'view'
)
SELECT e.event_id, CAST(COUNT(v.ts_s) AS BIGINT) AS n_prior_views
FROM e LEFT JOIN v
  ON v.user_id = e.user_id AND v.ts_s >= e.ts_s - 300 AND v.ts_s <= e.ts_s
GROUP BY e.event_id
""",
)
def views_before_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: range/interval join with equi prefix — views within the 5 min
    before each error, per user. Hash-joins on user_id with the time band
    as residual; per-key cardinality bounds the blow-up at scale."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_s", F.unix_timestamp("ts"))
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts_s")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts_s")
    joined = range_join(
        errors,
        views,
        on=["user_id"],
        conditions=(F.col("r.ts_s") >= F.col("l.ts_s") - 300)
        & (F.col("r.ts_s") <= F.col("l.ts_s")),
        how="left",
    )
    return joined.groupBy(F.col("l.event_id").alias("event_id")).agg(
        F.count(F.col("r.ts_s")).alias("n_prior_views")
    )


@register(
    "error_window_activity",
    oracle="""
WITH e AS (
    SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events WHERE event_type = 'error'
), v AS (
    SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events WHERE event_type = 'view'
)
SELECT e.event_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(COUNT(DISTINCT v.user_id) AS BIGINT) AS n_viewers
FROM e JOIN v ON v.ts_s >= e.ts_s - 60 AND v.ts_s <= e.ts_s + 60
GROUP BY e.event_id
""",
)
def error_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6+ interval join with NO equi key: site-wide view activity (any
    user) within ±60 s of each error — the blast-radius question an
    incident review asks, and the join shape ``range_join`` cannot
    express (no shared key → Catalyst would plan a nested-loop join,
    O(errors × views)). The binned decomposition manufactures a time-bin
    equi key instead (operators/joins.py:binned_interval_join): points
    hash to one bin, each ±60 s window explodes into ≤ 3 adjacent 60 s
    bins, the join shuffles only matching bins, exact containment is the
    residual — linear, plan-pinned nested-loop-free in
    tests/test_plans.py."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_s", F.unix_timestamp("ts"))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", F.col("ts_s").alias("e_ts"))
        .withColumn("w_start", F.col("e_ts") - 60)
        .withColumn("w_end", F.col("e_ts") + 60)
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("viewer_id"), F.col("ts_s").alias("v_ts")
    )
    hits = binned_interval_join(
        views, errors, point_ts="v_ts", start_ts="w_start", end_ts="w_end", bin_s=60
    )
    return hits.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_views"),
        F.countDistinct("viewer_id").alias("n_viewers"),
    )


@register(
    "purchase_after_view_gap",
    oracle="""
WITH tagged AS (
    SELECT user_id, event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ats,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side,
           CASE WHEN event_type = 'view' THEN CAST(floor(epoch(ts)) AS BIGINT) END
               AS view_ts
    FROM events WHERE event_type IN ('purchase', 'view')
), filled AS (
    SELECT *,
           last_value(view_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ats, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view_ts
    FROM tagged
)
SELECT event_id, user_id,
       ats - last_view_ts AS gap_s
FROM filled WHERE side = 1
""",
)
def purchase_after_view_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: backward as-of join — for each purchase, the latest prior view
    by the same user (union-tag + last(ignorenulls): one shuffle, scales
    linearly; feature primitive for MLE goals README.md:21-23)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_s", F.unix_timestamp("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_s"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", "ts_s", "event_id")
        .withColumn("view_ts", F.col("ts_s"))
    )
    joined = as_of_join(
        purchases,
        views,
        on=["user_id"],
        payload=["view_ts"],
        tie_break=["event_id"],
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.col("ts_s") - F.col("view_ts_asof")).alias("gap_s"),
    )


@register(
    "region_pairs",
    oracle="""
SELECT a.r_name AS from_region, b.r_name AS to_region
FROM region a CROSS JOIN region b
WHERE a.r_regionkey <> b.r_regionkey
""",
)
def region_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: explicit cross join (nested-loop) — the brute-force pairwise
    primitive; also the exact oracle shape for LSH similarity joins."""
    region = load_table(spark, sf_dir, "region")
    a = region.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("ak"))
    b = region.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("bk"))
    return a.crossJoin(b).filter(F.col("ak") != F.col("bk")).drop("ak", "bk")


def _week_users(ev: DataFrame, start_day: int, end_day: int) -> DataFrame:
    d = F.dayofmonth("ts")
    return ev.filter((d >= start_day) & (d <= end_day)).select("user_id").distinct()


_WEEK_SQL = (
    "SELECT DISTINCT user_id FROM events "
    "WHERE date_part('day', ts) BETWEEN {a} AND {b}"
)


@register(
    "retained_users",
    oracle=f"({_WEEK_SQL.format(a=1, b=7)}) INTERSECT ({_WEEK_SQL.format(a=22, b=28)})",
)
def retained_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: intersect — visitors active in both week 1 and week 4."""
    ev = load_table(spark, sf_dir, "events")
    return _week_users(ev, 1, 7).intersect(_week_users(ev, 22, 28))


@register(
    "churned_users",
    oracle=f"({_WEEK_SQL.format(a=1, b=7)}) EXCEPT ({_WEEK_SQL.format(a=22, b=28)})",
)
def churned_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: except — week-1 visitors gone by week 4. ``subtract`` is EXCEPT
    DISTINCT: one dedup aggregate, matching the SQL EXCEPT semantics."""
    ev = load_table(spark, sf_dir, "events")
    return _week_users(ev, 1, 7).subtract(_week_users(ev, 22, 28))


@register(
    "unioned_daily_counts",
    oracle="""
WITH unioned AS (
    SELECT * FROM events WHERE date_part('day', ts) <= 15
    UNION ALL
    SELECT * FROM events WHERE date_part('day', ts) > 15
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM unioned GROUP BY event_type
""",
)
def unioned_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: unionByName of period partitions reassembles the full stream
    (the AWS delivery format ships one file per node per interval)."""
    ev = load_table(spark, sf_dir, "events")
    first_half = ev.filter(F.dayofmonth("ts") <= 15)
    second_half = ev.filter(F.dayofmonth("ts") > 15)
    return (
        first_half.unionByName(second_half)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "tpch_q3_style_unshipped_revenue",
    oracle=f"""
SELECT l.l_orderkey,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_s,
       o.o_orderpriority,
       CAST(SUM({sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS BIGINT)
           AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue_cents DESC, l.l_orderkey
LIMIT 10
""",
)
def tpch_q3_style_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping-priority): top-10 not-yet-shipped orders
    by outstanding revenue for one market segment.

    Scale hygiene: the segment filter prunes customer BEFORE its
    broadcast; the date predicates push into the orders/lineitem parquet
    scans; orders⋈lineitem shuffles on the orderkey; the top-10 is
    TakeOrderedAndProject, never a global sort."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    )
    return (
        orders.join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            "o_orderpriority",
        )
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_style_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       CAST(SUM({sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS BIGINT)
           AS revenue_cents
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def tpch_q5_style_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue per nation where
    the supplier and customer share the nation, one region.

    The region→nation filter prunes the nation dim before broadcast; the
    only shuffle joins are orders⋈lineitem (orderkey) — supplier,
    customer, nation, region all broadcast; the local-supplier condition
    (c_nationkey = s_nationkey) rides the supplier join as a residual."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asian_nations = nation.join(
        broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        orders.join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(broadcast(asian_nations), supplier.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue_cents"))
    )


@register(
    "tpch_q1_style_pricing_summary",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM({sql_cents('l_quantity')}) AS BIGINT)      AS sum_qty_cents,
       CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS sum_base_cents,
       CAST(SUM({sql_cents('l_extendedprice * (1 - l_discount)')}) AS BIGINT)
           AS sum_disc_cents,
       CAST(SUM({sql_cents('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS BIGINT)
           AS sum_charge_cents,
       ROUND(SUM({sql_cents('l_quantity')}) / 100.0 / COUNT(*), 4)      AS avg_qty,
       ROUND(SUM({sql_cents('l_extendedprice')}) / 100.0 / COUNT(*), 4) AS avg_price,
       ROUND(SUM({sql_cents('l_discount')}) / 100.0 / COUNT(*), 4)      AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_style_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (pricing summary report): the canonical scan-heavy
    aggregate — one pass over lineitem, 4-group output.

    Scale hygiene: the shipdate predicate and the 7-column projection both
    push into the parquet scan; the aggregate is map-side partial over the
    tiny (returnflag, linestatus) key space, so the exchange carries a
    handful of rows per input partition regardless of scan size. Averages
    are derived from the exact integer-cents sums (sum_cents/100/n) so the
    double arithmetic is bit-identical on both engines before ROUND."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(cents("l_quantity")).alias("sum_qty_cents"),
        F.sum(cents("l_extendedprice")).alias("sum_base_cents"),
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_cents"),
        F.sum(
            cents(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
        ).alias("sum_charge_cents"),
        F.round(F.sum(cents("l_quantity")) / 100.0 / n, 4).alias("avg_qty"),
        F.round(F.sum(cents("l_extendedprice")) / 100.0 / n, 4).alias("avg_price"),
        F.round(F.sum(cents("l_discount")) / 100.0 / n, 4).alias("avg_disc"),
        n.cast("long").alias("count_order"),
    )


@register(
    "tpch_q18_style_large_volume_customers",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({sql_cents('l_quantity')}) > 9000
)
SELECT c.c_name,
       o.o_orderkey,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS orderdate_s,
       CAST({sql_cents('o.o_totalprice')} AS BIGINT) AS totalprice_cents,
       CAST(q.qty_cents AS BIGINT) AS qty_cents
FROM orders o
JOIN (SELECT l_orderkey, SUM({sql_cents('l_quantity')}) AS qty_cents
      FROM lineitem GROUP BY l_orderkey) q ON q.l_orderkey = o.o_orderkey
JOIN big ON big.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice_cents DESC, o.o_orderkey
LIMIT 20
""",
)
def tpch_q18_style_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds a threshold, joined back to customer — the
    aggregate-then-semi-join pattern.

    Scale hygiene: lineitem is aggregated to one row per orderkey BEFORE
    any join (map-side partial combine shrinks the shuffle), the HAVING
    filter rides that same aggregate (no second lineitem scan — Spark's
    plan reuses the exchange), customer broadcasts, and the top-20 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    qty = li.groupBy("l_orderkey").agg(F.sum(cents("l_quantity")).alias("qty_cents"))
    big = qty.filter(F.col("qty_cents") > 9000)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("orderdate_s"),
            cents("o_totalprice").alias("totalprice_cents"),
            "qty_cents",
        )
        .orderBy(F.desc("totalprice_cents"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q4_style_priority_with_late_lines",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def tpch_q4_style_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — correlated EXISTS: orders of one year having at
    least one line shipped >60 days after order date, counted per
    priority. Expressed through the SQL surface so Catalyst performs the
    standard decorrelation: the EXISTS rewrites to a LEFT SEMI hash join
    on the orderkey with the non-equi ship-lag predicate as the join
    condition — semantically dedup-free (no pre-aggregate needed), and
    the date filter prunes the probe side before the join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q4_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q4_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM _q4_orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM _q4_lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o.o_orderpriority
        """
    )


@register(
    "tpch_q17_style_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM({sql_cents('l.l_extendedprice')}) AS BIGINT) AS small_qty_revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN avg_qty a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < a.half_avg
    """,
)
def tpch_q17_style_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar aggregate: revenue from lines
    whose quantity is below half their part's average. The correlated
    subquery decorrelates to a per-part aggregate joined back to the
    fact — BOTH sides shuffle on l_partkey, so Catalyst reuses one
    exchange layout for the aggregate and the join (no second shuffle of
    the big side). The comparison is float-safe: quantities sit on a
    .01 grid, far from the 0.5*avg boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    half_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(half_avg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.sum(cents("l_extendedprice")).alias("small_qty_revenue_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q14_style_promo_revenue_share",
    oracle=f"""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                   THEN {sql_cents('l.l_extendedprice * (1 - l.l_discount)')} ELSE 0 END)
                 / SUM({sql_cents('l.l_extendedprice * (1 - l.l_discount)')}), 4)
             AS promo_share_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1996-07-01'
    """,
)
def tpch_q14_style_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — conditional-share aggregate over a fact ⋈ dim
    join: the PROMO slice of half-a-year's revenue as a percentage. The
    part dim broadcasts; the date filter pushes to the lineitem scan;
    both SUMs ride one aggregate over exact integer cents, so the share
    divides two exact longs (ROUND-4 is the only float step)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    part = load_table(spark, sf_dir, "part")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    return j.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
            / F.sum(rev),
            4,
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q16_style_supplier_diversity",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def tpch_q16_style_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — NOT IN exclusion + distinct-count rollup:
    supplier diversity per (brand, size), excluding one brand and any
    supplier in the complaint list (negative balance). Expressed through
    the SQL surface so the NOT IN subquery takes Spark's null-aware
    anti-join path (a plain left_anti is wrong if the subquery can yield
    NULL); the exclusion list broadcasts, the distinct-count aggregate
    partial-aggregates on (brand, size, suppkey) before the final
    shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_q16_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_q16_part")
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("_q16_supplier")
    return spark.sql(
        """
        SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS n_suppliers
        FROM _q16_lineitem l JOIN _q16_part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand <> 'Brand#1'
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM _q16_supplier WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
        """
    )
