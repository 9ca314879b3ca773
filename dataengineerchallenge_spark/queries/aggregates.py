"""Aggregation breadth (SURVEY.md §2.4 A6-A8) + JSON props (§2.8 F7).

Multi-grain observation reports over the fixtures — the reference's open
"analytical observations" mandate (/root/reference/README.md:5) plus the
100 TB requirement that every exact distinct has an approximate (HLL)
sibling (SURVEY.md §2.4 A6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast

from dataengineerchallenge_spark.functions.exact import cents, sql_cents
from dataengineerchallenge_spark.operators.sessionize import events_session_cte
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources import load_table

_CTE = events_session_cte()

_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


@register(
    "props_value_by_type",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k
FROM events
GROUP BY event_type
""",
)
def props_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: parse the events.props JSON column (from_json with an explicit
    schema — never schema inference on a hot path) and aggregate the
    extracted value per event type."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", _PROPS_SCHEMA)["k"]
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.count("k").alias("n_with_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
        )
    )


@register(
    "props_variant_stats",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
           AS n_distinct_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
""",
)
def props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 via the Spark 4 VARIANT path: parse_json → variant_get, the
    schema-flexible semi-structured representation (binary-encoded,
    shredding-capable at rest) that replaces string re-parsing when the
    props schema drifts — the right F7 at 100 TB where one fixed
    from_json schema can't describe every producer. Values extracted
    once, then plain aggregates."""
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("k").cast("bigint").alias("n_distinct_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "session_url_sets",
    oracle=_CTE
    + """
SELECT skey, session_id,
       array_to_string(array_agg(DISTINCT url ORDER BY url), '|') AS urls
FROM sess
GROUP BY skey, session_id
""",
)
def session_url_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 collect_set: the distinct URLs each session touched, sort_array-
    wrapped so the array ordering is deterministic for the oracle hash
    (SURVEY.md §7.4 discipline — never hash a collect_list order).
    Serialized with array_join: the driver's pandas canonicalizer cannot
    sort list-typed cells (CORRECTNESS_r02 'unhashable type: list')."""
    from dataengineerchallenge_spark.operators.sessionize import with_session_ids

    ev = load_table(spark, sf_dir, "events")
    sess = with_session_ids(ev)
    return (
        sess.groupBy(F.col("user_id").alias("skey"), "session_id")
        .agg(F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias("urls"))
    )


@register(
    "region_nation_rollup",
    oracle=f"""
SELECT r.r_name, n.n_name,
       CAST(SUM({sql_cents('o.o_totalprice')}) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def region_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 rollup: revenue at (region, nation), (region), and grand-total
    grains in one pass — Spark plans a single Expand + hash aggregate, so
    the multi-grain report costs one shuffle, not three."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.sum(cents("o_totalprice")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "event_type_day_cube",
    oracle="""
SELECT event_type, CAST(date_part('day', ts) AS INT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events
GROUP BY CUBE (event_type, CAST(date_part('day', ts) AS INT))
""",
)
def event_type_day_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 cube: all four grains of (event_type, day) in one Expand pass."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("day", F.dayofmonth("ts"))
        .cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register("approx_unique_urls_per_user")  # no oracle: HLL sketches differ per engine
def approx_unique_urls_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 approx_count_distinct (HLL++, rsd=0.02): the 100 TB sibling of
    the exact distinct — sketches merge map-side, so the shuffle carries
    one sketch per group instead of the full value set. Error bound vs the
    exact count is pinned in tests/test_aggregates.py."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.approx_count_distinct("event_type", 0.02).alias("approx_unique_urls")
    )


@register(
    "salted_user_value_stats",
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value,
       MAX(value) AS max_value
FROM events
GROUP BY user_id
""",
)
def salted_user_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase salted aggregation (operators/skew.py): the
    hot-key fallback for per-IP aggregates, hash-checked against the
    plain GROUP BY — salting must be invisible in the results."""
    from dataengineerchallenge_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["user_id"],
        {"n_events": ("value", "count"), "total_value": ("value", "sum"), "max_value": ("value", "max")},
        salt_on=["event_id"],  # unique per row: every shard genuinely spreads
        n_salts=16,
    )
    return out.select(
        F.col("user_id").cast("string").alias("user_id"),
        F.col("n_events").cast("long").alias("n_events"),
        F.round("total_value", 4).alias("total_value"),
        "max_value",
    )


@register(
    "value_percentiles_by_type",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(median(value), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events
GROUP BY event_type
""",
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles + median per group (F.percentile /
    F.median — the exact forms; percentile_approx is the sketch sibling
    already covered by approx_unique_urls_per_user's HLL discussion).
    Exact percentile needs a per-group sort at scale — the approx sketch
    is the 100 TB default, this query pins the exact semantics."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.25)), 4).alias("p25"),
        F.round(F.median("value"), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.75)), 4).alias("p75"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "user_event_type_pivot",
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS user_id,
       CAST(count(*) FILTER (event_type = 'click')    AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'error')    AS BIGINT) AS error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup')   AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'view')     AS BIGINT) AS view
FROM events
GROUP BY user_id
""",
)
def user_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide one-hot aggregation): explicit values list so the
    output schema is static — at scale NEVER let pivot infer the column
    set (that is a full distinct scan before planning). Absent cells
    coalesce to 0 to match the oracle's FILTER counts."""
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy(F.col("user_id").cast("string").alias("user_id"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


@register(
    "winsorized_value_stats",
    oracle="""
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY event_type
), clipped AS (
  SELECT e.event_type,
         CAST(floor(least(greatest(e.value, c.lo), c.hi) * 10000 + 0.5)
              AS BIGINT) AS v4
  FROM events e JOIN cuts c USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(v4) AS BIGINT) AS min_e4,
       CAST(max(v4) AS BIGINT) AS max_e4,
       CAST(sum(v4) AS BIGINT) AS sum_e4
FROM clipped GROUP BY event_type
""",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization (A+ training-data cleaning): clip each
    value to its group's exact [p01, p99] band, then per-group stats of
    the clipped column — the standard outlier treatment before a model
    consumes a heavy-tailed feature (clipping keeps the row, unlike the
    z-score FILTER in event_value_outliers, so no training signal is
    dropped).

    Plan: the cuts frame is one row per group (exact interpolated
    percentiles, same engine parity as value_percentiles_by_type) and
    broadcasts back onto the scan — at 100 TB the clip pass is
    map-only. The clipped values integerize to e4 micro-units BEFORE
    aggregation (floor(x*1e4+0.5), the exact.py discipline), so min/
    max/sum are integer-exact in both engines — summing raw clipped
    doubles would drift with accumulation order."""
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("lo"),
        F.percentile("value", F.lit(0.99)).alias("hi"),
    )
    clipped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.floor(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v4"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v4").alias("min_e4"),
        F.max("v4").alias("max_e4"),
        F.sum("v4").alias("sum_e4"),
    )


@register("winsorized_value_stats_approx")
def winsorized_value_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path of ``winsorized_value_stats`` (VERDICT r5 #3):
    identical clip-then-aggregate shape, but the per-group [p01, p99]
    cuts come from ``percentile_approx`` (KLL-style rank sketch,
    accuracy 10000 ⇒ rank error ≤ 1e-4) instead of exact interpolated
    percentiles. Exact per-group percentile materializes and sorts every
    group's values — at 100 TB with a handful of event types that is a
    giant per-group sort for a 2-number answer; the sketch is one
    mergeable partial-aggregate pass, same as the exact/approx pairing
    of value_percentiles_by_type / approx_value_percentiles.

    Rows-only per contract (the sketch cut is accuracy-bounded, not
    bit-pinned); the deviation of the approx-clipped stats vs the exact
    twin is pinned in tests/test_aggregates.py."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", F.array(F.lit(0.01), F.lit(0.99)), 10000)
    cuts = ev.groupBy("event_type").agg(
        F.get(pct, 0).alias("lo"), F.get(pct, 1).alias("hi")
    )
    clipped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.floor(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v4"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v4").alias("min_e4"),
        F.max("v4").alias("max_e4"),
        F.sum("v4").alias("sum_e4"),
    )
