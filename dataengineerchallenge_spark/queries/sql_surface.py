"""S5: the pure-SQL entry point (SURVEY.md §2.1 S5, §3.2) — temp-view
registration + ``spark.sql``. Same Catalyst IR as the DataFrame API
(§3.2: both converge after analysis), so one representative query runs
the ANTLR→analyzer→optimizer path end-to-end under the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.sessionize import events_session_cte
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table, register_views

_SQL = """
SELECT n.n_name,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_buyers,
       ROUND(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS gross,
       ROUND(AVG(o.o_totalprice), 4) AS avg_order
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus <> 'F'
GROUP BY n.n_name
"""


@register("sql_nation_order_stats", oracle=_SQL)
def sql_nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: register views, run ANSI SQL through spark.sql — the oracle
    is literally the same statement run by DuckDB."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL)


_GS_SQL = """
SELECT event_type,
       CAST(date_part('day', ts) AS INT) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type), (CAST(date_part('day', ts) AS INT)), ())
"""


@register(
    "event_grouping_sets",
    oracle=_GS_SQL,
)
def event_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 GROUPING SETS (the general form rollup/cube specialize): three
    explicit grains in one Expand pass, via the SQL surface — the same
    statement runs on DuckDB as the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_GS_SQL)


@register(
    "event_scalar_function_showcase",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS event_id,
           upper(trim(event_type)) AS type_uc,
           substring(event_type, 1, 3) AS type_prefix,
           concat_ws('|', event_type, CAST(user_id AS VARCHAR)) AS type_user,
           regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_devoweled,
           CAST(length(event_type) AS INT) AS type_len,
           CAST(hour(ts) AS INT) AS hr,
           CAST(isodow(ts) AS INT) AS dow_iso,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since_y0,
           round(sqrt(abs(value)), 4) AS sqrt_value,
           round(ln(1.0 + abs(value)), 4) AS log_value,
           CAST(floor(value) AS BIGINT) AS value_floor,
           CASE WHEN value >= 5 THEN 'high' WHEN value >= 2 THEN 'mid' ELSE 'low' END AS tier,
           coalesce(nullif(event_type, 'error'), 'ERR') AS type_masked
    FROM events
    """,
)
def event_scalar_function_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F3/F4/F5 breadth in one hash-checked pass: string
    (upper/trim/substring/concat_ws/regexp_replace/length), date/time
    (hour/ISO weekday/datediff), math (sqrt/ln/floor/abs), and
    conditional (CASE, coalesce, nullif) — all JVM built-ins inside one
    whole-stage-codegen projection, the scalar surface a query author
    actually lives on."""
    from dataengineerchallenge_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").cast("string").alias("event_id"),
        F.upper(F.trim("event_type")).alias("type_uc"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.concat_ws("|", "event_type", F.col("user_id").cast("string")).alias("type_user"),
        F.regexp_replace("event_type", "[aeiou]", "_").alias("type_devoweled"),
        F.length("event_type").cast("int").alias("type_len"),
        F.hour("ts").cast("int").alias("hr"),
        F.dayofweek("ts").alias("_dow_raw"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("int").alias("days_since_y0"),
        F.round(F.sqrt(F.abs("value")), 4).alias("sqrt_value"),
        F.round(F.log1p(F.abs("value")), 4).alias("log_value"),
        F.floor("value").cast("long").alias("value_floor"),
        F.when(F.col("value") >= 5, "high").when(F.col("value") >= 2, "mid").otherwise("low").alias("tier"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias("type_masked"),
    ).withColumn(
        # Spark dayofweek is 1=Sun..7=Sat; convert to ISO 1=Mon..7=Sun
        "dow_iso", (((F.col("_dow_raw") + 5) % 7) + 1).cast("int")
    ).drop("_dow_raw")


_SESSION_TAIL_SQL = """
SELECT skey, session_id, n_hits, duration_s, n_unique_urls, start_s, end_s
FROM sessions
"""


@register(
    "sql_sessionize",
    oracle=events_session_cte() + _SESSION_TAIL_SQL,
)
def sql_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 flagship: the ENTIRE sessionizer (goals 1-4 core,
    /root/reference/README.md:9-16) expressed as one SQL string through
    spark.sql — the ANTLR entry point converging on the same Catalyst
    plan as the DataFrame sessionize (§3.2). The Spark text differs from
    the DuckDB oracle only in the epoch idiom (unix_timestamp vs
    floor(epoch)); window clauses, lag, cumulative sum and the grouped
    session aggregate are the same ANSI on both engines."""
    from dataengineerchallenge_spark.operators.sessionize import ORACLE_SESSION_CTE

    load_table(spark, sf_dir, "events").createOrReplaceTempView("_sql_events")
    spark_cte = ORACLE_SESSION_CTE.replace(
        "CAST(floor(epoch({ts})) AS BIGINT)", "unix_timestamp({ts})"
    ).format(tbl="_sql_events", key="user_id", ts="ts", order="event_id", url="event_type", gap=900)
    return spark.sql(spark_cte + _SESSION_TAIL_SQL)
