"""S5: the pure-SQL entry point (SURVEY.md §2.1 S5, §3.2) — temp-view
registration + ``spark.sql``. Same Catalyst IR as the DataFrame API
(§3.2: both converge after analysis), so one representative query runs
the ANTLR→analyzer→optimizer path end-to-end under the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import register_views

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


@register(
    "sql_nation_order_stats",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_buyers,
           ROUND(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS gross,
           ROUND(AVG(o.o_totalprice), 4) AS avg_order
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus <> 'F'
    GROUP BY n.n_name
    """,
)
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
