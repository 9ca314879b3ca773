"""Feature engineering for the MLE goals (W5 windowed running
aggregates, D6 inputs; /root/reference/README.md:18-23).

Time-based frames use ``rangeBetween`` over epoch seconds, NOT
``rowsBetween``: the per-minute load series has gaps (minutes with zero
requests produce no row), so row-offset lags would silently reach back
across holes. Range frames are calendar-correct and match the DuckDB
``RANGE BETWEEN``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.sessionize import session_stats
from dataengineerchallenge_spark.sources.tables import load_table


def minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("minute", "ts")).alias("minute_epoch_s")
    ).agg(F.count(F.lit(1)).alias("n_requests"))


def load_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute load with trailing calendar-window features:

    - ``prev_1m``: requests in the previous minute
    - ``sum_5m`` / ``avg_5m``: requests over the 5 trailing minutes
      (window ends at the previous minute — the current minute is the
      prediction target, never a feature: no leakage)
    - ``minute_of_hour``: seasonality term

    Target: ``n_requests`` of the current minute (MLE goal 1 frames
    next-minute prediction as current-minute-from-history).
    """
    base = minute_load(spark, sf_dir)
    w = Window.orderBy("minute_epoch_s")
    prev_1m = w.rangeBetween(-60, -60)
    trail_5m = w.rangeBetween(-300, -60)
    return base.select(
        "minute_epoch_s",
        F.coalesce(F.sum("n_requests").over(prev_1m), F.lit(0)).alias("prev_1m"),
        F.coalesce(F.sum("n_requests").over(trail_5m), F.lit(0)).alias("sum_5m"),
        F.round(F.coalesce(F.avg("n_requests").over(trail_5m), F.lit(0.0)), 4).alias("avg_5m"),
        ((F.col("minute_epoch_s") / 60) % 60).cast("int").alias("minute_of_hour"),
        "n_requests",
    )


LOAD_FEATURES_ORACLE = """
WITH base AS (
  SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS minute_epoch_s,
         CAST(COUNT(*) AS BIGINT) AS n_requests
  FROM events GROUP BY 1
)
SELECT minute_epoch_s,
       CAST(coalesce(sum(n_requests) OVER (ORDER BY minute_epoch_s
            RANGE BETWEEN 60 PRECEDING AND 60 PRECEDING), 0) AS BIGINT) AS prev_1m,
       CAST(coalesce(sum(n_requests) OVER (ORDER BY minute_epoch_s
            RANGE BETWEEN 300 PRECEDING AND 60 PRECEDING), 0) AS BIGINT) AS sum_5m,
       round(coalesce(avg(n_requests) OVER (ORDER BY minute_epoch_s
            RANGE BETWEEN 300 PRECEDING AND 60 PRECEDING), 0.0), 4) AS avg_5m,
       CAST((minute_epoch_s / 60) % 60 AS INT) AS minute_of_hour,
       n_requests
FROM base
"""


def user_feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral features and the two per-IP targets (MLE
    goals 2-3): average session duration and average distinct URLs per
    session. Built on the same sessionizer the batch queries use."""
    ev = load_table(spark, sf_dir, "events")
    sess = session_stats(ev)  # user_id, session_id, n_hits, duration_s, n_unique_urls, ...
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_hits"), 4).alias("avg_hits"),
        F.sum("n_hits").alias("total_hits"),
        (F.max("end_s") - F.min("start_s")).alias("active_span_s"),
        F.round(F.avg("duration_s"), 4).alias("avg_session_s"),
        F.round(F.avg("n_unique_urls"), 4).alias("avg_unique_urls"),
    )


USER_FEATURES_ORACLE_TAIL = """
SELECT skey AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       round(AVG(n_hits), 4) AS avg_hits,
       CAST(SUM(n_hits) AS BIGINT) AS total_hits,
       MAX(end_s) - MIN(start_s) AS active_span_s,
       round(AVG(duration_s), 4) AS avg_session_s,
       round(AVG(n_unique_urls), 4) AS avg_unique_urls
FROM sessions
GROUP BY skey
"""
