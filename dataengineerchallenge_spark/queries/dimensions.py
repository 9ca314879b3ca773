"""Dimensional-modeling operators: SCD2 history build (gaps-and-islands
on attribute CHANGE, the value-based sibling of time-gap sessionization)
and CDC upsert (merge a change batch into a keyed target without a
transactional table format).

Both are pure DataFrame algebra with full SQL oracles — the 100 TB
shapes are one window pass per key (SCD2) and one shuffle-or-broadcast
join (upsert)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table

_DAY_S = 86400


@register(
    "scd2_user_segments",
    oracle="""
    WITH daily AS (
      SELECT user_id,
             (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_s,
             event_type,
             count(*) AS cnt
      FROM events GROUP BY 1, 2, 3
    ), dominant AS (
      SELECT user_id, day_s, event_type AS segment
      FROM daily
      QUALIFY row_number() OVER (PARTITION BY user_id, day_s
                                 ORDER BY cnt DESC, event_type) = 1
    ), flagged AS (
      SELECT *,
             CASE WHEN lag(segment) OVER w IS DISTINCT FROM segment
                  THEN 1 ELSE 0 END AS chg
      FROM dominant
      WINDOW w AS (PARTITION BY user_id ORDER BY day_s)
    ), islands AS (
      SELECT *,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY day_s
                            ROWS UNBOUNDED PRECEDING) AS isl
      FROM flagged
    )
    SELECT user_id, segment,
           MIN(day_s) AS valid_from_s,
           MAX(day_s) + 86400 AS valid_to_s,
           CAST(COUNT(*) AS BIGINT) AS n_active_days
    FROM islands
    GROUP BY user_id, segment, isl
    """,
)
def scd2_user_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build: each user's DOMINANT daily event_type becomes
    a segment; consecutive days with the same segment collapse into one
    validity interval [valid_from, valid_to). Change-detection islands —
    the value-change twin of time-gap sessionization: flag days where
    lag(segment) differs, cumulative-sum the flags into island ids, one
    aggregate per island. Both window passes and the final aggregate
    share the user_id hash partitioning, so Catalyst plans a single
    exchange for the whole chain."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id",
        ((F.unix_timestamp("ts") / _DAY_S).cast("long") * _DAY_S).alias("day_s"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    pick = Window.partitionBy("user_id", "day_s").orderBy(F.desc("cnt"), F.asc("event_type"))
    dominant = (
        daily.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select("user_id", "day_s", F.col("event_type").alias("segment"))
    )
    w = Window.partitionBy("user_id").orderBy("day_s")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(
        ~F.lag("segment").over(w).eqNullSafe(F.col("segment")), 1
    ).otherwise(0)
    islands = dominant.withColumn("isl", F.sum(chg).over(run))
    return (
        islands.groupBy("user_id", "segment", "isl")
        .agg(
            F.min("day_s").alias("valid_from_s"),
            (F.max("day_s") + _DAY_S).alias("valid_to_s"),
            F.count(F.lit(1)).alias("n_active_days"),
        )
        .drop("isl")
    )


def cdc_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Keyed upsert without a table format: rows of ``updates`` replace
    same-key rows of ``target``; unmatched update keys insert. One left
    anti join (target survivors) + union — the updates side is typically
    the small CDC batch, so the anti join broadcasts it and the 100 TB
    target is never shuffled. (With Delta/Iceberg this is MERGE INTO;
    the algebra underneath is exactly this.)"""
    survivors = target.join(
        F.broadcast(updates.select(key).distinct()), key, "left_anti"
    )
    return survivors.unionByName(updates)


@register(
    "cdc_upsert_user_profile",
    oracle="""
    WITH target AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 4) AS total_value
      FROM events
      WHERE ts < TIMESTAMP '2024-01-16'
      GROUP BY user_id
    ), updates AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             ROUND(SUM(value), 4) AS total_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-16'
      GROUP BY user_id
    )
    SELECT * FROM updates
    UNION ALL
    SELECT * FROM target t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.user_id = t.user_id)
    """,
)
def cdc_upsert_user_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert under the gate: a first-half-of-month per-user profile
    is the target, the second half produces an update batch (latest
    profile wins wholesale), merged via ``cdc_upsert``. The oracle states
    the same semantics as updates ∪ (target anti updates)."""
    ev = load_table(spark, sf_dir, "events")
    split_s = 1705363200  # 2024-01-16 UTC
    ts_s = F.unix_timestamp("ts")

    def profile(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )

    target = profile(ev.filter(ts_s < split_s))
    updates = profile(ev.filter(ts_s >= split_s))
    return cdc_upsert(target, updates, "user_id")


@register(
    "snapshot_reconcile_daily_users",
    oracle="""
    WITH d1 AS (
      SELECT user_id,
             count(*) AS n_events,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704844800
        AND CAST(floor(epoch(ts)) AS BIGINT) <  1704931200
      GROUP BY user_id
    ), d2 AS (
      SELECT user_id,
             count(*) AS n_events,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events
      WHERE CAST(floor(epoch(ts)) AS BIGINT) >= 1704931200
        AND CAST(floor(epoch(ts)) AS BIGINT) <  1705017600
      GROUP BY user_id
    )
    SELECT COALESCE(d1.user_id, d2.user_id) AS user_id,
           CASE WHEN d1.user_id IS NULL THEN 'added'
                WHEN d2.user_id IS NULL THEN 'removed'
                WHEN d1.n_events <> d2.n_events OR d1.cents <> d2.cents
                     THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(d1.n_events AS BIGINT) AS n_events_prev,
           CAST(d2.n_events AS BIGINT) AS n_events_curr,
           d1.cents AS cents_prev,
           d2.cents AS cents_curr
    FROM d1 FULL OUTER JOIN d2 ON d1.user_id = d2.user_id
    """,
)
def snapshot_reconcile_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join: diff two consecutive
    daily per-user activity snapshots (2024-01-10 vs 2024-01-11 UTC,
    fixed epoch bounds) and classify every key as added / removed /
    changed / unchanged — the audit shape behind every CDC pipeline
    cutover check ("does the rebuilt table match yesterday plus the
    deltas?"). Money compares in integer cents (the repo's exact-cents
    discipline), so 'changed' is drift-free.

    Scale: both snapshots aggregate map-side before the join, so the
    full-outer shuffle carries one row per (user, day), not raw events;
    at 100 TB the two sides would be bucketed on user_id so the diff is
    exchange-free. Nulls on either side ARE the signal (added/removed),
    which is why this is the one join class where neither semi/anti nor
    inner can substitute."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def snap(lo: int, hi: int) -> DataFrame:
        return (
            ev.filter((F.col("ts_s") >= lo) & (F.col("ts_s") < hi))
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("cents").alias("cents"),
            )
        )

    d1 = snap(1704844800, 1704931200).alias("d1")  # 2024-01-10 UTC
    d2 = snap(1704931200, 1705017600).alias("d2")  # 2024-01-11 UTC
    joined = d1.join(d2, F.col("d1.user_id") == F.col("d2.user_id"), "full_outer")
    return joined.select(
        F.coalesce(F.col("d1.user_id"), F.col("d2.user_id")).alias("user_id"),
        F.when(F.col("d1.user_id").isNull(), F.lit("added"))
        .when(F.col("d2.user_id").isNull(), F.lit("removed"))
        .when(
            (F.col("d1.n_events") != F.col("d2.n_events"))
            | (F.col("d1.cents") != F.col("d2.cents")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.col("d1.n_events").alias("n_events_prev"),
        F.col("d2.n_events").alias("n_events_curr"),
        F.col("d1.cents").alias("cents_prev"),
        F.col("d2.cents").alias("cents_curr"),
    )
