"""Batch sessionization (SURVEY.md §2.5 W1-W2, §2.4 A1-A5).

Implements the reference's headline goals (/root/reference/README.md:9-16):
  1. sessionize hits by visitor key within a time-gap window (default 15 min,
     README.md:43),
  2. average session time (README.md:12),
  3. unique URL visits per session (README.md:13-14),
  4. most-engaged visitors by session time (README.md:16).

Spark-first design: lag + cumulative-sum window functions — two window
passes over the same ``hashpartition(key) + sort(ts)`` layout, so Catalyst
plans ONE exchange and one sort feeding both WindowExec nodes, then reuses
the same partitioning for the per-session hash aggregate. At 100 TB the
only shuffle is the single exchange on the session key; a hot key degrades
the per-partition sort, in which case the streaming twin
(streaming/sessionize.py, native session_window state merge) or per-day
pre-bucketing is the fallback (SURVEY.md §7.4).

Boundary semantics: a gap STRICTLY GREATER than ``gap_s`` seconds starts a
new session (gap == 900 s stays in-session); timestamps are floored to
whole seconds first (unix_timestamp) so the DuckDB oracle
(floor(epoch(ts))) sees identical values; ties within one second break on
``order_col``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_S = 900  # 15 minutes, README.md:43


def with_session_ids(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_col: str | Sequence[str] = "event_id",
    gap_s: int = DEFAULT_GAP_S,
) -> DataFrame:
    """Assign ``session_id`` (1-based per key) via lag + cumulative sum.

    Adds columns: ``ts_s`` (epoch seconds, floored) and ``session_id``
    (bigint). Both window functions share one partitioning/ordering so the
    physical plan has a single exchange + sort.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(key).orderBy("ts_s", *order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_s").over(w)
    is_new: Column = F.when(
        prev.isNull() | ((F.col("ts_s") - prev) > F.lit(gap_s)), 1
    ).otherwise(0)
    return (
        df.withColumn("ts_s", F.unix_timestamp(F.col(ts)))
        .withColumn("session_id", F.sum(is_new).over(run).cast("bigint"))
    )


def session_stats(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    url: str = "event_type",
    order_col: str | Sequence[str] = "event_id",
    gap_s: int = DEFAULT_GAP_S,
    extra_aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-session aggregate row: hit count, duration, distinct-URL count.

    ``url`` is the unique-visit key (README.md:13-14); on the events
    fixture the stand-in is ``event_type`` (FIXTURES.md). Duration is
    ``max - min`` of floored epoch seconds (single-hit sessions → 0).
    """
    sess = with_session_ids(df, key=key, ts=ts, order_col=order_col, gap_s=gap_s)
    return sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
        F.countDistinct(url).alias("n_unique_urls"),
        F.min("ts_s").alias("start_s"),
        F.max("ts_s").alias("end_s"),
        *extra_aggs,
    )


def session_state(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    url: str = "event_type",
    order_col: str | Sequence[str] = "event_id",
    gap_s: int = DEFAULT_GAP_S,
) -> DataFrame:
    """Mergeable per-session state: like :func:`session_stats` but keeps
    the distinct-URL SET (collect_set) instead of its count, so a later
    batch can be merged without rescanning history. At 100 TB, compact
    closed sessions (everything but each key's last) to the bare count —
    only the open session can still grow; the set is bounded by one
    session's URL variety either way (or swap in an HLL sketch, see
    hll_weekly_actives)."""
    sess = with_session_ids(df, key=key, ts=ts, order_col=order_col, gap_s=gap_s)
    return sess.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("ts_s").alias("start_s"),
        F.max("ts_s").alias("end_s"),
        F.collect_set(url).alias("url_set"),
    )


def merge_session_state(
    state: DataFrame,
    new_events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    url: str = "event_type",
    order_col: str | Sequence[str] = "event_id",
    gap_s: int = DEFAULT_GAP_S,
) -> DataFrame:
    """Incrementally fold a new batch of events into prior session state.

    PRECONDITION: every new event's floored timestamp is >= every prior
    event's for the same key (time-partitioned ingestion; the batch twin
    of the streaming watermark). Under it, only each key's LAST session
    can be extended, so the merge is: sessionize the new batch alone,
    renumber its sessions after the key's prior max (minus one when the
    first new session continues the open one, i.e. its start is within
    ``gap_s`` of the prior end), then one (key, session_id) merge
    aggregate over old+new state rows. Result is IDENTICAL to
    re-sessionizing all events from scratch — the registered query proves
    that against the full-recompute oracle — at the cost of one pass over
    the NEW batch only: the 100 TB daily-ingest pattern where history is
    never rescanned.
    """
    new_state = session_state(
        new_events, key=key, ts=ts, url=url, order_col=order_col, gap_s=gap_s
    )
    prior = state.groupBy(key).agg(
        F.max("session_id").alias("_smax"), F.max("end_s").alias("_pend")
    )
    first_new = new_state.filter(F.col("session_id") == 1).select(
        F.col(key), F.col("start_s").alias("_nstart")
    )
    flags = prior.join(first_new, key).select(
        key,
        "_smax",
        (F.col("_nstart") - F.col("_pend") <= F.lit(gap_s)).cast("long").alias("_cont"),
    )
    renumbered = new_state.join(flags, key, "left").select(
        key,
        (
            F.col("session_id")
            + F.coalesce(F.col("_smax"), F.lit(0))
            - F.coalesce(F.col("_cont"), F.lit(0))
        ).alias("session_id"),
        "n_hits",
        "start_s",
        "end_s",
        "url_set",
    )
    return (
        state.select(key, "session_id", "n_hits", "start_s", "end_s", "url_set")
        .unionByName(renumbered)
        .groupBy(key, "session_id")
        .agg(
            F.sum("n_hits").alias("n_hits"),
            F.min("start_s").alias("start_s"),
            F.max("end_s").alias("end_s"),
            F.array_distinct(F.flatten(F.collect_list("url_set"))).alias("url_set"),
        )
    )


def session_stats_skew_safe(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    url: str = "event_type",
    order_col: str | Sequence[str] = "event_id",
    gap_s: int = DEFAULT_GAP_S,
    slice_s: int = 86_400,
) -> DataFrame:
    """Two-phase sessionization for skewed keys — the implemented escape
    hatch for W2's documented hot-key limit (operators/skew.py): plain
    ``session_stats`` sorts each key's ENTIRE history inside one window
    partition, so one hot key (a NAT gateway, a scraper) serializes a
    whole task at 100 TB. Here the event-level sort is bounded to
    ``(key, slice)`` (default: one day), and slices are stitched at
    session granularity:

    1. sessionize each (key, slice) independently — same lag+cumsum, but
       the sort is at most one slice of one key;
    2. order each key's LOCAL sessions (orders of magnitude fewer rows
       than events) and re-apply the identical gap rule to consecutive
       (prev end, next start) pairs — cross-slice continuations merge,
       chains across any number of slices fold via the same cumulative
       sum;
    3. one (key, global id) aggregate; distinct URLs merge via per-local
       url sets (bounded by per-session variety, same stance as
       ``session_state``).

    Every consecutive event pair is evaluated against the same
    ``gap > gap_s`` rule exactly once (within-slice pairs in phase 1,
    boundary pairs in phase 2), so the result is IDENTICAL to the
    single-pass sessionizer — the registered query proves it against the
    full-recompute oracle. Cost: one extra (small) session-level shuffle
    — the price of hot-key immunity.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    ev = (
        df.withColumn("ts_s", F.unix_timestamp(F.col(ts)))
        .withColumn("_slice", F.floor(F.col("ts_s") / F.lit(slice_s)))
    )
    w = Window.partitionBy(key, "_slice").orderBy("ts_s", *order_cols)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts_s").over(w)
    is_new = F.when(prev.isNull() | ((F.col("ts_s") - prev) > F.lit(gap_s)), 1).otherwise(0)
    local = (
        ev.withColumn("_lid", F.sum(is_new).over(run))
        .groupBy(key, "_slice", "_lid")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
            F.collect_set(url).alias("_urls"),
        )
    )
    ws = Window.partitionBy(key).orderBy("start_s", "_slice", "_lid")
    runs = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_end = F.lag("end_s").over(ws)
    sess_new = F.when(
        prev_end.isNull() | ((F.col("start_s") - prev_end) > F.lit(gap_s)), 1
    ).otherwise(0)
    return (
        local.withColumn("session_id", F.sum(sess_new).over(runs).cast("bigint"))
        .groupBy(key, "session_id")
        .agg(
            F.sum("n_hits").cast("long").alias("n_hits"),
            (F.max("end_s") - F.min("start_s")).alias("duration_s"),
            F.size(F.array_distinct(F.flatten(F.collect_list("_urls")))).cast("long").alias(
                "n_unique_urls"
            ),
            F.min("start_s").alias("start_s"),
            F.max("end_s").alias("end_s"),
        )
    )


# Shared oracle SQL fragment: identical sessionization in DuckDB.
# {tbl} = source view, {key}/{ts}/{order}/{url} = column names, {gap} = secs.
ORACLE_SESSION_CTE = """
WITH hits AS (
    SELECT {key} AS skey, {order} AS ord, {url} AS url,
           CAST(floor(epoch({ts})) AS BIGINT) AS ts_s
    FROM {tbl}
), flagged AS (
    SELECT *,
           CASE WHEN lag(ts_s) OVER w IS NULL
                  OR ts_s - lag(ts_s) OVER w > {gap} THEN 1 ELSE 0 END AS is_new
    FROM hits
    WINDOW w AS (PARTITION BY skey ORDER BY ts_s, ord)
), sess AS (
    SELECT *,
           CAST(SUM(is_new) OVER (PARTITION BY skey ORDER BY ts_s, ord
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM flagged
), sessions AS (
    SELECT skey, session_id,
           COUNT(*) AS n_hits,
           MAX(ts_s) - MIN(ts_s) AS duration_s,
           COUNT(DISTINCT url) AS n_unique_urls,
           MIN(ts_s) AS start_s,
           MAX(ts_s) AS end_s
    FROM sess
    GROUP BY skey, session_id
)
"""


def events_session_cte(
    tbl: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    order: str = "event_id",
    url: str = "event_type",
    gap: int = DEFAULT_GAP_S,
) -> str:
    return ORACLE_SESSION_CTE.format(tbl=tbl, key=key, ts=ts, order=order, url=url, gap=gap)
