"""Registered streaming queries (SURVEY.md §2.9) — each runs its
streaming plan to completion over the fixture with availableNow and
returns the materialized sink contents, so the DuckDB oracle can check
real streaming output, not a batch stand-in.

Streaming runs pay Python/state overhead per micro-batch; these entries
exist for semantics verification. Production deployment differences
(real trigger cadence, kafka source, parquet sink) are config, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineerchallenge_spark.operators.sessionize import events_session_cte
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import local_frame
from dataengineerchallenge_spark.streaming import run_to_batch, stream_events
from dataengineerchallenge_spark.streaming.sessionize import (
    session_window_stream,
    stateful_sessionize_stream,
    tws_sessionize_stream,
)
from dataengineerchallenge_spark.streaming.windows import (
    per_minute_load_stream,
    sliding_load_stream,
)


@register(
    "stream_per_minute_load",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS minute_epoch_s,
           CAST(COUNT(*) AS BIGINT) AS n_requests
    FROM events
    GROUP BY 1
    """,
)
def stream_per_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: tumbling per-minute counts, complete-mode snapshot == batch
    A10 aggregate (streaming/batch equivalence, hash-checked)."""
    ev = stream_events(spark, sf_dir)
    return run_to_batch(per_minute_load_stream(ev), "per_minute", output_mode="complete")


@register(
    "stream_sliding_load",
    oracle="""
    SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) - 60 * k
             AS window_start_s,
           CAST(COUNT(*) AS BIGINT) AS n_requests
    FROM events CROSS JOIN (SELECT unnest(range(5)) AS k)
    GROUP BY 1
    """,
)
def stream_sliding_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: 5-min/1-min sliding load; every event lands in 5 overlapping
    windows (the oracle expands the same 5-way membership in SQL)."""
    ev = stream_events(spark, sf_dir)
    return run_to_batch(sliding_load_stream(ev), "sliding", output_mode="complete")


@register(
    "stream_sessionize",
    oracle=events_session_cte(gap=900)
    + """
    SELECT skey, start_s, end_s + 900 AS end_s, n_hits, n_unique_urls
    FROM sessions
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+T4: native session_window sessionizer, complete snapshot.

    Gap boundary: session_window MERGES a gap of exactly 900 s (inclusive
    — empirically pinned at sf0.1, where exact-900 gaps exist: a gap
    strictly GREATER than the gap duration starts a new session). That is
    identical to the batch sessionizer's `>` rule, so the oracle is the
    shared session CTE with gap=900; window end = last event + gap."""
    ev = stream_events(spark, sf_dir)
    return run_to_batch(session_window_stream(ev), "sessions", output_mode="complete")


@register(
    "stream_stateful_sessions",
    oracle=events_session_cte()
    + """
    , mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS m FROM events)
    SELECT CAST(skey AS VARCHAR) AS skey,
           start_s AS session_start_s,
           end_s   AS session_end_s,
           CAST(n_hits AS BIGINT) AS n_hits
    FROM (SELECT *, max(session_id) OVER (PARTITION BY skey) AS max_sid
          FROM sessions), mx
    WHERE session_id < max_sid      -- closed by a proven gap in-stream
       OR end_s + 900 < m - 1800    -- flushed by event-time timeout
    """,
)
def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: custom stateful sessionizer (batch `>` gap semantics).

    Emission rule, encoded exactly in the oracle: a session emits when a
    later event proves its gap closed, OR when its event-time timeout
    (session end + gap) falls below the final watermark (max event time −
    30-min delay; the trailing availableNow no-data batch fires these).
    Sessions still inside the watermark horizon stay in state — correct
    streaming behavior: they are not provably over. (The fixture has no
    session exactly ON the timeout boundary, so strict-vs-non-strict
    comparison is not observable at sf0.01.)"""
    ev = stream_events(spark, sf_dir)
    return run_to_batch(stateful_sessionize_stream(ev), "stateful", output_mode="append")


def _has_tws_runtime() -> bool:
    """transformWithStateInPandas drives its Python state server over
    protobuf, which this container lacks — gate, don't crash (the
    operator itself lives in streaming/sessionize.py regardless)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


if _has_tws_runtime():

    @register(
        "stream_stateful_sessions_tws",
        oracle=events_session_cte()
        + """
        , mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS m FROM events)
        SELECT CAST(skey AS VARCHAR) AS skey,
               start_s AS session_start_s,
               end_s   AS session_end_s,
               CAST(n_hits AS BIGINT) AS n_hits
        FROM (SELECT *, max(session_id) OVER (PARTITION BY skey) AS max_sid
              FROM sessions), mx
        WHERE session_id < max_sid      -- closed by a proven gap in-stream
           OR end_s + 900 < m - 1800    -- flushed by event-time timer
        """,
    )
    def stream_stateful_sessions_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
        """T5 on transformWithStateInPandas (Spark 4): same emission rule
        and oracle as stream_stateful_sessions, rebuilt on typed value
        state + explicit timers — the forward-looking stateful API."""
        ev = stream_events(spark, sf_dir)
        return run_to_batch(tws_sessionize_stream(ev), "tws", output_mode="append")


@register(
    "stream_view_purchase_pairs",
    oracle="""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS user_id,
             CAST(event_id AS VARCHAR) AS event_id,
             event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    )
    SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
           p.ts_s - v.ts_s AS gap_s
    FROM ev v JOIN ev p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts_s >= v.ts_s AND p.ts_s <= v.ts_s + 3600
    """,
)
def stream_view_purchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (watermarked both sides): all
    (view, purchase) pairs of one user within an hour — the streaming
    twin of the batch range join, hash-checked against the plain SQL
    band join."""
    from dataengineerchallenge_spark.streaming.joins import (
        purchases_within_hour_of_view_stream,
    )

    ev = stream_events(spark, sf_dir)
    return run_to_batch(
        purchases_within_hour_of_view_stream(ev), "vp_pairs", output_mode="append"
    )


@register(
    "stream_dedup_events",
    oracle="""
    SELECT CAST(event_id AS VARCHAR) AS event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
           event_type,
           round(value, 4) AS value
    FROM events
    """,
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (A9's streaming twin): the events feed
    delivered TWICE (re-delivered log drops, the at-least-once reality of
    /root/reference/README.md:44's per-interval objects), deduplicated
    with ``dropDuplicatesWithinWatermark`` on the event key.

    State stays bounded by the 30-min watermark — at 100 TB/day this is
    the only viable streaming dedup (unbounded ``dropDuplicates`` state
    grows forever); the contract is that re-deliveries arrive within the
    watermark delay, which AWS interval re-drops do. Output == the
    single-delivery batch, hash-checked."""
    from pyspark.sql import functions as F

    doubled = stream_events(spark, sf_dir).unionByName(stream_events(spark, sf_dir))
    dedup = (
        doubled.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            F.col("event_id").cast("string").alias("event_id"),
            F.unix_timestamp("ts").alias("ts_s"),
            "event_type",
            F.round("value", 4).alias("value"),
        )
    )
    return run_to_batch(dedup, "dedup", output_mode="append")


_TYPE_WEIGHTS = [("view", 1.0), ("click", 2.0), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)]


@register(
    "stream_weighted_minute_load",
    oracle="""
    WITH w(event_type, weight) AS (VALUES
      ('view', 1.0), ('click', 2.0), ('purchase', 10.0), ('signup', 5.0), ('error', 0.0))
    SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS minute_epoch_s,
           CAST(COUNT(*) AS BIGINT) AS n_requests,
           round(CAST(SUM(coalesce(w.weight, 0.0)) AS DOUBLE), 4) AS weighted_load
    FROM events LEFT JOIN w USING (event_type)
    GROUP BY 1
    """,
)
def stream_weighted_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: broadcast per-type weight dimension into the
    stream, then per-minute weighted load (complete snapshot)."""
    from dataengineerchallenge_spark.streaming.joins import weighted_minute_load_stream

    ev = stream_events(spark, sf_dir)
    weights = local_frame(spark, _TYPE_WEIGHTS, "event_type string, weight double")
    return run_to_batch(
        weighted_minute_load_stream(ev, weights), "wload", output_mode="complete"
    )
