"""Streaming joins (SURVEY.md §2.9 extension): the two shapes Structured
Streaming supports beyond per-stream aggregation.

- **Stream-stream interval join**: both sides watermarked, join condition
  = equi key + event-time band. State holds each side's rows until the
  watermark proves no future match can arrive — the streaming twin of the
  batch range join (operators/joins.py J6).
- **Stream-static join**: an unbounded stream hash-joined against a small
  static dimension (broadcast; no state, no watermark required) — the
  streaming twin of J1 enrichment.

Timestamps are pre-floored to whole seconds (like streaming/sessionize)
so band-boundary comparisons are integer-exact against the DuckDB
oracle — a pair sitting exactly ON the 1-hour band edge must land the
same way in both engines (lesson from the sf0.1 session_window fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _floored(events: DataFrame) -> DataFrame:
    return events.withColumn("ts", F.timestamp_seconds(F.unix_timestamp("ts")))


def purchases_within_hour_of_view_stream(
    events: DataFrame, band_s: int = 3600, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream inner interval join: every (view, purchase) pair of
    the same user with 0 ≤ purchase.ts − view.ts ≤ band_s.

    The watermark bounds BOTH sides' state: a buffered view can be
    dropped once the watermark passes view.ts + band (no future purchase
    can match it). Inner-join matches emit immediately — no finalization
    wait — so an availableNow replay yields the complete deterministic
    pair set.
    """
    ev = _floored(events)
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id").cast("string").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").cast("string").alias("p_user_id"),
            F.col("event_id").cast("string").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {band_s} SECONDS")),
        "inner",
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")).alias("gap_s"),
    )


def weighted_minute_load_stream(
    events: DataFrame, weights: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-static join + windowed aggregate: enrich each event with a
    static per-type weight (broadcast — the dimension never shuffles the
    stream), then a per-minute weighted load. The MLE-1 feature feed
    where event types contribute unequally."""
    enriched = _floored(events).join(F.broadcast(weights), "event_type", "left")
    return (
        enriched.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("weighted_load"),
        )
        .select(
            F.unix_timestamp("w.start").alias("minute_epoch_s"),
            "n_requests",
            F.round("weighted_load", 4).alias("weighted_load"),
        )
    )
