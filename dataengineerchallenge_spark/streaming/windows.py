"""Streaming windowed load counts (SURVEY.md §2.9 T1/T2/T4;
/root/reference/README.md:19 — requests-per-minute is the feature feed
for next-minute load prediction).

Identical DataFrame code to the batch A10 aggregate — Structured
Streaming incrementalizes the same logical plan (SIGMOD'18 design,
PAPERS.md): state is the per-window partial count, merged per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_minute_load_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """T1 tumbling 1-minute request counts.

    The watermark (T4) bounds state: windows older than max(event time) -
    30 min are finalized and their state dropped — without it, a 100 TB
    stream accretes one state row per minute forever. Output minutes as
    epoch seconds (hash-safe, ns-vs-µs caveat SURVEY §7.4).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .select(F.unix_timestamp("w.start").alias("minute_epoch_s"), "n_requests")
    )


def sliding_load_stream(
    events: DataFrame, length: str = "5 minutes", slide: str = "1 minute",
    watermark: str = "30 minutes",
) -> DataFrame:
    """T2 sliding-window smoothed load: each event contributes to
    length/slide overlapping windows — the smoothed feature series for
    MLE goal 1 (ml/features.py consumes the batch twin)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", length, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "n_requests")
    )
