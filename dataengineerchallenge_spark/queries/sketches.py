"""Mergeable-sketch aggregates (SURVEY.md §2.4 A6 at the level a 100 TB
deployment actually uses it): HyperLogLog sketches materialized at a fine
grain and UNIONED at coarser grains, and approximate percentiles.

The point of sketches at scale is not one approximate number — it is
that partial sketches are mergeable, so a per-day sketch table replaces
re-scanning raw events for every rollup window (the same
partial/final-aggregate contract Catalyst applies within one query,
lifted to between-query materialization). Sketch binaries are
implementation-specific (Apache DataSketches in Spark), so these are
rows-only per contract; pytest pins the estimates against exact counts
within the sketch's documented error envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table


def daily_user_sketches(ev: DataFrame) -> DataFrame:
    """Per-day HLL sketch of active user_ids — the materializable
    fine-grain sketch table (lgConfigK=12 ≈ 1.6% rsd, 4 KiB/row)."""
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s")
    ).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("hll_weekly_actives")
def hll_weekly_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 scale pattern: weekly distinct-user estimates built by UNIONING
    the per-day sketches — raw events are scanned once at day grain; the
    week rollup touches only 7 sketch rows per key. Deterministic for a
    given input (DataSketches HLL is order-insensitive on union), but
    rows-only: the estimate is sketch-implementation-specific, and DuckDB
    has no twin. Accuracy vs exact is pinned in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = daily_user_sketches(ev)
    return (
        daily.groupBy(
            ((F.col("day_s") - F.lit(345600)) / 604800).cast("long").alias("_wk_idx")
        )
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")), 0)
            .cast("long")
            .alias("approx_users"),
            F.sum("n_events").alias("n_events"),
        )
        .select(
            # week start (Monday UTC; epoch 0 was a Thursday, hence the
            # 345600 s = 4 day shift in the index above)
            (F.col("_wk_idx") * 604800 + F.lit(345600)).alias("week_s"),
            "approx_users",
            "n_events",
        )
    )


@register("approx_value_percentiles")
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per type via
    percentile_approx (KLL-style rank sketch; relative error 1e-4 here).
    Rows-only: the sketch answer is accuracy-bounded, not bit-pinned (the
    exact twin is value_percentiles_by_type); bound pinned in pytest."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000)
    return ev.groupBy("event_type").agg(
        F.round(F.get(pct, 0), 4).alias("p50"),
        F.round(F.get(pct, 1), 4).alias("p90"),
        F.round(F.get(pct, 2), 4).alias("p99"),
    )


@register("kll_value_quantile_rollup")
def kll_value_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+ mergeable QUANTILES (the KLL twin of hll_weekly_actives): per-day
    KLL sketches of event value, merged per event_type — the sketch-table
    pattern where a day-grain materialization answers any coarser rollup
    without rescanning raw events. Spark 4's kll_sketch_merge_* is a
    binary scalar, not an aggregate, so the rollup folds a higher-order
    ``aggregate`` over the collected day sketches; the list is
    array_sort-ed first so the fold order (and thus the exact compaction
    path) is deterministic for a given input. Rows-only per contract
    (sketch-implementation-specific); rank-error vs the exact
    percentiles is pinned in tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s"),
    ).agg(F.kll_sketch_agg_double("value", F.lit(200)).alias("sk"))
    merged = (
        daily.groupBy("event_type")
        .agg(F.array_sort(F.collect_list("sk")).alias("sks"))
        .select(
            "event_type",
            F.expr(
                "aggregate(slice(sks, 2, size(sks) - 1), sks[0],"
                " (acc, x) -> kll_sketch_merge_double(acc, x))"
            ).alias("sk"),
        )
    )
    return merged.select(
        "event_type",
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 4).alias("p50"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.9)), 4).alias("p90"),
        F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.99)), 4).alias("p99"),
    )
