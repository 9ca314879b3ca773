"""Round-16 analytics pins: the additive seasonal decomposition."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.analytics import (
    hourly_load_seasonal_decomposition,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stl_components_add_back_exactly(spark):
    df = hourly_load_seasonal_decomposition(spark, SF_DIR)
    bad = df.filter(
        F.col("y") * 1000000
        != F.col("trend_micropoints")
        + F.col("seasonal_micropoints")
        + F.col("remainder_micropoints")
    ).count()
    assert bad == 0


def test_stl_seasonal_is_centered_and_daily(spark):
    rows = hourly_load_seasonal_decomposition(spark, SF_DIR).collect()
    # exactly one seasonal value per hour-of-day, and the 24 values
    # re-center to ~0 (within 24 half-ulps of the micro rounding)
    by_hod = {}
    for r in rows:
        hod = (r["hour_s"] // 3600) % 24
        by_hod.setdefault(hod, set()).add(r["seasonal_micropoints"])
    assert all(len(v) == 1 for v in by_hod.values())
    assert len(by_hod) == 24
    total = sum(next(iter(v)) for v in by_hod.values())
    assert abs(total) <= 24


def test_stl_trims_boundary_half_windows(spark):
    # the centered 2x24 MA is undefined for the first/last 12 hours:
    # 696 interior rows on a 720-hour fixture month
    n = hourly_load_seasonal_decomposition(spark, SF_DIR).count()
    assert n == 696
