"""Aggregation breadth (A6-A8, F7) invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_approx_count_distinct_within_rsd(spark, qs):
    """A6: HLL++ estimate stays within ~3x the requested 2% rsd of the
    exact count (generous bound — cardinalities here are tiny)."""
    from dataengineerchallenge_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    exact = ev.groupBy("user_id").agg(F.countDistinct("event_type").alias("exact"))
    approx = qs["approx_unique_urls_per_user"](spark, SF_DIR)
    joined = approx.join(exact, "user_id")
    bad = joined.filter(
        F.abs(F.col("approx_unique_urls") - F.col("exact")) > 0.06 * F.col("exact") + 1
    )
    assert bad.count() == 0


def test_rollup_grand_total_matches_flat_count(spark, qs):
    roll = qs["region_nation_rollup"](spark, SF_DIR)
    grand = roll.filter(F.col("r_name").isNull() & F.col("n_name").isNull()).collect()
    assert len(grand) == 1
    from dataengineerchallenge_spark.sources import load_table

    assert grand[0]["n_orders"] == load_table(spark, SF_DIR, "orders").count()


def test_cube_grain_counts_consistent(spark, qs):
    cube = qs["event_type_day_cube"](spark, SF_DIR)
    total = cube.filter(F.col("event_type").isNull() & F.col("day").isNull())
    per_type = cube.filter(F.col("event_type").isNotNull() & F.col("day").isNull())
    assert total.collect()[0]["n_events"] == sum(
        r["n_events"] for r in per_type.collect()
    )


def test_session_url_sets_sorted(spark, qs):
    # urls is a '|'-joined sorted-set string (driver hasher can't take
    # arrays); re-splitting must yield a sorted, duplicate-free list
    df = qs["session_url_sets"](spark, SF_DIR)
    arr = F.split("urls", r"\|")
    unsorted = df.filter(
        (arr != F.sort_array(arr)) | (F.size(arr) != F.size(F.array_distinct(arr)))
    )
    assert unsorted.count() == 0
