"""Rank/top-k/percentile family (W3-W4, O3-O4) invariants."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_longest_session_per_user_one_row_per_key(spark, qs):
    df = qs["longest_session_per_user"](spark, SF_DIR)
    total = df.count()
    assert total == df.select("skey").distinct().count()
    # the per-user max really is the max of that user's sessions
    sess = qs["sessionize"](spark, SF_DIR)
    mx = sess.groupBy("skey").agg(F.max("duration_s").alias("m"))
    joined = df.join(mx, "skey")
    assert joined.filter(F.col("duration_s") != F.col("m")).count() == 0


def test_top_orders_per_customer_bounds(spark, qs):
    df = qs["top_orders_per_customer"](spark, SF_DIR)
    per_key = df.groupBy("o_custkey").count()
    assert per_key.filter(F.col("count") > 3).count() == 0
    assert df.filter((F.col("rn") < 1) | (F.col("rn") > 3)).count() == 0


def test_engagement_percentiles_ranges(spark, qs):
    df = qs["engagement_percentiles"](spark, SF_DIR)
    assert df.filter((F.col("decile") < 1) | (F.col("decile") > 10)).count() == 0
    assert df.filter((F.col("pct_rank") < 0) | (F.col("pct_rank") > 1)).count() == 0


def test_bernoulli_sample_reproducible_with_seed(spark):
    """O4 .sample(): seeded Bernoulli sampling is reproducible within Spark
    (the oracle-checked variant is the systematic event_id % 97 filter)."""
    from dataengineerchallenge_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    a = ev.sample(fraction=0.1, seed=7).select("event_id").collect()
    b = ev.sample(fraction=0.1, seed=7).select("event_id").collect()
    assert a == b
    assert 0 < len(a) < ev.count()
