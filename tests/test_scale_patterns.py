"""Scale-pattern verification: salted aggregation equivalence and
bucketed co-located joins (SURVEY.md §4) — the two shuffle levers that
don't show up in ordinary correctness tests."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from dataengineerchallenge_spark.operators.skew import salted_agg
from dataengineerchallenge_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _explain(df, mode="simple"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_salted_agg_equals_direct_agg(spark):
    ev = load_table(spark, SF_DIR, "events")
    direct = {
        r["user_id"]: (r["n"], round(r["total"], 6), r["vmax"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"), F.max("value").alias("vmax"))
        .collect()
    }
    salted = {
        r["user_id"]: (r["n"], round(r["total"], 6), r["vmax"])
        for r in salted_agg(
            ev,
            ["user_id"],
            {"n": ("value", "count"), "total": ("value", "sum"), "vmax": ("value", "max")},
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(ev, ["user_id"], {"a": ("value", "avg")})


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key into the same bucket count →
    the sort-merge join runs with ZERO Exchange nodes: the co-location
    contract that kills the biggest shuffle of a 100 TB star join."""
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    for name, df, key in (("b_orders", orders, "o_orderkey"), ("b_lineitem", lineitem, "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    # tiny sf fixture would broadcast; force the SMJ path a 100 TB join takes
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey")
        )
        plan = _explain(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sanity: result matches the unbucketed join
        assert j.count() == orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for name in ("b_orders", "b_lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """Date-partitioned layout (the AWS per-interval delivery shape,
    reference README.md:44): a day filter must become a PartitionFilter
    on the scan — zero IO for other days — and never a data filter."""
    ev = load_table(spark, SF_DIR, "events").withColumn("day", F.dayofmonth("ts"))
    p = str(tmp_path / "ev_by_day")
    ev.write.partitionBy("day").parquet(p)
    q = spark.read.parquet(p).filter(F.col("day") == 2).select("event_id", "value")
    plan = _explain(q, "formatted")
    import re

    assert re.search(r"PartitionFilters: \[isnotnull\(day#\d+\), \(day#\d+ = 2\)\]", plan), plan
    # the day predicate must NOT survive as a post-scan data filter
    assert "PushedFilters: [IsNotNull(day" not in plan
    assert "Filter (day" not in plan
    expected = ev.filter(F.col("day") == 2).count()
    assert q.count() == expected


def test_orc_pushes_filters_like_parquet(spark):
    """S2/ORC: the other columnar format also receives pushed filters —
    the at-rest formats (parquet, ORC) prune; row formats don't."""
    from dataengineerchallenge_spark.sources.formats import events_from_orc

    q = events_from_orc(spark, SF_DIR).filter(F.col("event_type") == "error").select("event_id")
    plan = _explain(q, "formatted")
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,error)]" in plan
