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
            salt_on=["event_id"],
            n_salts=8,
        ).collect()
    }
    assert salted == direct


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(ev, ["user_id"], {"a": ("value", "avg")}, salt_on=["event_id"])


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


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime bloom-filter join pruning: a selective filter on the
    creation side (urgent orders) injects a bloom-filter semi-filter on
    the probe side's scan (might_contain over l_orderkey), so most
    lineitem rows die before the shuffle — the non-partitioned complement
    of DPP for a 100 TB fact ⋈ filtered-dim join. The application-side
    size threshold defaults to 10 GiB (far above any fixture), so the pin
    lowers it to 0; production clusters keep the default and get the
    filter exactly when the probe scan is big enough to matter."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        li = load_table(spark, SF_DIR, "lineitem")
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        [row] = j.collect()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    # bloom pruning must not change the result: cross-check without it
    o2 = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li2 = load_table(spark, SF_DIR, "lineitem")
    [plain] = (
        li2.join(o2, li2.l_orderkey == o2.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert (row["o_orderpriority"], row["n"]) == (plain["o_orderpriority"], plain["n"])


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's runtime skew-join split: a hot join key whose shuffle
    partition dwarfs the median gets split into multiple tasks at
    runtime (SortMergeJoin(skew=true) + AQEShuffleRead skewed) — the
    first lever against join skew; operators/skew.py's salted_join is
    the deterministic fallback. Thresholds are lowered to make a ~MB hot
    key "skewed"; production keeps the 256 MB default. The downstream
    aggregate is deliberately GLOBAL: an agg keyed on the join key would
    require hash distribution and veto the split — that interaction is
    the whole reason salting still exists."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 205000).select(
            F.when(F.col("id") < 200000, 0).otherwise((F.col("id") % 50) + 1).alias("k"),
            F.rand(7).alias("v"),
        )
        right = spark.range(0, 5100).select((F.col("id") % 51).alias("k"), F.rand(9).alias("w"))
        # the sum(v*w) aggregate keeps the random doubles alive through the
        # join: skew detection reads COMPRESSED shuffle bytes, and a
        # count-only plan prunes to the key column, whose 200k identical
        # longs compress below the 64 KB threshold (observed: no split)
        j = big.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.col("v") * F.col("w")).alias("s")
        )
        [row] = j.collect()
        # hot key 0: 200k rows × 100 matches; keys 1..50: 100 × 100 each
        assert row["n"] == 200000 * 100 + 50 * 100 * 100
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_salted_join_equals_plain_join(spark):
    """salted_join must preserve inner-join multiplicity exactly — row
    multiset equality with the plain join on a frame containing a hot key
    (most rows share user 0-like skew via modulo)."""
    from dataengineerchallenge_spark.operators.skew import salted_join

    big = spark.range(0, 5000).select(
        F.when(F.col("id") < 4000, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))
        ).alias("k"),
        F.col("id").alias("rid"),
    )
    small = spark.range(0, 200).select(
        F.when(F.col("id") < 5, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 37).cast("string"))
        ).alias("k"),
        F.col("id").alias("sid"),
    )
    plain = sorted(map(tuple, big.join(small, "k").select("k", "rid", "sid").collect()))
    salted = sorted(
        map(tuple, salted_join(big, small, key="k", salt_on="rid").select("k", "rid", "sid").collect())
    )
    assert salted == plain
    assert len(plain) > 4000 * 5  # the hot key actually fanned out


def test_salted_agg_requires_salt_columns(spark):
    """ADVICE r5: salting on nothing must be rejected up front — an
    empty salt collapses a hot key into one shard, silently reinstating
    the skew the operator exists to remove."""
    import pytest

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="salt_on"):
        salted_agg(ev, ["user_id"], {"n": ("value", "count")}, salt_on=[])
