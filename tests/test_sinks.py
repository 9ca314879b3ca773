"""S4 sink roundtrips: parquet (partitioned) and csv."""

from __future__ import annotations

import pyspark.sql.functions as F

from dataengineerchallenge_spark.sources import load_table
from dataengineerchallenge_spark.sources.sinks import read_result, write_result

SF_DIR = "/root/testdata/sf0.001"


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    ).select("event_id", "event_type", "value", "day")
    p = str(tmp_path / "out_parquet")
    write_result(ev, p, partition_by=["event_type"])
    back = read_result(spark, p)
    assert back.count() == ev.count()
    # partition pruning works on the written layout
    one = back.filter(F.col("event_type") == "click")
    assert one.count() == ev.filter(F.col("event_type") == "click").count()


def test_csv_single_file_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").groupBy("event_type").count()
    p = str(tmp_path / "out_csv")
    write_result(ev, p, fmt="csv", coalesce_to=1)
    import glob

    assert len(glob.glob(p + "/part-*.csv")) == 1  # compacted summary
    back = read_result(spark, p, fmt="csv")
    assert {(r["event_type"], r["count"]) for r in back.collect()} == {
        (r["event_type"], r["count"]) for r in ev.collect()
    }


def test_sink_partitioned_roundtrip_prunes_partitions(spark):
    """The registered S4 roundtrip's event_type predicate must be served
    by partition pruning on the written layout, not a row filter."""
    import contextlib
    import io
    import re

    from dataengineerchallenge_spark.registry import queries

    df = queries()["sink_partitioned_roundtrip"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"PartitionFilters: \[.*event_type", plan), plan


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    """The DPP query's partition filter must come from the dim join at
    runtime (dynamicpruningexpression), not from a static predicate."""
    import contextlib
    import io

    from dataengineerchallenge_spark.registry import queries

    df = queries()["dpp_engagement_by_type"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan, plan


def test_bucketed_join_has_no_join_side_exchange(spark):
    """S4+/J2+: the 8-bucket clustered layout feeds the orderkey join
    with zero join-side shuffles — the only Exchange in the plan is the
    final small aggregate. Broadcast is disabled so the pin proves the
    bucketing (not a broadcast) removed the exchanges."""
    from dataengineerchallenge_spark.queries.formats import stage_bucketed_order_tables

    bo, bl = stage_bucketed_order_tables(spark, SF_DIR)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, li = spark.table(bo), spark.table(bl)
        j = (
            o.join(li, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert plan.count("Exchange") == 1  # the aggregate only — join is co-located


def _executed_scan_metrics(df) -> list[dict]:
    """Run df and return the SQL metrics of every file scan in the FINAL
    adaptive plan (recursing through QueryStage leaves) — the only place
    partitions-actually-read is observable."""
    df.collect()
    out: list[dict] = []

    def walk(jplan):
        name = jplan.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(jplan.executedPlan())
            return
        if "QueryStage" in name:
            walk(jplan.plan())
            return
        if name.startswith("Scan parquet"):
            m, vals = jplan.metrics(), {}
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            out.append(vals)
        ch = jplan.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def test_date_partition_static_pruning_reads_only_window_days(spark):
    """VERDICT r5 #4: the 10-day window over the dt-partitioned layout
    must be served by PartitionFilters on dt, and the EXECUTED scan must
    read exactly 10 of the 30 day directories (scan SQL metrics)."""
    import contextlib
    import io
    import re

    from dataengineerchallenge_spark.registry import queries

    df = queries()["date_partition_pruned_daily_load"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert re.search(r"PartitionFilters: \[.*dt", plan), plan
    scans = _executed_scan_metrics(df)
    assert len(scans) == 1 and scans[0]["numPartitions"] == 10, scans


def test_dpp_promo_days_prunes_date_partitions_at_runtime(spark):
    """The promo-calendar join carries no static dt predicate — the day
    directories must be pruned at RUNTIME via DPP: the executed fact
    scan's metrics must show all 30 static partitions reduced to the 5
    promo days (staticFilesNum vs numPartitions)."""
    import contextlib
    import io

    from dataengineerchallenge_spark.queries.formats import PROMO_DAYS
    from dataengineerchallenge_spark.registry import queries

    df = queries()["dpp_promo_day_load"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruningexpression" in plan, plan
    scans = _executed_scan_metrics(df)
    fact = [s for s in scans if "staticFilesNum" in s]
    assert len(fact) == 1, scans
    assert fact[0]["staticFilesNum"] == 30 and fact[0]["numPartitions"] == 5, fact
    assert {r["dt"] for r in df.collect()} == set(PROMO_DAYS)
