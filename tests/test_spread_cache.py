"""Round-20 optimization pins for adaptive spread + memoized table loads
+ one-partition literal frames (sources/tables.py, OPTIMIZATION_r20.md
Changes 9-10):

- spread() sizes its fan-out width from the plan-stats input size and
  never exceeds the old defaultParallelism blanket; the dial off
  restores the blanket width;
- load_table returns the SAME lazy plan object for repeated loads of
  the same fixture in one session (a plan, not data — actions still
  compute from parquet), and distinct tables/dirs get distinct plans.
"""

from __future__ import annotations

from dataengineerchallenge_spark.sources.tables import (
    load_table,
    local_frame,
    spread,
)

SF_DIR = "/root/testdata/sf0.001"
FLAG = "spark.graft.spread.adaptive"


def test_spread_adaptive_narrows_tiny_scan(spark):
    docs = load_table(spark, SF_DIR, "documents")
    wide = spark.sparkContext.defaultParallelism
    n_adaptive = spread(docs).rdd.getNumPartitions()
    assert n_adaptive <= wide
    # the sf0.001 documents file is a few KB — far below one 64 KiB
    # chunk per defaultParallelism task
    assert n_adaptive < wide or wide == 1


def test_spread_dial_off_restores_blanket_width(spark):
    docs = load_table(spark, SF_DIR, "documents")
    spark.conf.set(FLAG, "false")
    try:
        n = spread(docs).rdd.getNumPartitions()
    finally:
        spark.conf.unset(FLAG)
    assert n == spark.sparkContext.defaultParallelism


def test_spread_explicit_partitions_untouched(spark):
    docs = load_table(spark, SF_DIR, "documents")
    assert spread(docs, 7).rdd.getNumPartitions() == 7


def test_local_frame_one_partition_same_values(spark):
    rows = [(1, "a", 1.5), (2, None, -2.0), (None, "c", 0.0)]
    schema = "k long, s string, v double"
    lf = local_frame(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert lf.rdd.getNumPartitions() == 1
    assert sorted(map(tuple, lf.collect()), key=str) == sorted(
        map(tuple, ref.collect()), key=str
    )
    # names and types match; nullability may be TIGHTER than
    # createDataFrame's all-nullable default (benign: the oracle harness
    # compares names+values, unions reconcile nullability)
    assert lf.dtypes == ref.dtypes


def test_local_frame_empty_and_complex_cells(spark):
    assert local_frame(spark, [], "x long").count() == 0
    # non-scalar cells take the 1-slice parallelize fallback
    lf = local_frame(spark, [([1.0, 2.0],)], "e array<double>")
    assert lf.rdd.getNumPartitions() == 1
    assert lf.collect()[0]["e"] == [1.0, 2.0]


def test_load_table_rewritten_fixture_invalidates(spark, tmp_path):
    import time

    p = str(tmp_path)
    spark.range(0, 3).toDF("x").write.mode("overwrite").parquet(f"{p}/t.parquet")
    a = load_table(spark, p, "t")
    assert a.count() == 3
    time.sleep(0.01)  # ensure a distinct mtime_ns on coarse filesystems
    spark.range(0, 5).toDF("x").write.mode("overwrite").parquet(f"{p}/t.parquet")
    b = load_table(spark, p, "t")
    assert b is not a
    assert b.count() == 5


def test_load_table_memoized_per_session(spark):
    a = load_table(spark, SF_DIR, "documents")
    b = load_table(spark, SF_DIR, "documents")
    assert a is b
    c = load_table(spark, SF_DIR, "events")
    assert c is not a
    # the cached object is lazy — an action computes fresh from parquet
    assert a.count() > 0
