"""Round-17 pins (VERDICT r16 next-round #2):

retraction on the staged edge store — folding the takedown orders'
NEGATIVE (−w, −wr) delta into the full store plus a zero-support
cleanup must leave a store EQUAL row-for-row (sym and symdeg) to a
from-scratch rebuild on the corpus minus those orders, including the
complete disappearance of edges whose whole support was deleted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.graph import (
    _copurchase_pair_counts,
    _staged_copurchase_edges_retracted,
)
from dataengineerchallenge_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_retracted_store_equals_rebuild_on_remaining_corpus(spark):
    root = _staged_copurchase_edges_retracted(spark, SF_DIR)
    got_sym = spark.read.parquet(f"{root}/sym").select("src", "dst", "w", "wr")
    got_deg = spark.read.parquet(f"{root}/symdeg").select("src", "outdeg", "sw")

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    keep = li.filter(F.col("l_orderkey") % 10 != 0)
    want_sym = _copurchase_pair_counts(keep).select(
        "src", "dst", "w", F.col("wr").cast("long").alias("wr")
    )
    want_deg = want_sym.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg"), F.sum("w").alias("sw")
    )
    assert _rows(got_sym) == _rows(want_sym)
    assert _rows(got_deg) == _rows(want_deg)


def test_retraction_actually_removes_support(spark):
    """The takedown set must be non-trivial on the fixture: some edges
    lose support entirely (rows swept by the wr == 0 cleanup) and some
    merely shrink — otherwise the delete≡rebuild pin proves nothing."""
    from dataengineerchallenge_spark.queries.graph import _staged_copurchase_edges

    full = spark.read.parquet(
        f"{_staged_copurchase_edges(spark, SF_DIR)}/sym"
    ).select("src", "dst", F.col("wr").cast("long").alias("wr"))
    kept = spark.read.parquet(
        f"{_staged_copurchase_edges_retracted(spark, SF_DIR)}/sym"
    ).select("src", "dst", F.col("wr").cast("long").alias("wr_kept"))
    j = full.join(kept, ["src", "dst"], "left")
    swept = j.filter(F.col("wr_kept").isNull()).count()
    shrunk = j.filter(F.col("wr_kept") < F.col("wr")).count()
    assert swept > 0, "no edge lost its whole support — weak fixture"
    assert shrunk > 0, "no edge shrank — weak fixture"
