"""Round-16 pins (VERDICT r15 next-round #3):

stream_copurchase_edge_store — the online maintenance twin of the
staged purchase-graph edge store — must

- fold micro-batch deltas into a store EQUAL row-for-row (src, dst,
  w, wr) to the full-corpus rebuild (online ≡ batch, the linear-
  register drain contract every streaming sketch twin meets);
- actually stream: the drain must process >= 2 micro-batches (the
  delivery payload is written as 3 order-hashed files, one per
  trigger).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.graph import (
    _copurchase_pair_counts,
    stream_copurchase_edge_merge,
)
from dataengineerchallenge_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_edge_store_equals_rebuild_and_multibatch(spark):
    epochs: list = []
    merged = stream_copurchase_edge_merge(spark, SF_DIR, epochs=epochs)
    assert len(epochs) >= 2, f"expected >=2 micro-batches, got {epochs}"

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    full = _copurchase_pair_counts(li)
    got = sorted(
        (r["src"], r["dst"], r["w"], r["wr"]) for r in merged.collect()
    )
    want = sorted(
        (r["src"], r["dst"], r["w"], r["wr"]) for r in full.collect()
    )
    assert got == want


def test_pair_counts_additive_over_order_split(spark):
    """The additivity precondition: summing per-split supports over any
    order-partitioned split reproduces the full aggregate exactly."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    parts = [
        _copurchase_pair_counts(li.filter(F.col("l_orderkey") % 3 == k))
        for k in range(3)
    ]
    summed = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"), F.sum("wr").cast("long").alias("wr"))
    )
    full = _copurchase_pair_counts(li)
    got = sorted(tuple(r) for r in summed.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want
