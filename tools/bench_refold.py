"""Slice re-fold vs rebuild pricing (r19): the HLL/KMV retraction
rungs claim delete cost ∝ surviving slices, never a raw-history
rescan. This measures both sides on a warm session:

- rebuild : estimator computed directly on the takedown-filtered raw
  events (what a store WITHOUT slice registers must do per delete)
- refold  : the registered retraction rungs serving from the staged
  day-slice stores (store build excluded — it is the build-once half)

N warm samples each, medians reported. The interesting readout is not
the fixture-scale wall clock (both are sub-second joins here) but the
INPUT SHAPE: rebuild scans the fact table (row count = |events|),
refold touches only the register store (rows = |days|·|types|·m for
HLL, k·|days|·|types| for KMV) — the ratio of those scan widths is
what grows with corpus size, and it is printed alongside.

Usage: python tools/bench_refold.py [--sf-dir /root/testdata/sf0.1] [--samples 5]
Writes BENCH_refold.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--samples", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.sketches import (
        _HLL_RETRACT_MOD,
        _KMV_K,
        _hll_estimate,
        _hll_registers,
        _staged_hll_day_store,
        _staged_kmv_day_store,
        hll_user_counts_retracted,
        kmv_user_counts_retracted,
    )
    from dataengineerchallenge_spark.session import get_spark
    from dataengineerchallenge_spark.sources.tables import load_table

    spark = get_spark(
        "bench_refold", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf_dir

    # warm the staged stores OUTSIDE the timed loops (build-once half)
    hll_root = _staged_hll_day_store(spark, sf)
    kmv_root = _staged_kmv_day_store(spark, sf)

    day_tomb = (
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400
    ).cast("long") % _HLL_RETRACT_MOD == 0

    def hll_rebuild():
        ev = load_table(spark, sf, "events").filter(~day_tomb)
        pairs = ev.select("event_type", "user_id").distinct()
        regs = _hll_registers(pairs)
        types = ev.select("event_type").distinct()
        exact = ev.groupBy("event_type").agg(
            F.count_distinct("user_id").alias("exact_users")
        )
        return _hll_estimate(spark, regs, types, exact)

    def kmv_rebuild():
        from pyspark.sql import Window

        from dataengineerchallenge_spark.functions.hashing import spark_u32

        ev = load_table(spark, sf, "events").filter(~day_tomb)
        pairs = ev.select("event_type", "user_id").distinct()
        hashed = pairs.withColumn("h", F.expr(spark_u32("user_id")))
        w = Window.partitionBy("event_type").orderBy("h", "user_id")
        kth = (
            hashed.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == _KMV_K)
            .select("event_type", F.col("h").alias("hk"))
        )
        nd = pairs.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        est = F.when(
            F.col("hk").isNotNull(),
            F.lit(float(_KMV_K - 1))
            * F.lit(4294967296.0)
            / (F.col("hk") + F.lit(1)),
        ).otherwise(F.col("n").cast("double"))
        return nd.join(kth, "event_type", "left").select(
            "event_type",
            F.col("n").cast("long").alias("exact_users"),
            F.round(est, 4).alias("kmv_users"),
            F.round(F.abs(est - F.col("n")) / F.col("n"), 4).alias(
                "rel_err"
            ),
        )

    def timed(fn, label):
        ts = []
        rows = None
        for _ in range(args.samples):
            t0 = time.time()
            rows = fn().collect()
            ts.append(time.time() - t0)
        return {
            "median_s": round(statistics.median(ts), 3),
            "min_s": round(min(ts), 3),
            "max_s": round(max(ts), 3),
            "rows": len(rows),
        }

    n_events = load_table(spark, sf, "events").count()
    hll_store_rows = spark.read.parquet(f"{hll_root}/regs").count()
    kmv_store_rows = spark.read.parquet(kmv_root).count()

    out = {
        "sf_dir": sf,
        "samples": args.samples,
        "scan_widths": {
            "raw_events_rows": n_events,
            "hll_day_register_rows": hll_store_rows,
            "kmv_day_register_rows": kmv_store_rows,
            "hll_width_ratio": round(n_events / max(hll_store_rows, 1), 1),
            "kmv_width_ratio": round(n_events / max(kmv_store_rows, 1), 1),
        },
        "hll": {
            "rebuild": timed(hll_rebuild, "hll_rebuild"),
            "refold": timed(
                lambda: hll_user_counts_retracted(spark, sf), "hll_refold"
            ),
        },
        "kmv": {
            "rebuild": timed(kmv_rebuild, "kmv_rebuild"),
            "refold": timed(
                lambda: kmv_user_counts_retracted(spark, sf), "kmv_refold"
            ),
        },
    }
    # sanity: refold and rebuild must agree (the oracle already proves
    # this; asserting here keeps the bench honest about what it times)
    a = sorted(tuple(r) for r in hll_rebuild().collect())
    b = sorted(
        tuple(r) for r in hll_user_counts_retracted(spark, sf).collect()
    )
    assert a == b, "hll refold != rebuild"
    ka = sorted(tuple(r) for r in kmv_rebuild().collect())
    kb = sorted(
        tuple(r) for r in kmv_user_counts_retracted(spark, sf).collect()
    )
    assert ka == kb, "kmv refold != rebuild"

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_refold.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
