"""Retraction economics: what does a takedown COST, fold vs rebuild?

The r17 retraction rungs prove delete-delta ≡ rebuild is CORRECT for
all three store mechanisms (algebraic un-fold on the edge store,
register subtraction on GK, tombstone anti-join on postings). This
bench prices the claim the docstrings make — that the fold is
delta-sized work while the rebuild re-scans history — on a synthetic
fact table large enough for the difference to matter.

Fixture: a deterministic (orderkey, partkey) fact table (orders of ~6
lines), generated in TWO part-domain regimes because the economics
hinge on how much the pair store COLLAPSES relative to the fact:

  - collapsed store (small part domain): distinct pairs ≪ fact rows —
    the 100 TB co-purchase shape, where the store is the compact
    aggregate of an enormous fact table;
  - sparse store (large part domain): distinct pairs ≈ pair instances
    — the store is BIGGER than the fact, and merging it costs more
    than re-aggregating the survivors.

A takedown deletes every order with orderkey % K == 0, for delete
fractions ~{1/32, 1/8, 1/4}. Per rung, best-of-N wall clock for:

  - rebuild : full pair-count aggregate over the surviving fact rows
              (what you pay without maintenance);
  - fold    : pair-count aggregate over ONLY the deleted orders' rows,
              negated, merged into the prebuilt store, zero-swept
              (what the retraction rung pays).

Both paths write their result store to parquet (the honest end state)
and the bench asserts fold ≡ rebuild row-for-row before timing —
correctness first, then price. Expectation: fold cost tracks the
DELTA fraction plus one store-sized merge, so it wins big at small
delete fractions and converges toward rebuild as the fraction grows.

Usage:
    python tools/bench_retract.py [--rows 4000000] [--iters 2]
        [--parts 2000,50000] [--out BENCH_retract.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dataengineerchallenge_spark.queries.graph import (  # noqa: E402
    _copurchase_pair_counts,
)

LINES_PER_ORDER = 6


def _gen(spark, path: str, rows: int, n_parts: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    (
        spark.range(rows)
        .select(
            (F.col("id") / LINES_PER_ORDER).cast("long").alias("l_orderkey"),
            F.pmod(F.xxhash64("id", F.lit(23)), F.lit(n_parts)).alias("l_partkey"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(path)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--parts", default="300,2000,50000")
    ap.add_argument("--out", default="BENCH_retract.json")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("bench_retract")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n_parts in (int(x) for x in args.parts.split(",")):
        scratch = tempfile.mkdtemp(prefix="bench_retract_")
        fact_path = f"{scratch}/fact"
        _gen(spark, fact_path, args.rows, n_parts)
        li = spark.read.parquet(fact_path)

        # prebuilt full store (the state a deployment already has)
        store_path = f"{scratch}/store"
        _copurchase_pair_counts(li).repartition("src").write.mode(
            "overwrite"
        ).parquet(store_path)
        store = spark.read.parquet(store_path)
        n_store = store.count()
        # store-collapse ratio is the economic variable; label by domain
        reg = f"parts{n_parts}"
        try:
            for k in (32, 8, 4):
                keep = li.filter(F.col("l_orderkey") % k != 0)
                dele = li.filter(F.col("l_orderkey") % k == 0)

                def rebuild(out):
                    _copurchase_pair_counts(keep).repartition("src").write.mode(
                        "overwrite"
                    ).parquet(out)

                def fold(out):
                    neg = _copurchase_pair_counts(dele).select(
                        "src",
                        "dst",
                        (-F.col("w")).alias("w"),
                        (-F.col("wr")).alias("wr"),
                    )
                    (
                        store.unionByName(neg)
                        .groupBy("src", "dst")
                        .agg(
                            F.sum("w").alias("w"),
                            F.sum("wr").cast("long").alias("wr"),
                        )
                        .filter(F.col("wr") > 0)
                        .repartition("src")
                        .write.mode("overwrite")
                        .parquet(out)
                    )

                # correctness first: fold == rebuild row-for-row
                rebuild(f"{scratch}/rb_chk")
                fold(f"{scratch}/fd_chk")
                rb = spark.read.parquet(f"{scratch}/rb_chk")
                fd = spark.read.parquet(f"{scratch}/fd_chk")
                # w is an integer-valued double (distinct-order support),
                # so sums are exact and row-for-row equality is
                # well-defined — include it, not just (src, dst, wr).
                mismatch = (
                    rb.select("src", "dst", "w", "wr")
                    .exceptAll(fd.select("src", "dst", "w", "wr"))
                    .count()
                    + fd.select("src", "dst", "w", "wr")
                    .exceptAll(rb.select("src", "dst", "w", "wr"))
                    .count()
                )
                assert mismatch == 0, f"fold != rebuild at K={k}: {mismatch} rows"

                def best(fn, out):
                    b = float("inf")
                    for _ in range(args.iters):
                        t0 = time.time()
                        fn(out)
                        b = min(b, time.time() - t0)
                    return round(b, 2)

                rb_s = best(rebuild, f"{scratch}/rb")
                fd_s = best(fold, f"{scratch}/fd")
                results[f"{reg}_delete_1_in_{k}"] = {
                    "part_domain": n_parts,
                    "store_collapse_pct": round(n_store * 100.0 / args.rows, 1),
                    "delete_fraction": round(1.0 / k, 4),
                    "deleted_rows": dele.count(),
                    "store_rows": n_store,
                    "rebuild_s": rb_s,
                    "fold_s": fd_s,
                    "fold_speedup": round(rb_s / fd_s, 2) if fd_s > 0 else None,
                }
                print(reg, k, results[f"{reg}_delete_1_in_{k}"], flush=True)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    out = {
        "metric": "retraction_fold_vs_rebuild",
        "fact_rows": args.rows,
        "lines_per_order": LINES_PER_ORDER,
        "iters_bench": args.iters,
        "results": results,
        "note": (
            "fold = delta-aggregate + store merge + zero sweep; rebuild = "
            "full pair-count aggregate over survivors. Fold equality with "
            "rebuild is asserted before timing at every delete fraction. "
            "The two part-domain regimes price the crossover: the fold "
            "only pays when the store collapses below the fact scan "
            "(the 100 TB shape); with a sparse pair domain the store "
            "outweighs the fact and rebuild wins — recorded as the "
            "honest negative result."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
