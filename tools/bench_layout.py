"""Physical-layout pruning bench: MEASURE what Z-order buys (and what a
single-column sort leaves on the table) for a two-dimensional selective
predicate — the footers-are-tight claim of tests/test_layout.py turned
into scan-rows and wall-clock numbers at multi-million-row sizes.

Three layouts of the SAME deterministic fixture (64 files each):
  - linear_t: range-partitioned + sorted by time — perfect min/max
    pruning on t, none on user_id (the default log-shipping layout);
  - linear_u: same by user_id — the mirror image;
  - zorder:   Morton-interleaved (user_id, t) via sources/layout.py —
    good (not perfect) pruning on BOTH dimensions.

The probe is the dashboard query every ops team runs — "this user
cohort, this time window" (~5% of each dimension, ~0.25% of rows):

    SELECT count(*), sum(value) WHERE user BETWEEN .. AND t BETWEEN ..

For each layout it reports the rows the parquet reader actually
surfaced (scan-node SQL metric ``number of output rows`` after
row-group skipping on the pushed filters — read amplification, the
number that matters at 100 TB where the reader is I/O-bound) and
best-of-N wall-clock; result equality across layouts is asserted (a
layout must never change an answer).

Pruning granularity here is the row group, and with 64 files each file
is one row group — the file-skipping story a real cluster sees from
footer stats. (Shrinking parquet.block.size to manufacture sub-file row
groups was tried and measured WORSE on every layout — tiny row groups
pay per-group overhead faster than their tighter stats prune.) Usage:

    python tools/bench_layout.py [--rows 4000000,16000000] [--iters 2]
        [--out BENCH_layout.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_TS = 1_700_000_000
SPAN_S = 30 * 86_400
N_USERS = 50_000
N_FILES = 64
# ~5% of each dimension -> ~0.25% of rows for the 2-D predicate
USER_LO, USER_HI = 10_000, 12_499
T_LO = BASE_TS + 5 * 86_400
T_HI = T_LO + int(0.05 * SPAN_S)


def _gen(spark, path: str, rows: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    df = spark.range(rows).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_USERS)).alias("user_id"),
        (F.lit(BASE_TS) + F.pmod(F.xxhash64("id", F.lit(13)), F.lit(SPAN_S))).alias(
            "t"
        ),
        (F.pmod(F.xxhash64("id", F.lit(23)), F.lit(1_000_000)) / 100.0).alias(
            "value"
        ),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)


def _scan_rows(df) -> int:
    """Rows surfaced by every parquet scan of the FINAL adaptive plan
    (after row-group skipping on pushed filters)."""
    df.collect()
    total = 0

    def walk(jplan):
        nonlocal total
        name = jplan.nodeName()
        if name.startswith("AdaptiveSparkPlan"):
            walk(jplan.executedPlan())
            return
        if "QueryStage" in name:
            walk(jplan.plan())
            return
        if name.startswith("Scan parquet"):
            m = jplan.metrics()
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    total += kv._2().value()
        ch = jplan.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return total


def _probe(spark, path: str):
    return (
        spark.read.parquet(path)
        .filter(
            F.col("user_id").between(USER_LO, USER_HI)
            & F.col("t").between(T_LO, T_HI - 1)
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="4000000,16000000")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--out", default="BENCH_layout.json")
    args = ap.parse_args()
    sizes = [int(s) for s in str(args.rows).split(",") if s]

    from dataengineerchallenge_spark.session import get_spark
    from dataengineerchallenge_spark.sources.layout import zorder_by

    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")
    spark = get_spark("bench-layout")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
    )
    out: dict = {
        "metric": "layout_bench",
        "sizes": sizes,
        "n_files": N_FILES,
        "predicate": {
            "user": [USER_LO, USER_HI],
            "t": [T_LO, T_HI],
            "dim_selectivity": 0.05,
        },
        "iters": args.iters,
        "results": {},
    }

    for rows in sizes:
        base = os.path.join(root, f"layout_base_{rows}")
        _gen(spark, base, rows)
        src = spark.read.parquet(base)
        layouts = {}
        t0 = time.time()
        layouts["linear_t"] = os.path.join(root, f"layout_lt_{rows}")
        if not os.path.exists(os.path.join(layouts["linear_t"], "_SUCCESS")):
            src.repartitionByRange(N_FILES, "t").sortWithinPartitions("t").write.mode(
                "overwrite"
            ).parquet(layouts["linear_t"])
        layouts["linear_u"] = os.path.join(root, f"layout_lu_{rows}")
        if not os.path.exists(os.path.join(layouts["linear_u"], "_SUCCESS")):
            src.repartitionByRange(N_FILES, "user_id").sortWithinPartitions(
                "user_id"
            ).write.mode("overwrite").parquet(layouts["linear_u"])
        layouts["zorder"] = os.path.join(root, f"layout_z_{rows}")
        if not os.path.exists(os.path.join(layouts["zorder"], "_SUCCESS")):
            zorder_by(src, "user_id", "t", N_FILES).write.mode("overwrite").parquet(
                layouts["zorder"]
            )
        write_s = round(time.time() - t0, 1)

        answers = {}
        res: dict = {"rows": rows, "layout_write_s_total": write_s}
        for name, path in layouts.items():
            q = _probe(spark, path)
            answers[name] = q.collect()[0]
            scanned = _scan_rows(_probe(spark, path))
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.time()
                _probe(spark, path).collect()
                best = min(best, time.time() - t0)
            res[f"{name}_scan_rows"] = int(scanned)
            res[f"{name}_wall_s"] = round(best, 3)
        assert len({tuple(a) for a in answers.values()}) == 1, (
            f"layouts disagree: {answers}"
        )
        res["result_rows_matched"] = int(answers["zorder"]["n"])
        res["zorder_scan_reduction_vs_best_linear"] = round(
            min(res["linear_t_scan_rows"], res["linear_u_scan_rows"])
            / max(res["zorder_scan_rows"], 1),
            2,
        )
        out["results"][f"probe_{rows}"] = res
        print(json.dumps({f"probe_{rows}": res}))

    # --- small-file tax & compaction (sources/layout.py:compact_files) ---
    # the OTHER layout pathology: a streaming sink / over-parallel writer
    # leaves thousands of tiny files; measure the full-scan tax and what
    # one round-robin compaction rewrite buys back
    from dataengineerchallenge_spark.sources.layout import compact_files

    rows = sizes[-1]
    base = os.path.join(root, f"layout_base_{rows}")
    src = spark.read.parquet(base)
    frag = os.path.join(root, f"layout_frag_{rows}")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        src.repartition(2000).write.mode("overwrite").parquet(frag)
    comp = os.path.join(root, f"layout_comp_{rows}")
    if not os.path.exists(os.path.join(comp, "_SUCCESS")):
        compact_files(spark.read.parquet(frag), 64 * 1024 * 1024).write.mode(
            "overwrite"
        ).parquet(comp)

    def scan_agg(path):
        return (
            spark.read.parquet(path)
            .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
            .collect()[0]
        )

    a_frag = scan_agg(frag)
    a_comp = scan_agg(comp)
    assert tuple(a_frag) == tuple(a_comp), "compaction changed the answer"
    import glob as _glob

    tf = float("inf")
    tc = float("inf")
    for _ in range(args.iters):
        t0 = time.time()
        scan_agg(frag)
        tf = min(tf, time.time() - t0)
        t0 = time.time()
        scan_agg(comp)
        tc = min(tc, time.time() - t0)
    out["compaction"] = {
        "rows": rows,
        "n_files_fragmented": len(_glob.glob(os.path.join(frag, "part-*"))),
        "n_files_compacted": len(_glob.glob(os.path.join(comp, "part-*"))),
        "full_scan_fragmented_s": round(tf, 3),
        "full_scan_compacted_s": round(tc, 3),
        "speedup": round(tf / tc, 2),
    }
    print(json.dumps({"compaction": out["compaction"]}))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
