"""Bisect the udf_user_trend drift (VERDICT r14 What's-wrong #1: the
lone `persistent` BENCH_variance mover, 1.14 -> 1.19 -> 1.36 s across
three anchor rounds) → BENCH_udf_bisect.json.

The query is a pure applyInPandas grouped-map (one OLS fit per user),
so the only knobs that can move it without a plan change are the
Arrow exchange batch size and Python-worker lifecycle — exactly the
two VERDICT told this round to sweep:

- ``spark.sql.execution.arrow.maxRecordsPerBatch`` (runtime-settable):
  how many rows ride one Arrow record batch JVM->Python.
- ``spark.python.worker.reuse`` (context-scoped — each setting gets a
  FRESH SparkContext): whether each task forks a new Python worker or
  leases one from the daemon pool.

Method: for each config, a fresh session runs one untimed warm pass
then N_SAMPLES timed noop-write passes of the registered query at
$SPARK_GRAFT_SF_DIR; medians/min/max land in the artifact. A config
whose median reproduces the r14 elevation (>= ~1.3 s) while another
returns to the r12 level (~1.14 s) localizes the mover; if every
config lands in one band, the drift was machine/session state, not a
knob — that verdict feeds the BENCH_variance row either way.

Usage: python tools/bisect_udf_trend.py [--out BENCH_udf_bisect.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

N_SAMPLES = 5

# (label, worker_reuse, max_records_per_batch or None=default 10000)
CONFIGS = [
    ("reuse_default_batch", "true", None),
    ("reuse_batch_1k", "true", 1000),
    ("reuse_batch_100k", "true", 100000),
    ("noreuse_default_batch", "false", None),
]


def _time_config(sf_dir: str, reuse: str, batch: int | None) -> dict:
    from pyspark.sql import SparkSession

    from dataengineerchallenge_spark.session import default_parallelism
    from dataengineerchallenge_spark.queries.udf import udf_user_trend

    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName("bisect-udf-trend")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.python.worker.reuse", reuse)
    )
    if batch is not None:
        builder = builder.config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch)
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        samples = []
        for i in range(N_SAMPLES + 1):
            t0 = time.time()
            udf_user_trend(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            if i > 0:  # pass 0 is the untimed warm-up
                samples.append(time.time() - t0)
        return {
            "median_s": round(statistics.median(samples), 3),
            "min_s": round(min(samples), 3),
            "max_s": round(max(samples), 3),
            "samples_s": [round(s, 3) for s in samples],
        }
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_udf_bisect.json"))
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out = {
        "metric": "udf_user_trend_bisect",
        "sf_dir": sf_dir,
        "samples": N_SAMPLES,
        "anchors_s": {"r12": 1.138, "r13": 1.193, "r14": 1.361},
        "configs": {},
    }
    for label, reuse, batch in CONFIGS:
        out["configs"][label] = dict(
            _time_config(sf_dir, reuse, batch),
            worker_reuse=reuse,
            max_records_per_batch=batch or 10000,
        )
        print(label, out["configs"][label], flush=True)
    meds = {k: v["median_s"] for k, v in out["configs"].items()}
    spread = max(meds.values()) - min(meds.values())
    base = out["configs"]["reuse_default_batch"]
    # verdict heuristic: if every config's median sits inside the widest
    # single-config sample window, the knobs don't move the query and
    # the round-over-round drift is session noise, not configuration.
    widest = max(
        v["max_s"] - v["min_s"] for v in out["configs"].values()
    )
    out["config_median_spread_s"] = round(spread, 3)
    out["widest_sample_window_s"] = round(widest, 3)
    out["verdict"] = (
        "knob_insensitive_noise" if spread <= widest else "config_sensitive"
    )
    out["base_median_s"] = base["median_s"]
    # drift classification vs the three BENCH_variance anchors: if the
    # current default config cannot reproduce the r14 elevation on a
    # quiet box, the monotone anchor climb was bench-session noise.
    out["r14_elevation_reproduced"] = (
        base["median_s"] >= 0.9 * out["anchors_s"]["r14"]
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: meds[k] for k in meds} | {"verdict": out["verdict"]}))


if __name__ == "__main__":
    main()
