"""A/B the shared foreachBatch drain width (r21 change 3): the ~21
foreachBatch twins now route start/await/stop through
`streaming.runner.drain_foreach_batch`, which narrows the session
shuffle width to `spark.graft.stream.drainStatePartitions` (default 8)
around the drain — the r20 Change-14 dial that previously covered only
the `run_to_batch` memory-sink path. OFF (dial 0) keeps the full
`spark.sql.shuffle.partitions` width through each micro-batch's
foreachBatch body. Values identical either way (exact aggregates,
epoch-keyed overwrites); only task counts per micro-batch differ.

Same session, alternating conf per sample, untimed warm-up per query,
3 samples per setting, medians compared.

    python tools/bench_foreachdrain_ab.py  ->  BENCH_foreachdrain.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.graft.stream.drainStatePartitions"

QUERIES = [
    ("stream_cm_heavy_hitters", "/root/testdata/sf0.1"),
    ("stream_hll_user_counts", "/root/testdata/sf0.1"),
    ("stream_kmv_overlap", "/root/testdata/sf0.1"),
    ("stream_gk_value_quantiles", "/root/testdata/sf0.1"),
    ("stream_hourly_anomalies_mad", "/root/testdata/sf0.1"),
    ("stream_sliding_distinct_users", "/root/testdata/sf0.1"),
    ("stream_classifier_auc", "/root/testdata/sf0.1"),
    ("stream_session_length_ridge", "/root/testdata/sf0.1"),
    ("stream_copurchase_edge_store", "/root/testdata/sf0.1"),
    ("stream_near_dup_serve", "/root/testdata/sf0.1"),
    # control: a run_to_batch twin (already dialed in r20 — the helper
    # refactor must not move it)
    ("stream_per_minute_load", "/root/testdata/sf0.1"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-foreachdrain-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_foreachdrain.json")
    out: dict[str, dict] = {}
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f).get("queries", {})
    for name, sf in QUERIES:
        if only and name not in only:
            continue
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()  # warm
        samples: dict[str, list[float]] = {"on": [], "off": []}
        for _ in range(N):
            for setting in ("on", "off"):
                spark.conf.set(FLAG, "8" if setting == "on" else "0")
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                samples[setting].append(round(time.time() - t0, 3))
        spark.conf.unset(FLAG)
        out[name] = {
            "sf_dir": sf,
            "dial8_s": samples["on"],
            "dial0_s": samples["off"],
            "median_dial8_s": round(statistics.median(samples["on"]), 3),
            "median_dial0_s": round(statistics.median(samples["off"]), 3),
        }
        print(name, out[name]["median_dial8_s"], "vs",
              out[name]["median_dial0_s"], flush=True)
    doc = {
        "metric": "foreach_drain_width_ab",
        "design": (
            "one session, per-sample alternation dial=8 vs dial=0 "
            f"(disabled), untimed warm-up first, {N} samples each, "
            "median compared; noop sink"
        ),
        "queries": out,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
