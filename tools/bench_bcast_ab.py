"""A/B the `spark.graft.graph.broadcastIterate` dial (r20 optimization
round): same session, alternating conf per sample, untimed warm-up per
query first (staging builds + codegen), 3 timed samples per setting,
median reported. Queries: the loop families that KEPT the `_bc` hint.

    python tools/bench_bcast_ab.py  ->  BENCH_bcast.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

QUERIES = [
    ("part_copurchase_pagerank_staged", "/root/testdata/sf0.1"),
    ("purchase_hits_staged", "/root/testdata/sf0.1"),
    ("copurchase_pivot_betweenness", "/root/testdata/sf0.01"),
    ("copurchase_spectral_bipartition", "/root/testdata/sf0.01"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-bcast-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    out: dict[str, dict] = {}
    for name, sf in QUERIES:
        qs[name](spark, sf).write.format("noop").mode("overwrite").save()  # warm
        samples: dict[str, list[float]] = {"on": [], "off": []}
        for _ in range(N):
            for setting in ("on", "off"):
                spark.conf.set(
                    "spark.graft.graph.broadcastIterate",
                    "true" if setting == "on" else "false",
                )
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                samples[setting].append(round(time.time() - t0, 3))
        spark.conf.set("spark.graft.graph.broadcastIterate", "true")
        out[name] = {
            "sf_dir": sf,
            "hint_on_s": samples["on"],
            "hint_off_s": samples["off"],
            "median_on_s": round(statistics.median(samples["on"]), 3),
            "median_off_s": round(statistics.median(samples["off"]), 3),
        }
        print(name, out[name]["median_on_s"], "vs", out[name]["median_off_s"])
    doc = {
        "metric": "broadcast_iterate_hint_ab",
        "design": (
            "one session, per-sample alternation on/off, untimed warm-up "
            f"first, {N} samples each, median compared; noop sink"
        ),
        "queries": out,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_bcast.json"), "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
