"""A/B `spark.graft.graph.narrowLoopFrames` (r20 optimization round):
with the dial ON, the persisted loop-invariant edge caches of the
per-round graph loops are coalesced to a width derived from their
MEASURED row count (operators/graph.py:_narrowed) and the 1-row BFS/SSSP
seeds collapse to one partition (_seed1); OFF restores the uncompacted
32-64-near-empty-partition layout whose per-round cost is a shuffle-file
create/commit serialized on the IndexShuffleBlockResolver lock plus an
mmap/unmap pair per task (jstack evidence, OPTIMIZATION_r20.md Change 6).

Same session, alternating conf per sample (the dial is a runtime SQL
conf and every query builds its caches inside its own call), untimed
warm-up per query, 3 samples per setting, medians compared.

    python tools/bench_narrow_ab.py  ->  BENCH_narrow.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.graft.graph.narrowLoopFrames"

QUERIES = [
    # queries whose operator gained _narrowed/_seed1
    ("part_copurchase_hops", "/root/testdata/sf0.1"),
    ("part_copurchase_hops_staged", "/root/testdata/sf0.1"),
    ("copurchase_weighted_distances", "/root/testdata/sf0.1"),
    ("copurchase_communities_lpa", "/root/testdata/sf0.1"),
    ("copurchase_coreness", "/root/testdata/sf0.1"),
    ("copurchase_deterministic_walks", "/root/testdata/sf0.1"),
    # r20 second batch: adaptive HITS cache width + derived side counts
    ("purchase_hits", "/root/testdata/sf0.1"),
    ("purchase_hits_staged", "/root/testdata/sf0.1"),
    # control (no persisted loop invariant touched by the dial)
    ("copurchase_components_staged", "/root/testdata/sf0.1"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-narrow-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    # optional query-name filter: merge results into the existing JSON
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_narrow.json")
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
                spark.conf.set(FLAG, "true" if setting == "on" else "false")
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode("overwrite").save()
                samples[setting].append(round(time.time() - t0, 3))
        spark.conf.unset(FLAG)
        out[name] = {
            "sf_dir": sf,
            "flag_on_s": samples["on"],
            "flag_off_s": samples["off"],
            "median_on_s": round(statistics.median(samples["on"]), 3),
            "median_off_s": round(statistics.median(samples["off"]), 3),
        }
        print(name, out[name]["median_on_s"], "vs", out[name]["median_off_s"], flush=True)
    doc = {
        "metric": "narrow_loop_frames_ab",
        "design": (
            "one session, per-sample alternation on/off, untimed warm-up "
            f"first, {N} samples each, median compared; noop sink"
        ),
        "queries": out,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
