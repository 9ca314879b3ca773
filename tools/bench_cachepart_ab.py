"""A/B `spark.sql.optimizer.canChangeCachedPlanOutputPartitioning` (r20
optimization round): with the flag ON, AQE may coalesce the shuffle
feeding a persisted frame, so tiny loop-invariant caches (graph edge
frames, distinct-collapsed fact slices) stop carrying
spark.sql.shuffle.partitions near-empty partitions through every loop
round — the measured cost of each such partition is a shuffle-file
create/commit serialized on the IndexShuffleBlockResolver lock plus an
mmap/unmap pair (jstack evidence, OPTIMIZATION_r20.md).

Same session, alternating conf per sample (the flag is a runtime SQL
conf and every query builds its caches inside its own call), untimed
warm-up per query, 3 samples per setting, medians compared. Queries:
every headline query that persists a loop invariant or consumes one
frame repeatedly, plus two no-persist controls.

    python tools/bench_cachepart_ab.py  ->  BENCH_cachepart.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"

QUERIES = [
    ("part_copurchase_hops", "/root/testdata/sf0.1"),
    ("copurchase_weighted_distances", "/root/testdata/sf0.1"),
    ("part_copurchase_triangles", "/root/testdata/sf0.1"),
    ("copurchase_components_staged", "/root/testdata/sf0.1"),
    ("copurchase_coreness", "/root/testdata/sf0.1"),
    ("copurchase_communities_lpa", "/root/testdata/sf0.1"),
    ("part_copurchase_pagerank_staged", "/root/testdata/sf0.1"),
    ("purchase_hits_staged", "/root/testdata/sf0.1"),
    ("semantic_dedup_corpus", "/root/testdata/sf0.1"),
    # controls (no persisted loop invariant): construction/agg profiles
    ("part_pair_affinity", "/root/testdata/sf0.1"),
    ("doc_lang_id", "/root/testdata/sf0.1"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-cachepart-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    out: dict[str, dict] = {}
    for name, sf in QUERIES:
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
        "metric": "cached_plan_output_partitioning_ab",
        "design": (
            "one session, per-sample alternation on/off, untimed warm-up "
            f"first, {N} samples each, median compared; noop sink"
        ),
        "queries": out,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_cachepart.json"), "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
