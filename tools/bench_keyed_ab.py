"""A/B `spark.graft.graph.keyedLoopFrames` (r20 optimization round,
session 5): with the dial ON, the persisted loop-invariant edge caches
of the aggregation-keyed graph loops are HASH-PARTITIONED on the loop's
per-round aggregation key (repartition(k, key), k sized from the
measured row count exactly like HITS' Change-7 caches) instead of
coalesce-compacted — the per-round groupBy/window/distinct then needs
NO exchange at all (HashPartitioning(key, k) satisfies the clustered
distribution for any k), so every round drops its map-side
partial-agg + shuffle stage pair. OFF restores the Change-6 coalesce
layout exactly (same values, same row counts, different partitioning).

Touched operators: pagerank (per-round groupBy(dst) contribution
aggregate — 1 edge-scale exchange per round removed; k sized from
optimized-plan stats, no extra action), label_propagation
(groupBy(dst,label) + row_number window over node — 2 per round) and
coreness (neighbor-value window over node — 1 per round), both with the
|V|-row iterate side broadcast-hinted UNDER THE KEYED DIAL so the keyed
cache is the streamed side (without the hint AQE broadcasts whichever
side is smaller — at fixture scale often the edge cache itself, which
throws the keyed partitioning away). hop_distances was PROBED and
REVERTED (5-sample medians 0.956 vs 0.901 s staged: the wave join's
build side is AQE's per-wave pick, so the keyed layout never fires at
fixture scale, and hinting the growing frontier broadcast measured
+7-8%); its rungs stay in the list as no-op controls.

Same session, alternating conf per sample (the dial is a runtime SQL
conf and every query builds its caches inside its own call), untimed
warm-up per query, 3 samples per setting, medians compared.

    python tools/bench_keyed_ab.py  ->  BENCH_keyed.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.graft.graph.keyedLoopFrames"

QUERIES = [
    # pagerank: staged (cheap parquet re-read under the extra base cache)
    # and inline (pays the self-join build into the base cache) rungs,
    # plus the weighted path
    ("part_copurchase_pagerank_staged", "/root/testdata/sf0.1"),
    ("weighted_copurchase_pagerank_staged", "/root/testdata/sf0.1"),
    ("part_copurchase_pagerank", "/root/testdata/sf0.1"),
    # label_propagation / coreness (keyed cache + iterate-side hint)
    ("copurchase_communities_lpa", "/root/testdata/sf0.1"),
    ("copurchase_coreness", "/root/testdata/sf0.1"),
    # hop_distances: probed, reverted — no-op under the dial (controls)
    ("part_copurchase_hops", "/root/testdata/sf0.1"),
    ("part_copurchase_hops_staged", "/root/testdata/sf0.1"),
    # controls (loops NOT touched by this dial: HITS has its own keyed
    # caches since Change 2/7; star-CC has no keyed aggregation frame)
    ("purchase_hits_staged", "/root/testdata/sf0.1"),
    ("copurchase_components_staged", "/root/testdata/sf0.1"),
    # r21 change 2: the spectral loops' edge cache keyed on the matvec
    # aggregation key (sf0.01 — the registry-only convention; these are
    # the two heaviest registered plans, priced in BENCH_spectral.json)
    ("copurchase_spectral_bipartition", "/root/testdata/sf0.01"),
    ("copurchase_spectral_profile", "/root/testdata/sf0.01"),
    ("copurchase_spectral_quadrants", "/root/testdata/sf0.01"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-keyed-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    # optional query-name filter: merge results into the existing JSON
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_keyed.json")
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
        "metric": "keyed_loop_frames_ab",
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
