"""Same-day re-measure of the 9 driver-flagged r20 regressions
(VERDICT r20 next-round #4), plus the alternating A/B the r20 Change-8
distinct-pair checkpoint was missing (what's-wrong #2), now that the
change carries a dial (`spark.graft.graph.ckptDistinctPairs`).

Part 1 — five warm samples per flagged query on the current tree,
reported against the r19/r20 driver medians (PERF_r20.json) so each
regression is either inside the machine band or root-caused.
Part 2 — dial A/B for the three distinct-pair-checkpoint consumers
(3 samples per setting, alternating, medians).

    python tools/bench_regress_triage.py  ->  BENCH_regress_triage.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

SF = "/root/testdata/sf0.1"

# (name, r19 driver sec, r20 driver sec) from PERF_r20.json
FLAGGED = [
    ("sessionize", 0.693, 0.868),
    ("cm_heavy_hitters", 0.533, 0.635),
    ("exact_dedup_bloom_prefilter", 0.939, 1.113),
    ("payload_near_dups", 1.447, 1.843),
    ("semantic_dedup_corpus", 2.634, 3.138),
    ("part_pair_affinity", 2.35, 2.806),
    ("copurchase_components_staged", 2.919, 3.741),
    ("ivf_pq_residual_serve_fresh_topk", 1.116, 1.911),
    ("ivf_pq_trained_rerank_topk", 1.386, 1.732),
]

AB_FLAG = "spark.graft.graph.ckptDistinctPairs"
AB_QUERIES = [
    "part_pair_affinity",
    "part_association_rules",
    "weighted_copurchase_pagerank",
]
N_SAMPLES = 5
N_AB = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-regress-triage")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())

    flagged_out: dict[str, dict] = {}
    for name, r19, r20 in FLAGGED:
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()  # warm
        t: list[float] = []
        for _ in range(N_SAMPLES):
            t0 = time.time()
            qs[name](spark, SF).write.format("noop").mode("overwrite").save()
            t.append(round(time.time() - t0, 3))
        med = round(statistics.median(t), 3)
        flagged_out[name] = {
            "r19_driver_s": r19,
            "r20_driver_s": r20,
            "now_samples_s": t,
            "now_median_s": med,
            "now_min_s": min(t),
            "now_max_s": max(t),
            "at_or_under_r19": med <= r19,
            "under_r20_driver": med <= r20,
        }
        print(f"{name}: now {med} (r19 {r19}, r20 {r20})", flush=True)

    ab_out: dict[str, dict] = {}
    for name in AB_QUERIES:
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()  # warm
        samples: dict[str, list[float]] = {"on": [], "off": []}
        for _ in range(N_AB):
            for setting in ("on", "off"):
                spark.conf.set(AB_FLAG, "true" if setting == "on" else "false")
                t0 = time.time()
                qs[name](spark, SF).write.format("noop").mode("overwrite").save()
                samples[setting].append(round(time.time() - t0, 3))
        spark.conf.unset(AB_FLAG)
        ab_out[name] = {
            "flag_on_s": samples["on"],
            "flag_off_s": samples["off"],
            "median_on_s": round(statistics.median(samples["on"]), 3),
            "median_off_s": round(statistics.median(samples["off"]), 3),
        }
        print(f"{name} ckpt A/B: {ab_out[name]['median_on_s']} vs "
              f"{ab_out[name]['median_off_s']}", flush=True)

    doc = {
        "metric": "r20_regression_triage",
        "design": (
            f"current tree, one session; flagged queries {N_SAMPLES} warm "
            "samples vs the r19/r20 driver medians; distinct-pair "
            f"checkpoint dial alternating A/B {N_AB} samples/setting"
        ),
        "sf_dir": SF,
        "flagged": flagged_out,
        "ckpt_distinct_pairs_ab": ab_out,
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_regress_triage.json")
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
