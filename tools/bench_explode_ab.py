"""A/B `spark.graft.graph.explodeMembers` (r20 optimization round,
session 4): with the dial ON, the triangle family emits a triangle's
three corners (triangle_counts) / three sides (truss) via one
explode(array(...)) pass over the enumeration join; OFF restores the
legacy 3-way UNION whose executed plan re-ran the wedge + closing joins
once per branch (only the exchanges were reused — 38 join nodes in
plans/r20/part_copurchase_triangles "before"; guide §2.4 duplicated
subtrees). Both forms produce the identical row multiset.

Same session, alternating conf per sample, untimed warm-up per query,
3 samples per setting, medians compared.

    python tools/bench_explode_ab.py  ->  BENCH_explode.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.graft.graph.explodeMembers"

QUERIES = [
    ("part_copurchase_triangles", "/root/testdata/sf0.1"),
    ("part_copurchase_triangles_staged", "/root/testdata/sf0.1"),
    ("copurchase_clustering_coefficient", "/root/testdata/sf0.1"),
    ("copurchase_truss", "/root/testdata/sf0.1"),
    # control (no triangle enumeration anywhere in its plan)
    ("copurchase_coreness", "/root/testdata/sf0.1"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-explode-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_explode.json")
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
        "metric": "explode_members_ab",
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
