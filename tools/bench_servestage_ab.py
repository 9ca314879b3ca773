"""A/B `spark.graft.vectors.ckptServeLuts` (r21 optimization round,
change 1): with the dial ON, the fresh-batch serve rungs materialize the
batch long form once (lazy localCheckpoint) and compute routing, coarse
dots and query norms in ONE fused aggregation pass whose output is also
materialized; OFF restores the legacy shape in which the executed plan
scanned and exploded the query batch once per lookup table (4 scans / 4
aggregation subtrees for the residual fresh serve, 3 for the trained
rungs — plans/r21/ivf_pq_residual_serve_fresh_topk_before.txt), each
under its own multi-stage broadcast-build job. Values are bit-identical
either way (same joins, same groups, same single-file input row order);
only the plan shape differs.

Same session, alternating conf per sample, untimed warm-up per query,
3 samples per setting, medians compared.

    python tools/bench_servestage_ab.py  ->  BENCH_servestage.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.graft.vectors.ckptServeLuts"

QUERIES = [
    ("ivf_pq_residual_serve_fresh_topk", "/root/testdata/sf0.1"),
    ("ivf_pq_trained_rerank_topk", "/root/testdata/sf0.1"),
    ("ivf_pq_serve_filtered_topk", "/root/testdata/sf0.1"),
    ("ivf_pq_serve_fresh_topk", "/root/testdata/sf0.1"),
    ("ivf_pq_serve_rerank_topk", "/root/testdata/sf0.1"),
    # control (prebuilt-batch serve: no fresh LUT stage, dial can't move it)
    ("ivf_pq_serve_topk", "/root/testdata/sf0.1"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-servestage-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_servestage.json")
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
        "metric": "ckpt_serve_luts_ab",
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
