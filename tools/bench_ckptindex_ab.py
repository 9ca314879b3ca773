"""A/B `spark.graft.dedup.ckptInvertedIndex` (r20 optimization round,
session 5): with the dial ON, the exploded shingle/gram inverted-index
frames of shingle_jaccard_pairs{,_prefix} and dup_span_doc_frame are
localCheckpoint-ed once, so every consumer (self-join sides, doc-size
broadcast builds, doc-frequency aggregate, candidate attach/re-verify)
reads the materialized narrow rows; OFF restores the
recompute-per-consumer plan in which the executed plan re-ran the
split+shingle text pass 2-3x per query (profiled at sf0.1:
near_dup_jaccard carried two ~2.5 s repeat-explode stages,
dup_span_trim_docs two ~3 s ones). Values identical either way — only
the materialization point moves.

Same session, alternating conf per sample, untimed warm-up per query,
3 samples per setting, medians compared.

    python tools/bench_ckptindex_ab.py  ->  BENCH_ckptindex.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

FLAG = "spark.graft.dedup.ckptInvertedIndex"

QUERIES = [
    ("near_dup_jaccard", "/root/testdata/sf0.1"),
    # prefix variant: PROBED and REVERTED (checkpoint measured +20% —
    # a checkpoint root erases the plan stats its verification joins
    # broadcast-plan from); stays in the list as a no-op control
    ("near_dup_jaccard_prefix", "/root/testdata/sf0.1"),
    ("dup_span_trim_docs", "/root/testdata/sf0.1"),
    ("dup_span_trim_docs_hashed", "/root/testdata/sf0.1"),
    ("dedup_survivor_stats", "/root/testdata/sf0.1"),
    # control (no inverted-index operator touched by the dial)
    ("exact_dedup_docs", "/root/testdata/sf0.1"),
]
N = 3


def main() -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-ckptindex-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_ckptindex.json")
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
        "metric": "ckpt_inverted_index_ab",
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
