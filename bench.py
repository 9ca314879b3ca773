"""Headline-query benchmark. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Runs each headline query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; time = build + execute
(count) per query, after one warm-up of the first query to absorb JVM/codegen
startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Original 5 anchors first (BENCH_r01 comparability), then one
# representative per family added in round 2.
HEADLINE = [
    "sessionize",
    "avg_session_time",
    "unique_urls_per_session",
    "most_engaged_users",
    "per_minute_load",
    "region_revenue",           # J1 broadcast star join
    "top_orders_per_customer",  # O3 per-group top-k
    "exact_dedup_docs",         # N1 content-hash dedup
    "near_dup_jaccard",         # N2 shingle-join similarity
    "near_dup_embedding_lsh",   # N2 embedding-cosine near-dup (LSH scale path)
    "cosine_topk_exact",        # N3/F8 vector top-k
    "doc_lang_id",              # N4 text scoring
    "load_features",            # W5 range-frame features
    "udf_user_trend",           # D3 Arrow grouped-map
    "elb_sessionize",           # P1-P5 real-format parse path
    "stream_per_minute_load",   # T1 streaming twin
    "corpus_curation_pipeline", # N1+N4 composed flagship
    "incremental_sessionize_merge",  # W2+ state merge (round 3)
    "dq_referential_integrity",      # N+ audit battery (round 3)
    "multimodal_synth_codec_audit",  # N5 codec encode/decode (round 4)
    "ivf_pq_adc_topk",               # N3 composed IVF-PQ serving shape (round 5)
    "ivf_pq_serve_topk",             # N3 serve-only path over the prebuilt index (round 6)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = [n for n in HEADLINE if n in qs]

    # warm-up: absorb one-time JVM/codegen/file-listing cost with the SAME
    # noop-write plan shape being measured
    try:
        qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001 — warm-up only; the timed loop records it
        pass

    # stage the IVF-PQ index before timing: build-once/serve-many is the
    # operator's contract, so the ivf_pq_serve_topk line measures SERVING
    # (the build cost is what ivf_pq_adc_topk's line already shows)
    try:
        from dataengineerchallenge_spark.queries.vectors import _staged_ivfpq_index

        _staged_ivfpq_index(spark, sf_dir)
    except Exception:  # noqa: BLE001 — the timed loop will record it
        pass

    # warm the Python/Arrow worker pool too (spark.python.worker.reuse keeps
    # it alive): spawning one worker per core is a ~5s one-time infra cost
    # that would otherwise be charged to whichever pandas-UDF query runs
    # first, not a property of that query's plan
    import pandas as pd  # noqa: F401  (worker-side import warm)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _warm = pandas_udf(lambda v: v, "double")  # no hints: local pd alias
    # isn't resolvable by the type-hint inferrer under future-annotations

    n_cores = spark.sparkContext.defaultParallelism
    spark.range(0, n_cores * 100, 1, n_cores).select(
        _warm((F.col("id") * 1.0))
    ).write.format("noop").mode("overwrite").save()

    # Per-query isolation: one failing query must never zero the whole
    # artifact — record the error class under "errors" and keep timing the
    # rest (a bench harness that loses all data on a single failure is
    # itself a defect).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — isolate, classify, continue
            errors[name] = type(exc).__name__
            continue
        timings[name] = round(time.time() - t0, 3)

    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
