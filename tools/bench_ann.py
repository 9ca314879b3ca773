"""ANN build/serve scaling bench → BENCH_ann.json.

The committed fixtures top out at 5k vectors — fine for correctness,
useless for the serving claim. This bench generates deterministic
clustered corpora at real sizes and measures the three numbers the
IVF-PQ build/serve split (queries/vectors.py) is about:

- **build_s**: one-time cost of `_staged_ivfpq_index` (encode corpus,
  write bucket-partitioned inverted lists + lookup tables);
- **serve_s**: per-lookup-batch cost of `ivf_pq_serve_topk` over the
  prebuilt index (best of ``iters``);
- **serve_fresh_s**: per-batch cost of `ivf_pq_serve_fresh_topk` — a
  batch the build never saw, routed at query time from the staged
  centroids (the common real serving call; payload staged before
  timing, so the number is routing + ADC lookups + DPP seek);
- **inline_s**: what every lookup batch costs WITHOUT the split
  (`ivf_pq_adc_topk` rebuilds the index inside the query plan).

Corpus: 10 mild clusters (deterministic per-label base vector + hash
noise), so bucket sizes are balanced and candidate fractions realistic;
labels drive the stand-in codebooks exactly as on the fixtures. Recall
is NOT reported here — synthetic noise clusters say nothing about real
recall (that's pinned on the fixtures); this artifact is about where
the time goes as N grows.

Usage:
    python tools/bench_ann.py [--sizes 100000,1000000] [--iters 3]
        [--driver-memory 8g] [--out BENCH_ann.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

DIM = 64
N_LABELS = 10


def _gen(spark, path: str, rows: int) -> None:
    """Deterministic clustered embeddings: label = vec_id % 10, vector =
    unit-ish base(label) + hash noise, float32, schema-identical to the
    driver fixtures."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    base = [
        F.sin(F.lit(0.7) * F.col("label") + F.lit(0.13) * d) for d in range(DIM)
    ]
    noise = [
        (F.pmod(F.xxhash64("id", F.lit(d)), F.lit(1000)) / 1000.0 - 0.5) for d in range(DIM)
    ]
    df = (
        spark.range(rows)
        .withColumn("label", F.pmod(F.col("id"), F.lit(N_LABELS)).cast("int"))
        .select(
            F.col("id").alias("vec_id"),
            F.array(
                *[(b + n).cast("float") for b, n in zip(base, noise)]
            ).alias("embedding"),
            "label",
        )
    )
    df.repartition(32).write.mode("overwrite").parquet(os.path.join(path, "embeddings.parquet"))
    open(os.path.join(path, "_SUCCESS"), "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--driver-memory", default="8g")
    ap.add_argument("--out", default="BENCH_ann.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",") if s]

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", f"--driver-memory {args.driver_memory} pyspark-shell"
    )
    from dataengineerchallenge_spark.queries.vectors import (
        _staged_fresh_query_batch,
        _staged_ivfpq_index,
        ivf_pq_adc_topk,
        ivf_pq_serve_fresh_topk,
        ivf_pq_serve_topk,
    )
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-ann")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
    )
    out: dict = {"metric": "ann_bench", "sizes": sizes, "iters": args.iters, "results": {}}
    for rows in sizes:
        d = os.path.join(root, f"ann_{rows}")
        _gen(spark, d, rows)

        t0 = time.time()
        idx = _staged_ivfpq_index(spark, d)
        build_s = round(time.time() - t0, 2)

        def best(fn):
            b = float("inf")
            for _ in range(args.iters):
                t = time.time()
                n = len(fn(spark, d).collect())
                b = min(b, time.time() - t)
            return round(b, 3), n

        serve_s, n_serve = best(ivf_pq_serve_topk)
        _staged_fresh_query_batch(spark, d)  # request payload, pre-staged
        serve_fresh_s, n_fresh = best(ivf_pq_serve_fresh_topk)
        inline_s, n_inline = best(ivf_pq_adc_topk)
        assert n_serve == n_inline > 0 and n_fresh > 0
        idx_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(idx)
            for f in fs
        )
        out["results"][str(rows)] = {
            "build_s": build_s,
            "serve_s": serve_s,
            "serve_fresh_s": serve_fresh_s,
            "inline_s": inline_s,
            "serve_speedup": round(inline_s / serve_s, 1),
            "index_bytes": idx_bytes,
            "result_rows": n_serve,
        }
        print(
            f"N={rows}: build {build_s}s once; serve {serve_s}s "
            f"(fresh batch {serve_fresh_s}s) vs inline "
            f"{inline_s}s ({out['results'][str(rows)]['serve_speedup']}x); "
            f"index {idx_bytes/1e6:.1f} MB"
        )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
