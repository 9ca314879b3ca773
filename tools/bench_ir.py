"""Inverted-index bench: what the staged postings store buys over
re-tokenizing the corpus per query, and how both sides scale with
corpus size — the build/serve break-even evidence the graph and ANN
families already carry (BENCH_graph serve_split_fixture / BENCH_ann).

Two rungs, merged into BENCH_ir.json:

* fixture rung — on the real sf0.1 documents: cold store build, then
  best-of-N wall for phrase + BM25, inline (scan) vs served (store);
  ``break_even_runs`` = how many query passes the build amortizes over.
* scaling rung — documents replicated 1x/4x/16x (id-offset union, so
  postings grow linearly): the inline phrase cost must grow with the
  corpus while the served cost tracks |postings(query terms)| — the
  flat-serve-vs-growing-scan curve IS the point of an inverted index.

Usage:
    python tools/bench_ir.py [--sf-dir /root/testdata/sf0.1]
        [--reps 1,4,16] [--iters 2] [--out BENCH_ir.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")

from pyspark.sql import functions as F  # noqa: E402


def best(fn, iters: int) -> float:
    b = float("inf")
    for _ in range(iters):
        t0 = time.time()
        fn()
        b = min(b, time.time() - t0)
    return round(b, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", default="1,4,16")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--out", default="BENCH_ir.json")
    args = ap.parse_args()

    from dataengineerchallenge_spark.queries.search import (
        _N_BUCKETS,
        _PHRASE,
        _phrase_hits,
        _query_terms,
        _staged_inverted_index,
        bm25_search_inverted_staged,
        phrase_search_inverted,
        phrase_search_inverted_staged,
    )
    from dataengineerchallenge_spark.queries.text import bm25_keyword_search
    from dataengineerchallenge_spark.session import get_spark
    from dataengineerchallenge_spark.sources.tables import load_table
    from dataengineerchallenge_spark.staging import STAGING_ROOT_CONF

    spark = get_spark("bench-ir")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"metric": "ir_bench", "sf_dir": args.sf_dir, "results": {}}

    # --- fixture rung: cold build + inline-vs-serve, fresh staging root
    tmp = tempfile.mkdtemp(prefix="spark_graft_bench_ir_")
    prev_root = spark.conf.get(STAGING_ROOT_CONF, None)
    spark.conf.set(STAGING_ROOT_CONF, tmp)
    try:
        t0 = time.time()
        _staged_inverted_index(spark, args.sf_dir)
        build_s = round(time.time() - t0, 3)

        def run(fn):
            return lambda: fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        rows = {
            "build_s": build_s,
            "phrase_inline_s": best(run(phrase_search_inverted), args.iters),
            "phrase_served_s": best(run(phrase_search_inverted_staged), args.iters),
            "bm25_scan_s": best(run(bm25_keyword_search), args.iters),
            "bm25_served_s": best(run(bm25_search_inverted_staged), args.iters),
        }
        saved = (
            rows["phrase_inline_s"]
            - rows["phrase_served_s"]
            + rows["bm25_scan_s"]
            - rows["bm25_served_s"]
        )
        rows["saved_per_pass_s"] = round(saved, 3)
        rows["break_even_runs"] = round(build_s / saved, 2) if saved > 0 else None
        out["results"]["serve_split_fixture"] = rows
        print(json.dumps({"serve_split_fixture": rows}))
    finally:
        if prev_root is not None:
            spark.conf.set(STAGING_ROOT_CONF, prev_root)
        else:
            spark.conf.unset(STAGING_ROOT_CONF)
        shutil.rmtree(tmp, ignore_errors=True)

    # --- scaling rung: replicated corpora, inline grows / serve flat
    from dataengineerchallenge_spark.queries.search import postings_frame

    docs0 = load_table(spark, args.sf_dir, "documents")
    n0 = docs0.count()
    scratch = tempfile.mkdtemp(prefix="spark_graft_bench_ir_scale_")
    try:
        for rep in [int(x) for x in str(args.reps).split(",") if x]:
            docs = docs0
            for k in range(1, rep):
                docs = docs.unionByName(
                    docs0.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(k * 10_000_000)
                    )
                )
            store = os.path.join(scratch, f"postings_{rep}")
            t0 = time.time()
            (
                postings_frame(docs)
                .repartition(_N_BUCKETS, "bucket")
                .sortWithinPartitions("term", "doc_id")
                .write.partitionBy("bucket")
                .parquet(store)
            )
            build_s = round(time.time() - t0, 3)
            postings = spark.read.parquet(store)
            qt = _query_terms(spark, _PHRASE)

            def served():
                _phrase_hits(postings, qt, _PHRASE).write.format("noop").mode(
                    "overwrite"
                ).save()

            def inline():
                _phrase_hits(
                    postings_frame(docs), qt, _PHRASE
                ).write.format("noop").mode("overwrite").save()

            res = {
                "docs": n0 * rep,
                "build_s": build_s,
                "phrase_inline_s": best(inline, args.iters),
                "phrase_served_s": best(served, args.iters),
            }
            out["results"][f"scale_{rep}x"] = res
            print(json.dumps({f"scale_{rep}x": res}))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
