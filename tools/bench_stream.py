"""Streaming throughput / state-size bench (VERDICT r5 next-round #5;
SURVEY.md §7.4 — the online surface of /root/reference/README.md:19).

Replays the skew-bench event fixture (tools/bench_skew.py's generator:
one hot key holding ~hot_pct% of rows, vs a uniform control) through the
repo's two streaming sessionizers as an ORDERED file stream:

- the fixture is staged as ``n_slices`` time-slice files with strictly
  increasing modification times, so FileStreamSource triggers them in
  event-time order (maxFilesPerTrigger=1 ⇒ one slice per micro-batch)
  and the 30-minute watermark never drops data — the shape of a real
  log stream arriving in order;
- ``stateful_sessionize_stream`` (T5, applyInPandasWithState — the
  Python explicit-state path) and ``session_window_stream`` (T3, the
  native JVM gap window) both run under Trigger.AvailableNow to a noop
  sink;
- per micro-batch we record input rows, processedRowsPerSecond, trigger
  wall time, and the state operator's numRowsTotal / memoryUsedBytes —
  the state-growth-vs-hot-keys evidence the README's next-minute
  surface needs.

What to expect (recorded, not asserted): state rows track the number of
OPEN sessions (≈ active keys), not input volume — eviction via
watermark timeout keeps it flat across batches; the hot key adds ONE
state row but concentrates ~hot_pct% of every batch's rows into a
single pandas group, so the Python path's batch time degrades with
skew while the JVM session_window path absorbs it.

Also records the ONLINE serve rungs: ``ann_serve_fresh_stream`` (the
fresh-query payload drained as a one-file-per-trigger stream, each
micro-batch served against the staged IVF-PQ index via the registered
``stream_serve_fresh_topk`` body) and ``near_dup_serve_stream`` (the
delivery drained the same way through the registered
``stream_near_dup_serve`` sign → dedup → commit loop against the staged
band store), each with per-micro-batch serve latency.

Usage:
    python tools/bench_stream.py [--rows 16000000] [--hot-pct 30]
        [--slices 16] [--driver-memory 8g] [--out BENCH_stream.json]

Driver memory: local-mode hosts all executors in one JVM; 8g is enough
for the default 16M-row ladder (measured ~3 GiB peak). The flag only
takes effect when this process creates the JVM.
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

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_skew import BASE_TS, SPAN_S, _gen  # noqa: E402


def _stage_slices(spark, src: str, out: str, n_slices: int) -> None:
    """Rewrite a fixture as n_slices single-file time slices whose file
    mtimes increase with event time, so the file stream replays them in
    order (FileStreamSource sorts pending files by modification time)."""
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return
    ev = spark.read.parquet(src).withColumn("ts_s", F.unix_timestamp("ts"))
    os.makedirs(out, exist_ok=True)
    step = SPAN_S // n_slices + 1
    t_base = time.time()
    for i in range(n_slices):
        lo, hi = BASE_TS + i * step, BASE_TS + (i + 1) * step
        tmp = tempfile.mkdtemp(prefix="spark_graft_slice_")
        (
            ev.filter((F.col("ts_s") >= lo) & (F.col("ts_s") < hi))
            .drop("ts_s")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = [f for f in os.listdir(tmp) if f.startswith("part-")][0]
        dst = os.path.join(out, f"slice-{i:04d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (t_base + i, t_base + i))  # strictly increasing mtime
        shutil.rmtree(tmp, ignore_errors=True)
    open(os.path.join(out, "_SUCCESS"), "w").close()


def _run_stream(spark, path: str, schema, build, n_slices: int | None = None) -> dict:
    """Drive one sessionizer over the staged slices with AvailableNow,
    one slice per micro-batch; return per-batch progress + totals.

    Spark caps ``recentProgress`` at
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100), which
    would silently drop the earliest batches above ~100 slices and write
    an undercounted artifact presented as complete (ADVICE r6) — so the
    cap is raised to the slice count + headroom BEFORE the query starts,
    and the batch count is asserted against the slice count after."""
    if n_slices is not None:
        spark.conf.set(
            "spark.sql.streaming.numRecentProgressUpdates", str(n_slices + 32)
        )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )
    ckpt = tempfile.mkdtemp(prefix="spark_graft_stream_ckpt_")
    t0 = time.time()
    q = (
        build(src)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    batches = []
    total_rows = 0
    for p in q.recentProgress:
        if p["numInputRows"] == 0 and not p["stateOperators"]:
            continue
        so = p["stateOperators"][0] if p["stateOperators"] else {}
        total_rows += p["numInputRows"]
        batches.append(
            {
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "rows_per_s": round(p.get("processedRowsPerSecond") or 0.0, 1),
                "trigger_s": round(p["durationMs"].get("triggerExecution", 0) / 1000, 3),
                "state_rows": so.get("numRowsTotal"),
                "state_rows_updated": so.get("numRowsUpdated"),
                "state_rows_removed": so.get("numRowsRemoved"),
                "state_bytes": so.get("memoryUsedBytes"),
            }
        )
    shutil.rmtree(ckpt, ignore_errors=True)
    if n_slices is not None and len(q.recentProgress) < n_slices:
        raise RuntimeError(
            f"progress log truncated: {len(q.recentProgress)} updates for "
            f"{n_slices} slices — raise numRecentProgressUpdates"
        )
    return {
        "wall_s": round(wall, 2),
        "total_rows": total_rows,
        "avg_rows_per_s": round(total_rows / wall, 1) if wall else None,
        "max_state_rows": max((b["state_rows"] or 0) for b in batches) if batches else 0,
        "max_state_bytes": max((b["state_bytes"] or 0) for b in batches) if batches else 0,
        "batches": batches,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--hot-pct", type=int, default=30)
    ap.add_argument("--slices", type=int, default=16)
    ap.add_argument("--driver-memory", default="8g")
    ap.add_argument("--out", default="BENCH_stream.json")
    args = ap.parse_args()

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", f"--driver-memory {args.driver_memory} pyspark-shell"
    )
    from dataengineerchallenge_spark.session import get_spark
    from dataengineerchallenge_spark.streaming.sessionize import (
        session_window_stream,
        stateful_sessionize_stream,
    )

    spark = get_spark("bench-stream")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
    )
    out: dict = {
        "metric": "stream_bench",
        "rows": args.rows,
        "hot_pct": args.hot_pct,
        "slices": args.slices,
        "results": {},
    }
    schema = "event_id long, user_id long, ts timestamp, event_type string, value double"
    ops = {
        "stateful_pandas": lambda src: stateful_sessionize_stream(src),
        "session_window": lambda src: session_window_stream(src),
    }
    for name, hot in (("skewed", args.hot_pct), ("uniform", 0)):
        fixture = os.path.join(root, f"ev_r{args.rows}_h{hot}")
        _gen(spark, fixture, args.rows, hot)
        sliced = os.path.join(root, f"stream_r{args.rows}_h{hot}_s{args.slices}")
        _stage_slices(spark, fixture, sliced, args.slices)
        for op, build in ops.items():
            res = _run_stream(spark, sliced, schema, build, n_slices=args.slices)
            out["results"][f"{op}_{name}"] = res
            print(
                f"{op} {name}: {res['total_rows']} rows in {res['wall_s']}s "
                f"({res['avg_rows_per_s']} rows/s), max state rows "
                f"{res['max_state_rows']}, max state {res['max_state_bytes']} B"
            )
    sp, su = out["results"]["stateful_pandas_skewed"], out["results"]["stateful_pandas_uniform"]
    out["stateful_skew_slowdown"] = (
        round(su["avg_rows_per_s"] / sp["avg_rows_per_s"], 2)
        if sp["avg_rows_per_s"]
        else None
    )

    # ONLINE ANN serve rung (VERDICT r8 missing #3): drain the fresh-query
    # payload as a file stream (one file per trigger) and serve each
    # micro-batch against the STAGED IVF-PQ index through the registered
    # foreachBatch body — the per-micro-batch latency a real online serving
    # loop would see (index staged before timing; each number is routing +
    # ADC lookups + DPP codes seek + sink append for one micro-batch).
    from dataengineerchallenge_spark.queries.vectors import (
        _staged_fresh_query_stream,
        _staged_ivfpq_index,
        _stream_serve_fresh,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    ix_root = _staged_ivfpq_index(spark, sf_dir)
    payload = _staged_fresh_query_stream(spark, sf_dir)
    epochs: list = []
    t0 = time.time()
    served = _stream_serve_fresh(spark, ix_root, payload, epochs=epochs)
    out["results"]["ann_serve_fresh_stream"] = {
        "sf_dir": sf_dir,
        "wall_s": round(time.time() - t0, 2),
        "micro_batches": len(epochs),
        "per_batch_serve_s": [t for _, t in epochs],
        "result_rows": served.count(),
    }
    print(
        f"ann_serve_fresh_stream: {len(epochs)} micro-batches, per-batch "
        f"{[t for _, t in epochs]} s"
    )

    # Same loop at the PRODUCTION index (round 11): micro-batches served
    # against the all-trained IVF-PQ (k-means coarse cells + trained PQ
    # codebooks) through the shared harness with only the serve body
    # swapped — the per-micro-batch cost of the index the production
    # stack actually ships.
    from dataengineerchallenge_spark.queries.vectors import (
        _staged_trained_ivfpq_index,
        _trained_serve_from_index,
    )

    tr_root = _staged_trained_ivfpq_index(spark, sf_dir)
    tepochs: list = []
    t0 = time.time()
    tserved = _stream_serve_fresh(
        spark, tr_root, payload, epochs=tepochs, serve_body=_trained_serve_from_index
    )
    out["results"]["ann_serve_trained_stream"] = {
        "sf_dir": sf_dir,
        "wall_s": round(time.time() - t0, 2),
        "micro_batches": len(tepochs),
        "per_batch_serve_s": [t for _, t in tepochs],
        "result_rows": tserved.count(),
    }
    print(
        f"ann_serve_trained_stream: {len(tepochs)} micro-batches, per-batch "
        f"{[t for _, t in tepochs]} s"
    )

    # ONLINE dedup serve rung (VERDICT r9 next #4): drain the delivery as
    # a file stream and run the full sign → dedup-against-store-so-far →
    # commit lifecycle per micro-batch against the STAGED base band table
    # (store staged before timing; each number is one micro-batch's
    # signing + size-adaptive candidate join + exact-Jaccard verify +
    # sink/commit appends).
    from dataengineerchallenge_spark.queries.dedup import (
        _staged_delivery_stream,
        _staged_minhash_bands,
        _stream_near_dup_serve,
    )
    from dataengineerchallenge_spark.sources.tables import load_table, spread

    store = _staged_minhash_bands(spark, sf_dir)
    dpayload = _staged_delivery_stream(spark, sf_dir)
    docs = spread(load_table(spark, sf_dir, "documents"))
    depochs: list = []
    t0 = time.time()
    deduped = _stream_near_dup_serve(spark, store, dpayload, docs, epochs=depochs)
    out["results"]["near_dup_serve_stream"] = {
        "sf_dir": sf_dir,
        "wall_s": round(time.time() - t0, 2),
        "micro_batches": len(depochs),
        "per_batch_serve_s": [t for _, t in depochs],
        "result_rows": deduped.count(),
    }
    print(
        f"near_dup_serve_stream: {len(depochs)} micro-batches, per-batch "
        f"{[t for _, t in depochs]} s"
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
