"""Per-query STAGE profiler — the empirical half of the optimization
loop (guide §1.1): for each named query, run once cold-ish to warm the
JVM/codegen, then run measured passes to the noop sink and attribute the
wall time to the Spark stages it scheduled, via the live UI REST API.

    python tools/profile_stages.py /root/testdata/sf0.1 q1 q2 ... [--json OUT]

Output per query: total wall per pass, then the stages of the measured
window sorted by executorRunTime with task counts, shuffle read/write
bytes and input bytes — i.e. "is the time compute, shuffle, or
scheduling?" per stage. Stages are correlated by submission time within
the measured window (job-group filtering via REST is version-fragile).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
        args = [a for a in args if a != out_json]
    sf_dir = args[0]
    names = args[1:]

    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    report: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        # warm pass (codegen, file listing, staged-store build)
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm = time.time() - t0
        # measured pass
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t1 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t1
        t2 = time.time()
        spark.sparkContext.setJobDescription(None)

        stages = _rest(f"{base}/stages?status=complete")
        window = []
        for s in stages:
            sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
            if not sub:
                continue
            # REST timestamps: "2026-08-17T12:34:56.789GMT"
            ts = time.mktime(
                time.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
            ) - time.timezone
            if t1 - 1 <= ts <= t2 + 1:
                window.append(s)
        rows = []
        for s in window:
            rows.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:70],
                    "tasks": s["numCompleteTasks"],
                    "runTime_ms": s["executorRunTime"],
                    "cpuTime_ms": round(s.get("executorCpuTime", 0) / 1e6),
                    "gc_ms": s.get("jvmGcTime", 0),
                    "shuffle_read_mb": round(s["shuffleReadBytes"] / 2**20, 2),
                    "shuffle_write_mb": round(s["shuffleWriteBytes"] / 2**20, 2),
                    "input_mb": round(s["inputBytes"] / 2**20, 2),
                }
            )
        rows.sort(key=lambda r: -r["runTime_ms"])
        report[name] = {
            "warm_s": round(warm, 3),
            "wall_s": round(wall, 3),
            "n_stages": len(rows),
            "sum_task_runtime_ms": sum(r["runTime_ms"] for r in rows),
            "stages": rows[:12],
        }
        print(f"\n== {name}: warm {warm:.2f}s, measured {wall:.2f}s, "
              f"{len(rows)} stages, task-time {report[name]['sum_task_runtime_ms']} ms")
        for r in rows[:12]:
            print(
                f"  st{r['stage']:>4} {r['runTime_ms']:>7}ms cpu{r['cpuTime_ms']:>7}ms "
                f"t{r['tasks']:>3} sr{r['shuffle_read_mb']:>8}MB "
                f"sw{r['shuffle_write_mb']:>8}MB in{r['input_mb']:>8}MB  {r['name']}"
            )
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
