"""Capture per-execution physical plans for named queries into
plans/<tag>/<query>_<suffix>.txt — the evidence files for optimization
rounds. Iterative operators run many SQL executions (one per
localCheckpoint round); the final frame's explain() alone hides them,
so every execution between the query's start and finish is dumped.

    python tools/capture_plans.py SF_DIR TAG SUFFIX q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")
    sf_dir, tag, suffix = sys.argv[1:4]
    names = sys.argv[4:]
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    # optional session-conf overrides, e.g. to reproduce a pre-hint plan:
    #   CAPTURE_CONF="spark.graft.graph.broadcastIterate=false"
    for kv in os.environ.get("CAPTURE_CONF", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            spark.conf.set(k.strip(), v.strip())
    qs = dict(e.queries())
    store = spark._jsparkSession.sharedState().statusStore()
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        wm = store.executionsList().size()
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        lst = store.executionsList()
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} — wall {wall:.2f}s, "
                    f"{lst.size() - wm} SQL executions\n")
            for i in range(wm, lst.size()):
                ex = lst.apply(i)
                f.write(f"\n===== execution {ex.executionId()} =====\n")
                f.write(ex.physicalPlanDescription()[:60000])
                f.write("\n")
        print(f"{name}: wall {wall:.2f}s, {lst.size() - wm} executions -> {path}")


if __name__ == "__main__":
    main()
