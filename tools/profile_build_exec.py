"""Split each named query's warm wall time into DataFrame-build (Python →
py4j plan construction, including eager per-op analysis) vs execute (noop
sink) — the guide §1.2 "time the computation" discipline applied to the
driver side. Three warm passes each, minima reported (construction cost
is deterministic; minima strip scheduler noise).

    python tools/profile_build_exec.py /root/testdata/sf0.1 q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("profile-build-exec")
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(e.queries())

    for name in names:
        fn = qs[name]
        # cold pass to warm codegen/file listing/staging
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        builds, execs = [], []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        print(
            f"{name:40s} build {min(builds):6.3f}s  exec {min(execs):6.3f}s  "
            f"(build samples {[round(b, 3) for b in builds]})"
        )


if __name__ == "__main__":
    main()
