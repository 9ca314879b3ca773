"""Plan audit: build every registered query against a fixture dir and
report physical-plan health — exchange count, broadcast vs shuffle
joins, scan pushdown, whole-stage-codegen coverage — as one markdown
table (PLAN_AUDIT.md). The point is a repo-wide shuffle budget you can
re-check after any change:

    python tools/plan_audit.py /root/testdata/sf0.01 [PLAN_AUDIT.md]

Streaming queries (writeStream-driven) and ML fits are skipped — their
execution is not a single batch plan.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_PREFIXES = ("stream_", "predict_")
# driver-loop training ops: plan of the RESULT is a trivial local
# relation; auditing would just re-train
SKIP_NAMES = {"bpe_merge_table", "bpe_token_counts", "kmeans_embedding_clusters"}


def audit(sf_dir: str, out_path: str) -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name, fn in sorted(e.queries().items()):
        if name.startswith(SKIP_PREFIXES) or name in SKIP_NAMES:
            continue
        try:
            df = fn(spark, sf_dir)
            qe = df._jdf.queryExecution()
            plan = qe.executedPlan().toString()
        except Exception as ex:  # pragma: no cover - audit robustness
            rows.append((name, "ERROR", str(ex)[:80], "", "", ""))
            continue
        n_exchange = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition|Exchange RoundRobin", plan))
        n_bcast = plan.count("BroadcastExchange")
        joins = "+".join(
            sorted(
                {
                    m
                    for m in (
                        "BroadcastHashJoin" if "BroadcastHashJoin" in plan else None,
                        "SortMergeJoin" if "SortMergeJoin" in plan else None,
                        "ShuffledHashJoin" if "ShuffledHashJoin" in plan else None,
                        "BroadcastNestedLoopJoin" if "BroadcastNestedLoopJoin" in plan else None,
                    )
                    if m
                }
            )
        )
        n_scan = plan.count("FileScan") + plan.count("BatchScan")
        pushed = "y" if re.search(r"PushedFilters: \[[^\]]", plan) else ""
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        rows.append((name, str(n_exchange), str(n_bcast), joins, f"{n_scan}{'+pf' if pushed else ''}", str(n_codegen)))

    with open(out_path, "w") as f:
        f.write(
            "# Plan audit\n\n"
            f"Fixture: `{sf_dir}`. One row per registered batch query; "
            "`shuffles` counts data-moving Exchange nodes (broadcasts "
            "listed separately — they move only the small side), `scans` "
            "is file scans (`+pf` = at least one scan has pushed "
            "filters), `wscg` is distinct WholeStageCodegen spans "
            "(undercounts under AQE: pre-execution adaptive plans hide "
            "codegen markers until stages materialize).\n\n"
            "| query | shuffles | bcasts | joins | scans | wscg |\n"
            "|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write("| " + " | ".join(r) + " |\n")
    total = sum(int(r[1]) for r in rows if r[1].isdigit())
    print(f"audited {len(rows)} queries -> {out_path}; total shuffle exchanges: {total}")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "PLAN_AUDIT.md"
    audit(sf, out)
