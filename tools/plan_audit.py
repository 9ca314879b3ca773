"""Plan audit: build every registered query against a fixture dir and
report physical-plan health — exchange count, broadcast vs shuffle
joins, scan pushdown, whole-stage-codegen coverage — as one markdown
table (PLAN_AUDIT.md). The point is a repo-wide shuffle budget you can
re-check after any change:

    python tools/plan_audit.py /root/testdata/sf0.01 [PLAN_AUDIT.md] [--execute]

With ``--execute`` each query is first run to a noop sink, so the
audited plan is the FINAL adaptive plan (AQE's actual broadcast
demotions / coalesced reads, real WholeStageCodegen spans) and a
wall-time column is added — slower, but the truth.

Executed-mode metrics come from the session's SQLAppStatusStore: every
SQL execution the query triggers between build and collect is counted —
including the localCheckpoint materializations iterative operators
(pagerank, BFS, star CC) run inside the build. Reading only the final
frame's plan undercounts those to near zero (VERDICT r12 what's-wrong
#2: the pagerank row showed "0 shuffles, 0.05 s" because everything ran
before the audited frame existed); wall time likewise wraps the BUILD
call, not just the terminal collect.

Streaming queries (writeStream-driven) and ML fits are skipped — their
execution is not a single batch plan.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_PREFIXES = ("stream_", "predict_")
# driver-loop training ops: plan of the RESULT is a trivial local
# relation; auditing would just re-train
SKIP_NAMES = {"bpe_merge_table_explicit", "bpe_token_counts_explicit", "kmeans_embedding_clusters"}


def audit(sf_dir: str, out_path: str, execute: bool = False) -> None:
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    def _last_execution_id() -> int:
        lst = spark._jsparkSession.sharedState().statusStore().executionsList()
        return lst.apply(lst.size() - 1).executionId() if lst.size() > 0 else -1

    def _plans_since(watermark: int) -> tuple[list[str], str]:
        """Per-execution FINAL-plan trees — ONE LIST ENTRY per SQL
        execution after ``watermark`` (one per localCheckpoint/action
        plus the terminal collect) — and the concatenated detail
        sections (PushedFilters / codegen ids). Kept per-execution so
        iterative queries report their round structure, not just an
        aggregate (VERDICT r13 #7)."""
        lst = spark._jsparkSession.sharedState().statusStore().executionsList()
        trees, details = [], []
        for i in range(lst.size()):
            ex = lst.apply(i)
            if ex.executionId() > watermark:
                desc = ex.physicalPlanDescription()
                # tree section(s): final plan only (the == Initial Plan ==
                # tree repeats every node pre-AQE); the detail section
                # below the trees carries PushedFilters / codegen ids
                head, _, rest = desc.partition("== Initial Plan ==")
                trees.append(head)
                details.append(rest)
        return trees, "\n".join(details)

    rows = []
    for name, fn in sorted(e.queries().items()):
        if name.startswith(SKIP_PREFIXES) or name in SKIP_NAMES:
            continue
        try:
            secs = ""
            detail = ""
            execs = ""
            if execute:
                # time the BUILD too: iterative operators execute their
                # rounds inside fn() via localCheckpoint, and those jobs
                # are the query's real cost
                wm = _last_execution_id()
                t0 = time.time()
                df = fn(spark, sf_dir)
                # collect() (not a noop write) so the FRAME'S OWN query
                # execution finalizes — a write spawns a separate one and
                # leaves this plan isFinalPlan=false
                df.collect()
                secs = f"{time.time() - t0:.2f}"
                trees, detail = _plans_since(wm)
                plan = "\n".join(trees)
                # per-execution structure: an iterative query's "21
                # shuffles" might be 1 execution of 21 or 7 rounds of 3 —
                # report count of executions and the max shuffles any
                # single one ran so the round shape is visible
                per_exec = [
                    len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", t))
                    for t in trees
                ]
                execs = f"{len(trees)} ({max(per_exec) if per_exec else 0})"
            else:
                df = fn(spark, sf_dir)
                qe = df._jdf.queryExecution()
                plan = qe.executedPlan().toString()
                # an adaptive plan prints Final AND Initial sections;
                # count nodes from the final one only
                plan = plan.split("== Initial Plan ==")[0]
        except Exception as ex:  # pragma: no cover - audit robustness
            rows.append((name, "ERROR", str(ex)[:80], "", "", "", "", ""))
            continue
        if execute:
            # description-format trees: nodes print as "Exchange (45)" /
            # "Scan parquet (1)"; codegen ids live in the detail section
            n_exchange = len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan))
            n_scan = len(re.findall(r"Scan (?:parquet|text|csv|json|ExistingRDD)", plan))
            n_codegen = len(set(re.findall(r"\[codegen id : (\d+)\]", detail)))
            pushed = "y" if re.search(r"PushedFilters: \[[^\]]", plan + detail) else ""
        else:
            n_exchange = len(re.findall(r"Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition|Exchange RoundRobin", plan))
            n_scan = plan.count("FileScan") + plan.count("BatchScan")
            n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
            pushed = "y" if re.search(r"PushedFilters: \[[^\]]", plan) else ""
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
        rows.append(
            (name, str(n_exchange), str(n_bcast), joins,
             f"{n_scan}{'+pf' if pushed else ''}", str(n_codegen), execs, secs)
        )

    cols = "| query | shuffles | bcasts | joins | scans | wscg |"
    sep = "|---|---|---|---|---|---|"
    if execute:
        cols += " execs (max shuf) | sec |"
        sep += "---|---|"
    with open(out_path, "w") as f:
        f.write(
            "# Plan audit\n\n"
            f"Fixture: `{sf_dir}`"
            + (", EXECUTED (final adaptive plans, wall time per query)" if execute else "")
            + ". One row per registered batch query; "
            "`shuffles` counts data-moving Exchange nodes (broadcasts "
            "listed separately — they move only the small side), `scans` "
            "is file scans (`+pf` = at least one scan has pushed "
            "filters), `wscg` is distinct WholeStageCodegen spans; "
            "executed mode aggregates EVERY SQL execution the query "
            "triggers and adds `execs (max shuf)` — execution count and "
            "the max shuffles any single execution ran, so iterative "
            "queries show their per-round structure"
            + (
                ".\n\n"
                if execute
                else " (undercounts without --execute: pre-execution "
                "adaptive plans hide codegen markers until stages "
                "materialize).\n\n"
            )
            + cols + "\n" + sep + "\n"
        )
        for r in rows:
            f.write("| " + " | ".join(r if execute else r[:6]) + " |\n")
    total = sum(int(r[1]) for r in rows if r[1].isdigit())
    print(f"audited {len(rows)} queries -> {out_path}; total shuffle exchanges: {total}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--execute"]
    sf = args[0] if args else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "PLAN_AUDIT.md"
    audit(sf, out, execute="--execute" in sys.argv)
