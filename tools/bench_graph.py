"""Iterative-graph bench: PageRank wall-clock vs edge count, and what
persisting the loop invariants is worth (operators/graph.py caches the
annotated edge list and node frame; without that every iteration's plan
subtree re-runs the whole upstream edge build).

Fixture: deterministic directed graph with a power-law-ish in-degree
(dst keys drawn from a quadratic-skewed hash so a few nodes collect
many in-edges — the web/co-purchase shape PageRank exists for),
symmetrized so there is no dangling mass and scaled ranks must sum to
|V| (asserted, an end-to-end correctness check on generated data).

Per edge-count rung it times best-of-N:
  - pagerank (5 iters) with the shipped persist;
  - the same update loop WITHOUT persist (inline copy) — measuring the
    recompute tax, not a code path users can reach;
and records the rank mass error and node count.

Usage:
    python tools/bench_graph.py [--edges 1000000,4000000,16000000]
        [--iters-bench 2] [--out BENCH_graph.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_NODES = 100_000
PR_ITERS = 5


def _gen(spark, path: str, edges: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    # src uniform; dst = square of a uniform draw -> low ids collect a
    # quadratically larger share of in-edges (hub shape), deterministic
    half = spark.range(edges // 2).select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_NODES)).alias("src"),
        (
            F.pow(
                F.pmod(F.xxhash64("id", F.lit(13)), F.lit(N_NODES)).cast("double")
                / N_NODES,
                2.0,
            )
            * N_NODES
        )
        .cast("long")
        .alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    sym = half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym.distinct().repartition(32).write.mode("overwrite").parquet(path)


def _pagerank_no_persist(edges, iters: int, damping: float = 0.85):
    """The update loop of operators/graph.py WITHOUT the loop-invariant
    persist — the recompute-tax control, kept in lockstep manually."""
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    eo = e.join(outdeg, "src")
    ranks = nodes.select("node", F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contrib = (
            eo.join(ranks, eo["src"] == ranks["node"])
            .select("dst", (F.col("pr") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", default="1000000,4000000,16000000")
    ap.add_argument("--iters-bench", type=int, default=2)
    ap.add_argument("--out", default="BENCH_graph.json")
    args = ap.parse_args()
    sizes = [int(s) for s in str(args.edges).split(",") if s]

    from dataengineerchallenge_spark.operators.graph import pagerank
    from dataengineerchallenge_spark.session import get_spark

    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")
    spark = get_spark("bench-graph")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
    )
    out: dict = {
        "metric": "graph_bench",
        "edge_sizes": sizes,
        "n_nodes_domain": N_NODES,
        "pr_iters": PR_ITERS,
        "iters_bench": args.iters_bench,
        "results": {},
    }

    for edges in sizes:
        path = os.path.join(root, f"graph_{edges}")
        _gen(spark, path, edges)
        e = spark.read.parquet(path)
        n_edges = e.count()

        def run_persisted():
            r = pagerank(e, iters=PR_ITERS)
            return r.agg(F.sum("pr").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]

        def run_control():
            r = _pagerank_no_persist(e, iters=PR_ITERS)
            return r.agg(F.sum("pr").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]

        best_p, best_c, check = float("inf"), float("inf"), None
        for _ in range(args.iters_bench):
            t0 = time.time()
            check = run_persisted()
            best_p = min(best_p, time.time() - t0)
            spark.catalog.clearCache()
        for _ in range(args.iters_bench):
            t0 = time.time()
            run_control()
            best_c = min(best_c, time.time() - t0)
        mass_err = abs(check["s"] - check["n"]) / check["n"]
        assert mass_err < 1e-9, f"rank mass not conserved: {check}"
        res = {
            "edges": int(n_edges),
            "nodes": int(check["n"]),
            "persisted_s": round(best_p, 2),
            "no_persist_s": round(best_c, 2),
            "persist_speedup": round(best_c / best_p, 2),
            "rank_mass_rel_err": mass_err,
        }
        out["results"][f"pr_{edges}"] = res
        print(json.dumps({f"pr_{edges}": res}))

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
