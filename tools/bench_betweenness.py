"""Betweenness accuracy-vs-pivot-count curve (r20, VERDICT r19 #3):
the registered rung runs Brandes exactly from the 4 highest-degree
pivots — batching (r19) made pivots cheap, but "how wrong is 4-pivot
betweenness" had no number. This sweeps k = 4 / 8 / 16 pivots at
sf0.01, scores each budget against EXACT all-sources Brandes (float,
computed here in pure Python over the collected edge list — the graph
is small at test SF; the ESTIMATOR is what runs distributed), and
reports per budget:

- spearman  : rank correlation of the k-pivot score vs exact, over
  nodes reached by the pivot BFS union (ties mid-ranked)
- top10     : |top-10 by estimate ∩ top-10 by exact| / 10 — NB the
  exact head here is a smooth near-tie band (top-30 spans 83k→42k
  with no separated head), so exact-top-10 identification is
  intrinsically hard; the decile metric below is the honest head axis
- top_decile: same overlap at the top-10%-of-nodes granularity
- execs     : SQL executions the batched frame spent (driver
  round-trips — the real cost axis; r19 measured 40 at k=4)
- secs      : wall clock (median of --samples warm runs)

The k=4 column doubles as a hash-invariance check: the frame's output
must equal the registered query's rows exactly (the refactor to
`pivot_betweenness_frame` is a pure extraction).

Usage: python tools/bench_betweenness.py [--sf-dir /root/testdata/sf0.01]
       [--budgets 4,8,16] [--samples 3]
Writes BENCH_betweenness.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")


def exact_brandes(adj: dict[int, list[int]]) -> dict[int, float]:
    """Textbook all-sources Brandes (2001) on an unweighted graph —
    float deltas, every node a source. O(V·E): fine at test SF where
    V ≈ 2k; the point of the k-pivot estimator is that this is the
    thing you CANNOT run at 100 TB."""
    bc = {v: 0.0 for v in adj}
    for s in adj:
        # forward BFS: sigma path counts + predecessor DAG
        sigma = {s: 1.0}
        dist = {s: 0}
        preds: dict[int, list[int]] = {s: []}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        # backward accumulation
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def pivot_estimate(
    adj: dict[int, list[int]], pivots: list[int]
) -> dict[int, float]:
    """Float twin of the registered rung's estimator (sum of Brandes
    deltas over the pivot set) — used only to sanity-check that the
    integer-grid Spark scores rank identically at k=4."""
    bc = {v: 0.0 for v in adj}
    for s in pivots:
        sigma = {s: 1.0}
        dist = {s: 0}
        preds: dict[int, list[int]] = {s: []}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def spearman(xs: list[float], ys: list[float]) -> float:
    """Spearman rho with mid-ranks for ties (no scipy in-container)."""

    def ranks(vals: list[float]) -> list[float]:
        idx = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(idx):
            j = i
            while j + 1 < len(idx) and vals[idx[j + 1]] == vals[idx[i]]:
                j += 1
            mid = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                r[idx[k]] = mid
            i = j + 1
        return r

    rx, ry = ranks(xs), ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    return num / den if den else 0.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--budgets", default="4,8,16")
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()
    budgets = [int(b) for b in args.budgets.split(",")]

    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.graph import (
        _BC_PIVOTS,
        _staged_copurchase_edges,
        copurchase_pivot_betweenness,
        pivot_betweenness_frame,
    )
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark(
        "bench_betweenness", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = args.sf_dir

    def _last_execution_id() -> int:
        lst = spark._jsparkSession.sharedState().statusStore().executionsList()
        return lst.apply(lst.size() - 1).executionId() if lst.size() > 0 else -1

    root = _staged_copurchase_edges(spark, sf)
    canon = (
        spark.read.parquet(f"{root}/sym")
        .filter(F.col("wr") >= 2)
        .select("src", "dst")
    )
    edges = [(r["src"], r["dst"]) for r in canon.collect()]
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    n_nodes, n_edges = len(adj), len(edges) // 2
    print(f"graph: {n_nodes} nodes, {n_edges} undirected edges")

    t0 = time.time()
    exact = exact_brandes(adj)
    exact_secs = time.time() - t0
    print(f"exact all-sources Brandes ({n_nodes} sources): {exact_secs:.1f}s")
    top10_exact = set(
        sorted(exact, key=lambda v: (-exact[v], v))[:10]
    )
    n_dec = max(1, n_nodes // 10)
    decile_exact = set(
        sorted(exact, key=lambda v: (-exact[v], v))[:n_dec]
    )

    # deterministic pivot ordering shared with the rung: degree desc, id asc
    by_deg = sorted(adj, key=lambda v: (-len(adj[v]), v))

    rows = []
    for k in budgets:
        est_rows = {}
        secs = []
        execs = None
        for s in range(args.samples):
            wm = _last_execution_id()
            t0 = time.time()
            est_rows = {
                r["part_key"]: r["betweenness_nano"]
                for r in pivot_betweenness_frame(spark, canon, k).collect()
            }
            secs.append(time.time() - t0)
            execs = _last_execution_id() - wm
        # score over the union of reached nodes (unreached = absent row)
        nodes = sorted(est_rows)
        sp = spearman(
            [float(est_rows[v]) for v in nodes], [exact[v] for v in nodes]
        )
        by_est = sorted(est_rows, key=lambda v: (-est_rows[v], v))
        overlap = len(set(by_est[:10]) & top10_exact) / 10.0
        dec_overlap = len(set(by_est[:n_dec]) & decile_exact) / n_dec
        # float-twin rank agreement: the integer-grid Spark scores must
        # rank like the float estimator from the same pivots
        ftwin = pivot_estimate(adj, by_deg[:k])
        sp_twin = spearman(
            [float(est_rows[v]) for v in nodes], [ftwin[v] for v in nodes]
        )
        rows.append(
            {
                "pivots": k,
                "spearman_vs_exact": round(sp, 4),
                "top10_overlap": overlap,
                "top_decile_overlap": round(dec_overlap, 3),
                "spearman_vs_float_twin": round(sp_twin, 4),
                "execs": execs,
                "secs_median": round(statistics.median(secs), 2),
                "nodes_scored": len(nodes),
            }
        )
        print(json.dumps(rows[-1]))

    # hash-invariance: frame at k=_BC_PIVOTS ≡ the registered query
    reg = {
        r["part_key"]: r["betweenness_nano"]
        for r in copurchase_pivot_betweenness(spark, sf).collect()
    }
    frame4 = {
        r["part_key"]: r["betweenness_nano"]
        for r in pivot_betweenness_frame(spark, canon, _BC_PIVOTS).collect()
    }
    assert reg == frame4, "refactor changed the registered rung's output"

    out = {
        "bench": "betweenness_accuracy_vs_pivots",
        "sf_dir": sf,
        "graph": {"nodes": n_nodes, "edges": n_edges},
        "exact_all_sources_secs": round(exact_secs, 1),
        "samples": args.samples,
        "curve": rows,
        "registered_equals_frame_at_default": True,
        "notes": (
            "spearman/top10/decile scored against exact all-sources "
            "Brandes (float, in-bench); execs = SQL executions per "
            "build+collect — the driver-round-trip axis batching "
            "optimizes. Execs and secs are FLAT in k (pivots ride one "
            "keyed frame), so accuracy is the only axis that moves; "
            "the registered default stays k=4 because the rung's hash "
            "is frozen by contract — the curve prices the dial for a "
            "user who wants more. See OBSERVATIONS.md."
        ),
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_betweenness.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
