"""Round-17 pins (VERDICT r16 next-round #2):

retraction on the staged edge store — folding the takedown orders'
NEGATIVE (−w, −wr) delta into the full store plus a zero-support
cleanup must leave a store EQUAL row-for-row (sym and symdeg) to a
from-scratch rebuild on the corpus minus those orders, including the
complete disappearance of edges whose whole support was deleted.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.graph import (
    _copurchase_pair_counts,
    _staged_copurchase_edges_retracted,
)
from dataengineerchallenge_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_retracted_store_equals_rebuild_on_remaining_corpus(spark):
    root = _staged_copurchase_edges_retracted(spark, SF_DIR)
    got_sym = spark.read.parquet(f"{root}/sym").select("src", "dst", "w", "wr")
    got_deg = spark.read.parquet(f"{root}/symdeg").select("src", "outdeg", "sw")

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    keep = li.filter(F.col("l_orderkey") % 10 != 0)
    want_sym = _copurchase_pair_counts(keep).select(
        "src", "dst", "w", F.col("wr").cast("long").alias("wr")
    )
    want_deg = want_sym.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg"), F.sum("w").alias("sw")
    )
    assert _rows(got_sym) == _rows(want_sym)
    assert _rows(got_deg) == _rows(want_deg)


def test_retraction_actually_removes_support(spark):
    """The takedown set must be non-trivial on the fixture: some edges
    lose support entirely (rows swept by the wr == 0 cleanup) and some
    merely shrink — otherwise the delete≡rebuild pin proves nothing."""
    from dataengineerchallenge_spark.queries.graph import _staged_copurchase_edges

    full = spark.read.parquet(
        f"{_staged_copurchase_edges(spark, SF_DIR)}/sym"
    ).select("src", "dst", F.col("wr").cast("long").alias("wr"))
    kept = spark.read.parquet(
        f"{_staged_copurchase_edges_retracted(spark, SF_DIR)}/sym"
    ).select("src", "dst", F.col("wr").cast("long").alias("wr_kept"))
    j = full.join(kept, ["src", "dst"], "left")
    swept = j.filter(F.col("wr_kept").isNull()).count()
    shrunk = j.filter(F.col("wr_kept") < F.col("wr")).count()
    assert swept > 0, "no edge lost its whole support — weak fixture"
    assert shrunk > 0, "no edge shrank — weak fixture"


def _tarjan(edges):
    """Reference SCC (iterative Tarjan) for the cross-check pin."""
    from collections import defaultdict

    adj = defaultdict(list)
    nodes = set()
    for s, d in edges:
        adj[s].append(d)
        nodes.add(s)
        nodes.add(d)
    index, low, onstk, stk, out, cnt = {}, {}, {}, [], [], [0]
    for v0 in nodes:
        if v0 in index:
            continue
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = cnt[0]
                cnt[0] += 1
                stk.append(v)
                onstk[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif onstk.get(w):
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                scc = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    scc.append(w)
                    if w == v:
                        break
                out.append(scc)
    return {v: min(c) for c in out for v in c}


def test_scc_closed_forms(spark):
    """Cycle -> one SCC labeled by its min node; chain (DAG) -> all
    singletons; two cycles bridged one-way -> two SCCs."""
    from dataengineerchallenge_spark.operators.graph import scc_fb_minlabel

    def run(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: r["scc_id"]
            for r in scc_fb_minlabel(df, peels=4, hops=8).collect()
        }

    cycle = [(1, 2), (2, 3), (3, 1)]
    assert run(cycle) == {1: 1, 2: 1, 3: 1}
    chain = [(1, 2), (2, 3), (3, 4)]
    assert run(chain) == {1: 1, 2: 2, 3: 3, 4: 4}
    bridged = [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3)]
    assert run(bridged) == {1: 1, 2: 1, 3: 3, 4: 3}


def test_purchase_scc_matches_tarjan(spark):
    """The registered query's labeling must equal reference Tarjan on
    the same sparsified successor graph — the bounded (peels, hops)
    schedule must not clip the fixture."""
    from dataengineerchallenge_spark.functions.hashing import spark_u32
    from dataengineerchallenge_spark.queries.graph import purchase_scc

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .filter(F.col("a.l_partkey") != F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
        .filter(
            F.expr(
                spark_u32("concat(cast(src as string), '~', cast(dst as string))")
            )
            % 4
            == 0
        )
    )
    truth = _tarjan([(r["src"], r["dst"]) for r in edges.collect()])
    got = {
        r["part_key"]: r["scc_id"] for r in purchase_scc(spark, SF_DIR).collect()
    }
    assert got == truth
    sizes = {}
    for scc in got.values():
        sizes[scc] = sizes.get(scc, 0) + 1
    assert max(sizes.values()) > 1, "no nontrivial SCC — weak fixture"
    assert len(sizes) > 1, "graph collapsed to one SCC — weak fixture"
