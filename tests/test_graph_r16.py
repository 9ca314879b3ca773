"""Round-16 pins (VERDICT r15 next-round #3):

stream_copurchase_edge_store — the online maintenance twin of the
staged purchase-graph edge store — must

- fold micro-batch deltas into a store EQUAL row-for-row (src, dst,
  w, wr) to the full-corpus rebuild (online ≡ batch, the linear-
  register drain contract every streaming sketch twin meets);
- actually stream: the drain must process >= 2 micro-batches (the
  delivery payload is written as 3 order-hashed files, one per
  trigger).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.graph import (
    _copurchase_pair_counts,
    stream_copurchase_edge_merge,
)
from dataengineerchallenge_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_stream_edge_store_equals_rebuild_and_multibatch(spark):
    epochs: list = []
    merged = stream_copurchase_edge_merge(spark, SF_DIR, epochs=epochs)
    assert len(epochs) >= 2, f"expected >=2 micro-batches, got {epochs}"

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    full = _copurchase_pair_counts(li)
    got = sorted(
        (r["src"], r["dst"], r["w"], r["wr"]) for r in merged.collect()
    )
    want = sorted(
        (r["src"], r["dst"], r["w"], r["wr"]) for r in full.collect()
    )
    assert got == want


def test_pair_counts_additive_over_order_split(spark):
    """The additivity precondition: summing per-split supports over any
    order-partitioned split reproduces the full aggregate exactly."""
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    parts = [
        _copurchase_pair_counts(li.filter(F.col("l_orderkey") % 3 == k))
        for k in range(3)
    ]
    summed = (
        parts[0]
        .unionByName(parts[1])
        .unionByName(parts[2])
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"), F.sum("wr").cast("long").alias("wr"))
    )
    full = _copurchase_pair_counts(li)
    got = sorted(tuple(r) for r in summed.collect())
    want = sorted(tuple(r) for r in full.collect())
    assert got == want


# --- hot-node (skewed-topology) pins (VERDICT r15 #5) -----------------
#
# The bench prices the Zipf hot-node graphs (BENCH_graph.json
# skew_zipf_* rows); these pins prove the G-family operators stay
# CORRECT on the most hostile small topology: a hub wired to every
# other node (maximum possible degree skew) with a K6 clique among six
# of its leaves — so the hub sits in a K7 with a known core number and
# known triangle memberships while 194 degree-1 leaves hang off it.

N_LEAVES = 200
CLIQUE = list(range(1, 7))


def _hub_clique_edges(spark):
    pairs = [(0, j) for j in range(1, N_LEAVES + 1)]
    pairs += [
        (a, b) for a in CLIQUE for b in CLIQUE if a < b
    ]
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_triangles_on_hub_graph(spark):
    """Degree-oriented wedge generation must not miscount around the
    hub: K6 alone has C(6,3)=20 triangles, hub+clique-pair adds
    C(6,2)=15, so memberships sum to 3*35 and the hub belongs to
    exactly 15. Every wedge is generated at the LOWER-degree endpoint,
    so the degree-200 hub emits none — the skew-survival property the
    orientation exists for."""
    from dataengineerchallenge_spark.operators.graph import triangle_counts

    tc = triangle_counts(_hub_clique_edges(spark))
    rows = {r["node"]: r["n_triangles"] for r in tc.collect()}
    assert sum(rows.values()) == 3 * 35
    assert rows[0] == 15
    for i in CLIQUE:
        assert rows[i] == 10 + 5  # within-clique pairs + hub pairings
    assert all(n in rows for n in [0, *CLIQUE]) and len(rows) == 7


def test_coreness_on_hub_graph(spark):
    """h-index rounds must converge THROUGH the hub: the hub starts at
    its degree (200) and must descend to its true core number 6 (the
    K7 with the clique), while degree-1 leaves pin at 1. Three rounds
    reach the fixpoint on this shape; 5 is the operator default."""
    from dataengineerchallenge_spark.operators.graph import coreness

    c = {r["node"]: r["core"] for r in coreness(_hub_clique_edges(spark), iters=5).collect()}
    assert c[0] == 6
    assert all(c[i] == 6 for i in CLIQUE)
    assert all(c[j] == 1 for j in range(7, N_LEAVES + 1))


def test_lpa_labels_everyone_on_hub_graph(spark):
    """Synchronous LPA on a star oscillates hub<->leaves by design
    (bipartite flip, bounded by the round cap) — but it must still
    label EVERY node each round, and the clique, whose internal
    majority locks in round 1, must hold one stable community."""
    from dataengineerchallenge_spark.operators.graph import label_propagation

    lab = {
        r["node"]: r["community"]
        for r in label_propagation(_hub_clique_edges(spark), iters=4).collect()
    }
    assert len(lab) == N_LEAVES + 1
    assert len({lab[i] for i in CLIQUE}) == 1


def test_pagerank_mass_on_hub_graph(spark):
    """The hub is a hot aggregation key (200 of 412 directed edges end
    there); partial aggregation must still conserve total rank mass."""
    from dataengineerchallenge_spark.operators.graph import pagerank

    r = pagerank(_hub_clique_edges(spark), iters=5).agg(
        F.sum("pr").alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    assert abs(r["s"] - r["n"]) / r["n"] < 1e-9
