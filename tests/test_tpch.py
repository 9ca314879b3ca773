"""Plan pins for the TPC-H completion battery (queries/tpch.py).

Results are covered by the DuckDB oracle harness; these tests pin the
physical-plan properties the 100 TB stance depends on."""

from __future__ import annotations

import contextlib
import io

import pytest

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def explain_str(df, mode: str = "simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q19_or_predicates_factor_and_push_to_both_scans(spark, qs):
    """The disjunction mixes columns from both join sides; Catalyst must
    still derive the per-side hulls (p_type/p_size bands on the part
    scan, quantity hull on the lineitem scan) and push them into the
    parquet readers."""
    plan = explain_str(qs["tpch_q19_style_disjunctive_predicates"](spark, SF_DIR), "formatted")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("p_type" in l and "p_size" in l for l in pushed), pushed
    assert any("l_quantity" in l and "Or(" in l for l in pushed), pushed
    assert "BroadcastHashJoin" in plan


def test_q7_only_fact_fact_join_may_shuffle(spark, qs):
    """supplier/customer/nation(×2) broadcast; at most the lineitem ⋈
    orders join is a shuffle join (at sf0.001 AQE may broadcast even
    that). Never a cartesian."""
    plan = explain_str(qs["tpch_q7_style_nation_trade_flows"](spark, SF_DIR))
    shuffles = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert shuffles <= 1, plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_q10_top20_is_takeordered_not_global_sort(spark, qs):
    plan = explain_str(qs["tpch_q10_style_returned_item_ranking"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_q13_outer_join_and_aggs_bounded_exchanges(spark, qs):
    """custkey join + custkey aggregate + histogram aggregate: the plan
    must not exceed three exchanges (join and first agg can share the
    custkey clustering; the histogram agg is tiny)."""
    plan = explain_str(qs["tpch_q13_style_order_count_distribution"](spark, SF_DIR))
    assert plan.count("Exchange") <= 3, plan


def test_q22_not_exists_plans_as_left_anti(spark, qs):
    plan = explain_str(qs["tpch_q22_style_dormant_high_balance"](spark, SF_DIR))
    assert "LeftAnti" in plan, plan


def test_q6_predicates_push_to_scan_no_shuffle_joins(spark, qs):
    """Pure scan-aggregate: shipdate/quantity hulls reach the parquet
    reader, no join of any kind, one partial/final agg pair."""
    df = qs["tpch_q6_style_forecast_revenue"](spark, SF_DIR)
    plan = explain_str(df, "formatted")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l and "l_quantity" in l for l in pushed), pushed
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin", "CartesianProduct"):
        assert j not in plan, j
    simple = explain_str(df)
    assert simple.count("HashAggregate") == 2, simple


def test_q21_semi_and_anti_keep_orderkey_equi_key(spark, qs):
    """The supplier-inequality residual must ride on an orderkey
    equi-join (semi + anti), never degrade to a nested-loop join."""
    plan = explain_str(qs["tpch_q21_style_sole_returned_supplier"](spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q2_join_back_reuses_partkey_clustering(spark, qs):
    """supply (part,supplier) agg and best (part) agg + the join-back all
    derive from one lineitem scan; the per-part MIN must not add a
    second wide shuffle beyond the (partkey,suppkey) one, and the
    dimension joins broadcast."""
    plan = explain_str(qs["tpch_q2_style_cheapest_supplier"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "CartesianProduct" not in plan, plan
