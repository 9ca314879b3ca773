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
