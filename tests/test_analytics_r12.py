"""Round-12 analytics pins: MAD anomaly semantics and the full-outer
snapshot reconcile (the oracle sweep checks parity; these pin the
SEMANTIC contracts the SQL comparison can't see)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_mad_anomalies_obey_threshold_and_integer_math(spark):
    from dataengineerchallenge_spark.queries.analytics import (
        hourly_load_anomalies_mad,
    )

    rows = hourly_load_anomalies_mad(spark, SF_SMOKE).collect()
    assert rows, "smoke fixture has load spikes"
    meds = {r["median_load"] for r in rows}
    mads = {r["mad_load"] for r in rows}
    assert len(meds) == 1 and len(mads) == 1, "median/MAD are global scalars"
    (mad,) = mads
    for r in rows:
        # every flagged hour strictly clears the robust threshold, and the
        # deviation column is consistent integer arithmetic
        assert r["abs_deviation"] == abs(r["n_requests"] - r["median_load"])
        assert r["abs_deviation"] > 3 * mad


def test_snapshot_reconcile_statuses_partition_keys(spark):
    from dataengineerchallenge_spark.queries.dimensions import (
        snapshot_reconcile_daily_users,
    )

    rows = snapshot_reconcile_daily_users(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r["status"] == "added":
            assert r["n_events_prev"] is None and r["n_events_curr"] is not None
        elif r["status"] == "removed":
            assert r["n_events_curr"] is None and r["n_events_prev"] is not None
        elif r["status"] == "changed":
            assert (r["n_events_prev"], r["cents_prev"]) != (
                r["n_events_curr"],
                r["cents_curr"],
            )
        else:
            assert r["status"] == "unchanged"
            assert r["n_events_prev"] == r["n_events_curr"]
            assert r["cents_prev"] == r["cents_curr"]
    # user_id is a key: one verdict per user
    ids = [r["user_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_snapshot_reconcile_plans_full_outer_equi_join(spark):
    from dataengineerchallenge_spark.queries.dimensions import (
        snapshot_reconcile_daily_users,
    )

    plan = snapshot_reconcile_daily_users(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
