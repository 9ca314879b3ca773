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


def test_es_weighted_sample_is_exact_k_biased_and_deterministic(spark):
    """Efraimidis-Spirakis sampler: exact k, weight-proportional
    inclusion (heavy group overrepresented on a strong 100:1 weight
    split), partitioning-invariant."""
    from dataengineerchallenge_spark.queries.mixing import es_weighted_sample

    rows = [(i, 100.0 if i < 100 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = es_weighted_sample(df, "doc_id", "w", 100).collect()
    assert len(out) == 100
    assert sorted(r["sel_rank"] for r in out) == list(range(1, 101))
    heavy = sum(1 for r in out if r["doc_id"] < 100)
    # uniform sampling would include ~10 heavy docs; weight 100:1 must
    # pull in the vast majority of the heavy group
    assert heavy > 60
    # same sample whatever the physical partitioning
    again = es_weighted_sample(df.repartition(7), "doc_id", "w", 100).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


def test_weighted_sample_query_plans_topk_not_global_sort(spark):
    from dataengineerchallenge_spark.queries.mixing import weighted_sample_docs

    df = weighted_sample_docs(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stream_mad_twin_matches_batch(spark):
    """Stream==batch contract: the foreachBatch-folded hour store must
    merge to exactly the batch anomaly set regardless of slicing (the
    payload stages 4 files -> 4 micro-batches at maxFilesPerTrigger=1)."""
    import glob

    from dataengineerchallenge_spark.queries.analytics import (
        _staged_event_hour_stream,
        hourly_load_anomalies_mad,
        stream_hourly_anomalies_mad,
    )

    payload = _staged_event_hour_stream(spark, SF_SMOKE)
    assert len(glob.glob(f"{payload}/part-*")) == 4
    got = sorted(map(tuple, stream_hourly_anomalies_mad(spark, SF_SMOKE).collect()))
    want = sorted(map(tuple, hourly_load_anomalies_mad(spark, SF_SMOKE).collect()))
    assert got == want


def test_forecast_backtest_closed_form(spark, tmp_path):
    """Perfectly daily-periodic series: seasonal-naive is exact (MAE 0)
    while naive pays the hour-to-hour swing — hand-computed."""
    import datetime as dt
    import os

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 days, hourly pattern: hour h gets (h % 4) + 1 events
    for day in range(3):
        for hour in range(24):
            for _ in range((hour % 4) + 1):
                rows.append(
                    (eid, base + dt.timedelta(days=day, hours=hour, minutes=5),
                     1, "view", 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "fc")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from dataengineerchallenge_spark.queries.analytics import (
        forecast_backtest_hourly_load,
    )

    got = {
        r["model"]: r for r in forecast_backtest_hourly_load(spark, sf).collect()
    }
    # eval window: hours 24..71 (48 points)
    assert got["seasonal_naive"]["n_eval_points"] == 48
    assert got["seasonal_naive"]["mae"] == 0.0
    assert got["seasonal_naive"]["mase_vs_naive"] == 0.0
    # naive errors cycle |y(t) - y(t-1)| over the pattern 1,2,3,4 ->
    # diffs 1,1,1 then the 4->1 drop of 3: per 4 hours sum = 6, MAE 1.5
    assert got["naive"]["mae"] == 1.5
    assert got["naive"]["mase_vs_naive"] == 1.0


def test_autocorrelation_detects_daily_cycle(spark, tmp_path):
    """A perfectly daily-periodic series: acf(24) = 1.0 exactly; acf(1)
    far below; and a constant-rate series has an undefined/zero-variance
    guard exercised by construction (non-constant here)."""
    import datetime as dt
    import os

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(5):
        for hour in range(24):
            for _ in range((hour % 6) + 1):
                rows.append(
                    (eid, base + dt.timedelta(days=day, hours=hour, minutes=1),
                     1, "view", 1.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "acf")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from dataengineerchallenge_spark.queries.analytics import (
        hourly_load_autocorrelation,
    )

    got = {
        r["lag"]: r for r in hourly_load_autocorrelation(spark, sf).collect()
    }
    assert got[24]["acf_micropoints"] == 1000000  # exact daily period
    assert got[24]["n_pairs"] == 5 * 24 - 24
    assert got[1]["acf_micropoints"] < 900000  # the hour-to-hour saw decays
    # 5-day series has no 168h pairs... it does: 120 - 168 < 0 -> absent
    assert 168 not in got
