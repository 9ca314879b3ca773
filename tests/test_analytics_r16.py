"""Round-16 analytics pins: the additive seasonal decomposition."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.analytics import (
    hourly_load_seasonal_decomposition,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stl_components_add_back_exactly(spark):
    df = hourly_load_seasonal_decomposition(spark, SF_DIR)
    bad = df.filter(
        F.col("y") * 1000000
        != F.col("trend_micropoints")
        + F.col("seasonal_micropoints")
        + F.col("remainder_micropoints")
    ).count()
    assert bad == 0


def test_stl_seasonal_is_centered_and_daily(spark):
    rows = hourly_load_seasonal_decomposition(spark, SF_DIR).collect()
    # exactly one seasonal value per hour-of-day, and the 24 values
    # re-center to ~0 (within 24 half-ulps of the micro rounding)
    by_hod = {}
    for r in rows:
        hod = (r["hour_s"] // 3600) % 24
        by_hod.setdefault(hod, set()).add(r["seasonal_micropoints"])
    assert all(len(v) == 1 for v in by_hod.values())
    assert len(by_hod) == 24
    total = sum(next(iter(v)) for v in by_hod.values())
    assert abs(total) <= 24


def test_stl_trims_boundary_half_windows(spark):
    # the centered 2x24 MA is undefined for the first/last 12 hours:
    # 696 interior rows on a 720-hour fixture month
    n = hourly_load_seasonal_decomposition(spark, SF_DIR).count()
    assert n == 696


def test_changepoint_finds_exact_step(spark):
    """A clean step series (20 hours at 5/hr then 30 at 11/hr) must
    split exactly at the step with the true segment means."""
    from dataengineerchallenge_spark.queries.analytics import (
        changepoint_from_series,
    )

    rows = [(3600 * i, 5 if i < 20 else 11) for i in range(50)]
    d = spark.createDataFrame(rows, "hour_s long, y long")
    r = changepoint_from_series(d).collect()[0]
    assert r["n_left"] == 20 and r["n_right"] == 30
    assert r["split_hour_s"] == 3600 * 19
    assert r["mean_left_micropoints"] == 5_000_000
    assert r["mean_right_micropoints"] == 11_000_000
    assert r["reduction_micropoints"] > 0


def test_changepoint_constant_series_zero_reduction(spark):
    from dataengineerchallenge_spark.queries.analytics import (
        changepoint_from_series,
    )

    d = spark.createDataFrame(
        [(3600 * i, 7) for i in range(30)], "hour_s long, y long"
    )
    r = changepoint_from_series(d).collect()[0]
    assert r["reduction_micropoints"] == 0
    # tie on R == 0 everywhere -> earliest hour wins deterministically
    assert r["split_hour_s"] == 0


def test_changepoint_fixture_mass_balance(spark):
    from dataengineerchallenge_spark.queries.analytics import (
        hourly_load_changepoint,
    )

    r = hourly_load_changepoint(spark, SF_DIR).collect()[0]
    total_mp = (
        r["n_left"] * r["mean_left_micropoints"]
        + r["n_right"] * r["mean_right_micropoints"]
    )
    n = r["n_left"] + r["n_right"]
    # segment means recombine to the global mean within rounding slack
    from dataengineerchallenge_spark.sources.tables import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    assert abs(total_mp / n - n_events * 1_000_000 / n) < 1_000


def test_psi_nonnegative_and_partitions_events(spark):
    """Every PSI term (x−y)·ln(x/y) is nonnegative, so the sum must be;
    and the two epoch halves must partition the events exactly."""
    from dataengineerchallenge_spark.queries.analytics import (
        event_value_psi_drift,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    rows = event_value_psi_drift(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["psi_micropoints"] >= 0
    total = sum(r["n_first_half"] + r["n_second_half"] for r in rows)
    assert total == load_table(spark, SF_DIR, "events").count()


def test_negative_samples_never_positive(spark):
    from dataengineerchallenge_spark.queries.mixing import (
        purchase_negative_samples,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    negs = purchase_negative_samples(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    pos = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        F.col("o_custkey").alias("custkey"),
        F.col("l_partkey").alias("neg_partkey"),
    )
    assert negs.join(pos, ["custkey", "neg_partkey"], "left_semi").count() == 0
    per_user = negs.groupBy("custkey").count().collect()
    assert all(r["count"] <= 3 for r in per_user)
    # valid item domain and no duplicate negative per user
    n_parts = load_table(spark, SF_DIR, "part").count()
    assert negs.filter(
        (F.col("neg_partkey") < 0) | (F.col("neg_partkey") >= n_parts)
    ).count() == 0
    assert (
        negs.groupBy("custkey", "neg_partkey").count().filter("count > 1").count()
        == 0
    )


def test_stream_psi_equals_batch(spark):
    """Frozen-reference streaming PSI must equal the batch half-split
    computation row-for-row (linear bin registers drain to the batch
    table under any slicing)."""
    from dataengineerchallenge_spark.queries.analytics import (
        event_value_psi_drift,
        stream_event_value_psi,
    )

    batch = sorted(
        tuple(r) for r in event_value_psi_drift(spark, SF_DIR).collect()
    )
    online = sorted(
        tuple(r) for r in stream_event_value_psi(spark, SF_DIR).collect()
    )
    assert batch == online


def test_quantile_normalization_contract(spark):
    """Within each source the mapping is monotone; each source's top
    rank maps to the GLOBAL max (ceil(n_s*N/n_s) = N); and normalized
    values are drawn from the global value multiset."""
    from dataengineerchallenge_spark.queries.mixing import (
        source_quantile_normalize_length,
    )

    rows = source_quantile_normalize_length(spark, SF_DIR).collect()
    assert len(rows) == 500
    global_max = max(r["n_chars"] for r in rows)
    global_values = {r["n_chars"] for r in rows}
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(
            (r["n_chars"], r["doc_id"], r["normalized_chars"])
        )
    for vals in by_src.values():
        vals.sort()
        norms = [v[2] for v in vals]
        assert norms == sorted(norms)  # monotone
        assert norms[-1] == global_max
        assert all(n in global_values for n in norms)
