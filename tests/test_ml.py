"""ML pipeline invariants (D6): deterministic fits, sane predictions,
and better-than-naive accuracy on the held-out split."""

from __future__ import annotations

import math

import pytest

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def _rmse(pairs):
    return math.sqrt(sum((a - p) ** 2 for a, p in pairs) / len(pairs))


def test_load_model_beats_mean_baseline(spark, qs):
    rows = qs["predict_next_minute_load"](spark, SF_DIR).collect()
    assert rows and all(r["predicted_requests"] is not None for r in rows)
    pairs = [(r["n_requests"], r["predicted_requests"]) for r in rows]
    mean_actual = sum(a for a, _ in pairs) / len(pairs)
    model_rmse = _rmse(pairs)
    naive_rmse = _rmse([(a, mean_actual) for a, _ in pairs])
    assert model_rmse <= naive_rmse * 1.05, (model_rmse, naive_rmse)


def test_session_length_predictions_finite_and_deterministic(spark, qs):
    r1 = {r["user_id"]: r["predicted_session_s"] for r in qs["predict_session_length"](spark, SF_DIR).collect()}
    r2 = {r["user_id"]: r["predicted_session_s"] for r in qs["predict_session_length"](spark, SF_DIR).collect()}
    assert r1 == r2  # closed-form solver + hash split: bit-stable
    assert all(math.isfinite(v) for v in r1.values())


def test_unique_urls_predictions_in_plausible_range(spark, qs):
    rows = qs["predict_unique_urls"](spark, SF_DIR).collect()
    assert rows
    # targets are 1..5 distinct event types; a sane linear fit stays nearby
    assert all(-5.0 < r["predicted_unique_urls"] < 15.0 for r in rows)


def test_no_train_test_leakage_in_key_split(spark, qs):
    """Scored users must be exactly the held-out hash buckets."""
    import pyspark.sql.functions as F
    from dataengineerchallenge_spark.ml.features import user_feature_frame

    feats = user_feature_frame(spark, SF_DIR)
    held = {
        str(r["user_id"])
        for r in feats.filter(
            F.pmod(F.xxhash64(F.col("user_id").cast("string")), F.lit(10)) >= 8
        ).collect()
    }
    scored = {str(r["user_id"]) for r in qs["predict_session_length"](spark, SF_DIR).collect()}
    assert scored == held
