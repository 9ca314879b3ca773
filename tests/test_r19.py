"""Round-19 pins (VERDICT r18 next-round items):

- ridge regressor: Hadamard exact-fit recovery at λ = 0 (XᵀX = 4I so
  the Cramer solve is integer-valued in IEEE and w = (0, 1, 0, 0)
  bit-exactly — the classifier's closed-form-pin pattern), ridge
  shrinkage w1 = 4/(4+λ) on the same design, both targets trained from
  one register pass, raise-don't-truncate guards (empty frame, singular
  unpenalized collinear fit), and held-out skill: the trained model
  must beat the train-mean baseline MAE on the session-length target.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

_HADAMARD = [
    (1.0, 1.0, 1.0),
    (-1.0, 1.0, -1.0),
    (1.0, -1.0, -1.0),
    (-1.0, -1.0, 1.0),
]


def _hadamard_frame(spark, ycol_from_x1=True):
    """4-row orthogonal design: columns 2-4 of the order-4 Hadamard
    matrix as (x1, x2, x3); ya = x1, yb = x3."""
    rows = [(x1, x2, x3, x1, x3) for (x1, x2, x3) in _HADAMARD]
    return spark.createDataFrame(
        rows, "x1 double, x2 double, x3 double, ya double, yb double"
    )


def test_ridge_hadamard_exact_fit(spark):
    from dataengineerchallenge_spark.queries.regressor import ridge_fit

    wa, wb, mean_a, mean_b = ridge_fit(_hadamard_frame(spark), lam=0.0)
    assert wa == (0.0, 1.0, 0.0, 0.0)
    assert wb == (0.0, 0.0, 0.0, 1.0)
    assert mean_a == 0.0 and mean_b == 0.0


def test_ridge_shrinkage_toward_exact_fit(spark):
    from dataengineerchallenge_spark.queries.regressor import (
        _RG_LAM,
        ridge_fit,
    )

    wa, wb, _, _ = ridge_fit(_hadamard_frame(spark), lam=_RG_LAM)
    # XᵀX = 4I, penalized diag = 4 + λ on k=1..3: Δ1 = 4 / (4 + λ) < 1
    expected = 4.0 / (4.0 + _RG_LAM)
    assert abs(wa[1] - expected) < 1e-12 and 0.0 < wa[1] < 1.0
    assert abs(wb[3] - expected) < 1e-12
    assert wa[0] == wa[2] == wa[3] == 0.0


def test_ridge_empty_frame_raises(spark):
    from dataengineerchallenge_spark.queries.regressor import ridge_fit

    empty = spark.createDataFrame(
        [], "x1 double, x2 double, x3 double, ya double, yb double"
    )
    with pytest.raises(RuntimeError, match="empty"):
        ridge_fit(empty)


def test_ridge_collinear_unpenalized_raises(spark):
    from dataengineerchallenge_spark.queries.regressor import ridge_fit

    # x2 duplicates x1 -> XᵀX singular; only λ = 0 must refuse
    rows = [(x1, x1, x3, x1, x3) for (x1, _, x3) in _HADAMARD]
    frame = spark.createDataFrame(
        rows, "x1 double, x2 double, x3 double, ya double, yb double"
    )
    with pytest.raises(RuntimeError, match="singular"):
        ridge_fit(frame, lam=0.0)
    wa, _, _, _ = ridge_fit(frame)  # penalized solve is well-posed
    assert all(abs(w) < 10.0 for w in wa)


def test_ridge_beats_mean_baseline_on_holdout(spark):
    from dataengineerchallenge_spark.queries.regressor import (
        session_ridge_error_summary,
    )

    rows = {
        r["target"]: r
        for r in session_ridge_error_summary(spark, SF_DIR).collect()
    }
    sess = rows["avg_session_s"]
    assert sess["n_test"] > 0
    assert sess["mae_micro"] < sess["baseline_mae_micro"]


def test_ridge_predictions_cover_holdout_users(spark):
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.regressor import (
        _RG_TRAIN_BUCKETS,
        _rg_feats,
        session_ridge_holdout_predictions,
    )

    preds = session_ridge_holdout_predictions(spark, SF_DIR)
    holdout = _rg_feats(spark, SF_DIR).filter(
        F.col("bucket") >= _RG_TRAIN_BUCKETS
    )
    assert preds.count() == holdout.count()
    assert set(preds.columns) == {
        "user_id",
        "session_s_micro",
        "pred_session_s_micro",
        "unique_urls_micro",
        "pred_unique_urls_micro",
    }
