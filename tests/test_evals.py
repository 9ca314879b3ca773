"""Pins for the classifier-evaluation family (queries/evals.py).

Ground truths below are hand-derived from the textbook definitions the
operators implement (tie-corrected Mann-Whitney ROC-AUC, step-rule
average precision, reliability-bin ECE, Brier MSE) — the same values
sklearn.metrics returns for the same inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.evals import (
    auc_by_group,
    classifier_auc_by_source,
    classifier_brier_ece,
    classifier_pr_auc,
    pr_auc,
    score_calibration_bins,
)

SF_DIR = "/root/testdata/sf0.001"


def _frame(spark, rows):
    return spark.createDataFrame(
        [("g", float(p), int(y)) for p, y in rows], "grp string, p double, y int"
    )


def test_auc_perfect_and_inverted(spark):
    perfect = _frame(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
    assert auc_by_group(perfect, "grp").collect()[0]["auc_micropoints"] == 1_000_000
    inverted = _frame(spark, [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)])
    assert auc_by_group(inverted, "grp").collect()[0]["auc_micropoints"] == 0


def test_auc_with_ties_matches_hand_value(spark):
    # scores: pos at .5 .5 .3 | neg at .5 .1 — average ranks:
    # .1 -> 1; .3 -> 2; the three .5 rows share rank (3+4+5)/3 = 4.
    # R+ = 4 + 4 + 2 = 10; AUC = (10 - 3*4/2) / (3*2) = 4/6 = 0.666667
    rows = [(0.5, 1), (0.5, 1), (0.3, 1), (0.5, 0), (0.1, 0)]
    got = auc_by_group(_frame(spark, rows), "grp").collect()[0]
    assert got["n_pos"] == 3 and got["n_neg"] == 2
    assert got["auc_micropoints"] == 666667


def test_auc_drops_single_class_group(spark):
    rows = _frame(spark, [(0.9, 1), (0.5, 1)])
    assert auc_by_group(rows, "grp").count() == 0


def test_pr_auc_matches_hand_value(spark):
    # thresholds desc: .9 (pos; P=1/1, dR=1/2, term=.5)
    #                  .5 (neg; term 0)
    #                  .3 (pos; P=2/3, dR=1/2, term=1/3)
    # AP = 1/2 + 1/3 = 0.833333  (sklearn average_precision_score agrees)
    rows = _frame(spark, [(0.9, 1), (0.5, 0), (0.3, 1)])
    got = pr_auc(rows).collect()[0]
    assert got["n_pos"] == 2 and got["n_thresholds"] == 3
    assert got["ap_micropoints"] == 833333


def test_calibration_bins_exact_arithmetic(spark):
    df = score_calibration_bins(spark, SF_DIR)
    rows = df.collect()
    assert rows, "no bins"
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0 <= r["n_pos"] <= r["n"]
        # conf is a mean of per-row micro-probabilities inside the bin
        assert r["bin"] * 100_000 <= r["conf_micropoints"] <= (r["bin"] + 1) * 100_000
        assert r["gap_micropoints"] == abs(
            r["acc_micropoints"] - r["conf_micropoints"]
        )
    from dataengineerchallenge_spark.sources.tables import load_table

    assert sum(r["n"] for r in rows) == load_table(spark, SF_DIR, "documents").count()


def test_brier_ece_consistent_with_bins(spark):
    summary = classifier_brier_ece(spark, SF_DIR).collect()[0]
    bins = score_calibration_bins(spark, SF_DIR).collect()
    n = sum(r["n"] for r in bins)
    assert summary["n"] == n
    ece = round(sum(r["n"] * r["gap_micropoints"] for r in bins) / n)
    assert summary["ece_micropoints"] == ece
    # scores sit far from their labels on this weak scorer: Brier must be
    # in (0, 1) strictly and dominated by the label term (p is tiny)
    assert 0 < summary["brier_micropoints"] < 1_000_000


def test_registered_auc_query_bounds(spark):
    rows = classifier_auc_by_source(spark, SF_DIR).collect()
    assert len(rows) == 20  # every fixture source has both classes
    for r in rows:
        assert 0 <= r["auc_micropoints"] <= 1_000_000
    ap = classifier_pr_auc(spark, SF_DIR).collect()[0]
    base_rate = sum(r["n_pos"] for r in rows) / sum(
        r["n_pos"] + r["n_neg"] for r in rows
    )
    # AP of any classifier is >= the positive base rate is NOT a theorem,
    # but AP must exceed 0 and at most 1; pin the sane envelope plus that
    # the weak scorer beats a 0-signal floor of base_rate/2.
    assert 0 < ap["ap_micropoints"] <= 1_000_000
    assert ap["ap_micropoints"] > base_rate / 2 * 1_000_000


def test_stream_brier_ece_equals_batch(spark):
    """The drained linear-register scorecard must equal the batch
    computation exactly (bin tallies add under any stream slicing)."""
    from dataengineerchallenge_spark.queries.evals import (
        stream_classifier_brier_ece,
    )

    batch = classifier_brier_ece(spark, SF_DIR).collect()[0]
    online = stream_classifier_brier_ece(spark, SF_DIR).collect()[0]
    assert tuple(batch) == tuple(online)


def test_stream_auc_equals_batch(spark):
    from dataengineerchallenge_spark.queries.evals import stream_classifier_auc

    batch = sorted(tuple(r) for r in classifier_auc_by_source(spark, SF_DIR).collect())
    online = sorted(tuple(r) for r in stream_classifier_auc(spark, SF_DIR).collect())
    assert batch == online


def test_stream_pr_auc_equals_batch(spark):
    from dataengineerchallenge_spark.queries.evals import (
        stream_classifier_pr_auc,
    )

    batch = tuple(classifier_pr_auc(spark, SF_DIR).collect()[0])
    online = tuple(stream_classifier_pr_auc(spark, SF_DIR).collect()[0])
    assert batch == online
