"""Property-based invariants for the round-16 eval and quantization
operators: the metric cores must agree with independent pure-python
references on ARBITRARY scored samples, not just the hand-built cases.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

# scored sample: (score in a small rational grid to force ties, label)
sample_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 1)),
    min_size=2,
    max_size=30,
).filter(
    lambda rows: 0 < sum(y for _, y in rows) < len(rows)  # both classes
)


def _ref_auc(rows) -> float:
    """Tie-corrected Mann-Whitney AUC by brutal pair counting: a
    concordant pair scores 1, a tied-score pair 0.5."""
    pos = [p for p, y in rows if y == 1]
    neg = [p for p, y in rows if y == 0]
    s = 0.0
    for a in pos:
        for b in neg:
            s += 1.0 if a > b else (0.5 if a == b else 0.0)
    return s / (len(pos) * len(neg))


def _ref_ap(rows) -> float:
    """Step-rule average precision over distinct-score thresholds."""
    from collections import Counter

    cnt = Counter(p for p, _ in rows)
    pos = Counter(p for p, y in rows if y == 1)
    P = sum(pos.values())
    cum_tp = cum_n = 0
    ap = 0.0
    for score in sorted(cnt, reverse=True):
        cum_tp += pos.get(score, 0)
        cum_n += cnt[score]
        ap += pos.get(score, 0) / P * (cum_tp / cum_n)
    return ap


@settings(max_examples=10, deadline=None)
@given(sample_strategy)
def test_auc_matches_pair_counting_reference(spark, rows):
    from dataengineerchallenge_spark.queries.evals import auc_by_group

    df = spark.createDataFrame(
        [("g", p / 8.0, y) for p, y in rows], "grp string, p double, y int"
    )
    got = auc_by_group(df, "grp").collect()[0]["auc_micropoints"]
    want = round(_ref_auc([(p / 8.0, y) for p, y in rows]) * 1_000_000)
    assert abs(got - want) <= 1  # one half-ulp of the micro rounding


@settings(max_examples=10, deadline=None)
@given(sample_strategy)
def test_pr_auc_matches_step_reference(spark, rows):
    from dataengineerchallenge_spark.queries.evals import pr_auc

    df = spark.createDataFrame(
        [("g", p / 8.0, y) for p, y in rows], "grp string, p double, y int"
    )
    got = pr_auc(df).collect()[0]["ap_micropoints"]
    want = round(_ref_ap([(p / 8.0, y) for p, y in rows]) * 1_000_000)
    # the operator integerizes per-threshold terms to nano first, so
    # allow one nano-rounding per threshold to accumulate
    assert abs(got - want) <= 1 + len({p for p, _ in rows})


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(-4, 4), min_size=4, max_size=4),
        min_size=4,
        max_size=12,
    )
)
def test_sq8_quantization_error_bounded(spark, vecs):
    """SQ8 dequantization error per dimension is at most half a
    quantization step ((mx-mn)/255/2) — checked via the registered
    plan's arithmetic on arbitrary small int vectors."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    from dataengineerchallenge_spark.functions.vectors import explode_vectors

    lf = explode_vectors(df, ["vec_id"], "embedding")
    stats = lf.groupBy("pos").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    joined = lf.join(stats, "pos")
    code = F.when(
        F.col("mx") > F.col("mn"),
        F.round((F.col("v") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn"))),
    ).otherwise(0)
    dq = F.when(
        F.col("mx") > F.col("mn"),
        F.col("mn") + code * (F.col("mx") - F.col("mn")) / 255,
    ).otherwise(F.col("mn"))
    rows = joined.select(
        "pos", "v", dq.alias("dq"), (F.col("mx") - F.col("mn")).alias("span")
    ).collect()
    for r in rows:
        assert abs(r["dq"] - r["v"]) <= r["span"] / 255 / 2 + 1e-9
