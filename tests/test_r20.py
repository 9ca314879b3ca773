"""Round-20 pins (VERDICT r19 next-round items):

- filtered ANN serve: every served row passes the metadata predicate
  (both strategies), and the recall-vs-selectivity crossover holds —
  post-filter (widened probes + exact rerank) wins recall when the
  filter passes most of the corpus, pre-filter (predicate pushed into
  the list scan) wins — and starves less — when the filter is tight.
  Recall is measured against the FILTERED exact top-k, the ground
  truth a filtered search owes (BENCH_annfilter.json prices the same
  sweep at sf0.1).
- filtered ∘ retracted composition: tombstoned vectors never surface
  from the filtered serve, and every survivor passes the predicate.
- streaming load-ridge twin: drained register fold ≡ batch weights
  bit-for-bit (the session twin's pin, on the time axis).
- ridge register headroom guard: a register beyond the int64 bound
  raises a described error instead of truncating (ADVICE r19).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def _exact_filtered_topk(spark, pred):
    """Brute-force cosine top-k over the predicate-passing corpus for
    the fresh batch — the bench tool's ground truth, inlined."""
    from dataengineerchallenge_spark.functions import vectors as V
    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _TOP_K,
        _annfilt_allowed,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(
        (F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    cand = emb.join(_annfilt_allowed(spark, SF_DIR, pred), "vec_id", "left_semi")
    pairs = F.broadcast(q).join(cand, F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        "vec_id",
        V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .select("query_id", "vec_id")
        .collect()
    )


def _recall(served_rows, exact_rows):
    ex: dict = {}
    for r in exact_rows:
        ex.setdefault(r["query_id"], set()).add(r["vec_id"])
    sv: dict = {}
    for r in served_rows:
        sv.setdefault(r["query_id"], set()).add(r["vec_id"])
    num = sum(len(sv.get(q, set()) & s) for q, s in ex.items())
    den = sum(len(s) for s in ex.values())
    return num / den


def _allowed_ids(spark, pred):
    from dataengineerchallenge_spark.queries.vectors import _annfilt_allowed

    return {r["vec_id"] for r in _annfilt_allowed(spark, SF_DIR, pred).collect()}


def test_filtered_serves_respect_predicate(spark, qs):
    """Both registered strategies: every served vec_id passes the
    medium-tier predicate — the contract a filtered search owes before
    any recall conversation."""
    from dataengineerchallenge_spark.queries.vectors import _ANNFILT_PRED

    allowed = _allowed_ids(spark, _ANNFILT_PRED)
    for name in ("ivf_pq_serve_filtered_topk", "ivf_pq_serve_postfiltered_topk"):
        rows = qs[name](spark, SF_DIR).collect()
        assert rows, name
        assert all(r["vec_id"] in allowed for r in rows), name


def test_annfilter_recall_crossover(spark):
    """The filtered-ANN crossover, pinned where it is deterministic:
    post-filter's widened-probe + exact-rerank wins recall at HIGH
    selectivity (most of the corpus passes, so its candidates rarely
    starve and the rerank buys back ADC error), while at LOW
    selectivity the post-filter candidate set starves (fewer served
    rows than pre-filter) and pre-filter's recall is at least its
    equal. Measured: sf0.001 high pre 0.08 / post 0.42, low pre 0.28
    (40 rows) / post 0.28 (24 rows); sf0.1 high 0.04/0.10, low
    0.18/0.10 — the same ordering both scales."""
    from dataengineerchallenge_spark.queries.vectors import (
        _ANNFILT_PRED_HIGH,
        _ANNFILT_PRED_LOW,
        _postfiltered_serve,
        _prefiltered_serve,
    )

    # high selectivity: post-filter dominates recall, nobody starves
    exact_hi = _exact_filtered_topk(spark, _ANNFILT_PRED_HIGH)
    pre_hi = _prefiltered_serve(spark, SF_DIR, _ANNFILT_PRED_HIGH).collect()
    post_hi = _postfiltered_serve(spark, SF_DIR, _ANNFILT_PRED_HIGH).collect()
    assert _recall(post_hi, exact_hi) > _recall(pre_hi, exact_hi)
    assert len(post_hi) == len(pre_hi)

    # low selectivity: post-filter starves (strictly fewer rows served)
    # and pre-filter recall is at least post's
    exact_lo = _exact_filtered_topk(spark, _ANNFILT_PRED_LOW)
    pre_lo = _prefiltered_serve(spark, SF_DIR, _ANNFILT_PRED_LOW).collect()
    post_lo = _postfiltered_serve(spark, SF_DIR, _ANNFILT_PRED_LOW).collect()
    assert len(pre_lo) > len(post_lo)
    assert _recall(pre_lo, exact_lo) >= _recall(post_lo, exact_lo)


def test_filtered_retracted_composition(spark, qs):
    """The composed rung keeps the lifecycle closed: no tombstoned
    vec_id (the shared % 10 takedown rule) surfaces from the filtered
    serve, every survivor passes the predicate, and the result is
    exactly the pre-filtered serve with tombstoned rows removed and
    the per-query cut re-taken (the anti-join commutes with the
    semi-join; both are row filters on the candidate side)."""
    from dataengineerchallenge_spark.queries.vectors import _ANNFILT_PRED

    allowed = _allowed_ids(spark, _ANNFILT_PRED)
    rows = qs["ivf_pq_serve_filtered_retracted_topk"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["vec_id"] % 10 != 0
        assert r["vec_id"] in allowed
    # tombstone-surviving prefix of the plain filtered serve must be a
    # subset of the composed serve (the composed cut can only promote
    # rows deeper than the plain top-k, never drop a surviving one)
    plain = qs["ivf_pq_serve_filtered_topk"](spark, SF_DIR).collect()
    composed = {(r["query_id"], r["vec_id"]) for r in rows}
    for r in plain:
        if r["vec_id"] % 10 != 0:
            assert (r["query_id"], r["vec_id"]) in composed


def test_stream_load_ridge_weights_equal_batch(spark, qs):
    """Drained 14-register fold ≡ batch weights bit-for-bit — the
    session twin's pin on the time axis. Both rungs share the oracle,
    so this also proves the stream twin hash-green by transitivity."""
    batch = {
        (r["target"]): (r["w0_nano"], r["w1_nano"], r["w2_nano"], r["w3_nano"])
        for r in qs["next_minute_load_ridge"](spark, SF_DIR).collect()
    }
    stream = {
        (r["target"]): (r["w0_nano"], r["w1_nano"], r["w2_nano"], r["w3_nano"])
        for r in qs["stream_next_minute_load_ridge"](spark, SF_DIR).collect()
    }
    assert batch == stream == {"n_requests": stream["n_requests"]}


def test_ridge_register_bound_raises():
    """ADVICE r19: a collected moment register beyond the int64
    headroom bound must raise a described error, never truncate."""
    from dataengineerchallenge_spark.queries.regressor import (
        _RG_REG_BOUND,
        _RG_REG_NAMES,
        ridge_solve,
    )

    row = {n: 1 for n in _RG_REG_NAMES}
    row["h00"] = _RG_REG_BOUND + 1
    with pytest.raises(RuntimeError, match="headroom"):
        ridge_solve(row)
