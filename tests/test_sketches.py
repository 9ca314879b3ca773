"""Sketch-aggregate accuracy pins (A6): the approximate answers must sit
inside their documented error envelopes vs exact twins computed on the
same fixture — the check that makes rows-only sketch queries trustworthy."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataengineerchallenge_spark.registry import queries
from dataengineerchallenge_spark.sources import load_table
from dataengineerchallenge_spark.queries.sketches import (
    kll_value_quantile_rollup,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_hll_weekly_actives_within_error(spark, qs):
    """lgConfigK=12 → rsd ≈ 1.6%/sqrt-ish; allow 5% (≫3 sigma)."""
    approx = {r["week_s"]: r["approx_users"] for r in qs["hll_weekly_actives"](spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    exact_df = ev.groupBy(
        F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("week_s")
    ).agg(F.countDistinct(F.col("user_id").cast("string")).alias("n"))
    exact = {r["week_s"]: r["n"] for r in exact_df.collect()}
    assert set(approx) == set(exact)
    for wk, n in exact.items():
        assert abs(approx[wk] - n) <= max(1, 0.05 * n), (wk, approx[wk], n)


def test_hll_union_equals_direct_sketch(spark, qs):
    """Mergeability: union of per-day sketches must estimate the same as
    one sketch built directly over the whole week — the contract that
    makes the materialized sketch table valid."""
    ev = load_table(spark, SF_DIR, "events")
    via_union = {
        r["week_s"]: r["approx_users"]
        for r in qs["hll_weekly_actives"](spark, SF_DIR).collect()
    }
    direct_df = ev.groupBy(
        F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("week_s")
    ).agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))), 0)
        .cast("long")
        .alias("approx_users")
    )
    direct = {r["week_s"]: r["approx_users"] for r in direct_df.collect()}
    assert via_union == direct


def test_approx_percentiles_within_rank_error(spark, qs):
    """percentile_approx(accuracy=10000): the approximate quantile must
    land between the exact quantiles at p±1/accuracy-ish rank slack
    (checked loosely via the exact p±0.01 bracket)."""
    approx = {r["event_type"]: r for r in qs["approx_value_percentiles"](spark, SF_DIR).collect()}
    ev = load_table(spark, SF_DIR, "events")
    for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        lo_hi = ev.groupBy("event_type").agg(
            F.expr(f"percentile(value, {max(p - 0.01, 0.0)})").alias("lo"),
            F.expr(f"percentile(value, {min(p + 0.01, 1.0)})").alias("hi"),
        )
        for r in lo_hi.collect():
            a = approx[r["event_type"]][col]
            assert r["lo"] - 1e-9 <= a <= r["hi"] + 1e-9, (r["event_type"], col, a, r["lo"], r["hi"])


def test_kll_rollup_within_rank_error(spark, qs):
    """KLL k=200 → normalized rank error ≈ 1.7%; allow a 5%-rank
    envelope: each estimated quantile must lie between the exact values
    at rank q-0.05 and q+0.05 for its event_type."""
    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in kll_value_quantile_rollup(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    bounds = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"q{int(q * 1000)}")
            for q in (0.45, 0.55, 0.85, 0.95, 0.94, 1.0)
        ]
    )
    exact = {r["event_type"]: r for r in bounds.collect()}
    assert set(approx) == set(exact)
    for et, (p50, p90, p99) in approx.items():
        e = exact[et]
        assert e["q450"] <= p50 <= e["q550"], (et, p50, e["q450"], e["q550"])
        assert e["q850"] <= p90 <= e["q950"], (et, p90, e["q850"], e["q950"])
        assert e["q940"] <= p99 <= e["q1000"], (et, p99, e["q940"], e["q1000"])


def test_kll_merge_equals_direct_sketch(spark, qs):
    """Mergeability: folding per-day sketches must estimate within the
    error envelope of one sketch built directly over all values."""
    ev = load_table(spark, SF_DIR, "events")
    direct = {
        r["event_type"]: r["p50"]
        for r in ev.groupBy("event_type")
        .agg(F.kll_sketch_agg_double("value", F.lit(200)).alias("sk"))
        .select(
            "event_type",
            F.round(F.kll_sketch_get_quantile_double("sk", F.lit(0.5)), 4).alias("p50"),
        )
        .collect()
    }
    via_merge = {
        r["event_type"]: r["p50"]
        for r in kll_value_quantile_rollup(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for et in direct:
        scale = max(1.0, abs(exact[et]))
        assert abs(direct[et] - via_merge[et]) <= 0.1 * scale, (
            et, direct[et], via_merge[et])


def test_cm_never_underestimates_and_bounded(spark, qs):
    """Count-min guarantees: est >= exact for EVERY key (each counter
    only ever adds), and est <= exact + eps*N with prob 1-delta where
    eps = e/w. With w=512 and N=1000 (sf0.001 events) eps*N ~ 5.3; allow
    the full bound on every key and require the typical overestimate to
    be far smaller (collisions spread across 512 buckets)."""
    from dataengineerchallenge_spark.queries.sketches import _CM_W

    rows = qs["cm_heavy_hitters"](spark, SF_DIR).collect()
    assert 1 <= len(rows) <= 20  # sf0.001 has only 15 distinct user_ids
    ev = load_table(spark, SF_DIR, "events")
    n_total = ev.count()
    eps_n = 2.718281828 * n_total / _CM_W
    overs = []
    for r in rows:
        assert r["cm_est"] >= r["exact_n"], (r["user_id"], r["cm_est"], r["exact_n"])
        assert r["cm_est"] - r["exact_n"] <= eps_n, (r["user_id"], r["cm_est"], r["exact_n"])
        overs.append(r["cm_est"] - r["exact_n"])
    assert sum(overs) / len(overs) <= eps_n / 2


def test_cm_cells_merge_parity(spark):
    """Mergeability: per-day cell tables summed per (row, bucket) must be
    cell-for-cell IDENTICAL to the sketch built directly over the whole
    table — counts are algebraic, so the merged sketch is exact, not
    approximate (the property that lets a day-grain sketch table answer
    any rollup)."""
    from dataengineerchallenge_spark.queries.sketches import cm_cells

    ev = load_table(spark, SF_DIR, "events")
    direct = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_cells(ev, "user_id").collect()
    }
    # build per-day cells by filtering per day and summing the cell frames
    days = [r["day_s"] for r in ev.select(
        F.unix_timestamp(F.date_trunc("day", F.col("ts"))).alias("day_s")
    ).distinct().collect()]
    merged: dict = {}
    for d in days[:5]:  # 5 days is enough to exercise the merge
        part = ev.filter(F.unix_timestamp(F.date_trunc("day", F.col("ts"))) == d)
        for r in cm_cells(part, "user_id").collect():
            merged[(r["row"], r["bucket"])] = merged.get((r["row"], r["bucket"]), 0) + r["cnt"]
    rest = ev.filter(
        ~F.unix_timestamp(F.date_trunc("day", F.col("ts"))).isin(days[:5])
    )
    for r in cm_cells(rest, "user_id").collect():
        merged[(r["row"], r["bucket"])] = merged.get((r["row"], r["bucket"]), 0) + r["cnt"]
    assert merged == direct


def test_cm_collisions_synthetic(spark):
    """At 5,000 distinct keys over w=512 buckets collisions are
    guaranteed (pigeonhole ~10 keys/bucket): the estimate must still
    never underestimate, the heavy key must surface exactly, and every
    overestimate must respect the eps*N bound."""
    from dataengineerchallenge_spark.queries.sketches import _CM_W, cm_cells, cm_estimate

    base = spark.range(5000).select(F.col("id").alias("k"))
    heavy = spark.range(500).select(F.lit(123456789).alias("k"))
    df = base.unionAll(heavy)
    cells = cm_cells(df, "k")
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r["k"]: r["cm_est"] for r in cm_estimate(df.select("k").distinct(), "k", cells).collect()}
    n_total = 5500
    eps_n = 2.718281828 * n_total / _CM_W  # ~29
    n_over = 0
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
        assert est[k] - n <= eps_n, (k, est[k], n)
        n_over += est[k] > n
    assert n_over > 0  # collisions actually happened at this density
    top = max(est, key=lambda k: (est[k], -k))
    assert top == 123456789


def test_stream_cm_equals_batch(spark, qs):
    """Stream≡batch: the drained streaming sketch must reproduce the
    batch heavy-hitter rows exactly (cell and key counts are sums, so
    micro-batch slicing cannot change the merged state), and the staged
    payload must actually slice into ≥2 micro-batch files."""
    import glob

    from dataengineerchallenge_spark.queries.sketches import _staged_event_key_stream

    payload = _staged_event_key_stream(spark, SF_DIR)
    assert len(glob.glob(f"{payload}/part-*.parquet")) >= 2
    batch = sorted(map(tuple, qs["cm_heavy_hitters"](spark, SF_DIR).collect()))
    stream = sorted(map(tuple, qs["stream_cm_heavy_hitters"](spark, SF_DIR).collect()))
    assert stream == batch


def test_hll_explicit_estimate_within_published_error(spark):
    """From-scratch HLL (m=256): estimate must land within ~3 sigma of
    the published standard error (1.04/sqrt(m) ~ 6.5%) of the exact
    distinct count for every group."""
    from dataengineerchallenge_spark.queries.sketches import hll_explicit_user_counts

    rows = hll_explicit_user_counts(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rel = abs(r["hll_users"] - r["exact_users"]) / r["exact_users"]
        assert rel < 0.20, (r["event_type"], r["hll_users"], r["exact_users"])


def test_stream_hll_twin_matches_batch(spark):
    """Stream==batch contract for the explicit HLL: per-micro-batch
    max-folded registers must collapse to the batch register table under
    the 4-file replay, so the estimator outputs are identical."""
    import glob

    from dataengineerchallenge_spark.queries.sketches import (
        _staged_event_type_user_stream,
        hll_explicit_user_counts,
        stream_hll_user_counts,
    )

    sf = SF_DIR
    payload = _staged_event_type_user_stream(spark, sf)
    assert len(glob.glob(f"{payload}/part-*")) == 4
    got = sorted(map(tuple, stream_hll_user_counts(spark, sf).collect()))
    want = sorted(map(tuple, hll_explicit_user_counts(spark, sf).collect()))
    assert got == want


# ------------------------------------------------------------- KMV


def _kmv(spark, rows, tmp_path):
    import os

    df = spark.createDataFrame(rows, "event_type string, user_id long, ts timestamp")
    sf = os.path.join(str(tmp_path), "kmvcorp")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from dataengineerchallenge_spark.queries.sketches import kmv_distinct_users

    return {
        r["event_type"]: r.asDict()
        for r in kmv_distinct_users(spark, sf).collect()
    }


def test_kmv_sub_k_group_is_exact(spark, tmp_path):
    # fewer than k=64 distinct members: the sketch IS the set, estimate
    # must fall back to the exact count with zero error
    rows = [("view", u, None) for u in range(1, 11)] * 3
    got = _kmv(spark, rows, tmp_path)
    assert got["view"]["exact_users"] == 10
    assert got["view"]["kmv_users"] == 10.0
    assert got["view"]["rel_err"] == 0.0


def test_kmv_estimator_accuracy_above_k(spark, tmp_path):
    # 5000 distinct users, k=64: Beyer et al.'s (k-1)/R_k estimator has
    # relative std error ~ 1/sqrt(k-2) ~ 0.127; the md5 draw is
    # deterministic so this is a fixed-value pin, with 3-sigma headroom
    rows = [("view", u, None) for u in range(1, 5001)]
    got = _kmv(spark, rows, tmp_path)
    assert got["view"]["exact_users"] == 5000
    assert got["view"]["rel_err"] < 0.38
    assert got["view"]["kmv_users"] != 5000.0  # it IS an estimate


def _kmv_overlap(spark, rows, tmp_path):
    import os

    df = spark.createDataFrame(rows, "event_type string, user_id long, ts timestamp")
    sf = os.path.join(str(tmp_path), "kmvover")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from dataengineerchallenge_spark.queries.sketches import kmv_event_type_overlap

    return {
        (r["type_a"], r["type_b"]): r.asDict()
        for r in kmv_event_type_overlap(spark, sf).collect()
    }


def test_kmv_overlap_sub_k_groups_are_exact(spark, tmp_path):
    # both audiences below k=64: the sketches ARE the sets, so Jaccard,
    # union and overlap all come out exact
    rows = [("view", u, None) for u in range(1, 31)] + [
        ("purchase", u, None) for u in range(21, 41)
    ]
    got = _kmv_overlap(spark, rows, tmp_path)
    r = got[("purchase", "view")]
    assert r["exact_overlap"] == 10 and r["exact_union"] == 40
    assert r["kmv_union"] == 40.0
    assert r["kmv_jaccard"] == 0.25
    assert r["kmv_overlap"] == 10.0


def test_kmv_overlap_estimator_accuracy_above_k(spark, tmp_path):
    # 4000-user audiences with a 2000-user overlap (true J = 1/3,
    # union 6000): k=64 Jaccard std error ~ sqrt(J(1-J)/k) ~ 0.059 and
    # the union estimate carries ~1/sqrt(k-2) ~ 0.127 — generous
    # 3-sigma-ish envelopes on the deterministic md5 draw
    rows = [("view", u, None) for u in range(1, 4001)] + [
        ("purchase", u, None) for u in range(2001, 6001)
    ]
    got = _kmv_overlap(spark, rows, tmp_path)
    r = got[("purchase", "view")]
    assert r["exact_overlap"] == 2000 and r["exact_union"] == 6000
    assert abs(r["kmv_jaccard"] - 1 / 3) < 0.18
    assert abs(r["kmv_union"] - 6000) / 6000 < 0.38
    assert abs(r["kmv_overlap"] - 2000) / 2000 < 0.5
    assert r["kmv_overlap"] != 2000.0  # it IS an estimate


def test_kmv_overlap_disjoint_audiences(spark, tmp_path):
    # zero overlap must estimate zero exactly: no shared hash can enter
    # both sketches, so the merged-sketch match count is structurally 0
    rows = [("view", u, None) for u in range(1, 201)] + [
        ("purchase", u, None) for u in range(1001, 1201)
    ]
    got = _kmv_overlap(spark, rows, tmp_path)
    r = got[("purchase", "view")]
    assert r["exact_overlap"] == 0
    assert r["kmv_jaccard"] == 0.0 and r["kmv_overlap"] == 0.0


def test_stream_kmv_overlap_equals_batch(spark):
    """Slicing invariance: the drained per-epoch bottom-k registers must
    reconstruct exactly the batch sketch, so the online overlap matrix
    equals the batch query row-for-row."""
    from tests.conftest import SF_SMOKE

    from dataengineerchallenge_spark.queries.sketches import (
        kmv_event_type_overlap,
        stream_kmv_overlap,
    )

    batch = {
        (r["type_a"], r["type_b"]): r.asDict()
        for r in kmv_event_type_overlap(spark, SF_SMOKE).collect()
    }
    online = {
        (r["type_a"], r["type_b"]): r.asDict()
        for r in stream_kmv_overlap(spark, SF_SMOKE).collect()
    }
    assert online == batch


def _ams(spark, rows, tmp_path, name):
    import os

    df = spark.createDataFrame(rows, "event_type string, user_id long, ts timestamp")
    sf = os.path.join(str(tmp_path), name)
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from dataengineerchallenge_spark.queries.sketches import ams_f2_user_frequency

    return {
        r["event_type"]: r.asDict()
        for r in ams_f2_user_frequency(spark, sf).collect()
    }


def test_ams_f2_error_envelope_and_exactness(spark, tmp_path):
    # 2000 users, one event each: F2 = 2000. AMS std error ~ F2 *
    # sqrt(2/d) ~ 0.177 * F2 at d=64; the md5 draw is deterministic so
    # this is a fixed-value pin with 3-sigma headroom
    rows = [("view", u, None) for u in range(1, 2001)]
    got = _ams(spark, rows, tmp_path, "ams1")
    assert got["view"]["f2_exact"] == 2000
    assert got["view"]["rel_err"] < 0.53
    assert got["view"]["f2_est"] != 2000.0  # it IS an estimate


def test_ams_f2_prices_skew_quadratically(spark, tmp_path):
    # same event count, one hot user: F2 explodes quadratically while
    # any distinct-count stays flat — the property the sketch exists for
    flat = [("a", u, None) for u in range(1, 101)]
    hot = [("b", 1, None)] * 90 + [("b", u, None) for u in range(2, 12)]
    got = _ams(spark, flat + hot, tmp_path, "ams2")
    assert got["a"]["f2_exact"] == 100
    assert got["b"]["f2_exact"] == 90 * 90 + 10
    # the ESTIMATE must reproduce the same ordering by a wide margin
    assert got["b"]["f2_est"] > 10 * got["a"]["f2_est"]


def test_stream_ams_equals_batch(spark):
    """Linearity: summed per-epoch cells reconstruct the batch sketch
    exactly, so the online estimate equals the batch query row-for-row."""
    from tests.conftest import SF_SMOKE

    from dataengineerchallenge_spark.queries.sketches import (
        ams_f2_user_frequency,
        stream_ams_f2,
    )

    batch = {
        r["event_type"]: r.asDict()
        for r in ams_f2_user_frequency(spark, SF_SMOKE).collect()
    }
    online = {
        r["event_type"]: r.asDict() for r in stream_ams_f2(spark, SF_SMOKE).collect()
    }
    assert online == batch


def test_gk_rank_error_within_guarantee(spark, qs):
    """The GK contract, pinned per row: the summary answers a rank-t
    query from the tuple at ⌈t/s⌉·s, so rank_err ∈ [0, s) and the
    estimate never under-shoots the exact nearest-rank value."""
    rows = qs["gk_value_quantiles"](spark, SF_DIR).collect()
    assert {r["q_bp"] for r in rows} == {5000, 9000, 9500, 9900}
    for r in rows:
        assert 0 <= r["rank_err"] < r["rank_step"], r
        assert r["est_value_cents"] >= r["exact_value_cents"], r
        assert r["summary_rank"] == min(
            r["n_values"],
            -(-r["target_rank"] // r["rank_step"]) * r["rank_step"],
        ), r


def test_gk_closed_form_on_uniform_grid(spark):
    """Hand-built registers with a known closed form: cents 1..997 each
    count 1 gives n=997, s=9; q=0.99 targets rank ⌈987.03⌉=988, the
    summary answers from rank 990 (rank_err 2); q=0.5 targets rank 499,
    answered from 504 (rank_err 5) — both inside the <s guarantee."""
    from dataengineerchallenge_spark.queries.sketches import (
        gk_quantiles_from_cents_counts,
    )

    g = spark.createDataFrame([(c, 1) for c in range(1, 998)], "c long, cnt long")
    got = {r["q_bp"]: r for r in gk_quantiles_from_cents_counts(spark, g).collect()}
    assert got[9900]["target_rank"] == 988
    assert got[9900]["summary_rank"] == 990
    assert got[9900]["est_value_cents"] == 990
    assert got[9900]["exact_value_cents"] == 988
    assert got[9900]["rank_err"] == 2
    assert got[5000]["target_rank"] == 499
    assert got[5000]["est_value_cents"] == 504
    assert got[5000]["exact_value_cents"] == 499
    assert got[5000]["rank_err"] == 5


def test_stream_gk_equals_batch(spark, qs):
    """Stream≡batch: (cent, count) registers are linear, so the drained
    store folds to the batch registers under any slicing; payload must
    slice into ≥2 micro-batch files to make the pin meaningful."""
    import glob

    from dataengineerchallenge_spark.queries.sketches import (
        _staged_event_value_stream,
    )

    payload = _staged_event_value_stream(spark, SF_DIR)
    assert len(glob.glob(f"{payload}/part-*.parquet")) >= 2
    batch = sorted(map(tuple, qs["gk_value_quantiles"](spark, SF_DIR).collect()))
    stream = sorted(
        map(tuple, qs["stream_gk_value_quantiles"](spark, SF_DIR).collect())
    )
    assert stream == batch


def test_gk_weighted_exact_matches_percentile_family(spark, qs):
    """Cross-family consistency: the weighted GK rung's EXACT column
    must select the same datum as token_weighted_quality_percentiles
    at the shared percentiles (50, 90), and the estimate must err
    under the s-token guarantee."""
    gk = {
        r["q_bp"]: r
        for r in qs["gk_token_weighted_quality_quantiles"](spark, SF_DIR).collect()
    }
    twq = {
        r["pct"]: r["token_weighted_quality"]
        for r in qs["token_weighted_quality_percentiles"](spark, SF_DIR).collect()
    }
    for q_bp, pct in ((5000, 50), (9000, 90)):
        assert gk[q_bp]["exact_value_upoints"] == round(twq[pct] * 100000), (
            q_bp,
            gk[q_bp],
            twq[pct],
        )
        assert 0 <= gk[q_bp]["rank_err"] < gk[q_bp]["rank_step"]
        assert gk[q_bp]["est_value_upoints"] >= gk[q_bp]["exact_value_upoints"]


def test_gk_grouped_guarantee_per_type(spark, qs):
    """Every event_type carries its own < s rank-error guarantee, and
    each group's summary equals what the GLOBAL rung would build on
    that group alone (shardability — no cross-group state)."""
    rows = qs["gk_value_quantiles_by_type"](spark, SF_DIR).collect()
    types = {r["event_type"] for r in rows}
    assert len(types) == 5
    for r in rows:
        assert 0 <= r["rank_err"] < r["rank_step"], r
        assert r["est_value_cents"] >= r["exact_value_cents"], r
    from dataengineerchallenge_spark.queries.sketches import (
        gk_quantiles_from_cents_counts,
    )
    from dataengineerchallenge_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events")
    one_type = sorted(types)[0]
    solo = {
        r["q_bp"]: r
        for r in gk_quantiles_from_cents_counts(
            spark,
            ev.filter(F.col("event_type") == one_type)
            .select(F.round(F.col("value") * 100).cast("long").alias("c"))
            .groupBy("c")
            .agg(F.count(F.lit(1)).alias("cnt")),
        ).collect()
    }
    grouped = {
        r["q_bp"]: r for r in rows if r["event_type"] == one_type
    }
    for q in grouped:
        assert grouped[q]["est_value_cents"] == solo[q]["est_value_cents"]
        assert grouped[q]["exact_value_cents"] == solo[q]["exact_value_cents"]
        assert grouped[q]["rank_err"] == solo[q]["rank_err"]
