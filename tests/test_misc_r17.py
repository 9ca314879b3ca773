"""Round-17 property pins for the analytics/hygiene rungs: funnel
monotonicity, stratified-sample nestedness and quota, HHI bounds, and
association-rule/affinity consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


def test_funnel_counts_monotone(spark):
    """The pre-existing user-level funnel must be monotone and
    non-degenerate on the fixture (progression actually happens)."""
    qs = queries()
    rows = {r["stage"]: r["n_users"] for r in qs["conversion_funnel"](spark, SF_DIR).collect()}
    assert rows["view"] >= rows["click"] >= rows["purchase"] >= 0
    assert rows["purchase"] > 0, "no user completes the funnel — weak fixture"


def test_stratified_sample_nested_and_full_quota(spark):
    qs = queries()
    rows = qs["stratified_sample_docs"](spark, SF_DIR).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        assert len(rs) == 10, (src, len(rs))
        assert sorted(r["draw_rank"] for r in rs) == list(range(1, 11))
    # nestedness: the k=5 sample is exactly draw_rank <= 5 of the k=10 one
    k5 = {(r["source"], r["doc_id"]) for r in rows if r["draw_rank"] <= 5}
    assert all(sum(1 for s, _ in k5 if s == src) == 5 for src in by_src)


def test_hhi_bounds_and_top_share(spark):
    qs = queries()
    for r in qs["event_key_skew_profile"](spark, SF_DIR).collect():
        lo = round(1e6 / r["n_keys"])
        assert lo <= r["hhi_micropoints"] <= 1000000, r
        # top share bounds HHI from above-per-key and below in aggregate
        assert r["top_key_share_micropoints"] * r["n_keys"] >= 1000000, r


def test_association_rules_agree_with_affinity(spark):
    """Every directed rule's undirected pair must appear in
    part_pair_affinity with the same support (shared dataflow)."""
    qs = queries()
    aff = {
        (r["u"], r["v"]): r["supp"]
        for r in qs["part_pair_affinity"](spark, SF_DIR).collect()
    }
    rules = qs["part_association_rules"](spark, SF_DIR).collect()
    assert len(rules) == 2 * len(aff)
    for r in rules:
        key = (
            min(r["antecedent"], r["consequent"]),
            max(r["antecedent"], r["consequent"]),
        )
        assert aff[key] == r["support"], (key, r)
