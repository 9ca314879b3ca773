"""Round-14 pins (VERDICT r13 next-round #1/#3/#5 + ADVICE):

- dup_span_doc_frame closed forms — a planted repeated 5-gram corpus
  with hand-computed coverage counts and trimmed text (the r13 query
  shipped with zero committed pytest evidence, ADVICE r13 #1);
- the gram-HASH shuffle shape must be bit-identical to the string-keyed
  plan (the lossless-superset argument, verified on data);
- the two new explicit-family incremental rungs (bigbatch shuffle-mode,
  second-delivery against the committed store) must equal the
  broadcast-mode explicit rung pair-for-pair — one oracle, three plans;
- star-CC rewiring: the dedup clustering backbone now runs
  large-star/small-star contraction; converged stats flag + the
  non-convergence RuntimeError (ADVICE r13 #2).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators import dedup as D
from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


# --- dup_span_doc_frame closed forms -------------------------------------


_SPAN_CORPUS = [
    # docs 1 and 2 share exactly one positional 5-gram: "a b c d e"
    # (doc 1 start 0, doc 2 start 2); every other gram is unique.
    (1, "a b c d e f g h"),
    (2, "x y a b c d e z"),
    # no gram shared with anyone
    (3, "p q r s t u"),
    # shorter than the gram width: no grams, untrimmed, fraction 0
    (4, "hi there"),
]

_SPAN_EXPECT = {
    # doc: (n_words, n_dup_grams, covered_words, dup_fraction, trimmed)
    1: (8, 1, 5, 0.625, "f g h"),
    2: (8, 1, 5, 0.625, "x y z"),
    3: (6, 0, 0, 0.0, "p q r s t u"),
    4: (2, 0, 0, 0.0, "hi there"),
}


@pytest.mark.parametrize("hash_grams", [False, True])
def test_dup_span_closed_forms(spark, hash_grams):
    df = spark.createDataFrame(_SPAN_CORPUS, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in D.dup_span_doc_frame(
            df, "doc_id", "text", n=5, min_docs=2, hash_grams=hash_grams
        ).collect()
    }
    assert out.keys() == _SPAN_EXPECT.keys()
    for doc, (nw, ndup, ncov, frac, trimmed) in _SPAN_EXPECT.items():
        r = out[doc]
        assert r["n_words"] == nw
        assert r["n_dup_grams"] == ndup
        assert r["covered_words"] == ncov
        assert r["dup_fraction"] == pytest.approx(frac, abs=1e-4)
        assert r["trimmed_text"] == trimmed


def test_dup_span_overlapping_grams_merge_coverage(spark):
    """Two overlapping duplicated grams cover the union of their spans,
    not the sum: docs sharing a 6-word run have two positional 5-grams
    in common whose spans overlap in 4 positions."""
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.dup_span_doc_frame(df, "doc_id", "text", n=5, min_docs=2).collect()
    }
    for doc in (1, 2):
        assert out[doc]["n_dup_grams"] == 2  # starts 0 and 1
        assert out[doc]["covered_words"] == 6  # union, not 10
        assert out[doc]["dup_fraction"] == pytest.approx(1.0)
        assert out[doc]["trimmed_text"] == ""
    assert out[3]["covered_words"] == 0


def test_dup_span_hashed_equals_string_keyed_on_fixture(spark, qs):
    """The 8-byte-key plan must reproduce the string-keyed plan
    bit-for-bit on real data (both registered rungs also share one
    DuckDB oracle in the sweep)."""
    a = {tuple(r) for r in qs["dup_span_trim_docs"](spark, SF_DIR).collect()}
    b = {tuple(r) for r in qs["dup_span_trim_docs_hashed"](spark, SF_DIR).collect()}
    assert a == b and len(a) > 0


# --- explicit incremental rungs: one oracle, three plans ------------------


def test_explicit_bigbatch_and_second_delivery_match_broadcast_rung(spark, qs):
    """Mode flip (broadcast → bucketed-SMJ shuffle) and store lifecycle
    (append-commit, then delivery N+1) must not change a single pair:
    all three rungs answer the same question of the same corpus."""
    broadcast = {
        tuple(r)
        for r in qs["near_dup_incremental_minhash_explicit"](spark, SF_DIR).collect()
    }
    bigbatch = {
        tuple(r)
        for r in qs["near_dup_incremental_minhash_bigbatch_explicit"](
            spark, SF_DIR
        ).collect()
    }
    second = {
        tuple(r)
        for r in qs["near_dup_second_delivery_minhash_explicit"](
            spark, SF_DIR
        ).collect()
    }
    assert broadcast == bigbatch == second
    assert len(broadcast) > 0


# --- star-CC rewiring + convergence contract ------------------------------


def test_near_dup_clusters_run_star_contraction(spark, qs):
    """The rewired backbone must produce the same labeling contract as
    before (component = min doc_id; singletons label themselves)."""
    rows = qs["near_dup_clusters"](spark, SF_DIR).collect()
    assert rows
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_span_bench_artifact_byte_cut_and_parity():
    """Artifact-gated (BENCH_dedup.json span_*): the gram-hash plan must
    be output-identical and must actually cut shuffle-write bytes — the
    claim is a network-IO lever, so the byte counters are the contract
    (local wall time is allowed to lag; see OBSERVATIONS)."""
    import json
    import os

    import pytest

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_dedup.json",
    )
    if not os.path.exists(path):
        pytest.skip("BENCH_dedup.json not generated on this machine")
    spans = {
        k: v
        for k, v in json.load(open(path))["results"].items()
        if k.startswith("span_")
    }
    if not spans:
        pytest.skip("no span rungs in BENCH_dedup.json yet")
    for k, v in spans.items():
        assert v["parity"] is True, k
        assert v["key_byte_cut"] >= 2.0, k
    # regime split since the r15 size-adaptive cand_mode: a rung whose
    # candidate-key set fits the broadcast budget keeps the strict
    # shuffle-byte win; past the budget the auto attach degrades to a
    # second shuffle (more bytes by design — the graceful-degrade ADVICE
    # fix) and the contract becomes the WALL-TIME crossover instead
    # (BENCH_dedup notes.span_crossover): at the biggest rung the hashed
    # plan must not lose.
    assert any(
        v["hashed_shuffle_write_bytes"] < v["string_shuffle_write_bytes"]
        for v in spans.values()
    ), "no rung demonstrates the broadcast-regime byte cut"
    biggest = max(spans.values(), key=lambda v: v["corpus"])
    if biggest["hashed_shuffle_write_bytes"] < biggest["string_shuffle_write_bytes"]:
        assert biggest["shuffle_byte_cut"] >= 1.5
    else:
        assert biggest["hashed_s"] <= biggest["string_s"], (
            "shuffle-attach regime must win wall time at the biggest rung"
        )


def test_winnow_guarantee_and_isolation(spark):
    """The winnowing contract (Schleimer et al. SIGMOD'03): two docs
    sharing a run of >= w+k-1 words (8 at k=4, w=5) MUST share a
    fingerprint hash; docs with no shared 4-gram must share none."""
    from dataengineerchallenge_spark.operators.dedup import (
        winnow_fingerprint_frame,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh i1 i2 i3 i4 i5 i6"),
            (2, "z1 z2 z3 z4 aa bb cc dd ee ff gg hh y1 y2"),
            (3, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"),
        ],
        "doc_id long, text string",
    )
    by: dict = {}
    for r in winnow_fingerprint_frame(docs, "doc_id", "text", k=4, w=5).collect():
        by.setdefault(r["doc_id"], set()).add(r["gram_hash"])
    assert by[1] & by[2], "shared 8-word run must yield a shared fingerprint"
    assert not (by[1] & by[3]) and not (by[2] & by[3])


def test_winnow_density_and_short_docs(spark):
    """Selected density sits around the published 2/(w+1); a doc with
    >= k but < k+w-1 words still winnows its single truncated window;
    a doc shorter than k words yields nothing."""
    import random

    from dataengineerchallenge_spark.operators.dedup import (
        winnow_fingerprint_frame,
    )

    random.seed(14)
    long_doc = " ".join(f"w{random.randrange(5000)}" for _ in range(200))
    docs = spark.createDataFrame(
        [(1, long_doc), (2, "a b c d e"), (3, "too short")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprint_frame(docs, "doc_id", "text", k=4, w=5)
    by: dict = {}
    for r in fps.collect():
        by.setdefault(r["doc_id"], []).append(r["pos"])
    n_grams = 200 - 3
    density = len(by[1]) / n_grams
    assert 0.15 <= density <= 0.55, density  # 2/(w+1) = 0.33 ± slack
    assert len(by.get(2, [])) >= 1  # truncated single window
    assert 3 not in by  # no grams at all


def test_star_cc_reports_convergence_and_raises_when_capped(spark):
    from dataengineerchallenge_spark.operators.graph import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 300)], "src long, dst long"
    )
    stats: dict = {}
    out = connected_components_star(chain, stats=stats)
    assert stats["converged"] is True
    assert out.count() == 300
    # a 2-round cap cannot contract a 300-node chain: incorrect labels
    # must never be returned silently (ADVICE r13 #2)
    stats2: dict = {}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(chain, max_rounds=2, stats=stats2)
    assert stats2 == {"rounds": 2, "converged": False}


# ------------------------------------------------- sorted neighborhood


def _snm_pairs(spark, rows, window=2, n_ranges=4):
    from dataengineerchallenge_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted_neighborhood_pairs(
        df, "doc_id", F.lower(F.substring("text", 1, 40)), window=window,
        n_ranges=n_ranges,
    )
    return {(r["id_a"], r["id_b"]): r["rank_gap"] for r in got.collect()}


def test_snm_window_closed_form(spark):
    # sort order by 40-char lowercase prefix then id:
    #   3:"aaa ..." < 1:"aab ..." < 4:"aab ..." (id tiebreak) < 2:"zzz"
    # window=2 pairs by rank: (3,1)=1 (3,4)=2 (1,4)=1 (1,2)=2 (4,2)=1
    rows = [
        (1, "aab x y"),
        (2, "zzz p q"),
        (3, "aaa x y"),
        (4, "aab x z"),
    ]
    got = _snm_pairs(spark, rows, window=2)
    assert got == {(3, 1): 1, (3, 4): 2, (1, 4): 1, (1, 2): 2, (4, 2): 1}


def test_snm_rank_is_partition_count_invariant(spark):
    # the distributed two-level rank must equal the single-range global
    # rank — identical candidate sets at any partitioning
    rows = [(i, f"doc {i % 7:03d} body {i}") for i in range(60)]
    one = _snm_pairs(spark, rows, window=3, n_ranges=1)
    many = _snm_pairs(spark, rows, window=3, n_ranges=16)
    assert one == many and len(one) == 3 * 60 - (1 + 2 + 3)
