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
- spectral profile / quadrants: K_m closed form (both deflated
  directions read λ̂ = m bit-for-bit on the 1e-6 grid), the 4-clique
  chain's two-eigenpair structure (quadrants recover all four blocks;
  direction 1 splits halves, direction 2 ends-vs-middle), and the
  sf0.01 conductance readout (quadrants refine the bipartition
  exactly; every quadrant < 0.5 while the 2-way cut is 0.28).
- betweenness accuracy-vs-pivots: doubling the pivot budget improves
  rank accuracy vs exact all-sources Brandes, and the integer-grid
  scores rank exactly like the float estimator (rho = 1.0).
- filtered rerank composition: the pre-filter + exact-rerank rung's
  recall dominance over the plain pre-filter is structural (exact
  ordering over a candidate superset), pinned per selectivity tier.
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


def _km_edges(spark, m):
    """Complete graph K_m, symmetric edge list."""
    rows = [(a, b) for a in range(m) for b in range(m) if a != b]
    return spark.createDataFrame(rows, "src long, dst long")


def test_spectral_profile_km_exact_eigenvalue(spark):
    """On K_m every zero-sum vector is an exact Laplacian eigenvector
    with eigenvalue m, and both deflated directions live in that
    subspace up to renorm floor error |Σx| < n — so the Rayleigh
    readout λ̂ = m − (Σx)²/xᵀx rounds to m on the 1e-6 grid
    bit-for-bit (the closed-form pin the profile rung's docstring
    promises)."""
    from dataengineerchallenge_spark.queries.graph import (
        _sb_lambda_text,
        _sb_rayleigh,
        spectral_second_direction,
        spectral_smoothing,
    )

    m = 6
    e = _km_edges(spark, m)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    degc = deg.localCheckpoint()
    c = 2 * (m - 1)
    lam = _sb_lambda_text(str(c))
    x1 = spectral_smoothing(spark, e)
    x2 = spectral_second_direction(spark, e, x1)
    for x in (x1, x2):
        row = (
            _sb_rayleigh(x, e, degc, c)
            .select(F.expr(lam).alias("l"))
            .collect()[0]
        )
        assert row["l"] == m * 1_000_000


def _clique_chain_edges(spark, k=4, cliques=4):
    """Path of `cliques` K_k blocks bridged tail-to-head — the
    two-eigenpair closed-form graph: v2 splits (A,B | C,D), v3 splits
    (A,D | B,C), so the quadrant labels separate all four blocks."""
    rows = []
    for ci in range(cliques):
        base = ci * k
        for a in range(k):
            for b in range(a + 1, k):
                rows += [(base + a, base + b), (base + b, base + a)]
    for ci in range(cliques - 1):
        u, v = ci * k + k - 1, (ci + 1) * k
        rows += [(u, v), (v, u)]
    return rows


def test_spectral_quadrants_recover_clique_chain(spark):
    """4-clique chain: within-block signs are uniform in BOTH
    directions, the four (sign1, sign2) quadrant labels are all
    distinct, direction 1 groups the chain halves (A,B | C,D) and
    direction 2 groups ends-vs-middle (A,D | B,C) — the known
    two-eigenpair structure of a path quotient."""
    from dataengineerchallenge_spark.queries.graph import (
        spectral_second_direction,
        spectral_smoothing,
    )

    k, cliques = 4, 4
    e = spark.createDataFrame(
        _clique_chain_edges(spark, k, cliques), "src long, dst long"
    )
    x1f = spectral_smoothing(spark, e)
    x1 = {r["node"]: r["v"] for r in x1f.collect()}
    x2 = {
        r["node"]: r["v"]
        for r in spectral_second_direction(spark, e, x1f).collect()
    }
    s1 = {v: 1 if x1[v] > 0 else 0 for v in x1}
    s2 = {v: 1 if x2[v] > 0 else 0 for v in x2}
    blocks = [
        [ci * k + a for a in range(k)] for ci in range(cliques)
    ]
    lab = []
    for blk in blocks:
        b1 = {s1[v] for v in blk}
        b2 = {s2[v] for v in blk}
        assert len(b1) == 1 and len(b2) == 1
        lab.append((b1.pop(), b2.pop()))
    assert len(set(lab)) == 4
    # direction 1: chain halves; direction 2: ends vs middle
    assert lab[0][0] == lab[1][0] != lab[2][0] == lab[3][0]
    assert lab[0][1] == lab[3][1] != lab[1][1] == lab[2][1]


def test_spectral_quadrants_refine_bipartition_sf001(spark, qs):
    """sf0.01 conductance readout (the quadrants rung's promised pin):
    the 4-way partition REFINES the bipartition exactly (side ==
    bipartition side per node — both read the same direction-1
    iterate), all four quadrants are substantively populated (measured
    465/572/429/426), and the conductance price of the finer cut is
    honest: every quadrant's conductance stays below 0.5 (measured
    0.39–0.47) while the 2-way cut sits at 0.28 — smaller parts have
    smaller volume, so refinement costs conductance by construction;
    what the pin guards is that no quadrant degenerates into a
    near-random shred (≥ 0.5 would mean more cut than kept)."""
    sf01 = "/root/testdata/sf0.01"
    from dataengineerchallenge_spark.queries.graph import (
        _staged_copurchase_edges,
    )

    quad = {
        r["part_key"]: (r["side"], r["quadrant"])
        for r in qs["copurchase_spectral_quadrants"](spark, sf01).collect()
    }
    bip = {
        r["part_key"]: r["side"]
        for r in qs["copurchase_spectral_bipartition"](spark, sf01).collect()
    }
    assert all(quad[v][0] == bip[v] for v in quad)
    root = _staged_copurchase_edges(spark, sf01)
    edges = [
        (r["src"], r["dst"])
        for r in spark.read.parquet(f"{root}/sym")
        .filter(F.col("wr") >= 2)
        .select("src", "dst")
        .collect()
        if r["src"] < r["dst"]
    ]
    m = len(edges)
    labels = {q for _, q in quad.values()}
    assert labels == {0, 1, 2, 3}
    for lbl in labels:
        assert sum(1 for _, q in quad.values() if q == lbl) >= 100
        cut = sum(
            1
            for s, d in edges
            if (quad[s][1] == lbl) != (quad[d][1] == lbl)
        )
        vol = sum(
            1 for s, d in edges for v in (s, d) if quad[v][1] == lbl
        )
        assert cut / max(1, min(vol, 2 * m - vol)) < 0.5


def test_betweenness_accuracy_improves_with_pivots(spark):
    """The accuracy-vs-pivot-count pin (VERDICT r19 next-round #3) at
    test SF: against exact all-sources Brandes (float, in-test — 200
    sources), doubling the pivot budget must not lose rank accuracy
    (measured sf0.001: rho 0.51 → 0.72, top-10 overlap 0.4 → 0.5), and
    the integer-grid Spark scores must rank EXACTLY like the float
    estimator run from the same pivots (rho = 1.0 — the 1e-9 grid
    costs nothing in ordering). BENCH_betweenness.json carries the
    sf0.01 curve the registered k=4 default is judged by."""
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.graph import (
        _staged_copurchase_edges,
        pivot_betweenness_frame,
    )
    from tools.bench_betweenness import (
        exact_brandes,
        pivot_estimate,
        spearman,
    )

    root = _staged_copurchase_edges(spark, SF_DIR)
    canon = (
        spark.read.parquet(f"{root}/sym")
        .filter(F.col("wr") >= 2)
        .select("src", "dst")
    )
    adj: dict = {}
    for r in canon.collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    exact = exact_brandes(adj)
    by_deg = sorted(adj, key=lambda v: (-len(adj[v]), v))

    rhos = {}
    for k in (4, 8):
        est = {
            r["part_key"]: r["betweenness_nano"]
            for r in pivot_betweenness_frame(spark, canon, k).collect()
        }
        nodes = sorted(est)
        rhos[k] = spearman(
            [float(est[v]) for v in nodes], [exact[v] for v in nodes]
        )
        ftwin = pivot_estimate(adj, by_deg[:k])
        assert (
            spearman(
                [float(est[v]) for v in nodes], [ftwin[v] for v in nodes]
            )
            == 1.0
        )
    assert rhos[8] > rhos[4] > 0.5


def test_filtered_rerank_dominates_plain_prefilter(spark, qs):
    """The composed rung's dominance is structural, not tuned: its
    exact rerank runs over the ADC top-R candidates — a SUPERSET of
    the plain pre-filtered rung's ADC top-k — and any true-top-k
    member present in a candidate set is always selected by exact
    ordering. So recall vs the filtered exact oracle is >= the plain
    rung's, per tier. Also: every served row passes the predicate
    (the contract a filtered serve owes)."""
    from dataengineerchallenge_spark.queries.vectors import (
        _ANNFILT_PRED,
        _ANNFILT_PRED_HIGH,
        _ANNFILT_PRED_LOW,
        _prefiltered_rerank_serve,
        _prefiltered_serve,
    )

    reg = qs["ivf_pq_serve_filtered_rerank_topk"](spark, SF_DIR).collect()
    allowed = _allowed_ids(spark, _ANNFILT_PRED)
    assert reg and all(r["vec_id"] in allowed for r in reg)
    for pred in (_ANNFILT_PRED_HIGH, _ANNFILT_PRED, _ANNFILT_PRED_LOW):
        exact = _exact_filtered_topk(spark, pred)
        plain = _prefiltered_serve(spark, SF_DIR, pred).collect()
        rr = _prefiltered_rerank_serve(spark, SF_DIR, pred).collect()
        assert _recall(rr, exact) >= _recall(plain, exact)
