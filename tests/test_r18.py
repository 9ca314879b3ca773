"""Round-18 pins (VERDICT r17 next-round items):

- weighted SSSP: triangle inequality over every edge, source at 0,
  distances no longer proportional to hops.
- top-4 PCA deflation: component 1 must equal the Spark-side PC1 rung
  bit-for-bit (pins the CPython<->JVM left-fold parity the driver-side
  design rides), pairwise orthogonality on the integer grid, and
  per-component Rayleigh against numpy's spectrum.
- Newton classifier: Hadamard closed-form recovery (σ̃⁻¹(3/4) = 1 so
  w = (0, 1, 0, 0) exactly), Newton-step decay onto the integer-grid
  fixpoint, and the scored AUC landing in its measured band.
- ABTT whitening: residual projections near-zero (exact on the last
  subtracted direction, non-orthogonality-bounded on the rest).
- store retractions: no tombstoned id may surface from the retracted
  ANN serve or the retracted MinHash near-dup.
- GK day rollup: register fold over the staged day store equals the
  direct grouped rung row-for-row.
- pivot betweenness: equality with an independent in-test Brandes on
  the same integer grid (the Tarjan-pin pattern).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# --- weighted SSSP ----------------------------------------------------


def test_sssp_triangle_inequality_and_source(spark):
    from dataengineerchallenge_spark.queries.graph import (
        _staged_copurchase_edges,
        copurchase_weighted_distances,
    )

    dist = {
        r["part_key"]: r["dist_microcost"]
        for r in copurchase_weighted_distances(spark, SF_DIR).collect()
    }
    root = _staged_copurchase_edges(spark, SF_DIR)
    edges = (
        spark.read.parquet(f"{root}/sym")
        .filter(F.col("wr") >= 2)
        .select(
            "src", "dst", F.expr("1000000 div cast(w as bigint)").alias("cost")
        )
        .collect()
    )
    from collections import Counter

    deg = Counter(e["src"] for e in edges)
    src_node = min(
        (n for n in deg if deg[n] == max(deg.values()))
    )
    assert dist[src_node] == 0
    reached = set(dist)
    for e in edges:
        if e["src"] in reached:
            # relaxed graph: no edge can shortcut a settled distance
            assert e["dst"] in reached
            assert dist[e["dst"]] <= dist[e["src"]] + e["cost"], (
                e["src"], e["dst"], e["cost"],
            )
    # weighted metric is genuinely non-uniform (not hop-count * const)
    assert len({v for v in dist.values() if v > 0}) > 5


# --- top-4 PCA deflation ----------------------------------------------


@pytest.fixture(scope="module")
def pcs(spark):
    from dataengineerchallenge_spark.queries.vectors import (
        embedding_principal_components_r4,
    )

    rows = embedding_principal_components_r4(spark, SF_DIR).collect()
    comps = {}
    lams = {}
    for r in rows:
        comps.setdefault(r["component"], [0.0] * 64)[r["dim"] - 1] = (
            r["loading_micropoints"] / 1e6
        )
        lams[r["component"]] = r["lambda_micropoints"]
    return comps, lams


def test_pca_component1_equals_pc1_rung(spark, pcs):
    from dataengineerchallenge_spark.queries.vectors import (
        embedding_principal_component,
    )

    pc1 = {
        r["dim"]: (r["loading_micropoints"], r["lambda_micropoints"])
        for r in embedding_principal_component(spark, SF_DIR).collect()
    }
    comps, lams = pcs
    for d in range(1, 65):
        assert pc1[d][0] == round(comps[1][d - 1] * 1e6)
        assert pc1[d][1] == lams[1]


def test_pca_orthogonality_and_rayleigh(spark, pcs):
    import numpy as np

    from dataengineerchallenge_spark.sources.tables import load_table

    comps, lams = pcs
    vs = [np.array(comps[c]) for c in (1, 2, 3, 4)]
    for v in vs:
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3  # unit on the grid
    for i in range(4):
        for j in range(i + 1, 4):
            assert abs(float(vs[i] @ vs[j])) < 0.05, (i + 1, j + 1)
    emb = load_table(spark, SF_DIR, "embeddings")
    x = np.array(
        emb.select("embedding").toPandas()["embedding"].tolist(), dtype=float
    )
    xi = np.round(x * 1e6)
    cov = (xi.T @ xi) / len(xi) - np.outer(xi.mean(0), xi.mean(0))
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    for k, v in enumerate(vs):
        rayleigh = float(v @ cov @ v)
        # k-th iterate's Rayleigh must reach most of the k-th eigenvalue
        # (spectrum is near-degenerate, so the band is honest, not tight)
        assert rayleigh >= 0.95 * evals[k], (k + 1, rayleigh, evals[k])
        # and the reported lambda is that Rayleigh's scale
        assert abs(lams[k + 1] - rayleigh / 1e6) / (rayleigh / 1e6) < 0.05


# --- IRLS classifier ---------------------------------------------------


def test_newton_recovers_hadamard_closed_form(spark):
    """Four feature cells on the Hadamard design {(1,1,1), (1,-1,-1),
    (-1,1,-1), (-1,-1,1)} with P(y=1) = 3/4 when x1 = +1 and 1/4 when
    x1 = -1: the saturated GLM solves the 4 empirical link values
    exactly, and because the design matrix M (with intercept) is
    Hadamard, w = Mᵀz/4 where z_c = σ̃⁻¹(rate_c); σ̃⁻¹(3/4) = 1 for the
    algebraic sigmoid, so w = (0, 1, 0, 0) in CLOSED FORM — the
    separable pin VERDICT asked for, with a nonsingular 4x4 Hessian
    exercising the full Cramer solve."""
    from dataengineerchallenge_spark.queries.classifier import newton_trace

    rows = []
    for x1, x2, x3 in ((1, 1, 1), (1, -1, -1), (-1, 1, -1), (-1, -1, 1)):
        pos = 30 if x1 > 0 else 10
        cell = (float(x1), float(x2), float(x3))
        rows += [(1, *cell)] * pos + [(0, *cell)] * (40 - pos)
    feats = spark.createDataFrame(
        rows, "y int, x1 double, x2 double, x3 double"
    )
    w = newton_trace(feats, rounds=8)[-1]
    assert abs(w[1] - 1.0) < 1e-6, w
    for k in (0, 2, 3):
        assert abs(w[k]) < 1e-6, w


def test_newton_steps_decay_and_freeze(spark):
    from dataengineerchallenge_spark.queries.classifier import (
        train_quality_irls,
    )

    tr = train_quality_irls(spark, SF_DIR)
    steps = [
        max(abs(a - b) for a, b in zip(tr[i], tr[i + 1]))
        for i in range(len(tr) - 1)
    ]
    # the algebraic link damps far from the optimum (steps GROW through
    # round ~4), then Newton's quadratic phase collapses them: measured
    # 11.26 → 6.2 → 1.07 → 0.024 → 1.3e-5 over rounds 4..8
    assert steps[7] < steps[6] < steps[5] < steps[4]
    assert steps[7] < 1e-3
    assert steps[-1] < 1e-5  # settled on the integer-register grid


def test_scored_auc_in_measured_band(spark):
    from dataengineerchallenge_spark.queries.classifier import (
        quality_classifier_scored_auc,
    )

    rows = quality_classifier_scored_auc(spark, SF_DIR).collect()
    assert len(rows) >= 10
    pooled = sum(r["auc_micropoints"] for r in rows) / len(rows)
    assert 800_000 <= pooled <= 990_000, pooled


def test_abtt_whitening_actually_subtracts(spark, pcs):
    """The whitened corpus must have ~zero projection on the removed
    components (the subtraction really happened), and the whitened
    ranking must not be a trivial copy of the raw cosine ranking."""
    import numpy as np

    from dataengineerchallenge_spark.queries.vectors import (
        _pcr_train,
        abtt_whitened_topk,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    comps, mi, nn = _pcr_train(spark, SF_DIR, 2)
    emb = load_table(spark, SF_DIR, "embeddings")
    x = np.array(
        emb.select("embedding").toPandas()["embedding"].tolist(), dtype=float
    )
    xi = np.round(x * 1e6)
    mu = np.array([mi[i] / nn for i in range(1, 65)])
    w = xi - mu
    before = [np.max(np.abs((w @ np.array(v))) / np.linalg.norm(w, axis=1))
              for v, _ in comps]
    for v, _ in comps:
        u = np.array(v)
        w = w - np.outer(w @ u, u)
    norms = np.linalg.norm(w, axis=1)
    # the LAST-subtracted direction is removed exactly; earlier ones are
    # bounded by the components' measured non-orthogonality (the 48-step
    # iterates on a near-degenerate spectrum are not exactly orthogonal,
    # so subtracting u2 reintroduces ~|u1·u2| of u1 — sequential ABTT's
    # honest residual, still 30x+ below the pre-whitening projections)
    u_last = np.array(comps[-1][0])
    assert np.max(np.abs(w @ u_last) / norms) < 1e-9
    for k, (v, _) in enumerate(comps):
        u = np.array(v)
        resid = np.max(np.abs(w @ u) / norms)
        assert resid < 0.01, (k, resid)
        assert resid < before[k] / 10, (k, resid, before[k])
    out = abtt_whitened_topk(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) == 50
    assert all(-10000 <= r["whitened_cosine_bp"] <= 10000 for r in rows)


# --- store retractions --------------------------------------------------


def test_ann_retracted_serve_never_returns_tombstones(spark):
    from dataengineerchallenge_spark.queries.vectors import (
        ivf_pq_serve_retracted_topk,
        ivf_pq_serve_topk,
    )

    got = ivf_pq_serve_retracted_topk(spark, SF_DIR).collect()
    assert got and all(r["vec_id"] % 10 != 0 for r in got)
    # and the tombstones were actually load-bearing: the unretracted
    # serve DID return some vec_id % 10 == 0 rows
    base = ivf_pq_serve_topk(spark, SF_DIR).collect()
    assert any(r["vec_id"] % 10 == 0 for r in base)


def test_minhash_retracted_has_no_tombstone_endpoints(spark):
    from dataengineerchallenge_spark.queries.dedup import (
        near_dup_minhash_retracted,
        near_dup_second_delivery_minhash_explicit,
    )

    got = near_dup_minhash_retracted(spark, SF_DIR).collect()
    for r in got:
        assert r["id_a"] % 10 != 0 and r["id_b"] % 10 != 0
    # live pairs survive identically: retracted result == unretracted
    # result minus pairs touching a tombstone (band statelessness)
    base = near_dup_second_delivery_minhash_explicit(spark, SF_DIR).collect()
    want = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in base
        if r["id_a"] % 10 != 0 and r["id_b"] % 10 != 0
    )
    assert sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in got) == want


# --- GK day rollup -------------------------------------------------------


def test_gk_rollup_equals_direct_grouped(spark):
    from dataengineerchallenge_spark.queries.sketches import (
        gk_value_quantile_rollup,
        gk_value_quantiles_by_type,
    )

    roll = gk_value_quantile_rollup(spark, SF_DIR)
    direct = gk_value_quantiles_by_type(spark, SF_DIR)
    assert _rows(roll) == _rows(direct)


# --- pivot betweenness ---------------------------------------------------


def test_pivot_betweenness_matches_reference_brandes(spark):
    """The registered rung must equal an independent in-test Brandes
    run (deque BFS + descending-level dependency accumulation on the
    same 1e-9 integer grid) from the same deterministic pivot set —
    the Tarjan-pin pattern for the dependency pass."""
    from collections import defaultdict, deque

    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.graph import (
        _BC_G,
        _BC_PIVOTS,
        _staged_copurchase_edges,
        copurchase_pivot_betweenness,
    )

    got = {
        r["part_key"]: r["betweenness_nano"]
        for r in copurchase_pivot_betweenness(spark, SF_DIR).collect()
    }
    root = _staged_copurchase_edges(spark, SF_DIR)
    canon = (
        spark.read.parquet(f"{root}/sym")
        .filter((F.col("wr") >= 2) & (F.col("src") < F.col("dst")))
        .select("src", "dst")
        .collect()
    )
    adj = defaultdict(list)
    for r in canon:
        adj[r["src"]].append(r["dst"])
        adj[r["dst"]].append(r["src"])
    deg = {n: len(a) for n, a in adj.items()}
    pivots = sorted(deg, key=lambda n: (-deg[n], n))[:_BC_PIVOTS]
    ref: dict = defaultdict(int)
    for s in pivots:
        level = {s: 0}
        sigma = {s: 1}
        q = deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in level:
                    level[w] = level[u] + 1
                    sigma[w] = 0
                    q.append(w)
                if level[w] == level[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0 for v in level}
        for v in sorted(level, key=lambda x: (-level[x], x)):
            for w in adj[v]:
                if level.get(w) == level[v] + 1:
                    delta[v] += (sigma[v] * (_BC_G + delta[w])) // sigma[w]
        for v in level:
            if v != s:
                ref[v] += delta[v]
    assert got == dict(ref)
    # brokers exist: some node that is NOT a pivot carries real mass
    top = max((v, k) for k, v in got.items() if k not in pivots)
    assert top[0] > _BC_G  # > 1.0 dependency units
