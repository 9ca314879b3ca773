"""Vector/similarity invariants (F8/N3): algebraic identities of the
higher-order-function cosine, IVF consistency with brute force, and LSH
recall vs the exact anchor."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from dataengineerchallenge_spark.functions import vectors as V
from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_cosine_identities(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0, 0.0], [0.0, 1.0, 0.0]), ([1.0, 2.0, 2.0], [1.0, 2.0, 2.0]), ([1.0, 1.0, 0.0], [1.0, -1.0, 0.0])],
        "a array<float>, b array<float>",
    )
    out = df.select(
        V.dot(F.col("a"), F.col("b")).alias("d"),
        V.l2_norm(F.col("a")).alias("na"),
        V.cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()
    assert out[0]["d"] == 0.0 and out[0]["c"] == 0.0  # orthogonal
    assert math.isclose(out[1]["c"], 1.0, abs_tol=1e-12)  # self-similarity
    assert math.isclose(out[1]["na"], 3.0, abs_tol=1e-12)
    assert math.isclose(out[2]["c"], 0.0, abs_tol=1e-12)


def test_ivf_subset_of_bucket_and_agrees_with_exact_on_same_bucket(spark, qs):
    """Every IVF hit must come from the query's probed bucket, and within
    that bucket must match what brute force would rank."""
    exact = qs["cosine_topk_exact"](spark, SF_DIR).collect()
    ivf = qs["ivf_topk"](spark, SF_DIR).collect()
    assign = {r["vec_id"]: r["assigned_label"] for r in qs["nearest_centroid"](spark, SF_DIR).collect()}
    for r in ivf:
        assert assign[r["vec_id"]] == assign[r["query_id"]]
    # IVF results that brute force also ranked in its top-k must agree on cosine
    exact_map = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in ivf:
        if (r["query_id"], r["vec_id"]) in exact_map:
            assert abs(exact_map[(r["query_id"], r["vec_id"])] - r["cosine"]) < 1e-9


def test_centroid_assignment_total_and_deterministic(spark, qs):
    """Every vector gets exactly one bucket, and assignment is stable
    across runs (pure arithmetic, no RNG). Note: fixture labels are NOT
    tight clusters at sf0.001 (~37% self-agreement), so cluster quality
    is deliberately not asserted — IVF partitions the space either way."""
    rows1 = qs["nearest_centroid"](spark, SF_DIR).collect()
    rows2 = qs["nearest_centroid"](spark, SF_DIR).collect()
    assert {r["vec_id"]: r["assigned_label"] for r in rows1} == {
        r["vec_id"]: r["assigned_label"] for r in rows2
    }
    ids = [r["vec_id"] for r in rows1]
    assert len(ids) == len(set(ids)) == 500


def test_lsh_recall_vs_exact(spark, qs):
    """Seeded euclidean-LSH top-k must recover ≥70% of the exact cosine
    top-k pairs (euclidean and cosine rank nearly identically here since
    fixture vectors have similar norms)."""
    exact = {(r["query_id"], r["vec_id"]) for r in qs["cosine_topk_exact"](spark, SF_DIR).collect()}
    approx = {(r["query_id"], r["vec_id"]) for r in qs["ann_lsh_neighbors"](spark, SF_DIR).collect()}
    assert len(exact) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall {recall:.2f}"


def test_pq_adc_recall_floor(spark, qs):
    """PQ is lossy by design, and the fixture's label geometry is only
    weakly separable (same stance as doc_lang_id: the query checks the
    machinery, not the fixture) — so the pin is RELATIVE: measured
    recall@10 must beat random candidate selection by >= 3x (observed
    0.10 vs a 0.02 random baseline at sf0.01; IVF on the same fixture
    measures 0.22). Uses sf0.01 — at sf0.001 the 50-vector corpus makes
    10 per-label training vectors-per-codebook tie-dominated."""
    sf = "/root/testdata/sf0.01"
    exact = {
        (r["query_id"], r["vec_id"]) for r in qs["cosine_topk_exact"](spark, sf).collect()
    }
    pq = {(r["query_id"], r["vec_id"]) for r in qs["pq_adc_topk"](spark, sf).collect()}
    recall = len(exact & pq) / len(exact)
    n = 500  # sf0.01 corpus size
    random_baseline = 10.0 / (n - 1)
    assert recall >= 3 * random_baseline, f"PQ recall@10 collapsed: {recall:.3f}"


def test_ivf_pq_recall_and_candidate_pruning(spark, qs):
    """The composed IVF-PQ rung (VERDICT r4 #3): recall@10 measured in
    the same frame as ann_recall_at_k — vs the exact anchor — must beat
    random selection like its PQ parent, and its result must be a
    genuine subset property: every returned candidate must come from the
    query's 2 probed buckets (the IVF pruning actually happened; a bug
    that silently scored the whole corpus would break this)."""
    sf = "/root/testdata/sf0.01"
    exact = {
        (r["query_id"], r["vec_id"]) for r in qs["cosine_topk_exact"](spark, sf).collect()
    }
    ivfpq = {(r["query_id"], r["vec_id"]) for r in qs["ivf_pq_adc_topk"](spark, sf).collect()}
    recall = len(exact & ivfpq) / len(exact)
    random_baseline = 10.0 / (500 - 1)
    assert recall >= 3 * random_baseline, f"IVF-PQ recall@10 collapsed: {recall:.3f}"

    from dataengineerchallenge_spark.queries.vectors import _assignments, _assignments_sims
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    assigned = {
        r["vec_id"]: r["assigned_label"]
        for r in _assignments(spark, sf).select("vec_id", "assigned_label").collect()
    }
    wq = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("clabel"))
    probe_rows = (
        _assignments_sims(spark, sf)
        .filter(F.col("vec_id") < 5)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= 2)
        .collect()
    )
    probed: dict[int, set] = {}
    for r in probe_rows:
        probed.setdefault(r["vec_id"], set()).add(r["clabel"])
    assert all(assigned[v] in probed[q] for q, v in ivfpq)


def test_residual_pq_reconstructs_tighter_than_raw_pq(spark):
    """The reason IVFADC quantizes residuals: at the same 4-byte code
    cost, encoding r = v - c_bucket must reconstruct with lower error
    than encoding the raw vector (residuals are centered, so codebook
    precision is spent where the coarse quantizer failed). Pins the
    measured per-(vec, sub) SSE ordering on sf0.01 (0.210 vs 0.227) —
    if codebook or assignment logic regresses, this flips."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.functions import vectors as V
    from dataengineerchallenge_spark.queries.vectors import _PQ_DIM, _assignments
    from dataengineerchallenge_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    lf = V.explode_vectors(emb, ["vec_id", "label"], "embedding").withColumn(
        "sub", F.floor(F.col("pos") / _PQ_DIM)
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(F.round("d2", 8), "code")

    def mean_sse(long_form, code_col):
        cb = long_form.groupBy("sub", F.col(code_col).alias("code"), "pos").agg(
            F.avg("x").alias("cx")
        )
        d2 = (
            long_form.join(F.broadcast(cb), ["sub", "pos"])
            .groupBy("vec_id", "sub", "code")
            .agg(F.sum((F.col("x") - F.col("cx")) ** 2).alias("d2"))
        )
        best = d2.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1")
        return best.agg(F.avg("d2")).collect()[0][0]

    raw = mean_sse(lf.select("vec_id", "sub", "pos", F.col("v").alias("x"), "label"), "label")

    cent = lf.groupBy(F.col("label").alias("clabel"), "pos").agg(F.avg("v").alias("cv"))
    assign = _assignments(spark, sf).select("vec_id", F.col("assigned_label").alias("bucket"))
    cent_r = cent.select("clabel", F.col("pos").alias("_cpos"), "cv")
    rlf = (
        lf.join(assign, "vec_id")
        .join(
            F.broadcast(cent_r),
            (F.col("bucket") == F.col("clabel")) & (F.col("pos") == F.col("_cpos")),
        )
        .select(
            "vec_id",
            "sub",
            "pos",
            (F.col("v") - F.col("cv")).alias("x"),
            F.pmod(F.col("vec_id"), F.lit(16)).alias("g"),
        )
    )
    residual = mean_sse(rlf, "g")
    assert residual < raw, f"residual SSE {residual:.4f} !< raw SSE {raw:.4f}"


def test_pq_codes_compress_64x(spark, qs):
    """The scale claim itself: every candidate is represented by m=4
    codes (4 bytes) vs 64 float32 dims (256 bytes)."""
    from dataengineerchallenge_spark.queries.vectors import _PQ_DIM

    from dataengineerchallenge_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    dim = len(emb.select("embedding").first()[0])
    m = dim // _PQ_DIM
    assert m == 4 and dim * 4 / m == 64.0


def test_ivf_pq_serve_matches_inline_and_never_scans_base_table(spark, qs):
    """The build/serve split (VERDICT r5 #1): serving from the staged
    index must (a) return exactly the inline rung's rows, (b) never
    touch the base embeddings table in its executed plan, and (c) carry
    a dynamic-partition-pruning filter on the bucket-partitioned codes
    scan — the inverted-list seek that makes IVF serve at scale."""
    inline = sorted(
        tuple(r) for r in qs["ivf_pq_adc_topk"](spark, SF_DIR).collect()
    )
    df = qs["ivf_pq_serve_topk"](spark, SF_DIR)
    served = sorted(tuple(r) for r in df.collect())
    assert served == inline and len(served) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert "dynamicpruning" in plan.lower()


def test_trained_ivf_beats_label_mean_quantizer(spark, qs):
    """The trained-coarse-quantizer rung must close the documented
    honesty caveat MEASURABLY: at the same bucket count (k=10) and probe
    count (2), seeded-k-means centroids must recall at least as much of
    the exact top-10 as the label-mean twin (measured 0.44 vs 0.28 at
    sf0.001, 0.56 vs 0.38 at sf0.01)."""
    exact = {(r["query_id"], r["vec_id"]) for r in qs["cosine_topk_exact"](spark, SF_DIR).collect()}
    trained = {(r["query_id"], r["vec_id"]) for r in qs["ivf_kmeans_topk"](spark, SF_DIR).collect()}
    twin = {(r["query_id"], r["vec_id"]) for r in qs["ivf_multiprobe_topk"](spark, SF_DIR).collect()}
    r_trained = len(exact & trained) / len(exact)
    r_twin = len(exact & twin) / len(exact)
    assert r_trained >= r_twin, (r_trained, r_twin)
    assert r_trained >= 0.4  # absolute floor so both regressing together fails


def test_ivf_pq_append_equals_full_rebuild(spark, qs):
    """Incremental index maintenance: encoding only the new 20% of
    vectors against the FROZEN codebooks and appending into the
    bucket-partitioned codes layout must produce (a) exactly the full
    build's code set and (b) hash-identical serving results."""
    from dataengineerchallenge_spark.queries.vectors import (
        _staged_ivfpq_appended_index,
        _staged_ivfpq_index,
    )

    full = {
        tuple(r)
        for r in spark.read.parquet(_staged_ivfpq_index(spark, SF_DIR) + "/codes").collect()
    }
    app = {
        tuple(r)
        for r in spark.read.parquet(
            _staged_ivfpq_appended_index(spark, SF_DIR) + "/codes"
        ).collect()
    }
    assert full == app and len(full) > 0
    a = sorted(tuple(r) for r in qs["ivf_pq_serve_topk"](spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in qs["ivf_pq_serve_appended_topk"](spark, SF_DIR).collect())
    assert a == b


def test_residual_serve_matches_inline_and_never_scans_base_table(spark, qs):
    """The residual (IVFADC) serve rung: hash-identical rows to the
    inline build (the repo's heaviest plan), zero base-table scans, DPP
    on the bucket-partitioned residual code lists."""
    inline = sorted(
        tuple(r) for r in qs["ivf_pq_residual_topk"](spark, SF_DIR).collect()
    )
    df = qs["ivf_pq_residual_serve_topk"](spark, SF_DIR)
    served = sorted(tuple(r) for r in df.collect())
    assert served == inline and len(served) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert "dynamicpruning" in plan.lower()


def test_ivf_pq_serve_fresh_matches_inline_and_never_scans_base_table(spark, qs):
    """The fresh-batch serve rung (VERDICT r6 #2): a query batch NOT in
    the prebuilt router must be routed at query time from the staged
    centroids only — (a) rows identical to the inline IVF-PQ dataflow
    run on the same batch, (b) zero base-table scans, (c) DPP on the
    codes scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _TOP_K,
        _pq_parts,
        _probe_frames,
    )

    # inline twin on the fresh batch: same parts, base-table dataflow
    codes, cn, qdot, qn = _pq_parts(spark, SF_DIR, q_lo=_FRESH_LO, q_hi=_FRESH_HI)
    assign, probes = _probe_frames(spark, SF_DIR, q_lo=_FRESH_LO, q_hi=_FRESH_HI)
    cand = assign.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe_label"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id")
    s = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qdot), ["query_id", "sub", "code"])
        .join(F.broadcast(cn), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd").alias("num"), F.sum("cn2").alias("cn2sum"))
    )
    scored = s.join(F.broadcast(qn), "query_id").withColumn(
        "adc_cosine",
        F.round(F.col("num") / (F.col("qnorm") * F.sqrt(F.col("cn2sum"))), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cosine"), F.asc("vec_id"))
    inline = sorted(
        tuple(r)
        for r in scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .select("query_id", "vec_id", "adc_cosine")
        .collect()
    )

    df = qs["ivf_pq_serve_fresh_topk"](spark, SF_DIR)
    served = sorted(tuple(r) for r in df.collect())
    assert served == inline and len(served) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert "dynamicpruning" in plan.lower()


def test_residual_serve_fresh_matches_inline_and_never_scans_base_table(spark, qs):
    """The fresh-batch serve rung for the RESIDUAL (IVFADC) index
    (VERDICT r7 #2): a query batch NOT in the prebuilt router must be
    routed at query time from the staged coarse+residual codebooks only —
    (a) rows identical to the inline residual dataflow run on the same
    batch, (b) zero base-table scans, (c) DPP on the residual codes
    scan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _TOP_K,
        _residual_parts,
    )

    # inline twin on the fresh batch: same parts, base-table dataflow
    codes, rn2, cbr, cn2sub, qr, qc, qn, assign, probes, _, _ = _residual_parts(
        spark, SF_DIR, q_lo=_FRESH_LO, q_hi=_FRESH_HI
    )
    cand = assign.join(
        F.broadcast(probes),
        (F.col("bucket") == F.col("probe_label"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id", "bucket")
    s = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(qr), ["query_id", "sub", "code"])
        .join(F.broadcast(rn2), ["sub", "code"])
        .join(F.broadcast(cbr), ["bucket", "sub", "code"])
        .join(F.broadcast(cn2sub), ["bucket", "sub"])
        .groupBy("query_id", "vec_id", "bucket")
        .agg(
            F.sum("qrd").alias("qrsum"),
            F.sum(F.col("cn2") + 2 * F.col("cbr") + F.col("rn2")).alias("den2"),
        )
    )
    scored = (
        s.join(F.broadcast(qc), ["query_id", "bucket"])
        .join(F.broadcast(qn), "query_id")
        .withColumn(
            "adc_cosine",
            F.round(
                (F.col("qcd") + F.col("qrsum"))
                / (F.col("qnorm") * F.sqrt(F.col("den2"))),
                4,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cosine"), F.asc("vec_id"))
    inline = sorted(
        tuple(r)
        for r in scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .select("query_id", "vec_id", "adc_cosine")
        .collect()
    )

    df = qs["ivf_pq_residual_serve_fresh_topk"](spark, SF_DIR)
    served = sorted(tuple(r) for r in df.collect())
    assert served == inline and len(served) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert "dynamicpruning" in plan.lower()


def test_serve_recall_floor(spark, qs):
    """Recall instrumented where serving happens (VERDICT r6 #5): both
    served batches — prebuilt router and fresh-routed — must beat random
    candidate selection, the same RELATIVE stance as the PQ/IVF-PQ
    recall pins and for the same reason (the fixture's label geometry is
    only weakly separable; the pin checks the machinery, not the
    fixture). Uses sf0.01 like those pins — at sf0.001 the 50-vector
    corpus makes PQ codes tie-dominated. Observed at sf0.01: prebuilt
    mean 0.10, fresh mean 0.04, vs a 0.02 random baseline — so the
    combined floor is 3x random and the per-batch floor 1.5x (the fresh
    queries are honestly harder under 2-probe label-mean IVF-PQ; a
    routing/lookup regression drives either to ~0x)."""
    sf = "/root/testdata/sf0.01"
    rows = qs["ann_serve_recall_at_k"](spark, sf).collect()
    assert len(rows) == 10  # 5 prebuilt + 5 fresh
    assert {r["batch"] for r in rows} == {"prebuilt", "fresh"}
    random_baseline = 10.0 / (500 - 1)
    means = {}
    for batch in ("prebuilt", "fresh"):
        rs = [r["recall_at_k"] for r in rows if r["batch"] == batch]
        means[batch] = sum(rs) / len(rs)
        assert means[batch] >= 1.5 * random_baseline, (
            f"{batch} served recall collapsed: {means[batch]:.3f}"
        )
    combined = sum(means.values()) / 2
    assert combined >= 3 * random_baseline, f"combined served recall {combined:.3f}"


def test_serve_recall_absolute_floor(spark, tmp_path):
    """ABSOLUTE served-recall floor on geometry that permits one
    (VERDICT r7 #3 / r8 missing #2 — the relative 3x-random pins above
    check the machinery is wired, but a recall collapse from 0.9 to 0.1
    on resolvable geometry would pass them). Plants the SEPARABLE
    corpus from tools/bench_ann.py — tight ~10-vector clusters with
    near-orthogonal centers, so each fresh query's exact top-10 IS its
    cluster co-members and the label-mean codebook's cells resolve it —
    and serves the fresh batch through the REGISTERED fresh-serve body
    (`_serve_fresh_from_index`): recall@10 vs brute-force exact must be
    >= 0.8 at >= 4 probes (bench_ann measures 0.9).

    Also pins the STRADDLED variant (each spatial cluster split across
    2 coarse labels): the curve must RISE from 1 probe to 4 — the
    multi-probe lever doing the thing it exists for. A routing or
    ADC-lookup regression breaks one of the two."""
    from pyspark.sql import Window

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _TOP_K,
        _serve_fresh_from_index,
        _staged_fresh_query_batch,
        _staged_ivfpq_index,
    )
    from tools.bench_ann import gen_separable

    def recall_at(d: str, n_probes: int) -> float:
        root = _staged_ivfpq_index(spark, d)
        batch = spark.read.parquet(_staged_fresh_query_batch(spark, d))
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        q = emb.filter(
            (F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI)
        ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"))
        pairs = F.broadcast(q).join(
            emb, F.col("query_id") != F.col("vec_id")
        ).select(
            "query_id", "vec_id", V.cosine(F.col("qe"), F.col("embedding")).alias("cos")
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
        exact = {
            (r.query_id, r.vec_id)
            for r in pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= _TOP_K)
            .collect()
        }
        served = {
            (r.query_id, r.vec_id)
            for r in _serve_fresh_from_index(spark, root, batch, n_probes=n_probes)
            .collect()
        }
        return len(served & exact) / len(exact)

    sep = str(tmp_path / "separable")
    gen_separable(spark, sep, 1000)
    r_sep = recall_at(sep, 4)
    assert r_sep >= 0.8, f"separable served recall@10 collapsed: {r_sep:.3f}"

    strad = str(tmp_path / "straddled")
    gen_separable(spark, strad, 1000, 5, 2)
    r1, r4 = recall_at(strad, 1), recall_at(strad, 4)
    assert r4 > r1, f"straddled curve must rise with probes: p1={r1:.3f} p4={r4:.3f}"
    assert r4 >= 0.8, f"straddled served recall@10 at 4 probes: {r4:.3f}"


def test_serve_split_parity_on_random_corpora(spark, tmp_path):
    """The build/serve split must hold for ARBITRARY embedding tables,
    not just the driver fixture: random corpora (varying sizes, cluster
    counts, tie-prone duplicate vectors) staged into fresh dirs must
    serve exactly the inline rung's rows."""
    import random

    from dataengineerchallenge_spark.queries.vectors import (
        ivf_pq_adc_topk,
        ivf_pq_serve_topk,
    )

    for case, (n, n_labels, dup_every) in enumerate(
        [(60, 3, 0), (120, 7, 5), (200, 10, 3)]
    ):
        rng = random.Random(1000 + case)
        rows = []
        for i in range(n):
            if dup_every and i % dup_every == 1 and i > 1:
                vec = rows[i - 1][1]  # exact duplicate: ADC score ties
            else:
                vec = [rng.uniform(-1, 1) for _ in range(64)]
            rows.append((i, vec, i % n_labels))
        d = tmp_path / f"corpus{case}"
        d.mkdir()
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
        inline = sorted(tuple(r) for r in ivf_pq_adc_topk(spark, str(d)).collect())
        served = sorted(tuple(r) for r in ivf_pq_serve_topk(spark, str(d)).collect())
        assert served == inline and len(served) > 0, f"case {case}"


def test_stream_serve_fresh_parity_and_multibatch(spark, qs):
    """ONLINE serve rung (VERDICT r8 missing #3): the fresh-query file
    stream served per micro-batch through the staged IVF-PQ index must
    (a) actually arrive as MULTIPLE micro-batches (one payload file per
    trigger — a single-batch drain would prove nothing about the online
    path), and (b) append EXACTLY the batch rung's rows to the sink —
    per-query results are micro-batch-local, so slicing must not change
    them."""
    from dataengineerchallenge_spark.queries.vectors import (
        _staged_fresh_query_stream,
        _staged_ivfpq_index,
        _stream_serve_fresh,
    )

    root = _staged_ivfpq_index(spark, SF_DIR)
    payload = _staged_fresh_query_stream(spark, SF_DIR)
    epochs: list = []
    streamed = _stream_serve_fresh(spark, root, payload, epochs=epochs)
    assert len(epochs) >= 2, f"expected a multi-micro-batch drain, got {epochs}"
    batch = qs["ivf_pq_serve_fresh_topk"](spark, SF_DIR)
    srows = sorted(tuple(r) for r in streamed.collect())
    brows = sorted(tuple(r) for r in batch.collect())
    assert srows == brows and len(srows) > 0


def test_rerank_serve_plan_recall_and_candidate_containment(spark, qs):
    """Exact re-rank rung (VERDICT r9 next #1): (a) the executed plan
    touches no base table and DPP-prunes BOTH staged seeks — the codes
    inverted lists AND the bucket-partitioned float-vector copy; (b)
    every reranked hit comes from the ADC top-R candidate set and its
    cosine is the true exact cosine (re-ranking reorders candidates, it
    never invents or rescores them wrongly); (c) recall@10 vs exact is
    at least the non-reranked fresh serve's on the same batch — the
    whole point of the rung."""
    from pyspark.sql import Window

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _RERANK_R,
        _TOP_K,
        _adc_serve_candidates,
        _fresh_query_luts,
        _staged_fresh_query_batch,
        _staged_ivfpq_index,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    df = qs["ivf_pq_serve_rerank_topk"](spark, SF_DIR)
    reranked = df.collect()
    assert len(reranked) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert plan.lower().count("dynamicpruningexpression") >= 2

    # (b) containment in the ADC top-R + exact-cosine correctness
    root = _staged_ivfpq_index(spark, SF_DIR)
    batch = spark.read.parquet(_staged_fresh_query_batch(spark, SF_DIR))
    probes, qlut = _fresh_query_luts(spark, root, batch, 2)
    codes = spark.read.parquet(f"{root}/codes")
    cand = {
        (r.query_id, r.vec_id)
        for r in _adc_serve_candidates(codes, probes, qlut, _RERANK_R).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(
        (F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    true_cos = {
        (r.query_id, r.vec_id): round(r.cos, 4) for r in pairs.collect()
    }
    for r in reranked:
        assert (r.query_id, r.vec_id) in cand
        assert abs(true_cos[(r.query_id, r.vec_id)] - r.cosine) <= 1e-4

    # (c) recall dominance over the non-reranked serve on the same batch
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .collect()
    }
    got = {(r.query_id, r.vec_id) for r in reranked}
    plain = {
        (r.query_id, r.vec_id)
        for r in qs["ivf_pq_serve_fresh_topk"](spark, SF_DIR).collect()
    }
    assert len(got & exact) >= len(plain & exact)


def test_trained_pq_beats_label_mean_codebook(spark, qs):
    """Trained per-subspace k-means codebooks (rung 4b) must beat the
    label-mean stand-in at EQUAL code budget (same m, same codes/sub):
    (a) strictly lower reconstruction SSE — the k-means objective
    itself; (b) recall@10 vs exact at least the label-mean rung's
    (measured 0.20 vs 0.02 on the fixture — the codebook-resolution
    story the recall curve tells, fixed the production way)."""
    from dataengineerchallenge_spark.queries.vectors import (
        _PQ_DIM,
        _staged_trained_pq_codebook,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    lf = V.explode_vectors(emb, ["vec_id", "label"], "embedding").withColumn(
        "sub", F.floor(F.col("pos") / _PQ_DIM)
    )
    cb_label = (
        lf.groupBy("sub", F.col("label").alias("code"), "pos")
        .agg(F.avg("v").alias("cv"))
        .select("sub", "code", "pos", "cv")
    )
    cb_trained = spark.read.parquet(
        _staged_trained_pq_codebook(spark, SF_DIR) + "/cb"
    ).select("sub", "code", "pos", "cv")

    def sse(cb):
        d2 = (
            lf.join(cb, ["sub", "pos"])
            .groupBy("vec_id", "sub", "code")
            .agg(
                F.sum((F.col("v") - F.col("cv")) * (F.col("v") - F.col("cv"))).alias(
                    "d2"
                )
            )
        )
        return (
            d2.groupBy("vec_id", "sub")
            .agg(F.min("d2").alias("m"))
            .agg(F.sum("m"))
            .first()[0]
        )

    sse_t, sse_l = sse(cb_trained), sse(cb_label)
    assert sse_t < sse_l, f"trained SSE {sse_t} not below label-mean {sse_l}"

    exact = {(r.query_id, r.vec_id) for r in qs["cosine_topk_exact"](spark, SF_DIR).collect()}
    lab = {(r.query_id, r.vec_id) for r in qs["pq_adc_topk"](spark, SF_DIR).collect()}
    tr = {(r.query_id, r.vec_id) for r in qs["pq_trained_adc_topk"](spark, SF_DIR).collect()}
    r_lab = len(lab & exact) / len(exact)
    r_tr = len(tr & exact) / len(exact)
    assert r_tr >= r_lab and len(tr) > 0, f"trained {r_tr} < label-mean {r_lab}"


def _trained_inline_topk(spark, d):
    """The all-trained dataflow run INLINE from the base table of
    corpus dir ``d`` (fresh batch, 2 probes): routes on the staged
    k-means coarse centroids, encodes the corpus against the staged
    trained PQ codebook inside the plan, ADC-scores probed candidates.
    The parity anchor for ``ivf_pq_trained_serve_topk`` — shared by the
    fixture test and the random-corpora property test."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _TOP_K,
        _pq_parts_from_codebook,
        _route_probes,
        _staged_kmeans_quantizer,
        _staged_trained_pq_codebook,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    kq = _staged_kmeans_quantizer(spark, d)
    cb = spark.read.parquet(_staged_trained_pq_codebook(spark, d) + "/cb")
    codes, cn, qdot, qn = _pq_parts_from_codebook(
        spark, d, cb, q_lo=_FRESH_LO, q_hi=_FRESH_HI
    )
    assign = spark.read.parquet(f"{kq}/assign").select(
        "vec_id", F.col("bucket").alias("probe_label")
    )
    cent_lf = spark.read.parquet(f"{kq}/centroids").select(
        "clabel", F.posexplode("cv").alias("pos", "cv")
    )
    emb = load_table(spark, d, "embeddings")
    qlf = (
        emb.filter((F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI))
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .select("query_id", F.posexplode("embedding").alias("pos", "_vf"))
        .withColumn("v", F.col("_vf").cast("double"))
    )
    probes = _route_probes(qlf, cent_lf, 2)
    cand = assign.join(F.broadcast(probes), "probe_label").filter(
        F.col("vec_id") != F.col("query_id")
    )
    s = (
        cand.select("query_id", "vec_id")
        .join(codes, "vec_id")
        .join(F.broadcast(qdot), ["query_id", "sub", "code"])
        .join(F.broadcast(cn), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd").alias("num"), F.sum("cn2").alias("cn2sum"))
    )
    scored = s.join(F.broadcast(qn), "query_id").withColumn(
        "adc_cosine",
        F.round(F.col("num") / (F.col("qnorm") * F.sqrt(F.col("cn2sum"))), 4),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc_cosine"), F.asc("vec_id"))
    return sorted(
        tuple(r)
        for r in scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .select("query_id", "vec_id", "adc_cosine")
        .collect()
    )


def test_trained_serve_matches_inline_and_never_scans_base_table(spark, qs):
    """The all-trained index (N3 capstone): (a) serving from the staged
    bucket-partitioned trained inverted lists returns EXACTLY the rows
    of the same trained dataflow run inline from the base table — the
    parquet round-trip and bucket partitioning must not corrupt a code;
    (b) the executed serve plan touches no base table and DPP-prunes
    the codes seek; (c) recall@10 on the fresh batch is at least the
    label-mean serve rung's on the same batch (measured 0.16 vs 0.10 —
    trained cells route true neighbors into probed buckets the weak
    labels miss)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _TOP_K,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    inline = _trained_inline_topk(spark, SF_DIR)
    emb = load_table(spark, SF_DIR, "embeddings")

    df = qs["ivf_pq_trained_serve_topk"](spark, SF_DIR)
    served = sorted(tuple(r) for r in df.collect())
    assert served == inline and len(served) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert "dynamicpruning" in plan.lower()

    # (c) recall dominance over the label-mean serve on the same batch
    q = emb.filter(
        (F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    wx = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in pairs.withColumn("_rn", F.row_number().over(wx))
        .filter(F.col("_rn") <= _TOP_K)
        .collect()
    }
    got = {(q_, v_) for q_, v_, _ in served}
    lab = {
        (r.query_id, r.vec_id)
        for r in qs["ivf_pq_serve_fresh_topk"](spark, SF_DIR).collect()
    }
    assert len(got & exact) >= len(lab & exact)


def test_trained_codebook_recall_monotone_in_k(spark, tmp_path):
    """Codebook RESOLUTION is the recall bound on realistic mild
    geometry (VERDICT r9 next #2: probes don't move mild recall — k
    must): trained-PQ recall@10 through the registered builder/scoring
    path must not DECREASE as codes-per-subspace rise 10 → 64 (measured
    ~0.06 → ~0.18 at 2000 rows × 20 queries; the full 10/64/256 sweep
    lives in BENCH_ann.json pq_k_sweep). 20 queries put the recall
    quantum at 0.005, so a flat-or-rising assert is noise-safe."""
    from tools.bench_ann import _gen, trained_pq_recall

    d = str(tmp_path / "mild")
    _gen(spark, d, 2000)
    r10, _ = trained_pq_recall(spark, d, 10, n_queries=20)
    r64, r64_rr = trained_pq_recall(spark, d, 64, n_queries=20, rerank=True)
    assert r64 >= r10, f"recall fell with codebook resolution: k10={r10:.3f} k64={r64:.3f}"
    assert r64 > 0, "trained-PQ recall collapsed to zero"
    # resolution×re-rank composition (VERDICT r9 next #1 measurement
    # clause): exact re-rank of the ADC top-R must not LOSE recall vs
    # the raw ADC top-k on the same codebook — the candidates are a
    # superset of the ADC top-k, re-scored with exact cosine
    assert r64_rr >= r64, (
        f"exact re-rank lost recall vs plain ADC: adc={r64:.3f} rerank={r64_rr:.3f}"
    )


def test_trained_serve_split_parity_on_random_corpora(spark, tmp_path):
    """The all-trained build/serve split must hold for ARBITRARY
    embedding tables, not just the driver fixture: random corpora
    (varying sizes, duplicate vectors for ADC ties) staged into fresh
    dirs must serve exactly the inline trained dataflow's rows."""
    import random

    from dataengineerchallenge_spark.queries.vectors import (
        _staged_trained_ivfpq_index,
        _trained_serve_from_index,
    )

    for case, (n, dup_every) in enumerate([(80, 0), (150, 7)]):
        rng = random.Random(2000 + case)
        rows = []
        for i in range(n):
            if dup_every and i % dup_every == 1 and i > 1:
                vec = rows[i - 1][1]  # exact duplicate: ADC score ties
            else:
                vec = [rng.uniform(-1, 1) for _ in range(64)]
            rows.append((i, vec, i % 5))
        d = tmp_path / f"tcorpus{case}"
        d.mkdir()
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
        inline = _trained_inline_topk(spark, str(d))
        root = _staged_trained_ivfpq_index(spark, str(d))
        batch = (
            spark.read.parquet(str(d / "embeddings.parquet"))
            .filter("vec_id >= 5 and vec_id < 10")
            .selectExpr("vec_id as query_id", "embedding")
        )
        served = sorted(
            tuple(r) for r in _trained_serve_from_index(spark, root, batch).collect()
        )
        assert served == inline and len(served) > 0, f"case {case}"


def test_trained_rerank_plan_recall_and_candidate_containment(spark, qs):
    """FULL PRODUCTION STACK rung (round 10): trained coarse cells +
    trained PQ codebooks + exact re-rank. (a) the executed plan touches
    no base table and DPP-prunes BOTH trained staged seeks — the trained
    inverted lists AND the trained-cell-partitioned float-vector copy;
    (b) every hit comes from the trained ADC top-R candidate set and
    its cosine is the true exact cosine; (c) recall@10 vs exact is at
    least the non-reranked trained serve's on the same batch — re-rank
    only reorders a candidate superset, it cannot lose a true hit."""
    from pyspark.sql import Window

    from dataengineerchallenge_spark.queries.vectors import (
        _FRESH_HI,
        _FRESH_LO,
        _RERANK_R,
        _TOP_K,
        _adc_serve_candidates,
        _staged_fresh_query_batch,
        _staged_trained_ivfpq_index,
        _trained_serve_luts,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    df = qs["ivf_pq_trained_rerank_topk"](spark, SF_DIR)
    reranked = df.collect()
    assert len(reranked) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert plan.lower().count("dynamicpruningexpression") >= 2

    # (b) containment in the trained ADC top-R + exact-cosine correctness
    root = _staged_trained_ivfpq_index(spark, SF_DIR)
    batch = spark.read.parquet(_staged_fresh_query_batch(spark, SF_DIR))
    codes, probes, qlut = _trained_serve_luts(spark, root, batch)
    cand = {
        (r.query_id, r.vec_id)
        for r in _adc_serve_candidates(codes, probes, qlut, _RERANK_R).collect()
    }
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(
        (F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    true_cos = {(r.query_id, r.vec_id): round(r.cos, 4) for r in pairs.collect()}
    for r in reranked:
        assert (r.query_id, r.vec_id) in cand
        assert abs(true_cos[(r.query_id, r.vec_id)] - r.cosine) <= 1e-4

    # (c) recall dominance over the non-reranked trained serve
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .collect()
    }
    got = {(r.query_id, r.vec_id) for r in reranked}
    plain = {
        (r.query_id, r.vec_id)
        for r in qs["ivf_pq_trained_serve_topk"](spark, SF_DIR).collect()
    }
    assert len(got & exact) >= len(plain & exact)


def test_trained_rerank_k64_dominates_k10_and_keeps_serve_plan(spark, qs):
    """Production-resolution rung (round 11): the k=64 trained codebook
    composed with exact re-rank must (a) keep the zero-base-scan DPP
    serve plan — resolution changes the staged artifact, never the
    serve shape; (b) recall@10 vs exact at least the k=10 rerank
    rung's on the same fresh batch (more codes per subspace = finer
    ADC ranking = a candidate set at least as good, and the re-rank
    tail is shared)."""
    from pyspark.sql import Window

    from dataengineerchallenge_spark.queries.vectors import _FRESH_HI, _FRESH_LO, _TOP_K
    from dataengineerchallenge_spark.sources.tables import load_table

    df = qs["ivf_pq_trained_rerank_k64_topk"](spark, SF_DIR)
    k64 = df.collect()
    assert len(k64) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert plan.lower().count("dynamicpruningexpression") >= 2

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(
        (F.col("vec_id") >= _FRESH_LO) & (F.col("vec_id") < _FRESH_HI)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .collect()
    }
    got64 = {(r.query_id, r.vec_id) for r in k64}
    got10 = {
        (r.query_id, r.vec_id)
        for r in qs["ivf_pq_trained_rerank_topk"](spark, SF_DIR).collect()
    }
    assert len(got64 & exact) >= len(got10 & exact)


def test_stream_serve_trained_parity_and_multibatch(spark, qs):
    """Round-11 online rung at the production index: the trained
    streaming serve must drain as multiple micro-batches and append
    EXACTLY the trained batch rung's rows — the shared harness with
    only the serve body swapped cannot change results."""
    from dataengineerchallenge_spark.queries.vectors import (
        _staged_fresh_query_stream,
        _staged_trained_ivfpq_index,
        _stream_serve_fresh,
        _trained_serve_from_index,
    )

    root = _staged_trained_ivfpq_index(spark, SF_DIR)
    payload = _staged_fresh_query_stream(spark, SF_DIR)
    epochs: list = []
    streamed = _stream_serve_fresh(
        spark, root, payload, epochs=epochs, serve_body=_trained_serve_from_index
    )
    assert len(epochs) >= 2, f"expected a multi-micro-batch drain, got {epochs}"
    batch = qs["ivf_pq_trained_serve_topk"](spark, SF_DIR)
    srows = sorted(tuple(r) for r in streamed.collect())
    brows = sorted(tuple(r) for r in batch.collect())
    assert srows == brows and len(srows) > 0


def test_trained_rerank_k256_synth_dominates_k64_same_corpus(spark, qs):
    """Round-13 full-resolution rung: on the staged synthetic 5000-vector
    separable corpus (the smallest that trains 256 centroids per
    subspace honestly), the k=256 stack must (a) keep the zero-base-scan
    DPP serve shape; (b) hit recall@10 >= the k=64 stack built over the
    SAME corpus and batch (finer ADC ranking => a candidate set at least
    as good, shared re-rank tail); (c) clear an absolute floor the
    separable geometry promises (each query's true top-10 is its tight
    co-cluster, which 2-probe + R=50 re-rank must recover)."""
    from pyspark.sql import Window

    from dataengineerchallenge_spark.queries.vectors import (
        _RERANK_R,
        _TOP_K,
        _adc_serve_candidates,
        _exact_rerank_tail,
        _staged_fresh_query_batch,
        _staged_synth_ann_corpus_dir,
        _staged_trained_ivfpq_index,
        _staged_trained_ivfpq_vectors,
        _trained_serve_luts,
    )

    df = qs["ivf_pq_trained_rerank_k256_synth_topk"](spark, SF_DIR)
    k256 = df.collect()
    assert len(k256) > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "embeddings" not in plan
    assert plan.lower().count("dynamicpruningexpression") >= 2

    synth = _staged_synth_ann_corpus_dir(spark, SF_DIR)
    emb = spark.read.parquet(f"{synth}/embeddings.parquet")
    batch = spark.read.parquet(_staged_fresh_query_batch(spark, synth))
    q = batch.select("query_id", F.col("embedding").alias("q_emb"))
    pairs = F.broadcast(q).join(emb, F.col("query_id") != F.col("vec_id")).select(
        "query_id", "vec_id", V.cosine(F.col("q_emb"), F.col("embedding")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    exact = {
        (r.query_id, r.vec_id)
        for r in pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _TOP_K)
        .collect()
    }
    # k=64 stack over the SAME synthetic corpus and batch
    root64 = _staged_trained_ivfpq_index(spark, synth, 64)
    vroot = _staged_trained_ivfpq_vectors(spark, synth)
    codes, probes, qlut = _trained_serve_luts(spark, root64, batch)
    cand = _adc_serve_candidates(codes, probes, qlut, _RERANK_R)
    k64 = _exact_rerank_tail(spark, vroot, batch, cand).collect()

    got256 = {(r.query_id, r.vec_id) for r in k256}
    got64 = {(r.query_id, r.vec_id) for r in k64}
    r256 = len(got256 & exact) / len(exact)
    r64 = len(got64 & exact) / len(exact)
    assert r256 >= r64, f"k256 recall {r256:.2f} below k64 {r64:.2f}"
    assert r256 >= 0.9, f"k256 recall {r256:.2f} under the separable floor"
