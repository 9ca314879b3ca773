"""Registered ML queries (D6/W5; /root/reference/README.md:18-23).

Feature frames are hash-checked against DuckDB (that is where data bugs
hide); model prediction frames are rows-only per the driver contract
(non-SQL-expressible), with quality pinned by tests/test_ml.py against
naive baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.ml.features import (
    LOAD_FEATURES_ORACLE,
    USER_FEATURES_ORACLE_TAIL,
    load_feature_frame,
    user_feature_frame,
)
from dataengineerchallenge_spark.ml.models import _fit_predict, key_split, time_split
from dataengineerchallenge_spark.functions.hashing import duck_u32, spark_u32
from dataengineerchallenge_spark.operators.sessionize import events_session_cte
from dataengineerchallenge_spark.registry import register


@register("load_features", oracle=LOAD_FEATURES_ORACLE)
def load_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: per-minute load with trailing range-frame features (the
    MLE-1 design matrix), hash-checked."""
    return load_feature_frame(spark, sf_dir)


@register(
    "user_session_features",
    oracle=events_session_cte() + USER_FEATURES_ORACLE_TAIL,
)
def user_session_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral features + MLE-2/3 targets, hash-checked."""
    return user_feature_frame(spark, sf_dir)


@register("predict_next_minute_load")
def predict_next_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE goal 1 (README.md:19): expected requests in the next minute.
    Temporal 80/20 split; linear model over trailing-window features."""
    feats = load_feature_frame(spark, sf_dir)
    train, test = time_split(feats, "minute_epoch_s")
    pred = _fit_predict(
        train, test, ["prev_1m", "sum_5m", "avg_5m", "minute_of_hour"], "n_requests"
    )
    return pred.select(
        "minute_epoch_s", "n_requests", F.round("prediction", 4).alias("predicted_requests")
    )


@register("predict_session_length")
def predict_session_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE goal 2 (README.md:21): expected session length for a given
    IP. Key-hash 80/20 split over users; behavioral features exclude the
    duration target itself."""
    feats = user_feature_frame(spark, sf_dir)
    train, test = key_split(feats, "user_id")
    pred = _fit_predict(
        train, test, ["n_sessions", "avg_hits", "total_hits", "active_span_s"], "avg_session_s"
    )
    return pred.select(
        "user_id", "avg_session_s", F.round("prediction", 4).alias("predicted_session_s")
    )


@register("predict_unique_urls")
def predict_unique_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE goal 3 (README.md:23): expected unique URL visits for a given
    IP (per-session average)."""
    feats = user_feature_frame(spark, sf_dir)
    train, test = key_split(feats, "user_id")
    pred = _fit_predict(
        train, test, ["n_sessions", "avg_hits", "total_hits", "active_span_s"], "avg_unique_urls"
    )
    return pred.select(
        "user_id", "avg_unique_urls", F.round("prediction", 4).alias("predicted_unique_urls")
    )


@register(
    "per_minute_load_dense",
    oracle="""
    WITH base AS (
      SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ),
    spine AS (
      SELECT unnest(range((SELECT min(m) FROM base),
                          (SELECT max(m) FROM base) + 60, 60)) AS minute_epoch_s
    )
    SELECT s.minute_epoch_s, coalesce(b.n, 0) AS n_requests
    FROM spine s LEFT JOIN base b ON b.m = s.minute_epoch_s
    """,
)
def per_minute_load_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-minute load: a generated minute spine (F.sequence →
    explode, no driver loop) left-joined to the observed counts, zero
    minutes explicit. Time-series models need the dense series —
    rangeBetween features (load_features) handle gaps, but lag-k row
    features and FFT-ish methods do not. The spine frame is one row per
    minute — broadcast side of the join at any horizon."""
    from dataengineerchallenge_spark.ml.features import minute_load

    base = minute_load(spark, sf_dir)
    bounds = base.agg(
        F.min("minute_epoch_s").alias("lo"), F.max("minute_epoch_s").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(60))).alias("minute_epoch_s")
    )
    return spine.join(base, "minute_epoch_s", "left").select(
        "minute_epoch_s",
        F.coalesce(F.col("n_requests"), F.lit(0)).cast("long").alias("n_requests"),
    )


@register("kmeans_embedding_clusters")
def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 beyond regression: seeded KMeans (k = 8, k-means|| init) over
    the embeddings table — the trained coarse quantizer an IVF index
    would use where no labels exist (ivf_topk's centroids come from
    labels; this learns them). Rows-only (iterative fit); determinism and
    assignment sanity pinned in tests/test_ml.py. At 100 TB each
    iteration is one treeAggregate over the vectors — linear passes, and
    scoring is a broadcast-centroid map."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from dataengineerchallenge_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=8, seed=42, maxIter=20, tol=1e-6).fit(emb)
    return (
        model.transform(emb)
        .select("vec_id", "label", F.col("prediction").alias("cluster"))
    )


@register("predict_session_length_gbt")
def predict_session_length_gbt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE goal 2, gradient-boosted variant: same features and key-hash
    split as predict_session_length, but a seeded GBTRegressor — the
    non-linear model that swaps in behind the identical assembler
    (ml/models.py design note). Full subsampling + all-features strategy
    keeps the fit deterministic under a fixed seed; determinism is pinned
    in tests/test_ml.py."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    feats = user_feature_frame(spark, sf_dir)
    train, test = key_split(feats, "user_id")
    cols = ["n_sessions", "avg_hits", "total_hits", "active_span_s"]
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=cols, outputCol="features"),
            GBTRegressor(
                featuresCol="features", labelCol="avg_session_s",
                predictionCol="prediction", maxIter=10, maxDepth=3,
                seed=42, subsamplingRate=1.0, featureSubsetStrategy="all",
            ),
        ]
    )
    pred = pipe.fit(train).transform(test)
    return pred.select(
        "user_id", "avg_session_s", F.round("prediction", 4).alias("predicted_session_s")
    )


@register(
    "loo_target_encode_events",
    oracle="""
WITH v AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS vc
  FROM events
),
t AS (
  SELECT event_type, SUM(vc) AS s, count(*) AS n FROM v GROUP BY event_type
),
g AS (SELECT SUM(vc) AS gs, count(*) AS gn FROM v)
SELECT v.event_id, v.event_type,
       CAST(v.vc AS BIGINT) AS value_cents,
       CAST(ROUND(CASE WHEN t.n > 1
                  THEN (t.s - v.vc) * 100.0 / (t.n - 1)
                  ELSE (g.gs - v.vc) * 100.0 / (g.gn - 1) END)
            AS BIGINT) AS loo_micropoints
FROM v JOIN t ON t.event_type = v.event_type CROSS JOIN g
""",
)
def loo_target_encode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6++ leave-one-out TARGET ENCODING (Micci-Barreca SIGKDD
    Explorations 2001 — the standard high-cardinality categorical
    encoder): each event's type is encoded as the mean target (value)
    over OTHER rows of the same type, (sum - own) / (n - 1) — the
    leave-one-out form that removes the self-leakage a naive group-mean
    feature injects (a model can read its own label out of a plain
    group mean; LOO is the per-row correction that makes the feature
    honest). Singleton groups fall back to the leave-one-out GLOBAL
    prior. Values are integerized to cents before summation (exact
    bigint sums) and the encoding ships as integer MICROPOINTS (1e-4
    value units) — a ROUND(4) double hit an exact .00005 tie on the
    fixture where Spark (HALF_UP) and DuckDB (half-away) disagree; an
    integer landing is tie-free (the exact.py / BM25 discipline).

    Feeds the same model frames as `ml/features.py`; unlike the
    rows-only MLlib fits, the ENCODER itself hash-verifies — encoders
    are where silent leakage bugs live, so this is the half that
    deserves the oracle.

    Scale shape: one partial-agg per type + a broadcast 1-row global
    prior + a broadcast type-stat join back onto the fact rows — the
    fact table is scanned once and never shuffled (type stats are
    KB-scale); the LOO arithmetic is per-row map-side."""
    from dataengineerchallenge_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
    )
    t = v.groupBy("event_type").agg(
        F.sum("vc").alias("s"), F.count(F.lit(1)).alias("n")
    )
    g = v.agg(F.sum("vc").alias("gs"), F.count(F.lit(1)).alias("gn"))
    enc = F.when(
        F.col("n") > 1,
        (F.col("s") - F.col("vc")) * 100.0 / (F.col("n") - 1),
    ).otherwise(
        (F.col("gs") - F.col("vc")) * 100.0 / (F.col("gn") - 1)
    )
    return (
        v.join(F.broadcast(t), "event_type")
        .crossJoin(F.broadcast(g))
        .select(
            "event_id",
            "event_type",
            F.col("vc").cast("long").alias("value_cents"),
            F.round(enc, 0).cast("bigint").alias("loo_micropoints"),
        )
    )


_KFOLD_K = 5


@register(
    "kfold_assignment_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             ({duck_u32("doc_id || '~fold'")}) % {_KFOLD_K} AS fold,
             len(string_split(text, ' ')) AS n_words,
             round(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
                   + 0.3 * round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                                 / len(string_split(text, ' ')), 4)
                   + 0.3 * (1.0 - round(len(list_filter(string_split(text, ' '),
                                w -> list_contains(['the', 'a'], w)))::DOUBLE
                                / len(string_split(text, ' ')), 4)), 5) AS q
      FROM documents
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(ROUND(q * 100000, 0) AS BIGINT)) AS BIGINT)
             AS sum_quality_upoints
    FROM d GROUP BY fold
    """,
)
def kfold_assignment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-FOLD assignment + per-fold balance audit — the
    split hygiene step before any cross-validated fit (D6 family): fold
    = md5-u32(doc_id ‖ salt) mod {_KFOLD_K}, so the assignment is a pure
    function of the key (reproducible across runs, engines, and
    cluster sizes — never Spark's `randomSplit`, whose partitioning-
    dependent RNG cannot be replayed by an oracle). Per fold: doc
    count, token count, and summed quality in integer 1e-5 points —
    the three balance checks that catch a skewed split before it
    poisons a validation score. Balance itself is pinned in
    tests/test_ml.py-style bounds via the oracle hash; the fold hash
    reuses the engine's one cross-engine u32 construct.

    Scale: one map pass + a {_KFOLD_K}-row aggregate."""
    from dataengineerchallenge_spark.queries.text import quality_frame
    from dataengineerchallenge_spark.sources.tables import load_table

    docs = quality_frame(load_table(spark, sf_dir, "documents"))
    fold = F.expr(spark_u32("concat(cast(doc_id as string), '~fold')")) % _KFOLD_K
    return (
        docs.select(
            fold.alias("fold"),
            F.col("n_words").cast("long").alias("w"),
            F.round(F.col("quality") * 100000, 0).cast("long").alias("qu"),
        )
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_tokens"),
            F.sum("qu").cast("long").alias("sum_quality_upoints"),
        )
        .select(
            F.col("fold").cast("long"),
            "n_docs",
            "n_tokens",
            "sum_quality_upoints",
        )
    )
