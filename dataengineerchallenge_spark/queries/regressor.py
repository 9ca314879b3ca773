"""In-engine trained ridge regressor — hash-green train → score → eval
closing the reference's MLE goals 2-3 (/root/reference/README.md:21-23:
predict session length and unique URL visits for a given IP), which
until this round were answered only by rows-only MLlib fits
(ml/models.py). VERDICT r18 next-round #1.

The round-18 quality classifier proved the recipe (integer g/H
registers, one shared Cramer expression text evaluated by DuckDB SQL
and CPython, weights re-entering plans as exact shortest-repr
literals); ridge/OLS is strictly easier — the normal equations

    (XᵀX + λ·diag(0,1,1,1)) w = Xᵀy

need ONE moment pass over the training rows, no iteration. Both MLE
targets share the same design matrix, so one 18-register aggregate
(10 upper-triangle XᵀX terms + 4 Xᵀy terms per target) trains BOTH
models: y_a = avg session seconds, y_b = avg unique URLs per session.

Model: per-user behavioral frame from the same sessionizer every batch
query uses (operators/sessionize.py), x = (1, n_sessions, avg_hits,
active_span_hours) — features that do not leak either target — split
80/20 by the engine's one cross-engine u32 hash (never randomSplit:
partitioning-dependent RNG has no oracle). λ = 2⁻⁶ (a power of two —
exactly representable, so the diagonal shift is bit-identical in both
engines), applied to the non-intercept diagonal only (standard ridge).

Float discipline (classifier.py's, minus the loop):

- Every corpus-sized reduction integerizes per-term to the 1e-8 grid
  before summing (order-free bigint addition); measured magnitudes at
  sf0.1 keep every register < 1e17 (int64 headroom ~100×; at larger
  corpora the grid coarsens, the documented classifier trade).
- The 4×4 solve is Cramer by cofactor expansion — the SAME generated
  expression text as the classifier (register names match by
  construction), evaluated driver-side for Spark and inline for
  DuckDB: identical IEEE ops in identical order.
- Trained weights re-enter the scoring plan as CAST('repr' AS DOUBLE)
  literals; the oracle carries them as stored doubles through
  MATERIALIZED CTEs. Predictions land on the 1e-6 integer grid.
- The mean-predictor baseline in the error summary is derived from the
  SAME registers (mean = g0d / h00d), so the skill readout needs no
  second pass.

Scale (100 TB): train is ONE map-side-combinable 18-register aggregate
over the feature frame (itself one sessionize + one per-user agg);
the solve is a driver-side 4×4; scoring is a stateless map with
broadcast-literal weights. Nothing iterates, nothing collects beyond
18 bigints.

Exact-fit pin (tests/test_r19.py): on a 4-row Hadamard design with
y = x1 and λ = 0, the solver recovers w = (0, 1, 0, 0) bit-exactly
(XᵀX = 4I, all Cramer terms integer-valued in IEEE), the same
closed-form recovery argument the classifier pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.functions.hashing import duck_u32, spark_u32
from dataengineerchallenge_spark.operators.sessionize import (
    events_session_cte,
    session_stats,
)
from dataengineerchallenge_spark.queries.classifier import (
    _QC_DELTAS,
    _QC_DET,
    _half_up,
    _wlit,
)
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table, local_frame

_RG_LAM = 0.015625  # 2^-6 — exact in binary, exact diagonal shift
# int64 saturation guard for the 1e-8-grid moment registers: Spark's
# non-ANSI double→bigint cast clamps at ±(2^63−1) silently while DuckDB
# errors, so a register anywhere near the edge means the two engines
# have already diverged. 9e17 leaves a ~10× margin under 2^63 ≈ 9.22e18.
_RG_REG_BOUND = int(9e17)
_RG_MOD = 10
_RG_TRAIN_BUCKETS = 8
_RG_SALT = "~ridge"
_RG_X = ("1.0", "x1", "x2", "x3")
_RG_HKEYS = [(k, l) for k in range(4) for l in range(4) if k <= l]

# one term-text generator, consumed verbatim by BOTH engines
_RG_HTERMS = {
    (k, l): (
        f"sum(cast(round(({_RG_X[k]} * {_RG_X[l]})"
        f" * 100000000.0, 0) as bigint))"
    )
    for (k, l) in _RG_HKEYS
}


def _rg_gterms(ycol: str) -> list[str]:
    return [
        f"sum(cast(round(({x} * {ycol}) * 100000000.0, 0) as bigint))"
        for x in _RG_X
    ]


# prediction text over the frame columns — w{i} placeholders are
# substituted with exact literals (Spark) or CTE-qualified names (SQL)
_RG_Z = "(((w0 + (x1 * w1)) + (x2 * w2)) + (x3 * w3))"

_RG_REG_NAMES = (
    [f"h{k}{l}" for (k, l) in _RG_HKEYS]
    + [f"ga{i}" for i in range(4)]
    + [f"gb{i}" for i in range(4)]
)
_RG_REG_TERMS = (
    [_RG_HTERMS[kl] for kl in _RG_HKEYS] + _rg_gterms("ya") + _rg_gterms("yb")
)


def _rg_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, x1, x2, x3, ya, yb, bucket) — mirrors the oracle's
    ufeat CTE token for token over the shared sessionizer."""
    ev = load_table(spark, sf_dir, "events")
    sess = session_stats(ev)
    return (
        sess.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x1"),
            F.round(F.avg("n_hits"), 4).alias("x2"),
            ((F.max("end_s") - F.min("start_s")) / 3600.0).alias("x3"),
            F.round(F.avg("duration_s"), 4).alias("ya"),
            F.round(F.avg("n_unique_urls"), 4).alias("yb"),
        )
        .withColumn(
            "bucket",
            F.expr(spark_u32(f"concat(cast(user_id as string), '{_RG_SALT}')"))
            % _RG_MOD,
        )
    )


def ridge_solve(
    row, lam: float = _RG_LAM
) -> tuple[tuple[float, ...], tuple[float, ...], float, float]:
    """Driver-side close over the 18 integer moment registers (any
    mapping name → bigint): widen, penalize the non-intercept diagonal,
    run two shared-text Cramer solves. Split out of :func:`ridge_fit`
    so the streaming twin's drained register fold closes through the
    IDENTICAL arithmetic."""
    if any(row[n] is None for n in _RG_REG_NAMES):
        raise RuntimeError(
            "ridge fit: NULL moment registers — the training frame is "
            "empty (sum over zero rows); fit needs at least one user"
        )
    for n in _RG_REG_NAMES:
        if abs(row[n]) > _RG_REG_BOUND:
            raise RuntimeError(
                f"ridge fit: moment register {n} = {row[n]} exceeds the "
                f"int64 headroom bound {_RG_REG_BOUND} — the 1e-8 grid "
                "saturates on this corpus; coarsen the grid rather than "
                "let Spark's non-ANSI cast truncate silently "
                "(raise-don't-truncate)"
            )
    henv = {
        f"h{k}{l}d": row[f"h{k}{l}"] / 100000000.0 for (k, l) in _RG_HKEYS
    }
    for k in (1, 2, 3):
        henv[f"h{k}{k}d"] = row[f"h{k}{k}"] / 100000000.0 + lam
    if eval(_QC_DET, {"__builtins__": {}}, dict(henv)) == 0.0:  # noqa: S307
        raise RuntimeError(
            "ridge fit: singular penalized normal matrix (det == 0) — "
            "features are collinear and lambda is zero; refusing to "
            "divide (raise-don't-truncate)"
        )
    ws = []
    for g in ("ga", "gb"):
        env = dict(henv)
        for i in range(4):
            env[f"g{i}d"] = row[f"{g}{i}"] / 100000000.0
        ws.append(
            tuple(
                eval(d, {"__builtins__": {}}, dict(env))  # noqa: S307 — repo-generated arithmetic text
                for d in _QC_DELTAS
            )
        )
    mean_a = (row["ga0"] / 100000000.0) / (row["h00"] / 100000000.0)
    mean_b = (row["gb0"] / 100000000.0) / (row["h00"] / 100000000.0)
    return ws[0], ws[1], mean_a, mean_b


def ridge_fit(
    train: DataFrame, lam: float = _RG_LAM
) -> tuple[tuple[float, ...], tuple[float, ...], float, float]:
    """ONE distributed 18-register moment pass over ``train`` (columns
    x1 x2 x3 ya yb), then the driver-side :func:`ridge_solve`. Returns
    (w_a, w_b, mean_a, mean_b) — the means are the baseline
    predictors, free from the same registers."""
    row = train.agg(
        *[F.expr(t).alias(n) for n, t in zip(_RG_REG_NAMES, _RG_REG_TERMS)]
    ).collect()[0]
    return ridge_solve(row, lam)


def train_session_ridge(
    spark: SparkSession, sf_dir: str
) -> tuple[tuple[float, ...], tuple[float, ...], float, float]:
    feats = _rg_feats(spark, sf_dir).localCheckpoint()
    return ridge_fit(feats.filter(F.col("bucket") < _RG_TRAIN_BUCKETS))


def _pred_text(w: tuple[float, ...]) -> str:
    zt = _RG_Z
    for i in range(4):
        zt = zt.replace(f"w{i}", _wlit(w[i]))
    return zt


def _rg_oracle_head() -> str:
    """sessions → ufeat → train split → registers → widened env →
    two weight CTEs (wa, wb) — the shared prefix of all three rungs."""
    gh = ",\n           ".join(
        [f"{_RG_HTERMS[(k, l)]} AS h{k}{l}" for (k, l) in _RG_HKEYS]
        + [f"{t} AS ga{i}" for i, t in enumerate(_rg_gterms("ya"))]
        + [f"{t} AS gb{i}" for i, t in enumerate(_rg_gterms("yb"))]
    )
    widen_h = ", ".join(
        f"h{k}{l} / 100000000.0"
        + (f" + {_RG_LAM!r}" if k == l and k > 0 else "")
        + f" AS h{k}{l}d"
        for (k, l) in _RG_HKEYS
    )
    cte = events_session_cte()
    solves = []
    for tag, g in (("wa", "ga"), ("wb", "gb")):
        widen_g = ", ".join(
            f"{g}{i} / 100000000.0 AS g{i}d" for i in range(4)
        )
        solves.append(
            f"""sd{tag} AS MATERIALIZED (
      SELECT {widen_g}, {widen_h} FROM s
    ), {tag} AS MATERIALIZED (
      SELECT ({_QC_DELTAS[0]}) AS w0, ({_QC_DELTAS[1]}) AS w1,
             ({_QC_DELTAS[2]}) AS w2, ({_QC_DELTAS[3]}) AS w3
      FROM sd{tag}
    )"""
        )
    return f"""{cte}, ufeat AS MATERIALIZED (
      SELECT skey AS user_id,
             CAST(COUNT(*) AS DOUBLE) AS x1,
             round(AVG(n_hits), 4) AS x2,
             (MAX(end_s) - MIN(start_s)) / 3600.0 AS x3,
             round(AVG(duration_s), 4) AS ya,
             round(AVG(n_unique_urls), 4) AS yb,
             ({duck_u32(f"CAST(skey AS VARCHAR) || '{_RG_SALT}'")})
               % {_RG_MOD} AS bucket
      FROM sessions GROUP BY skey
    ), tr AS MATERIALIZED (
      SELECT * FROM ufeat WHERE bucket < {_RG_TRAIN_BUCKETS}
    ), s AS MATERIALIZED (
      SELECT {gh} FROM tr
    ), {", ".join(solves)}"""


def _rg_z_sql(tag: str) -> str:
    zt = _RG_Z
    for i in range(4):
        zt = zt.replace(f"w{i}", f"{tag}.w{i}")
    return zt


_RG_TRAIN_ORACLE = f"""
    {_rg_oracle_head()}
    SELECT 'avg_session_s' AS target,
           CAST(ROUND(w0 * 1000000000.0, 0) AS BIGINT) AS w0_nano,
           CAST(ROUND(w1 * 1000000000.0, 0) AS BIGINT) AS w1_nano,
           CAST(ROUND(w2 * 1000000000.0, 0) AS BIGINT) AS w2_nano,
           CAST(ROUND(w3 * 1000000000.0, 0) AS BIGINT) AS w3_nano
    FROM wa
    UNION ALL
    SELECT 'avg_unique_urls' AS target,
           CAST(ROUND(w0 * 1000000000.0, 0) AS BIGINT) AS w0_nano,
           CAST(ROUND(w1 * 1000000000.0, 0) AS BIGINT) AS w1_nano,
           CAST(ROUND(w2 * 1000000000.0, 0) AS BIGINT) AS w2_nano,
           CAST(ROUND(w3 * 1000000000.0, 0) AS BIGINT) AS w3_nano
    FROM wb
    """


@register("session_length_ridge", oracle=_RG_TRAIN_ORACLE)
def session_length_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN rung: exact ridge weight vectors for BOTH per-IP MLE
    targets (session length, unique URLs — README.md:21-23), nano-
    integerized and hash-verified against the closed-form normal-
    equation oracle — every XᵀX/Xᵀy register and both Cramer solves
    must agree bit-for-bit. One moment pass trains both models;
    tests/test_r19.py pins the Hadamard exact-fit recovery
    (w = (0, 1, 0, 0) at λ = 0) and ridge shrinkage toward it."""
    wa, wb, _, _ = train_session_ridge(spark, sf_dir)
    rows = [
        ("avg_session_s", *[_half_up(w * 1000000000.0) for w in wa]),
        ("avg_unique_urls", *[_half_up(w * 1000000000.0) for w in wb]),
    ]
    return local_frame(
        spark,
        rows,
        "target string, w0_nano long, w1_nano long, w2_nano long, "
        "w3_nano long",
    )


@register(
    "session_ridge_holdout_predictions",
    oracle=f"""
    {_rg_oracle_head()}, te AS MATERIALIZED (
      SELECT * FROM ufeat WHERE bucket >= {_RG_TRAIN_BUCKETS}
    )
    SELECT te.user_id,
           CAST(ROUND(ya * 1000000.0, 0) AS BIGINT) AS session_s_micro,
           CAST(ROUND(({_rg_z_sql("wa")}) * 1000000.0, 0) AS BIGINT)
             AS pred_session_s_micro,
           CAST(ROUND(yb * 1000000.0, 0) AS BIGINT) AS unique_urls_micro,
           CAST(ROUND(({_rg_z_sql("wb")}) * 1000000.0, 0) AS BIGINT)
             AS pred_unique_urls_micro
    FROM te CROSS JOIN wa CROSS JOIN wb
    """,
)
def session_ridge_holdout_predictions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCORE rung: per-IP predictions for both targets on the held-out
    hash buckets (the users the model never saw) — the reference's own
    question answered hash-green: 'given an IP, expect this session
    length and this many unique visits'. Weights re-enter the plan as
    exact literals; predictions land on the 1e-6 grid. Scoring is a
    stateless map pass — no join, no shuffle beyond the feature agg."""
    feats = _rg_feats(spark, sf_dir).localCheckpoint()
    wa, wb, _, _ = ridge_fit(
        feats.filter(F.col("bucket") < _RG_TRAIN_BUCKETS)
    )
    te = feats.filter(F.col("bucket") >= _RG_TRAIN_BUCKETS)
    micro = "cast(round({} * 1000000.0, 0) as bigint)"
    return te.select(
        "user_id",
        F.expr(micro.format("ya")).alias("session_s_micro"),
        F.expr(micro.format(f"({_pred_text(wa)})")).alias(
            "pred_session_s_micro"
        ),
        F.expr(micro.format("yb")).alias("unique_urls_micro"),
        F.expr(micro.format(f"({_pred_text(wb)})")).alias(
            "pred_unique_urls_micro"
        ),
    )


@register(
    "session_ridge_error_summary",
    oracle=f"""
    {_rg_oracle_head()}, te AS MATERIALIZED (
      SELECT * FROM ufeat WHERE bucket >= {_RG_TRAIN_BUCKETS}
    ), ea AS (
      SELECT CAST(ROUND(abs(ya - ({_rg_z_sql("wa")})) * 1000000.0, 0)
               AS BIGINT) AS err,
             CAST(ROUND(abs(ya - (SELECT g0d / h00d FROM sdwa))
               * 1000000.0, 0) AS BIGINT) AS berr
      FROM te CROSS JOIN wa
    ), eb AS (
      SELECT CAST(ROUND(abs(yb - ({_rg_z_sql("wb")})) * 1000000.0, 0)
               AS BIGINT) AS err,
             CAST(ROUND(abs(yb - (SELECT g0d / h00d FROM sdwb))
               * 1000000.0, 0) AS BIGINT) AS berr
      FROM te CROSS JOIN wb
    )
    SELECT 'avg_session_s' AS target,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(ROUND(SUM(err) * 1.0 / COUNT(*), 0) AS BIGINT)
             AS mae_micro,
           CAST(ROUND(SUM(berr) * 1.0 / COUNT(*), 0) AS BIGINT)
             AS baseline_mae_micro
    FROM ea
    UNION ALL
    SELECT 'avg_unique_urls' AS target,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(ROUND(SUM(err) * 1.0 / COUNT(*), 0) AS BIGINT)
             AS mae_micro,
           CAST(ROUND(SUM(berr) * 1.0 / COUNT(*), 0) AS BIGINT)
             AS baseline_mae_micro
    FROM eb
    """,
)
def session_ridge_error_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL rung: held-out MAE per target (1e-6 grid) next to the
    train-mean baseline MAE — the skill readout, derived from the SAME
    moment registers (baseline mean = g0d / h00d, no second pass). A
    model worth shipping must beat its mean predictor; the margin is
    pinned in tests/test_r19.py and priced against the MLlib fits in
    OBSERVATIONS.md (VERDICT r18 stretch #7)."""
    feats = _rg_feats(spark, sf_dir).localCheckpoint()
    wa, wb, mean_a, mean_b = ridge_fit(
        feats.filter(F.col("bucket") < _RG_TRAIN_BUCKETS)
    )
    te = feats.filter(F.col("bucket") >= _RG_TRAIN_BUCKETS)
    err = "cast(round(abs({} - ({})) * 1000000.0, 0) as bigint)"
    parts = []
    for target, ycol, w, mean in (
        ("avg_session_s", "ya", wa, mean_a),
        ("avg_unique_urls", "yb", wb, mean_b),
    ):
        scored = te.select(
            F.expr(err.format(ycol, _pred_text(w))).alias("err"),
            F.expr(err.format(ycol, _wlit(mean))).alias("berr"),
        )
        parts.append(
            scored.agg(
                F.lit(target).alias("target"),
                F.count(F.lit(1)).cast("long").alias("n_test"),
                F.expr(
                    "cast(round(sum(err) * 1.0 / count(1), 0) as bigint)"
                ).alias("mae_micro"),
                F.expr(
                    "cast(round(sum(berr) * 1.0 / count(1), 0) as bigint)"
                ).alias("baseline_mae_micro"),
            )
        )
    return parts[0].unionByName(parts[1])


def _staged_ridge_feature_stream(spark: SparkSession, sf_dir: str) -> str:
    """(user_id, x1, x2, x3, ya, yb, bucket) feature rows written as 4
    hash-partitioned files for the multi-micro-batch replay."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        write_result(
            _rg_feats(spark, sf_dir).repartition(4, "user_id"), str(out)
        )

    return staged(
        spark,
        "ridge_feats",
        Path(sf_dir) / "events.parquet",
        "ridge_feature_stream:v1",
        build,
    )


@register("stream_session_length_ridge", oracle=_RG_TRAIN_ORACLE)
def stream_session_length_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``session_length_ridge`` — the purest register
    twin in the repo: the trainer's state is EXACTLY 18 bigint moment
    registers, linear in the rows by construction, so each micro-batch
    aggregates its own partial registers over its train-bucket rows and
    commits them under an epoch_id-keyed overwrite (the cm/HLL/GK/AUC
    drain contract); the drained fold is one 18-column SUM, and
    :func:`ridge_solve` closes through the identical Cramer arithmetic.
    Unlike the classifier twin (which must carry the grouped feature
    grid because Newton revisits the data), nothing here scales with
    history — per-epoch state is 18 integers, full stop. Shares the
    batch rung's closed-form normal-equation oracle hash-for-hash, and
    stream ≡ batch is pinned row-for-row in pytest."""
    import shutil
    import tempfile

    payload = _staged_ridge_feature_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_ridge_")
    regs_dir, ckpt = f"{scratch}/regs", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        # epoch_id-keyed overwrite: idempotent under micro-batch retry
        reg = mb.filter(F.col("bucket") < _RG_TRAIN_BUCKETS).agg(
            *[
                F.expr(t).alias(n)
                for n, t in zip(_RG_REG_NAMES, _RG_REG_TERMS)
            ]
        )
        # an all-holdout batch sums over zero rows -> NULL registers;
        # drop the row (contributes nothing) instead of folding NULLs
        reg.na.drop().write.mode("overwrite").parquet(
            f"{regs_dir}/epoch_id={epoch_id}"
        )

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "ridge stream")
        row = (
            spark.read.parquet(regs_dir)
            .agg(*[F.sum(n).alias(n) for n in _RG_REG_NAMES])
            .collect()[0]
        )
        wa, wb, _, _ = ridge_solve(row)
        rows = [
            ("avg_session_s", *[_half_up(w * 1000000000.0) for w in wa]),
            ("avg_unique_urls", *[_half_up(w * 1000000000.0) for w in wb]),
        ]
        result = local_frame(
            spark,
            rows,
            "target string, w0_nano long, w1_nano long, w2_nano long, "
            "w3_nano long",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result


# --- MLE goal 1: next-minute load, the same recipe on the time axis ---

_LD_FEAT_SQL = """
base AS (
  SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
), feat AS MATERIALIZED (
  SELECT m AS minute_epoch_s,
         CAST(coalesce(sum(n) OVER (ORDER BY m
              RANGE BETWEEN 60 PRECEDING AND 60 PRECEDING), 0) AS DOUBLE)
           AS x1,
         round(coalesce(avg(n) OVER (ORDER BY m
              RANGE BETWEEN 300 PRECEDING AND 60 PRECEDING), 0.0), 4)
           AS x2,
         CAST(CAST((m / 60) % 60 AS INT) AS DOUBLE) AS x3,
         CAST(n AS DOUBLE) AS ya
  FROM base
), bounds AS MATERIALIZED (
  SELECT MIN(minute_epoch_s) AS tmin, MAX(minute_epoch_s) AS tmax
  FROM feat
)"""


def _ld_feats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(minute_epoch_s, x1=prev_1m, x2=avg_5m, x3=minute_of_hour,
    ya=n_requests) — the hash-green load_features frame re-aliased to
    the regressor's column contract. sum_5m is deliberately dropped:
    it is 5·avg_5m up to window-edge rounding, the near-collinear pair
    the ridge penalty exists for but the honest model simply omits."""
    from dataengineerchallenge_spark.ml.features import load_feature_frame

    f = load_feature_frame(spark, sf_dir)
    return f.select(
        "minute_epoch_s",
        F.col("prev_1m").cast("double").alias("x1"),
        F.col("avg_5m").alias("x2"),
        F.col("minute_of_hour").cast("double").alias("x3"),
        F.col("n_requests").cast("double").alias("ya"),
    )


def _ld_oracle_head() -> str:
    """feat → temporal 80/20 split → registers → widened env → weight
    CTE (wa) — the load model's shared oracle prefix. ONE target, so
    the gb registers are aliased copies of ga (ridge_solve's 2-target
    contract, second solve discarded)."""
    gh = ",\n           ".join(
        [f"{_RG_HTERMS[(k, l)]} AS h{k}{l}" for (k, l) in _RG_HKEYS]
        + [f"{t} AS ga{i}" for i, t in enumerate(_rg_gterms("ya"))]
    )
    widen_h = ", ".join(
        f"h{k}{l} / 100000000.0"
        + (f" + {_RG_LAM!r}" if k == l and k > 0 else "")
        + f" AS h{k}{l}d"
        for (k, l) in _RG_HKEYS
    )
    widen_g = ", ".join(f"ga{i} / 100000000.0 AS g{i}d" for i in range(4))
    return f"""WITH {_LD_FEAT_SQL}, tr AS MATERIALIZED (
      SELECT f.* FROM feat f CROSS JOIN bounds b
      WHERE f.minute_epoch_s <= b.tmin + ((b.tmax - b.tmin) * 8) // 10
    ), s AS MATERIALIZED (
      SELECT {gh} FROM tr
    ), sdwa AS MATERIALIZED (
      SELECT {widen_g}, {widen_h} FROM s
    ), wa AS MATERIALIZED (
      SELECT ({_QC_DELTAS[0]}) AS w0, ({_QC_DELTAS[1]}) AS w1,
             ({_QC_DELTAS[2]}) AS w2, ({_QC_DELTAS[3]}) AS w3
      FROM sdwa
    )"""


def _ld_fit(spark: SparkSession, sf_dir: str):
    """Temporal-split fit: integer cutoff tmin + 8(tmax−tmin) div 10
    (both engines' floor division agrees on non-negative operands),
    then the shared 14-register moment pass + Cramer close."""
    feats = _ld_feats(spark, sf_dir).localCheckpoint()
    b = feats.agg(
        F.min("minute_epoch_s").alias("tmin"),
        F.max("minute_epoch_s").alias("tmax"),
    ).collect()[0]
    cutoff = b["tmin"] + ((b["tmax"] - b["tmin"]) * 8) // 10
    train = feats.filter(F.col("minute_epoch_s") <= cutoff)
    names = [f"h{k}{l}" for (k, l) in _RG_HKEYS] + [
        f"ga{i}" for i in range(4)
    ]
    terms = [_RG_HTERMS[kl] for kl in _RG_HKEYS] + _rg_gterms("ya")
    row = train.agg(
        *[F.expr(t).alias(n) for n, t in zip(names, terms)]
    ).collect()[0]
    regs = {n: row[n] for n in names}
    for i in range(4):
        regs[f"gb{i}"] = regs[f"ga{i}"]  # ridge_solve's 2-target contract
    wa, _, mean_a, _ = ridge_solve(regs)
    return feats, cutoff, wa, mean_a


@register(
    "next_minute_load_ridge",
    oracle=f"""
    {_ld_oracle_head()}
    SELECT 'n_requests' AS target,
           CAST(ROUND(w0 * 1000000000.0, 0) AS BIGINT) AS w0_nano,
           CAST(ROUND(w1 * 1000000000.0, 0) AS BIGINT) AS w1_nano,
           CAST(ROUND(w2 * 1000000000.0, 0) AS BIGINT) AS w2_nano,
           CAST(ROUND(w3 * 1000000000.0, 0) AS BIGINT) AS w3_nano
    FROM wa
    """,
)
def next_minute_load_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLE goal 1 answered hash-green (README.md:19 — expected load in
    the next minute), completing the set: with the r19 session ridge
    (goals 2-3) every ML question the reference poses now trains,
    scores and grades inside the hash gate, and the rows-only MLlib
    fits (`predict_next_minute_load`) remain as priced contrast. Same
    exact normal-equation machinery on the time axis: x = (1, prev_1m,
    avg_5m, minute_of_hour) from the hash-green `load_features` frame
    (sum_5m dropped — 5·avg_5m up to edge rounding, the collinear
    trap), TEMPORAL 80/20 split on an integer cutoff (a random split
    would leak the future — ml/models.py's own discipline), one
    14-register integerized moment pass, shared-text Cramer close."""
    _, _, wa, _ = _ld_fit(spark, sf_dir)
    rows = [("n_requests", *[_half_up(w * 1000000000.0) for w in wa])]
    return local_frame(
        spark,
        rows,
        "target string, w0_nano long, w1_nano long, w2_nano long, "
        "w3_nano long",
    )


@register(
    "load_ridge_error_summary",
    oracle=f"""
    {_ld_oracle_head()}, te AS MATERIALIZED (
      SELECT f.* FROM feat f CROSS JOIN bounds b
      WHERE f.minute_epoch_s > b.tmin + ((b.tmax - b.tmin) * 8) // 10
    ), ea AS (
      SELECT CAST(ROUND(abs(ya - ({_rg_z_sql("wa")})) * 1000000.0, 0)
               AS BIGINT) AS err,
             CAST(ROUND(abs(ya - x1) * 1000000.0, 0) AS BIGINT) AS perr
      FROM te CROSS JOIN wa
    )
    SELECT 'n_requests' AS target,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(ROUND(SUM(err) * 1.0 / COUNT(*), 0) AS BIGINT)
             AS mae_micro,
           CAST(ROUND(SUM(perr) * 1.0 / COUNT(*), 0) AS BIGINT)
             AS persistence_mae_micro
    FROM ea
    """,
)
def load_ridge_error_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL rung for the load model: held-out MAE next to the
    PERSISTENCE baseline (ŷ = last minute's load — the naive
    forecaster MASE normalizes by, `forecast_backtest_hourly_load`'s
    yardstick on the minute grain). A forecaster worth shipping must
    beat persistence; the margin is pinned in tests/test_r19.py."""
    feats, cutoff, wa, _ = _ld_fit(spark, sf_dir)
    te = feats.filter(F.col("minute_epoch_s") > cutoff)
    err = "cast(round(abs({} - ({})) * 1000000.0, 0) as bigint)"
    scored = te.select(
        F.expr(err.format("ya", _pred_text(wa))).alias("err"),
        F.expr(err.format("ya", "x1")).alias("perr"),
    )
    return scored.agg(
        F.lit("n_requests").alias("target"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.expr(
            "cast(round(sum(err) * 1.0 / count(1), 0) as bigint)"
        ).alias("mae_micro"),
        F.expr(
            "cast(round(sum(perr) * 1.0 / count(1), 0) as bigint)"
        ).alias("persistence_mae_micro"),
    )


_LD_REG_NAMES = [f"h{k}{l}" for (k, l) in _RG_HKEYS] + [
    f"ga{i}" for i in range(4)
]
_LD_REG_TERMS = [_RG_HTERMS[kl] for kl in _RG_HKEYS] + _rg_gterms("ya")


def _staged_load_feature_stream(spark: SparkSession, sf_dir: str) -> str:
    """(minute_epoch_s, x1, x2, x3, ya) feature rows written as 4
    hash-partitioned files for the multi-micro-batch replay — the load
    twin of `_staged_ridge_feature_stream`."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        write_result(
            _ld_feats(spark, sf_dir).repartition(4, "minute_epoch_s"),
            str(out),
        )

    return staged(
        spark,
        "load_feats",
        Path(sf_dir) / "events.parquet",
        "load_feature_stream:v1",
        build,
    )


@register(
    "stream_next_minute_load_ridge",
    oracle=f"""
    {_ld_oracle_head()}
    SELECT 'n_requests' AS target,
           CAST(ROUND(w0 * 1000000000.0, 0) AS BIGINT) AS w0_nano,
           CAST(ROUND(w1 * 1000000000.0, 0) AS BIGINT) AS w1_nano,
           CAST(ROUND(w2 * 1000000000.0, 0) AS BIGINT) AS w2_nano,
           CAST(ROUND(w3 * 1000000000.0, 0) AS BIGINT) AS w3_nano
    FROM wa
    """,
)
def stream_next_minute_load_ridge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ONLINE twin of ``next_minute_load_ridge`` (VERDICT r19 next-round
    #5) — MLE goal 1 is the naturally online question ("expected load in
    the NEXT minute"), and its trainer state is the same linear moment
    registers as the session ridge: 14 bigints (10 Hessian + 4 gradient,
    one target), so each micro-batch aggregates its own partial
    registers over its train-window rows and commits them under an
    epoch_id-keyed overwrite; the drained fold is one 14-column SUM and
    :func:`ridge_solve` closes through the identical Cramer arithmetic
    (gb aliased to ga — the 2-target contract, second solve discarded).
    The temporal cutoff is computed once from the staged payload before
    the stream starts — in production the train-window boundary is
    fixed configuration by train time, and a row's membership is then
    row-local, exactly like the session twin's bucket predicate. Shares
    the batch rung's closed-form oracle hash-for-hash; stream ≡ batch
    weights pinned bit-for-bit in pytest."""
    import shutil
    import tempfile

    payload = _staged_load_feature_stream(spark, sf_dir)
    b = (
        spark.read.parquet(payload)
        .agg(
            F.min("minute_epoch_s").alias("tmin"),
            F.max("minute_epoch_s").alias("tmax"),
        )
        .collect()[0]
    )
    cutoff = b["tmin"] + ((b["tmax"] - b["tmin"]) * 8) // 10
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_loadridge_")
    regs_dir, ckpt = f"{scratch}/regs", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        # epoch_id-keyed overwrite: idempotent under micro-batch retry
        reg = mb.filter(F.col("minute_epoch_s") <= cutoff).agg(
            *[
                F.expr(t).alias(n)
                for n, t in zip(_LD_REG_NAMES, _LD_REG_TERMS)
            ]
        )
        # an all-holdout batch sums over zero rows -> NULL registers;
        # drop the row (contributes nothing) instead of folding NULLs
        reg.na.drop().write.mode("overwrite").parquet(
            f"{regs_dir}/epoch_id={epoch_id}"
        )

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "load ridge stream")
        row = (
            spark.read.parquet(regs_dir)
            .agg(*[F.sum(n).alias(n) for n in _LD_REG_NAMES])
            .collect()[0]
        )
        regs = {n: row[n] for n in _LD_REG_NAMES}
        for i in range(4):
            regs[f"gb{i}"] = regs[f"ga{i}"]  # 2-target contract
        wa, _, _, _ = ridge_solve(regs)
        result = local_frame(
            spark,
            [("n_requests", *[_half_up(w * 1000000000.0) for w in wa])],
            "target string, w0_nano long, w1_nano long, w2_nano long, "
            "w3_nano long",
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result
