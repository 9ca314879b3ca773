"""Observation-analytics battery (the reference's open-ended mandate:
"make analytical observations about the data",
/root/reference/README.md:5) — the composed session/event analyses an
operator of the marketplace would actually run: conversion funnels and
cohort retention.

Both are single-exchange plans: every window/aggregate/join keys on
``user_id``, so Catalyst reuses one hashpartition(user_id) shuffle for
the whole pipeline — the same 100 TB story as the sessionizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table, local_frame


@register(
    "conversion_funnel",
    oracle="""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS u, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    v AS (SELECT u, min(ts_s) AS tv FROM ev WHERE event_type = 'view' GROUP BY u),
    c AS (SELECT ev.u, min(ev.ts_s) AS tc
          FROM ev JOIN v ON ev.u = v.u AND ev.ts_s >= v.tv
          WHERE event_type = 'click' GROUP BY ev.u),
    p AS (SELECT ev.u, min(ev.ts_s) AS tp
          FROM ev JOIN c ON ev.u = c.u AND ev.ts_s >= c.tc
          WHERE event_type = 'purchase' GROUP BY ev.u)
    SELECT 'view' AS stage, CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
    UNION ALL
    SELECT 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
    UNION ALL
    SELECT 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view → click → purchase funnel: a user advances a stage
    only with an event at-or-after their previous stage's first event.

    One pass over events: three stacked per-user windows (each stage's
    first-timestamp conditions on the previous stage's column) share a
    single hashpartition(user_id) exchange; the final count is a tiny
    unpivoted aggregate. No self-joins — the oracle's three-way join
    formulation collapses into window algebra."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("u"),
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
    )
    w = Window.partitionBy("u")
    staged = (
        ev.withColumn(
            "tv", F.min(F.when(F.col("event_type") == "view", F.col("ts_s"))).over(w)
        )
        .withColumn(
            "tc",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts_s") >= F.col("tv")),
                    F.col("ts_s"),
                )
            ).over(w),
        )
        .withColumn(
            "tp",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts_s") >= F.col("tc")),
                    F.col("ts_s"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("u").agg(
        F.first("tv").alias("tv"), F.first("tc").alias("tc"), F.first("tp").alias("tp")
    )
    totals = per_user.agg(
        F.count("tv").alias("view"),
        F.count("tc").alias("click"),
        F.count("tp").alias("purchase"),
    )
    return totals.select(
        F.expr(
            "stack(3, 'view', view, 'click', click, 'purchase', purchase) AS (stage, n_users)"
        )
    ).select("stage", F.col("n_users").cast("long").alias("n_users"))


@register(
    "weekly_cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT CAST(user_id AS VARCHAR) AS u,
             CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS wk
      FROM events
    ),
    firsts AS (SELECT u, min(wk) AS cohort FROM ev GROUP BY u),
    act AS (
      SELECT DISTINCT ev.u, firsts.cohort,
             (ev.wk - firsts.cohort) // 604800 AS week_offset
      FROM ev JOIN firsts USING (u)
    )
    SELECT cohort AS cohort_week_s,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM act GROUP BY 1, 2
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (Monday-truncated, UTC both engines), counted in each subsequent week
    they were active.

    TWO exchanges total: one user-keyed aggregate collects each user's
    cohort AND distinct active-week set in the same pass (collect_set is
    bounded by the number of calendar weeks, so state per user is tiny at
    any scale), then exploding the set yields already-distinct
    (user, week) rows — no join back to the source and no separate
    distinct, which a naive first-week ⋈ activity formulation (the
    oracle's shape) would each pay another exchange for."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("u"),
        F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("wk"),
    )
    per_user = ev.groupBy("u").agg(
        F.min("wk").alias("cohort"), F.collect_set("wk").alias("wks")
    )
    act = per_user.select("cohort", F.explode("wks").alias("wk")).select(
        "cohort", ((F.col("wk") - F.col("cohort")) / 604800).cast("long").alias("week_offset")
    )
    return act.groupBy(
        F.col("cohort").alias("cohort_week_s"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "event_value_outliers",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    st AS (
      SELECT event_type,
             count(*)::BIGINT AS n,
             sum(cents)::BIGINT AS s,
             sum(cents * cents)::BIGINT AS sq
      FROM c GROUP BY event_type
    )
    SELECT c.event_id, c.event_type,
           CAST(c.cents AS BIGINT) AS cents,
           ROUND((c.cents - s::DOUBLE / n)
                 / sqrt((sq::DOUBLE - s::DOUBLE * s::DOUBLE / n) / (n - 1)), 4) AS z
    FROM c JOIN st USING (event_type)
    WHERE abs((c.cents - s::DOUBLE / n)
              / sqrt((sq::DOUBLE - s::DOUBLE * s::DOUBLE / n) / (n - 1))) > 3.0
    """,
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier detection over event values — the data
    quality screen that precedes any training-data cut.

    Determinism discipline: mean and variance derive from exact integer
    cents sums (count/sum/sum-of-squares), so both engines evaluate the
    identical double expression on identical integers — no float
    accumulation-order drift to flip the |z| > 3 boundary. Plan: one
    partial-aggregatable pass builds the tiny per-type stats frame, which
    broadcasts back onto the scan — at 100 TB the second pass is a
    map-only filter."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    st = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("sq"),
    )
    sd = F.col("s").cast("double")
    z = (F.col("cents") - sd / F.col("n")) / F.sqrt(
        (F.col("sq").cast("double") - sd * sd / F.col("n")) / (F.col("n") - 1)
    )
    return (
        c.join(F.broadcast(st), "event_type")
        .withColumn("_z", z)
        .filter(F.abs(F.col("_z")) > 3.0)
        .select("event_id", "event_type", "cents", F.round("_z", 4).alias("z"))
    )

@register(
    "salted_join_type_engagement",
    oracle="""
    WITH dim AS (
      SELECT CAST(user_id AS VARCHAR) AS u, count(*)::BIGINT AS user_events
      FROM events GROUP BY 1
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d.user_events) AS BIGINT) AS sum_user_events
    FROM (SELECT CAST(user_id AS VARCHAR) AS u, event_type FROM events) e
    JOIN dim d ON e.u = d.u
    GROUP BY e.event_type
    """,
)
def salted_join_type_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe enrichment join under the correctness gate: events join
    their per-user activity dim through ``operators.skew.salted_join``
    (content-hash salt on event_id shards any hot user across 16
    reducers; the dim replicates 16×). The aggregate proves join
    multiplicity is exactly that of the plain join."""
    from dataengineerchallenge_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("u"), "event_type", "event_id"
    )
    dim = ev.groupBy("u").agg(F.count(F.lit(1)).alias("user_events"))
    joined = salted_join(ev, dim, key="u", salt_on="event_id", n_salts=16)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_events").alias("sum_user_events"),
    )


@register(
    "rolling_7day_user_value",
    oracle="""
    WITH e AS (
      SELECT CAST(user_id AS VARCHAR) AS u,
             CAST(event_id AS VARCHAR) AS event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    SELECT u, event_id, ts_s,
           CAST(SUM(cents) OVER w AS BIGINT) AS trail_7d_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS trail_7d_events
    FROM e
    WINDOW w AS (PARTITION BY u ORDER BY ts_s
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_7day_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5 rolling RANGE frame: per-user trailing 7-day spend and event
    count at every event — a time-based frame over epoch seconds, not a
    row-count frame, so gaps and ties are handled by value (tied
    timestamps are frame peers on both engines — no order ambiguity).
    Sums are exact integer cents. One shuffle on user_id; the frame scan
    is a single sorted pass per partition."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.col("user_id").cast("string").alias("u"),
        F.col("event_id").cast("string").alias("event_id"),
        F.unix_timestamp("ts").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("u").orderBy("ts_s").rangeBetween(-604800, 0)
    return e.select(
        "u",
        "event_id",
        "ts_s",
        F.sum("cents").over(w).alias("trail_7d_cents"),
        F.count(F.lit(1)).over(w).alias("trail_7d_events"),
    )


@register(
    "per_minute_load_gapfilled",
    oracle="""
    WITH bounds AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT) // 60) * 60 AS lo,
             (CAST(floor(epoch(max(ts))) AS BIGINT) // 60) * 60 AS hi
      FROM events
    ), spine AS (
      SELECT unnest(range(lo, hi + 60, 60)) AS minute_epoch_s FROM bounds
    ), agg AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS minute_epoch_s,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT s.minute_epoch_s,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_requests
    FROM spine s LEFT JOIN agg a USING (minute_epoch_s)
    """,
)
def per_minute_load_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: the per-minute load joined onto a
    COMPLETE minute spine (sequence() over the observed range, exploded),
    zero-filling silent minutes — forecasting features (load_features)
    need a contiguous series, and "no events" is a real observation, not
    a missing row. The spine derives from a 1-row min/max aggregate and
    explodes distributed (~43k minutes/month); the fill join is a
    broadcast of the aggregate onto the spine."""
    ev = load_table(spark, sf_dir, "events")
    minute = (F.unix_timestamp("ts") / 60).cast("long") * 60
    agg = ev.groupBy(minute.alias("minute_epoch_s")).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        ((F.unix_timestamp(F.min("ts")) / 60).cast("long") * 60).alias("lo"),
        ((F.unix_timestamp(F.max("ts")) / 60).cast("long") * 60).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(60))).alias("minute_epoch_s")
    )
    return spine.join(agg, "minute_epoch_s", "left").select(
        "minute_epoch_s", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_requests")
    )


@register(
    "event_value_correlations",
    oracle="""
    SELECT event_type,
           ROUND(corr(value, CAST(floor(epoch(ts)) % 86400 AS DOUBLE)), 4)
             AS corr_value_timeofday,
           ROUND(covar_samp(value, CAST(floor(epoch(ts)) % 86400 AS DOUBLE)), 2)
             AS covar_value_timeofday,
           ROUND(stddev_samp(value), 4) AS value_stddev,
           ROUND(skewness(value), 4) AS value_skewness
    FROM events
    GROUP BY event_type
    """,
)
def event_value_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 statistical aggregates: per-type Pearson correlation and sample
    covariance of value against time-of-day, plus spread and skewness —
    the profiling pass behind drift monitors. All are algebraic
    aggregates (sum/sum-of-products moments), so they partial-aggregate
    map-side like any sum; one shuffle of 5 moment tuples.

    Definition trap, pinned here: Spark's ``skewness`` is the population
    g1, DuckDB's the bias-corrected sample G1 — the √(n(n−1))/(n−2)
    rescale makes them the same statistic."""
    ev = load_table(spark, sf_dir, "events")
    tod = (F.unix_timestamp("ts") % 86400).cast("double")
    n = F.count(F.lit(1)).cast("double")
    g1_to_G1 = F.sqrt(n * (n - 1)) / (n - 2)
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", tod), 4).alias("corr_value_timeofday"),
        F.round(F.covar_samp("value", tod), 2).alias("covar_value_timeofday"),
        F.round(F.stddev_samp("value"), 4).alias("value_stddev"),
        F.round(F.skewness("value") * g1_to_G1, 4).alias("value_skewness"),
    )


@register(
    "per_minute_value_interpolated",
    oracle="""
    WITH bounds AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT) // 60) * 60 AS lo,
             (CAST(floor(epoch(max(ts))) AS BIGINT) // 60) * 60 AS hi
      FROM events
    ), spine AS (
      SELECT unnest(range(lo, hi + 60, 60)) AS minute_epoch_s FROM bounds
    ), obs AS (
      -- round the per-minute mean to 6 BEFORE interpolating: engines
      -- accumulate avg() in different orders (last-ULP drift), and the
      -- interpolation arithmetic amplifies that onto round-4 ties;
      -- from identical double inputs the identical expression tree is
      -- IEEE-deterministic in both engines
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS minute_epoch_s,
             round(avg(value), 6) AS v
      FROM events GROUP BY 1
    ), j AS (
      SELECT s.minute_epoch_s AS t, obs.v FROM spine s
      LEFT JOIN obs ON obs.minute_epoch_s = s.minute_epoch_s
    ), filled AS (
      SELECT t, v,
             last_value(v IGNORE NULLS) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
               (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(v IGNORE NULLS) OVER
               (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER
               (ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM j
    )
    SELECT t AS minute_epoch_s,
           v IS NOT NULL AS observed,
           -- micro-unit integerization via floor(x*1e4 + 0.5), NOT
           -- round(x, 4): both engines compute the identical double and
           -- floor it binary-exactly, where round() diverges on the
           -- frequent grid ties (Spark rounds the shortest decimal
           -- repr, DuckDB the raw binary) — exact.py discipline
           CAST(floor(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
           END * 10000 + 0.5) AS BIGINT) AS value_interp_e4
    FROM filled
    """,
)
def per_minute_value_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10+ time-series resample with LINEAR INTERPOLATION: per-minute
    mean(value) on a complete minute spine, with unobserved minutes
    interpolated between their neighboring observations — the sensor/
    metric resampling twin of ``per_minute_load_gapfilled`` (where zero
    IS the observation, counts need no interpolation; a mean VALUE in a
    silent minute is genuinely missing and must be estimated).

    Edge minutes before the first / after the last observation clamp to
    the nearest observed value (no extrapolation) — unreachable here
    since the spine spans observed bounds, but encoded identically in
    both engines anyway.

    Scale note: the interpolation windows are GLOBAL (no partition key)
    — safe because they run over the per-minute AGGREGATE, whose row
    count is bounded by the time span (~526k rows/year) regardless of
    corpus size, never over raw events. For multi-entity series,
    partition the same windows by the entity key."""
    ev = load_table(spark, sf_dir, "events")
    minute = (F.unix_timestamp("ts") / 60).cast("long") * 60
    obs = ev.groupBy(minute.alias("minute_epoch_s")).agg(
        F.round(F.avg("value"), 6).alias("v")
    )
    bounds = ev.agg(
        ((F.unix_timestamp(F.min("ts")) / 60).cast("long") * 60).alias("lo"),
        ((F.unix_timestamp(F.max("ts")) / 60).cast("long") * 60).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(60))).alias("minute_epoch_s")
    )
    j = spine.join(obs, "minute_epoch_s", "left")
    t = F.col("minute_epoch_s")
    # BOTH direction fills are running last() frames (unbounded-preceding
    # → current), the forward one over ascending and the backward one
    # over DESCENDING minute order — never a currentRow→unboundedFollowing
    # first(), which Spark evaluates O(n²) per partition (measured 49 s
    # vs 0.8 s on the 43k-minute series in the r5 plan audit)
    wb = Window.orderBy("minute_epoch_s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wr = Window.orderBy(F.desc("minute_epoch_s")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    obs_t = F.when(F.col("v").isNotNull(), t)
    filled = j.select(
        t,
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(wb).alias("pt"),
        F.last("v", ignorenulls=True).over(wr).alias("nv"),
        F.last(obs_t, ignorenulls=True).over(wr).alias("nt"),
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv")) * (t - F.col("pt")) / (F.col("nt") - F.col("pt"))
        )
    )
    return filled.select(
        "minute_epoch_s",
        F.col("v").isNotNull().alias("observed"),
        F.floor(interp * 10000 + F.lit(0.5)).cast("long").alias("value_interp_e4"),
    )


@register(
    "per_minute_load_ewma",
    oracle="""
    WITH bounds AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT) // 60) * 60 AS lo,
             (CAST(floor(epoch(max(ts))) AS BIGINT) // 60) * 60 AS hi
      FROM events
    ), spine AS (
      SELECT unnest(range(lo, hi + 60, 60)) AS minute_epoch_s FROM bounds
    ), agg AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS minute_epoch_s,
             count(*) AS n
      FROM events GROUP BY 1
    ), series AS (
      SELECT s.minute_epoch_s AS t,
             CAST(COALESCE(agg.n, 0) AS DOUBLE) AS x
      FROM spine s LEFT JOIN agg USING (minute_epoch_s)
    ), windowed AS (
      SELECT t, x,
             list(x) OVER (ORDER BY t ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
               AS xs
      FROM series
    )
    SELECT t AS minute_epoch_s,
           CAST(x AS BIGINT) AS n_requests,
           CAST(floor(
             list_sum([xs[len(xs) - i] * pow(0.5, i)
                       FOR i IN range(0, len(xs))])
             / (2.0 - pow(0.5, len(xs) - 1)) * 10000 + 0.5) AS BIGINT)
             AS ewma_e4
    FROM windowed
    """,
)
def per_minute_load_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10+/W5+ exponentially weighted moving average of the per-minute
    load (finite 30-minute horizon, normalized weights) — the smoothed
    feature the load-prediction model (MLE goal 1,
    /root/reference/README.md:19) consumes instead of the raw spiky
    series. Runs over the zero-filled spine (per_minute_load_gapfilled
    semantics) so lag positions are true minutes, not observation ranks.

    EWMA's recurrence is not a SQL window aggregate, but the finite-
    horizon form IS: collect the trailing-30 window into an array and
    fold weight*value with higher-order functions — JVM-side in Spark
    (transform/aggregate), a list comprehension in the DuckDB twin.

    Cross-engine float discipline: decay 0.5 EXACTLY so pow(0.5, i) is a
    binary-exact double in any IEEE libm (an 0.9-style decay can drift a
    ULP between engines' pow implementations); the fold then computes
    identical doubles in both engines, integerized to e4 micro-units via
    floor(x*1e4+0.5) (see per_minute_value_interpolated for why not
    round()).

    Scale note: same bounded-series stance as the interpolation query —
    the global window runs over the per-minute aggregate (~526k
    rows/year), never raw events."""
    ev = load_table(spark, sf_dir, "events")
    minute = (F.unix_timestamp("ts") / 60).cast("long") * 60
    agg = ev.groupBy(minute.alias("minute_epoch_s")).agg(F.count(F.lit(1)).alias("n"))
    bounds = ev.agg(
        ((F.unix_timestamp(F.min("ts")) / 60).cast("long") * 60).alias("lo"),
        ((F.unix_timestamp(F.max("ts")) / 60).cast("long") * 60).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(60))).alias("minute_epoch_s")
    )
    series = spine.join(agg, "minute_epoch_s", "left").select(
        "minute_epoch_s", F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("x")
    )
    w = Window.orderBy("minute_epoch_s").rowsBetween(-29, Window.currentRow)
    windowed = series.select(
        "minute_epoch_s", "x", F.collect_list("x").over(w).alias("xs")
    )
    m = F.size("xs")
    num = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: F.element_at(F.col("xs"), m - i) * F.pow(F.lit(0.5), i),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    den = F.lit(2.0) - F.pow(F.lit(0.5), (m - 1).cast("double"))
    return windowed.select(
        "minute_epoch_s",
        F.col("x").cast("long").alias("n_requests"),
        F.floor(num / den * 10000 + F.lit(0.5)).cast("long").alias("ewma_e4"),
    )


_MAD_ORACLE = """
    WITH bounds AS (
      SELECT (CAST(floor(epoch(min(ts))) AS BIGINT) // 3600) * 3600 AS lo,
             (CAST(floor(epoch(max(ts))) AS BIGINT) // 3600) * 3600 AS hi
      FROM events
    ), spine AS (
      SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_epoch_s FROM bounds
    ), agg AS (
      SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS hour_epoch_s,
             count(*) AS n
      FROM events GROUP BY 1
    ), series AS (
      SELECT s.hour_epoch_s, CAST(COALESCE(a.n, 0) AS BIGINT) AS x
      FROM spine s LEFT JOIN agg a USING (hour_epoch_s)
    ), hist AS (
      SELECT x, count(*) AS cnt FROM series GROUP BY x
    ), cum AS (
      SELECT x, SUM(cnt) OVER (ORDER BY x) AS cum,
             SUM(cnt) OVER () AS n_total
      FROM hist
    ), med AS (
      SELECT MIN(x) AS med FROM cum WHERE cum >= (n_total * 50 + 99) // 100
    ), dev AS (
      SELECT s.hour_epoch_s, s.x, ABS(s.x - m.med) AS d, m.med
      FROM series s CROSS JOIN med m
    ), dhist AS (
      SELECT d, count(*) AS cnt FROM dev GROUP BY d
    ), dcum AS (
      SELECT d, SUM(cnt) OVER (ORDER BY d) AS cum,
             SUM(cnt) OVER () AS n_total
      FROM dhist
    ), mad AS (
      SELECT MIN(d) AS mad FROM dcum WHERE cum >= (n_total * 50 + 99) // 100
    )
    SELECT v.hour_epoch_s,
           v.x AS n_requests,
           v.med AS median_load,
           a.mad AS mad_load,
           v.d AS abs_deviation
    FROM dev v CROSS JOIN mad a
    WHERE v.d > 3 * a.mad
    """


@register("hourly_load_anomalies_mad", oracle=_MAD_ORACLE)
def hourly_load_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly detection over the zero-filled
    per-hour load series: flag hours whose load deviates from the
    global median by more than 3 median-absolute-deviations. Everything
    is INTEGER arithmetic — the nearest-rank median of an integer series
    is an actual datum, the MAD is the nearest-rank median of integer
    deviations, and the 3*MAD threshold compares integers — so the query
    hash-matches DuckDB bit-for-bit with no float discipline needed
    (mean/stddev z-scores would drag sum-order double drift in).

    Scale shape: both medians come from VALUE HISTOGRAMS (group the
    series by its value, cumulative-sum the counts, pick the first value
    whose running count reaches ceil(n/2)) — the sorted set is the
    distinct-value histogram (bounded by max load, not hours), so
    nothing ever global-sorts the raw series; the spine explode and the
    two histogram windows are the same shapes per_minute_load_gapfilled
    and the nearest-rank percentile queries already carry at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.unix_timestamp("ts") / 3600).cast("long") * 3600
    agg = ev.groupBy(hour.alias("hour_epoch_s")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return _mad_anomalies(_hour_spine_series(agg))


def _hour_spine_series(agg: DataFrame) -> DataFrame:
    """(hour_epoch_s, n) partial-count frame -> the zero-filled complete
    series (hour_epoch_s, x). Bounds come from the aggregate itself (the
    first/last hour each contain >= 1 event by construction, so this
    equals raw-timestamp bounds)."""
    bounds = agg.agg(
        F.min("hour_epoch_s").alias("lo"), F.max("hour_epoch_s").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))).alias(
            "hour_epoch_s"
        )
    )
    return spine.join(agg, "hour_epoch_s", "left").select(
        "hour_epoch_s", F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("x")
    )


def _nearest_rank_median(df: DataFrame, col: str, out: str) -> DataFrame:
    """1-row frame: nearest-rank median of an integer column via its
    value histogram (no global sort of the raw rows)."""
    hist = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.col(col),
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_total"),
    )
    k = ((F.col("n_total") * 50 + 99) / 100).cast("long")
    return cum.filter(F.col("cum") >= k).agg(F.min(col).alias(out))


def _mad_anomalies(series: DataFrame) -> DataFrame:
    """(hour_epoch_s, x) series -> hours where |x - median| > 3 * MAD,
    medians nearest-rank over value histograms (all-integer, drift-free)."""
    med = _nearest_rank_median(series, "x", "med")
    dev = series.crossJoin(F.broadcast(med)).select(
        "hour_epoch_s",
        "x",
        F.col("med"),
        F.abs(F.col("x") - F.col("med")).alias("d"),
    )
    mad = _nearest_rank_median(dev, "d", "mad")
    return (
        dev.crossJoin(F.broadcast(mad))
        .filter(F.col("d") > 3 * F.col("mad"))
        .select(
            "hour_epoch_s",
            F.col("x").alias("n_requests"),
            F.col("med").alias("median_load"),
            F.col("mad").alias("mad_load"),
            F.col("d").alias("abs_deviation"),
        )
    )


def _staged_event_hour_stream(spark: SparkSession, sf_dir: str) -> str:
    """events reduced to (event_id, hour_epoch_s) and written as 4
    hash-partitioned files so maxFilesPerTrigger=1 replays a real
    multi-micro-batch stream (same staging shape as
    sketches._staged_event_key_stream)."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        ev = load_table(spark, sf_dir, "events")
        hours = ev.select(
            "event_id",
            ((F.unix_timestamp("ts") / 3600).cast("long") * 3600).alias(
                "hour_epoch_s"
            ),
        )
        write_result(hours.repartition(4, "event_id"), str(out))

    return staged(
        spark,
        "mad_hours",
        Path(sf_dir) / "events.parquet",
        "mad_hours",
        build,
    )


@register("stream_hourly_anomalies_mad", oracle=_MAD_ORACLE)
def stream_hourly_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``hourly_load_anomalies_mad``: events arrive as a
    tailed file stream (one file per trigger) and each micro-batch folds
    only its OWN per-hour partial counts into a run-scoped store via
    foreachBatch — the monitoring loop a production pipeline runs, where
    history is never re-scanned and per-batch state is one tiny algebraic
    append (rows = hours present in the batch). Because hour counts are
    sums, the drained store merges to EXACTLY the batch series whatever
    the stream slicing, so the final median/MAD anomaly screen shares the
    batch query's DuckDB oracle hash-for-hash (the same stream==batch
    contract as ``stream_cm_heavy_hitters``); stream-vs-batch parity is
    pinned in tests/test_analytics_r12.py."""
    import shutil
    import tempfile

    payload = _staged_event_hour_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_mad_")
    hours_dir, ckpt = f"{scratch}/hours", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        # epoch_id-keyed overwrite: a retried micro-batch rewrites its
        # own partition instead of double-counting the sum-merged hour
        # counts (ADVICE r12).
        mb.groupBy("hour_epoch_s").agg(F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(f"{hours_dir}/epoch_id={epoch_id}")

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "stream mad")
        merged = (
            spark.read.parquet(hours_dir)
            .groupBy("hour_epoch_s")
            .agg(F.sum("n").alias("n"))
        )
        out = _mad_anomalies(_hour_spine_series(merged))
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result


@register(
    "forecast_backtest_hourly_load",
    oracle="""
WITH h AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
         count(*) AS y
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM h),
grid AS (
  SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds
),
d AS (
  SELECT g.hour_s, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN h ON h.hour_s = g.hour_s
),
l AS (
  SELECT hour_s, y,
         lag(y, 1)  OVER (ORDER BY hour_s) AS naive,
         lag(y, 24) OVER (ORDER BY hour_s) AS snaive
  FROM d
),
e AS (SELECT * FROM l WHERE snaive IS NOT NULL),
m AS (
  SELECT count(*) AS n,
         SUM(ABS(y - naive)) AS ae_n, SUM((y - naive) * (y - naive)) AS se_n,
         SUM(ABS(y - snaive)) AS ae_s, SUM((y - snaive) * (y - snaive)) AS se_s
  FROM e
)
SELECT 'naive' AS model, CAST(n AS BIGINT) AS n_eval_points,
       ROUND(ae_n * 1.0 / n, 4) AS mae,
       ROUND(sqrt(se_n * 1.0 / n), 4) AS rmse,
       CAST(1.0 AS DOUBLE) AS mase_vs_naive
FROM m
UNION ALL
SELECT 'seasonal_naive', CAST(n AS BIGINT),
       ROUND(ae_s * 1.0 / n, 4),
       ROUND(sqrt(se_s * 1.0 / n), 4),
       ROUND(ae_s * 1.0 / ae_n, 4)
FROM m
""",
)
def forecast_backtest_hourly_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ML-eval anchor: in-engine forecast BACKTEST of the hourly load
    series against the two baselines every forecasting result must beat
    before it means anything (Hyndman & Koehler 2006 — MASE's whole
    argument): naive (y_hat = last hour) and seasonal-naive (y_hat =
    same hour yesterday). The series is gap-filled to the dense hourly
    grid first (an empty hour is a real zero, not a missing row), both
    models score the SAME eval window (every hour with a 24h-lag value),
    and the metrics are exact-integer sums rationalized only at the
    final division — so the eval itself hash-verifies, giving the
    rows-only MLlib forecasters (`predict_next_minute_load`) a
    hash-green yardstick: a learned model that can't beat the
    seasonal_naive row's MAE is not yet a model. mase_vs_naive is the
    seasonal model's MAE over the naive MAE (< 1 means daily
    seasonality is real and exploitable in this series).

    Scale shape: one (hour) partial-agg over the fact table, a
    broadcast 1-row bounds frame, a dense-grid explode (720 rows/month
    — trivially driver-safe at any fact scale), and two lags over the
    GRID-sized frame, never the fact table; the global window orders
    hours, not events (at a century of hours, range-partition the grid
    and lift lags across boundaries with the two-level offset trick)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s")
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = h.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_s")
    )
    d = grid.join(h, "hour_s", "left").select(
        "hour_s", F.coalesce("y", F.lit(0)).alias("y")
    )
    w = Window.orderBy("hour_s")
    l = d.select(
        "hour_s",
        "y",
        F.lag("y", 1).over(w).alias("naive"),
        F.lag("y", 24).over(w).alias("snaive"),
    ).filter(F.col("snaive").isNotNull())
    m = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("y") - F.col("naive"))).alias("ae_n"),
        F.sum((F.col("y") - F.col("naive")) * (F.col("y") - F.col("naive"))).alias(
            "se_n"
        ),
        F.sum(F.abs(F.col("y") - F.col("snaive"))).alias("ae_s"),
        F.sum((F.col("y") - F.col("snaive")) * (F.col("y") - F.col("snaive"))).alias(
            "se_s"
        ),
    )
    naive = m.select(
        F.lit("naive").alias("model"),
        F.col("n").cast("long").alias("n_eval_points"),
        F.round(F.col("ae_n") * 1.0 / F.col("n"), 4).alias("mae"),
        F.round(F.sqrt(F.col("se_n") * 1.0 / F.col("n")), 4).alias("rmse"),
        F.lit(1.0).alias("mase_vs_naive"),
    )
    snaive = m.select(
        F.lit("seasonal_naive").alias("model"),
        F.col("n").cast("long").alias("n_eval_points"),
        F.round(F.col("ae_s") * 1.0 / F.col("n"), 4).alias("mae"),
        F.round(F.sqrt(F.col("se_s") * 1.0 / F.col("n")), 4).alias("rmse"),
        F.round(F.col("ae_s") * 1.0 / F.col("ae_n"), 4).alias("mase_vs_naive"),
    )
    return naive.union(snaive)


_ACF_LAGS = (1, 24, 168)


def _acf_oracle() -> str:
    lags = " UNION ALL ".join(f"SELECT {g} AS lag" for g in _ACF_LAGS)
    return f"""
    WITH h AS (
      SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
             count(*) AS y
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM h),
    grid AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds),
    d AS (
      SELECT g.hour_s, COALESCE(h.y, 0) AS y
      FROM grid g LEFT JOIN h ON h.hour_s = g.hour_s
    ),
    lags AS ({lags}),
    p AS (
      SELECT l.lag, a.y AS x, b.y AS y
      FROM lags l
      JOIN d a ON TRUE
      JOIN d b ON b.hour_s = a.hour_s + l.lag * 3600
    ),
    m AS (
      SELECT lag, count(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM p GROUP BY lag
    )
    SELECT lag, CAST(n AS BIGINT) AS n_pairs,
           CAST(ROUND((n * sxy - sx * sy) * 1000000.0
                / sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)))
                AS BIGINT) AS acf_micropoints
    FROM m
    WHERE (n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy) > 0
    """


@register("hourly_load_autocorrelation", oracle=_acf_oracle())
def hourly_load_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A++ lagged AUTOCORRELATION of the hourly load series at lags 1,
    24 and 168 — the seasonality-STRENGTH measurement that justifies
    (or indicts) `forecast_backtest_hourly_load`'s seasonal-naive
    model: a daily cycle shows as acf(24) >> acf(1)'s decay floor, a
    weekly one as acf(168), and a flat series leaves nothing for any
    seasonal model to exploit. Pearson r over the lag-aligned pairs of
    the gap-filled series, computed from INTEGER MOMENT SUMS
    (N·Σxy − Σx·Σy over exact bigint counts — no running means, no
    float accumulation order), rationalized once into micropoints —
    deterministic cross-engine by construction.

    Scale shape: the hourly partial-agg over the fact table is the
    only big-data touch; the lag self-join and moment sums run over
    the 720-row grid frame. A century-long series would range-join on
    the hour key instead of the equi-join — the selection rule is
    unchanged."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s")
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = h.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_s")
    )
    d = grid.join(h, "hour_s", "left").select(
        "hour_s", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    lags = local_frame(spark, [(g,) for g in _ACF_LAGS], "lag int")
    a = d.select(F.col("hour_s").alias("hs"), F.col("y").alias("x"))
    b = d.select(F.col("hour_s").alias("hs_b"), F.col("y").alias("yb"))
    p = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("hs_b") == F.col("hs") + F.col("lag") * 3600)
    )
    m = p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("yb").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("yb") * F.col("yb")).alias("syy"),
        F.sum(F.col("x") * F.col("yb")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    # var_prod == 0 means at least one side of the lag pairing is a
    # CONSTANT series (degenerate fixture): Spark's x/0 yields NULL while
    # DuckDB's yields inf/NaN, so rather than hash-diverge silently both
    # engines DROP the undefined lag row (oracle: WHERE var_prod > 0).
    var_prod = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) * 1.0 * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    )
    den = F.sqrt(var_prod)
    return m.filter(var_prod > 0).select(
        "lag",
        F.col("n").cast("long").alias("n_pairs"),
        F.round(num * 1000000.0 / den, 0).cast("bigint").alias("acf_micropoints"),
    )


_STL_ORACLE = """
WITH h AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
         count(*) AS y
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM h),
grid AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds),
d AS (
  SELECT g.hour_s, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN h ON h.hour_s = g.hour_s
),
ma AS (
  SELECT hour_s, y,
         LAG(y, 12) OVER (ORDER BY hour_s)
           + LEAD(y, 12) OVER (ORDER BY hour_s)
           + 2 * SUM(y) OVER (ORDER BY hour_s
               ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS trend48
  FROM d
),
det AS (
  SELECT hour_s, y, trend48,
         (hour_s / 3600) % 24 AS hod,
         48 * y - trend48 AS detr48
  FROM ma WHERE trend48 IS NOT NULL
),
seas AS (
  SELECT hod,
         CAST(ROUND(SUM(detr48) * 1000000.0 / (48.0 * COUNT(*)), 0) AS BIGINT)
           AS s_micro
  FROM det GROUP BY hod
),
grand AS (
  SELECT CAST(ROUND(SUM(s_micro) * 1.0 / COUNT(*), 0) AS BIGINT) AS g_micro
  FROM seas
)
SELECT det.hour_s,
       CAST(det.y AS BIGINT) AS y,
       CAST(ROUND(det.trend48 * 1000000.0 / 48.0, 0) AS BIGINT)
         AS trend_micropoints,
       CAST(seas.s_micro - grand.g_micro AS BIGINT) AS seasonal_micropoints,
       CAST(det.y * 1000000
            - CAST(ROUND(det.trend48 * 1000000.0 / 48.0, 0) AS BIGINT)
            - (seas.s_micro - grand.g_micro) AS BIGINT)
         AS remainder_micropoints
FROM det JOIN seas USING (hod) CROSS JOIN grand
"""


@register("hourly_load_seasonal_decomposition", oracle=_STL_ORACLE)
def hourly_load_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly load
    (the moving-average skeleton of STL / X-11, public textbook method):
    trend = centered 2x24-term moving average (half weights at the
    ends, the standard even-period filter), seasonal = mean of the
    detrended series per hour-of-day re-centered to sum to ~0,
    remainder = what's left. The three components ADD BACK to the
    observation exactly (y*1e6 == trend + seasonal + remainder in
    micropoints, by construction — remainder is defined as the integer
    difference), which is the decomposition contract monitoring rides
    on: alert on remainder, never on raw load.

    Exactness: the 48x-scaled trend numerator and the 48x-scaled
    detrended values are INTEGERS (y integer counts, integer window
    sums); the only doubles are two final divisions inside ROUND and
    one per-hod mean integerized before the grand-mean sum — no float
    accumulates across rows in engine order.

    Scale: the windows run over the AGGREGATED hourly series (one row
    per hour — a year is 8,760 rows), not events; the single-partition
    sort is bounded by calendar length no matter the corpus size. The
    events->hour aggregate is the only big-data shuffle; the 24-row
    seasonal table broadcasts."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_s")
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = h.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_s")
    )
    d = grid.join(h, "hour_s", "left").select(
        "hour_s", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    w = Window.orderBy("hour_s")
    w_in = Window.orderBy("hour_s").rowsBetween(-11, 11)
    ma = d.select(
        "hour_s",
        "y",
        (
            F.lag("y", 12).over(w)
            + F.lead("y", 12).over(w)
            + 2 * F.sum("y").over(w_in)
        ).alias("trend48"),
    )
    det = ma.filter(F.col("trend48").isNotNull()).select(
        "hour_s",
        "y",
        "trend48",
        ((F.col("hour_s") / 3600) % 24).cast("long").alias("hod"),
        (48 * F.col("y") - F.col("trend48")).alias("detr48"),
    )
    seas = det.groupBy("hod").agg(
        F.round(F.sum("detr48") * 1000000.0 / (48.0 * F.count(F.lit(1))), 0)
        .cast("bigint")
        .alias("s_micro")
    )
    grand = seas.agg(
        F.round(F.sum("s_micro") * 1.0 / F.count(F.lit(1)), 0)
        .cast("bigint")
        .alias("g_micro")
    )
    trend_mp = F.round(F.col("trend48") * 1000000.0 / 48.0, 0).cast("bigint")
    seasonal_mp = (F.col("s_micro") - F.col("g_micro")).cast("bigint")
    return (
        det.join(F.broadcast(seas), "hod")
        .crossJoin(F.broadcast(grand))
        .select(
            "hour_s",
            F.col("y").cast("long").alias("y"),
            trend_mp.alias("trend_micropoints"),
            seasonal_mp.alias("seasonal_micropoints"),
            (F.col("y") * 1000000 - trend_mp - seasonal_mp)
            .cast("bigint")
            .alias("remainder_micropoints"),
        )
    )


_CHANGEPOINT_ORACLE = """
WITH h AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
         count(*) AS y
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM h),
grid AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds),
d AS (
  SELECT g.hour_s, COALESCE(h.y, 0) AS y,
         ROW_NUMBER() OVER (ORDER BY g.hour_s) AS idx
  FROM grid g LEFT JOIN h ON h.hour_s = g.hour_s
),
tot AS (SELECT COUNT(*) AS n, SUM(y) AS s FROM d),
cand AS (
  SELECT hour_s, idx,
         SUM(y) OVER (ORDER BY idx) AS cum_s,
         n, s
  FROM d CROSS JOIN tot
),
scored AS (
  SELECT hour_s, idx, cum_s, n, s,
         cum_s * 1.0 * cum_s / idx
           + (s - cum_s) * 1.0 * (s - cum_s) / (n - idx)
           - s * 1.0 * s / n AS red
  FROM cand WHERE idx < n
)
SELECT hour_s AS split_hour_s,
       CAST(idx AS BIGINT) AS n_left,
       CAST(n - idx AS BIGINT) AS n_right,
       CAST(ROUND(red * 1000000.0 / n, 0) AS BIGINT)
         AS reduction_micropoints,
       CAST(ROUND(cum_s * 1000000.0 / idx, 0) AS BIGINT)
         AS mean_left_micropoints,
       CAST(ROUND((s - cum_s) * 1000000.0 / (n - idx), 0) AS BIGINT)
         AS mean_right_micropoints
FROM scored
QUALIFY ROW_NUMBER() OVER (ORDER BY red DESC, hour_s) = 1
"""


@register("hourly_load_changepoint", oracle=_CHANGEPOINT_ORACLE)
def hourly_load_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on the hourly load by BINARY
    SEGMENTATION (Scott & Knott 1974; the greedy step every multi-
    changepoint segmenter — including PELT's baseline — recurses on):
    choose the split t maximizing the within-SSE reduction
    R(t) = S_L²/n_L + S_R²/n_R − S²/n (the between-segment sum of
    squares), equivalent to the best single-step fit of a piecewise-
    constant mean. Emits the argmax split with both segment means and
    the per-hour variance-reduction — the "did the load regime shift,
    and when?" primitive behind deploy-impact and incident timelines.

    Exactness: S, cum_s, n are integers widened to double BEFORE the
    square (`cum_s * 1.0 * cum_s`, mirrored in the oracle) so the
    bigint product never forms — bigint² would overflow ANSI mode once
    total event count passes ~3e9; each candidate's R is the identical
    double expression on identical integers in both engines;
    the argmax is deterministic with an hour tie-break. The candidate
    window runs over the AGGREGATED hourly series (calendar-bounded,
    same note as the seasonal decomposition) — at 100 TB the only
    corpus-sized work is the events→hour aggregate."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_s")
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = h.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_s")
    )
    d = grid.join(h, "hour_s", "left").select(
        "hour_s", F.coalesce("y", F.lit(0)).cast("long").alias("y")
    )
    return changepoint_from_series(d)


def changepoint_from_series(d: DataFrame) -> DataFrame:
    """Binary-segmentation argmax split of an integer (hour_s, y)
    series — the metric core, fed synthetic step series in tests."""
    from pyspark.sql import Window

    w = Window.orderBy("hour_s")
    d = d.select(
        "hour_s", "y", F.row_number().over(w).cast("long").alias("idx")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
    cand = d.select(
        "hour_s", "idx", F.sum("y").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_s")
    ).crossJoin(F.broadcast(tot))
    red = (
        F.col("cum_s") * 1.0 * F.col("cum_s") / F.col("idx")
        + (F.col("s") - F.col("cum_s"))
        * 1.0
        * (F.col("s") - F.col("cum_s"))
        / (F.col("n") - F.col("idx"))
        - F.col("s") * 1.0 * F.col("s") / F.col("n")
    )
    scored = cand.filter(F.col("idx") < F.col("n")).withColumn("red", red)
    best = scored.withColumn(
        "_rn",
        F.row_number().over(Window.orderBy(F.desc("red"), F.asc("hour_s"))),
    ).filter(F.col("_rn") == 1)
    return best.select(
        F.col("hour_s").alias("split_hour_s"),
        F.col("idx").cast("long").alias("n_left"),
        (F.col("n") - F.col("idx")).cast("long").alias("n_right"),
        F.round(F.col("red") * 1000000.0 / F.col("n"), 0)
        .cast("bigint")
        .alias("reduction_micropoints"),
        F.round(F.col("cum_s") * 1000000.0 / F.col("idx"), 0)
        .cast("bigint")
        .alias("mean_left_micropoints"),
        F.round(
            (F.col("s") - F.col("cum_s")) * 1000000.0 / (F.col("n") - F.col("idx")),
            0,
        )
        .cast("bigint")
        .alias("mean_right_micropoints"),
    )


_PSI_ORACLE = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
span AS (
  SELECT MIN(ts_s) AS lo, MAX(ts_s) AS hi,
         MIN(cents) AS minc, MAX(cents) AS maxc
  FROM e
),
binned AS (
  SELECT event_type,
         CASE WHEN ts_s < (lo + hi) // 2 THEN 0 ELSE 1 END AS epoch,
         LEAST(9, ((cents - minc) * 10) // (maxc - minc + 1)) AS bin
  FROM e CROSS JOIN span
),
cnt AS (
  SELECT event_type, bin,
         SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS cb
  FROM binned GROUP BY event_type, bin
),
grid AS (
  SELECT t.event_type, g.bin
  FROM (SELECT DISTINCT event_type FROM e) t
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
),
dense AS (
  SELECT grid.event_type, grid.bin,
         COALESCE(cnt.ca, 0) AS ca, COALESCE(cnt.cb, 0) AS cb
  FROM grid LEFT JOIN cnt
    ON cnt.event_type = grid.event_type AND cnt.bin = grid.bin
),
tot AS (
  SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM dense GROUP BY event_type
),
terms AS (
  SELECT d.event_type, t.na, t.nb,
         CAST(ROUND((
             (d.ca + 1.0) / (t.na + 10) - (d.cb + 1.0) / (t.nb + 10)
           ) * ln(((d.ca + 1.0) / (t.na + 10)) / ((d.cb + 1.0) / (t.nb + 10)))
           * 1000000000.0, 0) AS BIGINT) AS term_nano
  FROM dense d JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_first_half,
       CAST(nb AS BIGINT) AS n_second_half,
       CAST(ROUND(SUM(term_nano) / 1000.0, 0) AS BIGINT) AS psi_micropoints
FROM terms GROUP BY event_type, na, nb
"""


@register("event_value_psi_drift", oracle=_PSI_ORACLE)
def event_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the value distribution per event
    type, first half vs second half of the time range — the standard
    drift screen (credit-scoring lineage, now the default feature-drift
    monitor) a feature pipeline runs before trusting last month's
    normalization constants: PSI = Σ_bins (p_A − p_B)·ln(p_A/p_B) over
    10 fixed-width value bins, Laplace +1 smoothed on a DENSE bin grid
    so empty bins contribute finite mass instead of ±inf (the smoothing
    convention stated in the docstring IS the contract — both engines
    share it literally). Rule-of-thumb thresholds: <0.1 stable, >0.25
    investigate.

    Exactness: bin edges derive from global integer cents min/max with
    pure integer arithmetic (floored products, no float widths); each
    bin's PSI term is one double expression on integers, integerized to
    nano-points before the 10-term sum. Plan: one scan → one (type,
    bin, epoch) partial-agg, the 1-row span and the tiny grid broadcast
    — at 100 TB the scan is the only corpus-sized stage."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    span = e.agg(
        F.min("ts_s").alias("lo"),
        F.max("ts_s").alias("hi"),
        F.min("cents").alias("minc"),
        F.max("cents").alias("maxc"),
    )
    binned = e.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.when(
            F.col("ts_s") < F.floor((F.col("lo") + F.col("hi")) / 2), 0
        ).otherwise(1).alias("epoch"),
        F.least(
            F.lit(9),
            F.floor(
                (F.col("cents") - F.col("minc")) * 10
                / (F.col("maxc") - F.col("minc") + 1)
            ),
        ).cast("long").alias("bin"),
    )
    cnt = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0)).alias("cb"),
    )
    return _psi_finish(spark, cnt)


def _psi_finish(spark: SparkSession, cnt: DataFrame) -> DataFrame:
    """PSI from sparse per-(event_type, bin) epoch counts — shared by
    the batch query and the streaming twin (which feeds reference
    counts for ca and drained live registers for cb)."""
    grid = (
        cnt.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(10).select(F.col("id").cast("long").alias("bin"))
            )
        )
    )
    dense = grid.join(cnt, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = dense.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + 1.0) / (F.col("na") + 10)
    pb = (F.col("cb") + 1.0) / (F.col("nb") + 10)
    terms = dense.join(tot, "event_type").select(
        "event_type",
        "na",
        "nb",
        F.round((pa - pb) * F.log(pa / pb) * 1000000000.0, 0)
        .cast("bigint")
        .alias("term_nano"),
    )
    return terms.groupBy("event_type", "na", "nb").agg(
        F.round(F.sum("term_nano") / 1000.0, 0).cast("bigint").alias("psi_micropoints")
    ).select(
        "event_type",
        F.col("na").cast("long").alias("n_first_half"),
        F.col("nb").cast("long").alias("n_second_half"),
        "psi_micropoints",
    )


def _staged_psi_reference(spark: SparkSession, sf_dir: str) -> str:
    """The FROZEN half of a production PSI monitor: global span stats
    (epoch midpoint + integer cents bounds — the bin edges) and the
    reference epoch's per-(event_type, bin) counts, staged once. A live
    monitor never re-derives bin edges from current traffic; edges are
    part of the reference contract."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        e = load_table(spark, sf_dir, "events").select(
            "event_type",
            F.unix_timestamp("ts").alias("ts_s"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        span = e.agg(
            F.min("ts_s").alias("lo"),
            F.max("ts_s").alias("hi"),
            F.min("cents").alias("minc"),
            F.max("cents").alias("maxc"),
        )
        write_result(span, str(out / "span"))
        ref = (
            e.crossJoin(F.broadcast(span))
            .filter(F.col("ts_s") < F.floor((F.col("lo") + F.col("hi")) / 2))
            .select("event_type", _psi_bin_col())
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("ca"))
        )
        write_result(ref, str(out / "ref"))

    return staged(
        spark,
        "psi_ref",
        Path(sf_dir) / "events.parquet",
        "psi_ref_v1",
        build,
    )


def _psi_bin_col():
    """The shared integer bin expression (requires minc/maxc columns in
    scope): least(9, (cents - minc) * 10 // (maxc - minc + 1))."""
    return (
        F.least(
            F.lit(9),
            F.floor(
                (F.col("cents") - F.col("minc")) * 10
                / (F.col("maxc") - F.col("minc") + 1)
            ),
        )
        .cast("long")
        .alias("bin")
    )


def _staged_psi_live_stream(spark: SparkSession, sf_dir: str) -> str:
    """The second-half (live) events as 4 hash-partitioned files — the
    multi-micro-batch delivery the PSI monitor tails."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        e = load_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.unix_timestamp("ts").alias("ts_s"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        span = e.agg(F.min("ts_s").alias("lo"), F.max("ts_s").alias("hi"))
        live = (
            e.crossJoin(F.broadcast(span))
            .filter(F.col("ts_s") >= F.floor((F.col("lo") + F.col("hi")) / 2))
            .select("event_id", "event_type", "cents")
        )
        write_result(live.repartition(4, "event_id"), str(out))

    return staged(
        spark,
        "psi_live",
        Path(sf_dir) / "events.parquet",
        "psi_live_v1",
        build,
    )


@register("stream_event_value_psi", oracle=_PSI_ORACLE)
def stream_event_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``event_value_psi_drift`` in the shape production
    drift monitoring actually runs: bin edges and reference-epoch bin
    counts FROZEN in a staged store, live traffic tailed as a file
    stream, each micro-batch folding only its own per-(type, bin)
    counts under an epoch_id-keyed overwrite (bin counts are sums —
    linear registers — so the drained store equals the batch bin table
    under any stream slicing, the cm/hll/MAD drain contract). The final
    PSI joins frozen reference vs drained live through the SAME
    ``_psi_finish`` as the batch query and therefore shares its oracle
    hash-for-hash."""
    import shutil
    import tempfile

    ref_root = _staged_psi_reference(spark, sf_dir)
    payload = _staged_psi_live_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    span = spark.read.parquet(f"{ref_root}/span")
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_psi_")
    live_dir, ckpt = f"{scratch}/live", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        (
            mb.crossJoin(F.broadcast(span))
            .select("event_type", _psi_bin_col())
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(f"{live_dir}/epoch_id={epoch_id}")
        )

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "psi stream")
        live = (
            spark.read.parquet(live_dir)
            .groupBy("event_type", "bin")
            .agg(F.sum("n").alias("cb"))
        )
        ref = spark.read.parquet(f"{ref_root}/ref")
        cnt = ref.join(live, ["event_type", "bin"], "full_outer").select(
            "event_type",
            "bin",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        out = _psi_finish(spark, cnt)
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result


_EWMA_ORACLE = """
WITH h AS (
  SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
         count(*) AS y
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM h),
grid AS (SELECT unnest(range(lo, hi + 3600, 3600)) AS hour_s FROM bounds),
d AS (
  SELECT g.hour_s, COALESCE(h.y, 0) AS y,
         ROW_NUMBER() OVER (ORDER BY g.hour_s) AS idx
  FROM grid g LEFT JOIN h ON h.hour_s = g.hour_s
),
pairs AS (
  SELECT t.hour_s, t.idx, t.y,
         CASE WHEN j.idx = 1 THEN t.idx - 2 ELSE t.idx - j.idx END AS e,
         j.y AS yj
  FROM d t JOIN d j ON j.idx < t.idx
  WHERE t.idx >= 2
    AND (CASE WHEN j.idx = 1 THEN t.idx - 2 ELSE t.idx - j.idx END) <= 62
),
pred AS (
  SELECT hour_s, idx, y,
         SUM(CAST(ROUND(yj * 1000000000.0
                        / CAST((1::BIGINT << e) AS DOUBLE), 0) AS BIGINT))
           AS pred_nano
  FROM pairs GROUP BY hour_s, idx, y
),
fin AS (
  SELECT hour_s,
         CAST(y AS BIGINT) AS y,
         CAST(ROUND(pred_nano / 1000.0, 0) AS BIGINT) AS pred_micropoints
  FROM pred
)
SELECT hour_s, y, pred_micropoints,
       y * 1000000 - pred_micropoints AS resid_micropoints,
       CAST(CASE WHEN CAST(y * 1000000 - pred_micropoints AS HUGEINT)
                      * CAST(y * 1000000 - pred_micropoints AS HUGEINT)
                    > 9 * CAST(pred_micropoints AS HUGEINT) * 1000000
                 THEN 1 ELSE 0 END AS BIGINT) AS anomaly
FROM fin
"""


@register("hourly_load_ewma_residuals", oracle=_EWMA_ORACLE)
def hourly_load_ewma_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead EWMA FORECAST residuals + anomaly flags on the
    hourly load — the prediction-side sibling of the smoothing rung
    ``per_minute_load_ewma`` (which pioneered this module's α = 1/2
    exact-decay discipline for its trailing-30 normalized feature):
    where that rung SMOOTHS the current minute for a feature column,
    this one PREDICTS hour t from hours < t only (l_{t-1}, the honest
    forecast — no self-inclusion), scores the residual, and raises an
    integer 3σ flag (compared in exact wide-integer domains — Spark
    decimal(38,0) vs DuckDB HUGEINT — so resid² never overflows int64
    and both engines decide the flag on identical exact values; the
    same widen-before-square class of fix as the changepoint rung) rather
    than the EWMA feature. α = 1/2 keeps every weight an exact power
    of two: l_t = (y_t + l_{t-1})/2 unrolls to weights 2^-(t-j),
    computed exactly as 1/(1<<e) — no libm pow on data-dependent
    values. Unlike the smoother's normalized in-array fold, the terms
    here integerize to nano-points individually before a flat SUM, so
    the unbounded-horizon recursion (with the doubled-oldest-weight
    boundary making weights sum to exactly 1) stays order-free. Each weighted term integerizes to nano-points
    before the sum (order-free); lags beyond 62 are dropped because
    their nano-terms round to zero identically in both engines (the
    geometric tail is sub-integer) — which also BOUNDS the pair frame
    at 62 rows per hour. The anomaly flag is the ±3σ Poisson rule in
    pure integers: resid² > 9·pred·10⁶ micropoints².

    At 100 TB the only corpus-sized work is the events→hour aggregate
    (the calendar-bounded series note of the MAD/changepoint family);
    the 62-lag window join is T×62 over the aggregated series."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_s")
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = h.agg(F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour_s")
    )
    from pyspark.sql import Window

    d = (
        grid.join(h, "hour_s", "left")
        .select("hour_s", F.coalesce("y", F.lit(0)).cast("long").alias("y"))
        .withColumn("idx", F.row_number().over(Window.orderBy("hour_s")).cast("long"))
    )
    t = d.select(
        F.col("hour_s"), F.col("idx").alias("ti"), F.col("y").alias("yt")
    )
    j = d.select(F.col("idx").alias("ji"), F.col("y").alias("yj"))
    e = F.when(F.col("ji") == 1, F.col("ti") - 2).otherwise(
        F.col("ti") - F.col("ji")
    )
    pairs = (
        t.join(j, F.col("ji") < F.col("ti"))
        .filter(F.col("ti") >= 2)
        .withColumn("e", e)
        .filter(F.col("e") <= 62)
    )
    term = F.expr(
        "cast(round(yj * 1000000000.0 / cast(shiftleft(1L, e) as double), 0)"
        " as bigint)"
    )
    pred = pairs.groupBy("hour_s", "yt").agg(
        F.sum(term).alias("pred_nano")
    )
    pm = F.round(F.col("pred_nano") / 1000.0, 0).cast("bigint")
    resid = (F.col("yt") * 1000000 - pm).cast("bigint")
    # Flag compared in decimal(38,0) (exact integers, no int64 overflow)
    # — DuckDB mirrors with HUGEINT, so both engines decide on identical
    # exact values even when |resid| or pred exceed the bigint² range.
    resid_w = resid.cast("decimal(38,0)")
    pm_w = pm.cast("decimal(38,0)")
    return pred.select(
        "hour_s",
        F.col("yt").cast("long").alias("y"),
        pm.alias("pred_micropoints"),
        resid.alias("resid_micropoints"),
        F.when(resid_w * resid_w > F.lit(9) * pm_w * F.lit(1000000), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("anomaly"),
    )
