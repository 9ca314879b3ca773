"""Sessionization query family — the reference's goals 1-4
(/root/reference/README.md:9-16) on the ``events`` fixture
(user_id plays the IP, event_type the URL; FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.sessionize import (
    DEFAULT_GAP_S,
    events_session_cte,
    session_stats,
    with_session_ids,
)
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources import load_table
from dataengineerchallenge_spark.sources.tables import local_frame

_CTE = events_session_cte()


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev).withColumnRenamed("user_id", "skey")


@register(
    "sessionize",
    oracle=_CTE
    + """
SELECT skey, session_id, n_hits, duration_s, n_unique_urls, start_s, end_s
FROM sessions
""",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goal 1 (README.md:9-10): one row per (visitor, session)."""
    return _sessions(spark, sf_dir)


@register(
    "sessionize_skew_safe",
    oracle=_CTE
    + """
SELECT skey, session_id, n_hits, duration_s, n_unique_urls, start_s, end_s
FROM sessions
""",
)
def sessionize_skew_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 hot-key escape hatch, proven equivalent: two-phase day-sliced
    sessionization (operators/sessionize.py:session_stats_skew_safe)
    checked against the SAME full-recompute oracle as ``sessionize`` —
    the event-level sort is bounded per (key, day) so one hot IP can no
    longer serialize a task, and the boundary stitch reapplies the
    identical gap rule at session granularity."""
    from dataengineerchallenge_spark.operators.sessionize import session_stats_skew_safe

    ev = load_table(spark, sf_dir, "events")
    return session_stats_skew_safe(ev).withColumnRenamed("user_id", "skey")


@register(
    "avg_session_time",
    oracle=_CTE
    + """
SELECT ROUND(AVG(duration_s), 4) AS avg_session_s,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sessions
""",
)
def avg_session_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goal 2 (README.md:12): global average session duration."""
    return _sessions(spark, sf_dir).agg(
        F.round(F.avg("duration_s"), 4).alias("avg_session_s"),
        F.count(F.lit(1)).alias("n_sessions"),
    )


@register(
    "unique_urls_per_session",
    oracle=_CTE
    + """
SELECT n_unique_urls, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sessions
GROUP BY n_unique_urls
""",
)
def unique_urls_per_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goal 3 (README.md:13-14): distinct-URL-per-session distribution."""
    return (
        _sessions(spark, sf_dir)
        .groupBy("n_unique_urls")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


@register(
    "most_engaged_users",
    oracle=_CTE
    + """
SELECT skey, MAX(duration_s) AS longest_session_s,
       CAST(SUM(duration_s) AS BIGINT) AS total_session_s,
       CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM sessions
GROUP BY skey
ORDER BY longest_session_s DESC, skey
LIMIT 20
""",
)
def most_engaged_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goal 4 (README.md:16): top-20 visitors by longest session.

    orderBy().limit() — Catalyst plans TakeOrderedAndProject (per-partition
    top-k + driver merge), never a full global sort. Ties break on skey so
    the result set is deterministic for the oracle hash.
    """
    return (
        _sessions(spark, sf_dir)
        .groupBy("skey")
        .agg(
            F.max("duration_s").alias("longest_session_s"),
            F.sum("duration_s").alias("total_session_s"),
            F.count(F.lit(1)).alias("n_sessions"),
        )
        .orderBy(F.desc("longest_session_s"), "skey")
        .limit(20)
    )


@register(
    "session_entry_exit",
    oracle=_CTE.replace("), sessions AS", """), entry_exit AS (
    SELECT skey, session_id,
           first_value(url) OVER (PARTITION BY skey, session_id
               ORDER BY ts_s, ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS entry_url,
           last_value(url) OVER (PARTITION BY skey, session_id
               ORDER BY ts_s, ord
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS exit_url
    FROM sess
), sessions AS""")
    + """
SELECT entry_url, exit_url, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM (SELECT DISTINCT skey, session_id, entry_url, exit_url FROM entry_exit)
GROUP BY entry_url, exit_url
""",
)
def session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 first/last analytics: entry/exit URL per session, aggregated."""
    ev = load_table(spark, sf_dir, "events")
    sess = with_session_ids(ev)
    w = (
        Window.partitionBy("user_id", "session_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    per_sess = (
        sess.withColumn("entry_url", F.first("event_type").over(w))
        .withColumn("exit_url", F.last("event_type").over(w))
        .select("user_id", "session_id", "entry_url", "exit_url")
        .distinct()
    )
    return per_sess.groupBy("entry_url", "exit_url").agg(
        F.count(F.lit(1)).alias("n_sessions")
    )


@register(
    "inter_hit_gaps",
    oracle="""
WITH hits AS (
    SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events
), gaps AS (
    SELECT user_id, ts_s - lag(ts_s) OVER (PARTITION BY user_id
        ORDER BY ts_s, event_id) AS gap_s
    FROM hits
)
SELECT user_id,
       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
       ROUND(AVG(gap_s), 4) AS avg_gap_s,
       MAX(gap_s) AS max_gap_s
FROM gaps
GROUP BY user_id
""",
)
def inter_hit_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 lag: inter-hit gap stats per visitor (input to gap tuning,
    README.md:43 'determine the best session window time on your own')."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gaps = (
        ev.withColumn("ts_s", F.unix_timestamp("ts"))
        .withColumn("gap_s", F.col("ts_s") - F.lag("ts_s").over(w))
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


@register(
    "per_minute_load",
    oracle="""
SELECT CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS minute_epoch_s,
       CAST(COUNT(*) AS BIGINT) AS n_requests
FROM events
GROUP BY 1
""",
)
def per_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (README.md:19): per-minute request-load time series — the
    feature input for MLE goal 1; streaming twin in streaming/windows.py.

    Minutes are projected as epoch seconds (bigint) — raw timestamps are
    never hash-compared (ns-vs-µs caveat, SURVEY.md §7.4).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("minute", "ts")).alias("minute_epoch_s")
    ).agg(F.count(F.lit(1)).alias("n_requests"))


@register(
    "incremental_sessionize_merge",
    oracle=_CTE
    + """
SELECT skey, session_id, n_hits, duration_s, n_unique_urls, start_s, end_s
FROM sessions
""",
)
def incremental_sessionize_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin of ``sessionize``: events are split at a mid-month
    boundary, the first half becomes mergeable session STATE
    (operators.sessionize.session_state), and the second half is folded in
    with merge_session_state — history is never re-scanned. The oracle is
    the UNSUSPECTING full recompute over all events: hash-equality proves
    merge(state(old), new) == sessionize(old ∪ new) row for row."""
    from dataengineerchallenge_spark.operators.sessionize import (
        merge_session_state,
        session_state,
    )

    split_s = 1705363200  # 2024-01-16 00:00:00 UTC, mid-fixture
    ev = load_table(spark, sf_dir, "events")
    ts_s = F.unix_timestamp("ts")
    state = session_state(ev.filter(ts_s < split_s))
    merged = merge_session_state(state, ev.filter(ts_s >= split_s))
    return merged.select(
        F.col("user_id").alias("skey"),
        "session_id",
        "n_hits",
        (F.col("end_s") - F.col("start_s")).alias("duration_s"),
        F.size("url_set").cast("long").alias("n_unique_urls"),
        "start_s",
        "end_s",
    )


@register(
    "sessionize_native_window",
    oracle=_CTE
    + """
SELECT skey, session_id, n_hits, duration_s, n_unique_urls, start_s, end_s
FROM sessions
""",
)
def sessionize_native_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goal 1 via Spark's NATIVE session_window aggregate (the same
    operator the streaming twin uses, here in batch): one groupBy over
    (user, session_window(ts, gap)) — no window functions, no lag. The
    gap boundary is inclusive on both paths (== 900 s merges), so this
    hash-matches the identical full-recompute oracle as ``sessionize``;
    session ids are recovered per user by start-time rank. At scale this
    is ONE shuffle on the user key with state merged by the native
    operator instead of a sort + two window passes."""
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.withColumn("ts_s", F.unix_timestamp("ts"))
        .withColumn("_tsx", F.timestamp_seconds("ts_s"))
        .groupBy(
            F.col("user_id").alias("skey"),
            F.session_window("_tsx", f"{DEFAULT_GAP_S} seconds"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("event_type").alias("n_unique_urls"),
            F.min("ts_s").alias("start_s"),
            F.max("ts_s").alias("end_s"),
        )
    )
    w = Window.partitionBy("skey").orderBy("start_s")
    return sess.select(
        "skey",
        F.row_number().over(w).cast("bigint").alias("session_id"),
        "n_hits",
        (F.col("end_s") - F.col("start_s")).alias("duration_s"),
        "n_unique_urls",
        "start_s",
        "end_s",
    ).select("skey", "session_id", "n_hits", "duration_s", "n_unique_urls", "start_s", "end_s")


_GAP_SWEEP = (300, 900, 1800, 3600)


@register(
    "session_gap_sensitivity",
    oracle=f"""
WITH gaps(gap_s) AS (VALUES {", ".join(f"({g})" for g in _GAP_SWEEP)}),
hits AS (
    SELECT g.gap_s, e.user_id, e.event_id,
           CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_s
    FROM events e CROSS JOIN gaps g
), flagged AS (
    SELECT *,
           CASE WHEN lag(ts_s) OVER w IS NULL
                  OR ts_s - lag(ts_s) OVER w > gap_s THEN 1 ELSE 0 END AS is_new
    FROM hits
    WINDOW w AS (PARTITION BY gap_s, user_id ORDER BY ts_s, event_id)
), sess AS (
    SELECT *,
           SUM(is_new) OVER (PARTITION BY gap_s, user_id ORDER BY ts_s, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
), sessions AS (
    SELECT gap_s, user_id, session_id,
           COUNT(*) AS n_hits,
           MAX(ts_s) - MIN(ts_s) AS duration_s
    FROM sess GROUP BY gap_s, user_id, session_id
)
SELECT gap_s,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(AVG(duration_s), 4) AS avg_session_s,
       ROUND(AVG(n_hits), 4) AS avg_hits_per_session,
       ROUND(AVG(CASE WHEN n_hits = 1 THEN 1 ELSE 0 END), 4) AS single_hit_share
FROM sessions
GROUP BY gap_s
""",
)
def session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+ gap tuning — the DIRECT answer to the reference's own
    challenge question ("determine the best session window time on your
    own", /root/reference/README.md:43): the same sessionizer swept
    across candidate inactivity gaps {300, 900, 1800, 3600}s in ONE
    plan, reporting per-gap session count, mean duration, mean
    hits/session, and the single-hit share. Read together these locate
    the knee: too small a gap shatters visits (single-hit share spikes,
    durations collapse); too large a gap fuses distinct visits (session
    count keeps falling while durations balloon). `inter_hit_gaps` is
    the per-visitor raw input; this is the decision table.

    Scale shape: the gap candidates are EXPLODED onto the hits before
    the session window, so all |G| sessionizations share one hash
    exchange on (gap_s, user_id) — |G|× rows through 1 shuffle instead
    of |G| scans + |G| shuffles, and the 4× blow-up partitions
    perfectly (gap_s is in the key)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ts_s")
    )
    g = ev.withColumn(
        "gap_s", F.explode(F.array(*[F.lit(x) for x in _GAP_SWEEP]))
    )
    w = Window.partitionBy("gap_s", "user_id").orderBy("ts_s", "event_id")
    flagged = g.withColumn(
        "is_new",
        F.when(
            F.lag("ts_s").over(w).isNull()
            | (F.col("ts_s") - F.lag("ts_s").over(w) > F.col("gap_s")),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sess.groupBy("gap_s", "user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
    )
    return per_session.groupBy("gap_s").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("duration_s"), 4).alias("avg_session_s"),
        F.round(F.avg("n_hits"), 4).alias("avg_hits_per_session"),
        F.round(F.avg((F.col("n_hits") == 1).cast("int")), 4).alias("single_hit_share"),
    )


_SLIDE_HOURS = 3


@register(
    "sliding_distinct_users",
    oracle=f"""
WITH hu AS (
  SELECT DISTINCT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
         user_id
  FROM events
),
bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM hu),
contrib AS (
  SELECT unnest(range(hour_s, hour_s + {_SLIDE_HOURS} * 3600, 3600)) AS win_end_s,
         user_id
  FROM hu
)
SELECT c.win_end_s,
       CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS distinct_users
FROM contrib c CROSS JOIN bounds b
WHERE c.win_end_s BETWEEN b.lo AND b.hi
GROUP BY c.win_end_s
""",
)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5+ EXACT sliding-window distinct — the aggregate that famously
    does NOT decompose (distinct counts can't be merged across
    overlapping panes the way sums can), made tractable by the
    contribute-to-covering-windows rewrite: dedupe to (user, hour)
    grain once, then each pair contributes itself to the {_SLIDE_HOURS}
    hourly windows that cover it (explode over the window ends) and a
    plain count-distinct per window end finishes the job. Window ends
    clip to the observed hour range so every emitted window is fully
    defined by real data on both engines.

    Scale shape (100 TB events): the pre-dedup collapses the fact table
    to distinct (hour, user) pairs FIRST (partial-agg friendly — the
    biggest reduction happens map-side), the explode multiplies only
    that deduped frame by the window span (3x), and the final
    count-distinct shuffles on the window key. Contrast with the
    sketch route (`hll_weekly_actives` merges per-day HLL registers
    when approximate is acceptable): this is the exact form, and its
    cost is span x distinct pairs, not span x raw events."""
    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s"), "user_id"
    ).distinct()
    return _sliding_distinct_from_pairs(hu)


def _sliding_distinct_from_pairs(hu: DataFrame) -> DataFrame:
    """Finisher half of the sliding-distinct rewrite, shared by the
    batch query and the online twin: from the deduped (hour_s, user_id)
    pair frame, explode each pair over its covering window ends, clip
    to the observed hour range, count-distinct per window end."""
    bounds = hu.agg(
        F.min("hour_s").alias("lo"), F.max("hour_s").alias("hi")
    )
    contrib = hu.select(
        F.explode(
            F.sequence(
                F.col("hour_s"),
                F.col("hour_s") + (_SLIDE_HOURS - 1) * 3600,
                F.lit(3600),
            )
        ).alias("win_end_s"),
        "user_id",
    )
    return (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("win_end_s").between(F.col("lo"), F.col("hi")))
        .groupBy("win_end_s")
        .agg(F.count_distinct("user_id").alias("distinct_users"))
    )


def _staged_hour_user_stream(spark: SparkSession, sf_dir: str) -> str:
    """(hour_s, user_id) written as 4 hash-partitioned files for the
    multi-micro-batch replay (same shape as the sketch families'
    _staged_event_type_user_stream). Hours are pre-truncated to epoch
    seconds at stage time so the stream carries plain bigints — no
    timestamp-type hazards inside foreachBatch."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        ev = load_table(spark, sf_dir, "events")
        write_result(
            ev.select(
                F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_s"),
                "user_id",
            ).repartition(4, "user_id"),
            str(out),
        )

    return staged(
        spark,
        "slide_events",
        Path(sf_dir) / "events.parquet",
        "slide_events",
        build,
    )


@register(
    "stream_sliding_distinct_users",
    oracle=f"""
WITH hu AS (
  SELECT DISTINCT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS hour_s,
         user_id
  FROM events
),
bounds AS (SELECT MIN(hour_s) AS lo, MAX(hour_s) AS hi FROM hu),
contrib AS (
  SELECT unnest(range(hour_s, hour_s + {_SLIDE_HOURS} * 3600, 3600)) AS win_end_s,
         user_id
  FROM hu
)
SELECT c.win_end_s,
       CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS distinct_users
FROM contrib c CROSS JOIN bounds b
WHERE c.win_end_s BETWEEN b.lo AND b.hi
GROUP BY c.win_end_s
""",
)
def stream_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``sliding_distinct_users``: each micro-batch
    writes its OWN distinct (hour, user) pairs via foreachBatch
    (epoch-keyed overwrite, idempotent under retry); at drain the
    per-epoch pair sets distinct-union — a distinct of distincts is the
    distinct of the union under ANY stream slicing — and the shared
    finisher emits the identical sliding counts, so the twin shares the
    batch query's DuckDB oracle hash-for-hash. The state the online
    form keeps is the deduped pair set itself (the exact-form price;
    the sketch twins keep k-row registers instead), bounded by
    hours x active users, never by raw event volume."""
    import shutil
    import tempfile

    payload = _staged_hour_user_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_slide_")
    pairs_dir, ckpt = f"{scratch}/pairs", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        mb.select("hour_s", "user_id").distinct().write.mode("overwrite").parquet(
            f"{pairs_dir}/epoch_id={epoch_id}"
        )

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "stream sliding-distinct")
        hu = spark.read.parquet(pairs_dir).select("hour_s", "user_id").distinct()
        out = _sliding_distinct_from_pairs(hu)
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result


@register(
    "session_transition_matrix",
    oracle=events_session_cte()
    + """,
pairs AS (
  SELECT url AS from_type,
         lead(url) OVER (PARTITION BY skey, session_id
                         ORDER BY ts_s, ord) AS to_type
  FROM sess
),
t AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type
),
r AS (SELECT from_type, SUM(n) AS tot FROM t GROUP BY from_type)
SELECT t.from_type, t.to_type,
       CAST(t.n AS BIGINT) AS n_transitions,
       CAST(r.tot AS BIGINT) AS from_total,
       CAST(ROUND(t.n * 1000000.0 / r.tot) AS BIGINT) AS p_micropoints
FROM t JOIN r ON r.from_type = t.from_type
""",
)
def session_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+ the session MARKOV TRANSITION MATRIX — the generalization of
    every fixed funnel this repo runs (`conversion_funnel` asks about
    ONE path; this estimates P(next event type | current) from all
    consecutive within-session pairs, the first-order user-journey
    model product analytics fits before talking about any specific
    journey). Transitions never cross a session boundary (the 15-minute
    gap restarts the chain — exactly the independence cut the Markov
    assumption needs), ordering ties break on event_id, and
    probabilities ship as integer micropoints of the row-normalized
    count matrix — exact bigint end to end, sharing the repo's
    canonical sessionize CTE on both engines.

    Scale shape: the sessionizer's single (key)-exchange window, one
    lead over the already-sorted frame (same window spec — no second
    exchange), then a T^2-bounded aggregate (T = #event types) — the
    transition matrix is KB-scale however big the fact table is."""
    from dataengineerchallenge_spark.operators.sessionize import with_session_ids

    ev = load_table(spark, sf_dir, "events")
    s = with_session_ids(ev.select("user_id", "ts", "event_id", "event_type"))
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id", "session_id").orderBy("ts_s", "event_id")
    pairs = s.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    r = t.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return t.join(r, "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n_transitions"),
        F.col("tot").cast("long").alias("from_total"),
        F.round(F.col("n") * 1000000.0 / F.col("tot"), 0)
        .cast("bigint")
        .alias("p_micropoints"),
    )


@register(
    "purchase_attribution_last_touch",
    oracle="""
WITH e AS (
    SELECT user_id, event_id, event_type,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
    FROM events
), lagged AS (
    SELECT user_id, event_id, event_type, ts_s,
           last_value(CASE WHEN event_type != 'purchase' THEN ts_s END
                      IGNORE NULLS) OVER w AS prev_ts,
           last_value(CASE WHEN event_type != 'purchase' THEN event_type END
                      IGNORE NULLS) OVER w AS prev_type
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
    SELECT CASE WHEN prev_ts IS NOT NULL AND ts_s - prev_ts <= 1800
                THEN prev_type ELSE 'direct' END AS channel
    FROM lagged WHERE event_type = 'purchase'
), tot AS (SELECT COUNT(*) AS n FROM attributed)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(ROUND(COUNT(*) * 1000000.0 / ANY_VALUE(tot.n), 0) AS BIGINT)
         AS share_micropoints
FROM attributed CROSS JOIN tot
GROUP BY channel
""",
)
def purchase_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LAST-TOUCH attribution: every purchase is credited to the user's
    most recent NON-purchase event within a 30-minute lookback (the
    as-of-join pattern as a window — last_value IGNORE NULLS over the
    per-user event order), falling back to 'direct' when nothing
    qualifies. The two IGNORE-NULLS window reads are gated on the SAME
    predicate, so they select fields of the same row — the standard
    trick that keeps the as-of lookup a single window pass instead of
    a range join. Deterministic ordering tie-break on (ts_s, event_id).
    Output: per-channel purchase counts + credit share in micropoints.

    Scale: one user-keyed window over events (the sessionizer's
    exchange+sort, skew notes shared) and a |channels|-row rollup."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    lagged = ev.select(
        "event_type",
        "ts_s",
        F.last(F.when(non_purchase, F.col("ts_s")), ignorenulls=True)
        .over(w)
        .alias("prev_ts"),
        F.last(F.when(non_purchase, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("prev_type"),
    )
    attributed = lagged.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("prev_ts").isNotNull()
            & (F.col("ts_s") - F.col("prev_ts") <= 1800),
            F.col("prev_type"),
        )
        .otherwise("direct")
        .alias("channel")
    )
    tot = attributed.agg(F.count(F.lit(1)).alias("n"))
    return (
        attributed.groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("n_purchases").cast("long"),
            F.round(F.col("n_purchases") * 1000000.0 / F.col("n"), 0)
            .cast("bigint")
            .alias("share_micropoints"),
        )
    )
