"""Rank / per-group top-k / percentile family (SURVEY.md §2.5 W3-W4,
§2.6 O3-O4).

Realizes the reference's goal-4 variant "the IPs with the longest session
times" ranked *per visitor first* (/root/reference/README.md:16) plus the
percentile-style engagement observations (README.md:5).

Scale notes: every window here partitions by a high-cardinality key
(user/customer) except the two small ranked reports (priority_rank: 5 rows
post-agg; engagement_percentiles: one per visitor — a global-ordering
window is acceptable only because the per-key aggregate has already
collapsed cardinality; at 100 TB one would bound it with a top-N or bucket
the percentile computation via approx quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.functions.exact import cents, sql_cents
from dataengineerchallenge_spark.operators.sessionize import (
    events_session_cte,
    session_stats,
)
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources import load_table
from dataengineerchallenge_spark.sources.tables import local_frame

_CTE = events_session_cte()


@register(
    "longest_session_per_user",
    oracle=_CTE
    + """
SELECT skey, session_id, duration_s, n_hits
FROM (
    SELECT skey, session_id, duration_s, n_hits,
           row_number() OVER (PARTITION BY skey
               ORDER BY duration_s DESC, session_id) AS rn
    FROM sessions
)
WHERE rn = 1
""",
)
def longest_session_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 per-group top-k (k=1): each visitor's single longest session
    (README.md:16 variant). row_number over a per-key window — the shuffle
    is on the high-cardinality visitor key, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    sess = session_stats(ev).withColumnRenamed("user_id", "skey")
    w = Window.partitionBy("skey").orderBy(F.desc("duration_s"), "session_id")
    return (
        sess.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("skey", "session_id", "duration_s", "n_hits")
    )


@register(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, price_cents, rn
FROM (
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
)
WHERE rn <= 3
""",
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/W3: top-3 orders by price per customer via row_number <= k.
    Ties break on o_orderkey so both engines pick identical rows."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", cents("o_totalprice").alias("price_cents"), "rn")
    )


@register(
    "priority_rank",
    oracle=f"""
SELECT o_orderpriority, revenue_cents,
       rank() OVER (ORDER BY revenue_cents DESC) AS rnk,
       dense_rank() OVER (ORDER BY revenue_cents DESC) AS drnk
FROM (
    SELECT o_orderpriority,
           CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY o_orderpriority
)
""",
)
def priority_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 rank + dense_rank over an aggregated frame (5 rows — the global
    window is post-aggregation, so the single-partition sort is trivial)."""
    orders = load_table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.sum(cents("o_totalprice")).alias("revenue_cents")
    )
    w = Window.orderBy(F.desc("revenue_cents"))
    return agg.select(
        "o_orderpriority",
        "revenue_cents",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "engagement_percentiles",
    oracle=_CTE
    + """
SELECT skey, total_s,
       ntile(10) OVER (ORDER BY total_s, skey) AS decile,
       ROUND(percent_rank() OVER (ORDER BY total_s), 4) AS pct_rank
FROM (
    SELECT skey, CAST(SUM(duration_s) AS BIGINT) AS total_s
    FROM sessions GROUP BY skey
)
""",
)
def engagement_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 ntile + percent_rank: engagement deciles per visitor. ntile's
    ordering includes the key so tied totals land in deterministic tiles;
    percent_rank orders by value only (ties share a rank, both engines)."""
    ev = load_table(spark, sf_dir, "events")
    totals = (
        session_stats(ev)
        .withColumnRenamed("user_id", "skey")
        .groupBy("skey")
        .agg(F.sum("duration_s").cast("bigint").alias("total_s"))
    )
    w_tile = Window.orderBy("total_s", "skey")
    w_pct = Window.orderBy("total_s")
    return totals.select(
        "skey",
        "total_s",
        F.ntile(10).over(w_tile).alias("decile"),
        F.round(F.percent_rank().over(w_pct), 4).alias("pct_rank"),
    )


@register(
    "events_systematic_sample",
    oracle="""
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_id % 97 < 5
""",
)
def events_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 sampling, oracle-checkable form: systematic 5/97 sample on the
    key (deterministic on both engines — `df.sample(seed=...)` is only
    reproducible within Spark, so the Bernoulli variant is pytest-pinned
    in tests/test_ranking.py instead of oracle-compared)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 97 < 5).select(
        "event_id", "user_id", "event_type", "value"
    )


_HEX = "0123456789abcdef"
# hex-digit value of the k-th md5 char, identical idiom both engines
_BUCKET = (
    "(instr('{hex}', substring(md5(cast(event_id as string)), 1, 1)) - 1) * 16 "
    "+ instr('{hex}', substring(md5(cast(event_id as string)), 2, 1)) - 1"
).format(hex=_HEX)


@register(
    "events_hash_sample",
    oracle=f"""
SELECT CAST(event_id AS VARCHAR) AS event_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
FROM events
WHERE ((strpos('{_HEX}', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) * 16
       + strpos('{_HEX}', substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1) % 10 = 0
""",
)
def events_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 reproducible sampling at scale: ~10% sample selected by the
    first md5 byte of the row key — unlike `df.sample(seed=…)` (RNG
    state is engine- and partitioning-specific), a content-hash sample
    is reproducible across engines, re-runs, and repartitionings, which
    is what a 100 TB eval-split or debugging slice actually requires.
    Pure per-row predicate: pushes to the scan, no shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(_BUCKET)
    return ev.filter(bucket % 10 == 0).select(
        F.col("event_id").cast("string").alias("event_id"),
        "event_type",
        F.unix_timestamp("ts").alias("ts_s"),
    )


_DOC_BUCKET = (
    "(instr('{hex}', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 16 "
    "+ instr('{hex}', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
).format(hex=_HEX)

# per-language sampling rates out of 256 md5 buckets: downsample the
# majority languages, keep the rare ones whole (the usual corpus
# rebalancing move before training)
_LANG_RATES = (("en", 26), ("es", 51), ("zh", 128), ("de", 256), ("fr", 13))


@register(
    "stratified_doc_sample",
    oracle=f"""
    WITH rates(lang, rate256) AS (VALUES {', '.join(f"('{l}', {r})" for l, r in _LANG_RATES)})
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE (strpos('{_HEX}', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + strpos('{_HEX}', substr(md5(CAST(d.doc_id AS VARCHAR)), 2, 1)) - 1 < r.rate256
    """,
)
def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4+ stratified sampling: per-language sampling rates applied via
    content-hash bucketing — the reproducible twin of
    ``df.sampleBy("lang", fractions)``, whose RNG-based draw is neither
    engine- nor partitioning-stable. The rate table is a broadcast dim;
    the predicate evaluates per row and pushes below any downstream
    shuffle, so at 100 TB this is a pure scan-side filter."""
    docs = load_table(spark, sf_dir, "documents")
    rates = local_frame(spark, list(_LANG_RATES), "lang string, rate256 int")
    bucket = F.expr(_DOC_BUCKET)
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("rate256"))
        .select("doc_id", "lang", "source")
    )


@register(
    "analytic_functions_showcase",
    oracle=f"""
    WITH totals AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
             CAST(SUM({sql_cents('value')}) AS BIGINT) AS total_cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, user_id, total_cents,
           ROUND(cume_dist() OVER w, 6) AS cd,
           nth_value(total_cents, 2) OVER
             (PARTITION BY event_type ORDER BY total_cents, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_lowest_cents,
           last_value(total_cents) OVER
             (PARTITION BY event_type ORDER BY total_cents, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS max_cents
    FROM totals
    WINDOW w AS (PARTITION BY event_type ORDER BY total_cents, user_id)
    """,
)
def analytic_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/W4 completion: cume_dist (cumulative distribution of each
    user's spend within their event type), nth_value and frame-spanning
    last_value over per-user totals. Ordering includes user_id so ranks
    are total (exact-cent ties broken deterministically); every window
    shares one (event_type) partitioning, so one exchange feeds all
    three."""
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", F.col("user_id").cast("string").alias("user_id")).agg(
        F.sum(cents("value")).alias("total_cents")
    )
    w = Window.partitionBy("event_type").orderBy("total_cents", "user_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return totals.select(
        "event_type",
        "user_id",
        "total_cents",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("total_cents", 2).over(wfull).alias("second_lowest_cents"),
        F.last("total_cents").over(wfull).alias("max_cents"),
    )
