"""Registered format-roundtrip queries (S2 breadth): the same per-minute
load aggregate computed from JSON / CSV / ORC stagings of ``events``
must hash-match the parquet-derived oracle — proving each read path
delivers byte-identical rows, not just "roughly the same data".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.formats import (
    events_from_csv,
    events_from_json,
    events_from_orc,
)

# identical oracle for all three: minutes derived from epoch seconds
_MINUTE_ORACLE = """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS minute_epoch_s,
       CAST(COUNT(*) AS BIGINT) AS n_requests,
       ROUND(SUM(value), 4) AS total_value
FROM events
GROUP BY 1
"""


def _minute_load(ev: DataFrame) -> DataFrame:
    return ev.groupBy(((F.col("ts_s") / 60).cast("long") * 60).alias("minute_epoch_s")).agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register("json_source_minute_load", oracle=_MINUTE_ORACLE)
def json_source_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/JSON: schema-on-read JSON-lines path, hash-checked."""
    return _minute_load(events_from_json(spark, sf_dir))


@register("csv_source_minute_load", oracle=_MINUTE_ORACLE)
def csv_source_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/CSV: header+schema CSV path, hash-checked."""
    return _minute_load(events_from_csv(spark, sf_dir))


@register("orc_source_minute_load", oracle=_MINUTE_ORACLE)
def orc_source_minute_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/ORC: columnar ORC path (vectorized, pushdown-capable),
    hash-checked."""
    return _minute_load(events_from_orc(spark, sf_dir))


def _staged_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """events written through the S4 sink partitioned by event_type, into
    a content-addressed slot (shared publish protocol: staging.py)."""
    from pathlib import Path

    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.sources.tables import load_table
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            F.col("event_id").cast("string"),
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("user_id").cast("string"),
            "event_type",
            "value",
        )
        write_result(ev, str(out), partition_by=["event_type"])

    return staged(spark, "sink_part", Path(sf_dir) / "events.parquet", "part", build)


@register(
    "sink_partitioned_roundtrip",
    oracle="""
    SELECT event_type,
           (CAST(floor(epoch(ts)) AS BIGINT) // 86400) * 86400 AS day_s,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    WHERE event_type IN ('view', 'purchase')
    GROUP BY 1, 2
    """,
)
def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 under the correctness gate: events written via the partitioned
    parquet sink (partitionBy event_type — the 100 TB layout where
    downstream reads prune whole directories), read back with a
    partition-column filter, and aggregated per type/day. The event_type
    predicate is satisfied by PARTITION PRUNING on the written layout
    (PartitionFilters in the scan — pinned in tests/test_sinks.py), never
    by reading and discarding rows."""
    from pyspark.sql import functions as F

    back = spark.read.parquet(_staged_partitioned_events(spark, sf_dir))
    return (
        back.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(
            "event_type",
            ((F.col("ts_s") / 86400).cast("long") * 86400).alias("day_s"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


#: event_type → workload category; the literal dim for the DPP demo (the
#: oracle mirrors it as a VALUES list so both engines see identical rows).
EVENT_CATEGORY_DIM = [
    ("view", "engagement"),
    ("click", "engagement"),
    ("purchase", "commerce"),
    ("signup", "commerce"),
    ("error", "ops"),
]


@register(
    "dpp_engagement_by_type",
    oracle="""
    WITH dim(event_type, category) AS (
      VALUES ('view', 'engagement'), ('click', 'engagement'),
             ('purchase', 'commerce'), ('signup', 'commerce'), ('error', 'ops')
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    WHERE d.category = 'engagement'
    GROUP BY 1
    """,
)
def dpp_engagement_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning under the gate: the fact side is the
    event_type-partitioned S4 layout, the dim side a 5-row category map
    filtered to 'engagement'. No static predicate touches the partition
    column — the scan is pruned at RUNTIME from the broadcast dim
    (``dynamicpruningexpression`` in PartitionFilters, pinned in
    tests/test_sinks.py), so only 2 of 5 partition directories are read.
    At 100 TB this is the date-dim ⋈ fact pattern: the fact scan shrinks
    to the dim's surviving keys without any manual predicate rewrite."""
    fact = spark.read.parquet(_staged_partitioned_events(spark, sf_dir))
    dim = spark.createDataFrame(EVENT_CATEGORY_DIM, ["event_type", "category"])
    return (
        fact.join(dim.filter(F.col("category") == "engagement"), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def _staged_date_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """events written through the S4 sink PARTITIONED BY dt (UTC event
    date, ``dt=yyyy-MM-dd`` directories) — the single most common 100 TB
    log-table layout at rest (SURVEY §4; the reference's interval-file
    format, /root/reference/README.md:44, is this shape one level up).
    Content-addressed slot, shared publish protocol (staging.py)."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.sources.tables import load_table
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            F.col("event_id").cast("string"),
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("user_id").cast("string"),
            "event_type",
            "value",
            F.to_date(F.col("ts")).alias("dt"),
        )
        write_result(ev, str(out), partition_by=["dt"])

    return staged(spark, "datepart", Path(sf_dir) / "events.parquet", "datepart", build)


@register(
    "date_partition_pruned_daily_load",
    oracle="""
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-19'
    GROUP BY 1
    """,
)
def date_partition_pruned_daily_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC partition pruning on the date-partitioned-at-rest layout
    (VERDICT r5 #4): a 10-day window over a 30-day events table must
    plan as PartitionFilters on ``dt`` with only the 10 matching
    ``dt=...`` directories ever listed — the scan never opens the other
    20 days' files (pinned via df.inputFiles() in tests/test_sinks.py).
    Correctness is layout-invariant: the oracle reads the unpartitioned
    base table with the same predicate."""
    back = spark.read.parquet(_staged_date_partitioned_events(spark, sf_dir))
    return (
        back.filter(F.col("dt").between(F.lit("2024-01-10"), F.lit("2024-01-19")))
        .groupBy(F.date_format("dt", "yyyy-MM-dd").alias("dt"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


#: promo calendar — the literal date-dim for the DPP-over-dates demo;
#: the oracle mirrors it as a VALUES list so both engines see the same dim.
PROMO_DAYS = ["2024-01-05", "2024-01-10", "2024-01-15", "2024-01-20", "2024-01-25"]


@register(
    "dpp_promo_day_load",
    oracle=f"""
    WITH promo(dt) AS (
      VALUES {", ".join(f"(DATE '{d}')" for d in PROMO_DAYS)}
    )
    SELECT strftime(p.dt, '%Y-%m-%d') AS dt,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(e.value), 4) AS total_value
    FROM events e JOIN promo p ON CAST(e.ts AS DATE) = p.dt
    GROUP BY 1
    """,
)
def dpp_promo_day_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning on the date-partitioned layout: the
    promo calendar is a 5-row dim with no static predicate on ``dt`` —
    the fact scan is pruned at RUNTIME from the broadcast dim
    (``dynamicpruningexpression`` in PartitionFilters, pinned in
    tests/test_sinks.py), reading 5 of 30 day directories. This is the
    date-dim ⋈ fact pattern every 100 TB log warehouse runs daily:
    the calendar decides which partitions exist for the query, and no
    manual predicate rewrite is needed when the calendar changes."""
    import datetime

    fact = spark.read.parquet(_staged_date_partitioned_events(spark, sf_dir))
    dim = spark.createDataFrame(
        [(datetime.date.fromisoformat(d),) for d in PROMO_DAYS], "dt date"
    ).filter(F.col("dt") >= F.lit("2024-01-01"))  # selective predicate: DPP-eligible
    return (
        fact.join(F.broadcast(dim), "dt")
        .groupBy(F.date_format("dt", "yyyy-MM-dd").alias("dt"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def stage_bucketed_order_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """orders/lineitem written as 8-bucket tables clustered+sorted on the
    orderkey (S4+ data layout). Bucket metadata lives in the session
    catalog, so staging is deliberately per-session (NOT the shared
    content-addressed protocol of staging.py — a shared path would fight
    saveAsTable's catalog-scoped overwrite semantics across sessions):
    write once into a scratch path, reuse via
    ``spark.catalog.tableExists`` on repeat calls. On a real deployment
    the same write targets the metastore warehouse, which is the shared
    location. The scratch path itself lives under the conf-driven
    staging root so ALL staged bytes answer to one conf (VERDICT r8
    What's-wrong #3); it stays a per-session mkdtemp — not a shared
    deterministic slot — because a concurrent session's overwrite must
    not clobber files under this session's live catalog table. Returns
    the two table names."""
    import tempfile

    from dataengineerchallenge_spark.sources.tables import load_table
    from dataengineerchallenge_spark.staging import staging_root

    names = ("spark_graft_bkt_orders", "spark_graft_bkt_lineitem")
    if not all(spark.catalog.tableExists(n) for n in names):
        tmp = tempfile.mkdtemp(
            dir=staging_root(spark), prefix="spark_graft_bkt_"
        )
        for name, table, key in (
            (names[0], "orders", "o_orderkey"),
            (names[1], "lineitem", "l_orderkey"),
        ):
            (
                load_table(spark, sf_dir, table)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", f"{tmp}/{table}")
                .mode("overwrite")
                .saveAsTable(name)
            )
    return names


@register(
    "bucketed_join_order_priority_revenue",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def bucketed_join_order_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+/J2+ bucketed co-located join: both fact tables are laid out in
    8 buckets clustered and sorted on the orderkey, so the sort-merge
    join needs NO join-side exchange or sort — each task merges bucket i
    of orders with bucket i of lineitem (pinned in tests/test_sinks.py
    with broadcast disabled). This is the 100 TB layout answer for a join
    repeated every run: pay the shuffle once at write time, never at read
    time."""
    bkt_orders, bkt_lineitem = stage_bucketed_order_tables(spark, sf_dir)
    o = spark.table(bkt_orders)
    li = spark.table(bkt_lineitem)
    revenue = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(revenue).alias("revenue_cents"),
        )
    )


def _staged_zorder_events(spark: SparkSession, sf_dir: str) -> str:
    """events laid out as 8 Z-ordered files on (user_id, epoch-seconds),
    content-addressed like the other stagings (staging.py)."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.layout import zorder_by
    from dataengineerchallenge_spark.sources.tables import load_table
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        ev = load_table(spark, sf_dir, "events").select(
            F.col("event_id").cast("string"),
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("user_id").cast("long"),
            "event_type",
            "value",
        )
        zorder_by(ev, "user_id", "ts_s", n_files=8).write.parquet(str(out))

    return staged(spark, "zorder", Path(sf_dir) / "events.parquet", "zorder", build)


@register(
    "zorder_sink_roundtrip",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 4) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE user_id BETWEEN 100 AND 200
      AND ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    """,
)
def zorder_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+ Z-order layout under the gate: events rewritten as 8 files
    Morton-clustered on (user_id, ts_s), read back with predicates on
    BOTH dimensions. Correctness is layout-invariant (the oracle reads
    the original table); the two-dimensional min/max tightening that
    makes either predicate skip most files is pinned from real parquet
    footers in tests/test_layout.py."""
    lo = 1704844800  # 2024-01-10 UTC
    hi = 1705708800  # 2024-01-20 UTC
    back = spark.read.parquet(_staged_zorder_events(spark, sf_dir))
    return (
        back.filter(
            F.col("user_id").between(100, 200)
            & (F.col("ts_s") >= lo)
            & (F.col("ts_s") < hi)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


def _staged_evolving_events(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet drops with EVOLVED schemas: batch1 (first half-month)
    lacks the ``value`` column, batch2 carries it — the upstream-added-a-
    field ingestion reality. Content-addressed staging (staging.py)."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.tables import load_table
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        split_s = 1705363200  # 2024-01-16 UTC
        ev = load_table(spark, sf_dir, "events").select(
            F.col("event_id").cast("long"),
            F.unix_timestamp("ts").alias("ts_s"),
            "event_type",
            "value",
        )
        ev.filter(F.col("ts_s") < split_s).drop("value").write.parquet(str(out / "batch=1"))
        ev.filter(F.col("ts_s") >= split_s).write.parquet(str(out / "batch=2"))

    return staged(spark, "evolve", Path(sf_dir) / "events.parquet", "evolve", build)


@register(
    "schema_evolution_union_read",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_with_value,
           ROUND(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                          THEN value END), 4) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def schema_evolution_union_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+ schema evolution: one ``mergeSchema`` read over parquet drops
    whose schemas differ (the old batch predates the ``value`` column);
    rows from the old batch surface it as NULL, and the aggregate proves
    the unified view is exactly the NULL-padded union the oracle states.
    At 100 TB, footer merging is the cheap part — the design rule this
    pins is that ADDITIVE evolution needs no backfill rewrite of old
    partitions."""
    back = spark.read.option("mergeSchema", "true").parquet(
        _staged_evolving_events(spark, sf_dir)
    )
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("value").isNotNull(), 1).otherwise(0)).cast("long").alias("n_with_value"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "json_corrupt_quarantine",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_valid,
           CAST(3 AS BIGINT) AS n_corrupt,
           ROUND(SUM(value), 4) AS total_value
    FROM events
    """,
)
def json_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 on the JSON route: three known-malformed lines ride along with
    the staged events; PERMISSIVE + columnNameOfCorruptRecord quarantines
    them into a side column instead of failing the scan. The aggregate
    proves BOTH directions: every valid row survives with intact values,
    and exactly the planted bad lines land in quarantine."""
    from dataengineerchallenge_spark.sources.formats import events_json_with_corrupt

    df = events_json_with_corrupt(spark, sf_dir)
    return df.agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0)).cast("long").alias("n_valid"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
