"""Parquet table sources (SURVEY.md §2.1 S2/S5).

The driver fixtures are one parquet file per table
(TESTDATA.md). At 100 TB each "table" would be a partitioned parquet
dataset (e.g. date-partitioned logs per the AWS ELB delivery format,
/root/reference/README.md:44); ``spark.read.parquet`` handles both —
partition pruning and predicate pushdown apply automatically because all
queries here express filters declaratively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the engine depends on, applied defensively —
    the driver hands us ITS session, which won't have our builder configs.

    - nanosAsLong: events.ts has historically been parquet TIMESTAMP(NANOS),
      which Spark 4 rejects natively (PARQUET_TYPE_ILLEGAL) — read as bigint
      nanos instead. Harmless when the file is already µs.
    - UTC session timezone: epoch arithmetic must match the DuckDB oracle,
      which treats naive parquet timestamps as UTC.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize any ``ts`` column to TIMESTAMP (with local/UTC zone),
    whatever physical type the fixture parquet uses. Three cases observed
    across driver generations:

    - bigint: TIMESTAMP(NANOS) read via nanosAsLong — floor-divide ns→µs
      (identical to DuckDB's truncation) and rebuild a timestamp;
    - timestamp_ntz: parquet ``timestamp[us]`` without UTC adjustment —
      cast to TIMESTAMP; under the UTC session TZ this is value-preserving
      and makes the column legal for ``withWatermark`` (event time must be
      TIMESTAMP, not NTZ);
    - timestamp: passthrough.

    Works on batch and streaming DataFrames alike (pure column expressions).
    """
    for field in df.schema.fields:
        if field.name != "ts":
            continue
        kind = field.dataType.typeName()
        if kind == "long":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.floor(F.col("ts") / F.lit(1000)).cast("long"))
            )
        elif kind == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


#: session -> {(sf_dir, name): DataFrame}. r20: every load_table call
#: paid ~0.1 s of driver-side work (a fresh InMemoryFileIndex listing +
#: parquet footer read + analysis round-trips) for the SAME immutable
#: fixture scan — dq_referential_integrity alone calls it six times, and
#: the 342-query registry re-lists the same handful of files hundreds of
#: times per sweep (guide §5.3 driver overhead / §6 listing cost). The
#: cached object is a LAZY PLAN, not data: every action still computes
#: from the parquet inputs — nothing here memoizes results. Keyed on the
#: live session object via WeakKeyDictionary so entries die with the
#: session (no id()-reuse hazard — ADVICE r6), and DataFrames are
#: immutable so sharing one across callers is safe.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = None  # type: ignore[assignment]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    global _TABLE_CACHE
    if _TABLE_CACHE is None:
        import weakref

        _TABLE_CACHE = weakref.WeakKeyDictionary()
    _ensure_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    # the path's mtime is part of the key: a REWRITTEN fixture (test
    # corpora regenerate under one tmp dir; a Spark overwrite bumps the
    # directory mtime) must re-resolve its file listing, while the
    # read-only driver fixtures hit the cache every time. One stat()
    # per call — microseconds against the ~0.1 s listing it avoids.
    try:
        import os

        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None  # let spark.read raise its own descriptive error
    try:
        per = _TABLE_CACHE.setdefault(spark, {})
    except TypeError:  # unhashable session stub (tests) — skip caching
        per = {}
    df = per.get((sf_dir, name, mtime))
    if df is None:
        df = _normalize_ts(spark.read.parquet(path))
        per[(sf_dir, name, mtime)] = df
    return df


#: (applicationId, analyzed-plan semanticHash) -> scan partition count.
#: df.rdd compiles the full physical plan just to ask its width; with a
#: 170-query registry re-probing the same fixture scans every run adds a
#: plan compile per call (VERDICT r5 #7). Keyed on the SEMANTIC hash of
#: the analyzed plan, so two loads of the same table hit one probe.
#: Keyed on applicationId, not id(session): a stopped session's id() can
#: be reused by a new session object and inherit stale widths (ADVICE
#: r6); applicationId is unique per SparkContext lifetime.
#: Trade-off, documented: if the files behind an identical plan are
#: rewritten mid-session the cached width is stale — harmless here (the
#: gate only decides whether to widen) and impossible for the read-only
#: driver fixtures.
_SPREAD_CACHE: dict[tuple[str, int], int] = {}


# Per-partition floor (in PLAN-STATS bytes, i.e. compressed parquet
# bytes for scan-rooted plans) for spread's adaptive width: 64 KiB
# compressed ≈ a few MB of post-explode work per task. At sf0.1 this
# puts documents/embeddings at ~10 partitions (the measured sweet spot:
# doc_lang_id 1.5 → 1.0 s, doc_lm_perplexity 1.7 → 1.1 s vs the
# blanket defaultParallelism width whose 32 near-empty tasks each paid
# ~300 ms of shuffle-commit overhead); any corpus big enough to need
# the full cluster still gets it via the clamp below.
_SPREAD_BYTES_PER_PART = 1 << 16


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan up to a fan-out width before
    a fan-out-heavy stage (shingle explode, token explode, self-join).

    Single-file fixtures arrive as ONE scan partition, so everything up to
    the first exchange — including a 100×-row explode and the map side of a
    self-join — runs on one core (measured 3-4× slowdown on the shingle
    join at sf0.1). Gated: only repartitions when the plan currently has
    fewer partitions than the target, so at 100 TB (where a partitioned
    dataset already arrives wider than the cluster) this is a no-op and no
    extra shuffle is inserted. The width probe is memoized per semantic
    plan (see _SPREAD_CACHE).

    r20: the target width is derived from the plan-stats input size
    (guide §2.2 — partitions sized by bytes, adaptively, not a blanket
    cluster-width constant), clamped to ``defaultParallelism``: tiny
    corpora stop fanning out to dozens of near-empty tasks that each pay
    per-task shuffle-file overhead, while plans with unknown stats
    (checkpoint-rooted: Spark's 8-EiB default) and genuinely large
    inputs keep the full width — identical to the old behavior. Dial:
    ``spark.graft.spread.adaptive`` (default true; false restores the
    blanket width — used by the same-session A/B)."""
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    key = (
        df.sparkSession.sparkContext.applicationId,
        df._jdf.queryExecution().analyzed().semanticHash(),
        partitions,
    )
    cached = _SPREAD_CACHE.get(key)
    if cached is None:
        n = df.rdd.getNumPartitions()
        size = int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
        if len(_SPREAD_CACHE) < 4096:  # bound against pathological churn
            _SPREAD_CACHE[key] = (n, size)
    else:
        n, size = cached
    if (
        partitions is None
        and df.sparkSession.conf.get("spark.graft.spread.adaptive", "true")
        == "true"
    ):
        target = max(1, min(target, -(-size // _SPREAD_BYTES_PER_PART)))
    if n >= target:
        return df
    return df.repartition(target)


def _lit_scalar(c) -> bool:
    return c is None or isinstance(c, (int, float, str, bool)) or type(c).__module__ == "datetime"


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """One-partition literal frame for tiny constant tables (quantile
    grids, geo blocks, lexicons, dims).

    ``createDataFrame`` slices even a 9-row literal table over
    ``defaultParallelism`` partitions, and every execution that
    materializes the frame then schedules that many near-empty
    ExistingRDD tasks at ~200 ms apiece of pure scheduling/serialization
    overhead (profiled on gk_value_quantiles / elb_geo_traffic: 7-8 s of
    task time, <150 ms CPU, zero I/O — r20, OPTIMIZATION_r20.md Change
    10). Building the rows as literal-array projections over
    ``spark.range(0, n, 1, 1)`` pins ONE partition at the source and
    measured 4.5x faster to materialize (0.08 vs 0.37 s); rows with
    non-scalar cells fall back to a 1-slice parallelize, same layout.
    Values are identical to the createDataFrame form either way."""
    tmpl = spark.createDataFrame([], schema)
    rows = [tuple(r) for r in rows]
    if not rows:
        return tmpl
    if any(not _lit_scalar(c) for r in rows for c in r):
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), schema
        )
    idx = F.col("id").cast("int")
    cols = []
    for j, f in enumerate(tmpl.schema.fields):
        arr = F.array([F.lit(r[j]) for r in rows])
        cols.append(arr[idx].cast(f.dataType).alias(f.name))
    return spark.range(0, len(rows), 1, 1).select(*cols)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all fixture tables as temp views for the SQL surface (S5)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
