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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_confs(spark)
    return _normalize_ts(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


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


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a narrow scan up to cluster width before a
    fan-out-heavy stage (shingle explode, token explode, self-join).

    Single-file fixtures arrive as ONE scan partition, so everything up to
    the first exchange — including a 100×-row explode and the map side of a
    self-join — runs on one core (measured 3-4× slowdown on the shingle
    join at sf0.1). Gated: only repartitions when the plan currently has
    fewer partitions than the target, so at 100 TB (where a partitioned
    dataset already arrives wider than the cluster) this is a no-op and no
    extra shuffle is inserted. The width probe is memoized per semantic
    plan (see _SPREAD_CACHE).
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    key = (
        df.sparkSession.sparkContext.applicationId,
        df._jdf.queryExecution().analyzed().semanticHash(),
    )
    n = _SPREAD_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        if len(_SPREAD_CACHE) < 4096:  # bound against pathological churn
            _SPREAD_CACHE[key] = n
    if n >= target:
        return df
    return df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all fixture tables as temp views for the SQL surface (S5)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
