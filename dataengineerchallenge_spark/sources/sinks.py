"""Results sinks (SURVEY.md §2.1 S4; /root/reference/README.md:54 asks
solutions to persist/present results).

Batch: parquet is the default interchange (columnar, schema-carrying,
splittable); CSV for human hand-off. Partitioned writes are the 100 TB
path — ``partition_by`` date/tenant columns so downstream reads prune;
``coalesce_to`` compacts tiny results (a 20-row summary should be ONE
file, not 32 shuffle-partition shards).

Streaming: see streaming/runner.py (memory sink for tests) and the
parquet ``writeStream`` used in tests/test_streaming.py — same trigger
and checkpoint options apply to any production sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_result(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    coalesce_to: int | None = None,
) -> None:
    """Persist a result frame. Small summaries: pass ``coalesce_to=1``."""
    if coalesce_to:
        df = df.coalesce(coalesce_to)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)


def read_result(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    r = spark.read
    if fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    return r.format(fmt).load(path)
