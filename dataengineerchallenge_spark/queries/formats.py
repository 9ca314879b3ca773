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
