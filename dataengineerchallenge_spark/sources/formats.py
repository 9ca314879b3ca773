"""Alternate source formats (SURVEY.md §2.1 S2 breadth): JSON-lines,
CSV, and ORC read paths with explicit schema-on-read.

The driver fixtures are parquet-only, so each reader stages a converted
copy of the ``events`` table into a content-addressed scratch dir ONCE
(deterministic: same input file → same staged bytes → cached), then
reads it back with an EXPLICIT schema — never inference, per the messy
-data stance (/root/reference/README.md:61): on a 100 TB lake, schema
inference is both a full extra scan and a correctness hazard.

Format notes a 100 TB deployment cares about (in docstrings below):
JSON/CSV are row-formats — fine as ingest interchange, wrong at rest
(no column pruning, no predicate pushdown); ORC/parquet are the at-rest
formats (both columnar, both pushdown-capable in Spark).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from dataengineerchallenge_spark.sources.tables import load_table
from dataengineerchallenge_spark.staging import staged

# events with ts pre-floored to epoch seconds: JSON/CSV have no native
# timestamp type, so the interchange schema carries the integer form the
# queries use anyway (hash-safe, SURVEY §7.4)
_EVENTS_DDL = "event_id string, ts_s long, user_id string, event_type string, value double"


def _staged(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    def build(out: Path) -> None:
        from pyspark.sql import functions as F

        ev = load_table(spark, sf_dir, "events").select(
            F.col("event_id").cast("string"),
            F.unix_timestamp("ts").alias("ts_s"),
            F.col("user_id").cast("string"),
            "event_type",
            "value",
        )
        w = ev.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.format(fmt).save(str(out))

    return staged(spark, f"fmt_{fmt}", Path(sf_dir) / "events.parquet", fmt, build)


def events_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines reader: explicit schema, PERMISSIVE mode (malformed
    records surface as nulls, not job failures). Row format — ingest
    interchange only; no pruning/pushdown at rest."""
    return (
        spark.read.schema(_EVENTS_DDL)
        .option("mode", "PERMISSIVE")
        .json(_staged(spark, sf_dir, "json"))
    )


def events_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV reader: explicit schema + header, PERMISSIVE — the same
    from_csv machinery the ELB parser uses, as a file source."""
    return (
        spark.read.schema(_EVENTS_DDL)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(_staged(spark, sf_dir, "csv"))
    )


def events_from_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC reader: the other columnar at-rest format Spark pushes
    filters/pruning into (vectorized reader, like parquet)."""
    return spark.read.schema(_EVENTS_DDL).orc(_staged(spark, sf_dir, "orc"))


#: malformed JSON-lines appended to the corrupt-staging copy — known
#: constants so the quarantine count is oracle-stable
CORRUPT_JSON_LINES = (
    '{"event_id": "bad-1", "ts_s": not_json}',
    '{"event_id": "bad-2", "ts_s": 12,',
    "plainly not json at all",
)


def events_json_with_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines path with a quarantine column: the staged events plus
    three known-malformed lines, read PERMISSIVE with
    ``columnNameOfCorruptRecord`` so bad rows carry their raw text in
    ``_corrupt`` instead of failing the job — the P5 quarantine stance on
    the JSON route (the ELB route pins the same stance in
    sources/elb.py)."""
    src = Path(_staged(spark, sf_dir, "json"))

    def build(out: Path) -> None:
        out.mkdir(parents=True)
        for f in src.glob("part-*.json"):
            (out / f.name).write_bytes(f.read_bytes())
        (out / "part-zz-corrupt.json").write_text("\n".join(CORRUPT_JSON_LINES) + "\n")

    d = staged(
        spark, "fmt_jsoncorrupt", Path(sf_dir) / "events.parquet", "jsoncorrupt", build
    )
    return (
        spark.read.schema(_EVENTS_DDL + ", _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(d)
    )
