"""Custom Python Data Source (Spark 4 DataSource API) for ELB access
logs (SURVEY.md §2.1 S1 breadth).

``spark.read.text`` already handles gzip'd logs; this source exists as
the engine's template for ingest formats Spark has NO built-in reader
for (proprietary binary logs, API-paginated feeds) — the Python
DataSource API is the sanctioned way to bring those into the DataFrame
world with real partition planning instead of a driver-side collect.

Design points the 100 TB stance cares about:
- ``partitions()`` returns one InputPartition per file, so a prefix of
  per-interval log drops (/root/reference/README.md:44) parallelizes
  across the cluster exactly like the built-in file source;
- ``read()`` streams lines lazily (Arrow-batched by the runtime), never
  materializing a file in memory;
- gzip members are NOT splittable, so per-file is the correct partition
  granularity — same constraint the built-in text source has
  (sources/elb.py spread note).

Downstream parsing is shared with the built-in path (sources/elb.py
parse_elb), so both ingest routes feed identical typed rows — which is
what the oracle-checked twin query pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class ElbLogDataSource(DataSource):
    """``spark.read.format("elblog").load(path_or_glob)`` → one ``value``
    string column per log line, transparently gunzipping ``.gz`` files."""

    @classmethod
    def name(cls) -> str:
        return "elblog"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return _ElbLogReader(self.options)


class _ElbLogReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options["path"]

    def partitions(self):
        import glob
        import os

        p = self.path
        if any(c in p for c in "*?["):
            files = sorted(glob.glob(p))
        elif os.path.isfile(p):
            files = [p]
        else:
            files = sorted(
                f for f in glob.glob(os.path.join(p, "*")) if os.path.isfile(f)
            )
        if not files:
            raise FileNotFoundError(f"elblog source: no input files under {p!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        import gzip

        f = partition.value
        opener = gzip.open if f.endswith(".gz") else open
        with opener(f, "rt", encoding="utf-8", errors="replace") as fh:
            for line in fh:
                yield (line.rstrip("\n"),)


def read_elb_log_pyds(spark: SparkSession, path: str) -> DataFrame:
    """Raw ELB lines through the custom Python data source (idempotent
    per-session registration)."""
    spark.dataSource.register(ElbLogDataSource)
    return spark.read.format("elblog").load(path)
