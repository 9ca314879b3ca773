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
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _discover_files(path: str) -> list[str]:
    import glob
    import os

    if any(c in path for c in "*?["):
        return sorted(glob.glob(path))
    if os.path.isfile(path):
        return [path]
    return sorted(f for f in glob.glob(os.path.join(path, "*")) if os.path.isfile(f))


def _read_lines(f: str):
    import gzip

    opener = gzip.open if f.endswith(".gz") else open
    with opener(f, "rt", encoding="utf-8", errors="replace") as fh:
        for line in fh:
            yield (line.rstrip("\n"),)


class ElbLogDataSource(DataSource):
    """``spark.read.format("elblog").load(path_or_glob)`` → one ``value``
    string column per log line, transparently gunzipping ``.gz`` files.
    Also streamable: ``spark.readStream.format("elblog")`` tails the same
    path, discovering new files per micro-batch (the S3 per-interval
    log-drop pattern, /root/reference/README.md:44)."""

    @classmethod
    def name(cls) -> str:
        return "elblog"

    def schema(self) -> str:
        return "value string"

    def reader(self, schema) -> DataSourceReader:  # noqa: ANN001
        return _ElbLogReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:  # noqa: ANN001
        return _ElbLogStreamReader(self.options)


class _ElbLogReader(DataSourceReader):
    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options["path"]

    def partitions(self):
        files = _discover_files(self.path)
        if not files:
            raise FileNotFoundError(f"elblog source: no input files under {self.path!r}")
        return [InputPartition(f) for f in files]

    def read(self, partition):
        yield from _read_lines(partition.value)


class _ElbLogStreamReader(SimpleDataSourceStreamReader):
    """File-tailing micro-batch reader: the offset is the sorted list of
    files already ingested; each batch reads whatever is new. The
    "simple" stream API runs ``read`` on the DRIVER — right for the
    modest per-interval drop volume here; a firehose would use the
    partition-planning DataSourceStreamReader so each batch fans out to
    executors like the batch reader above. ``readBetweenOffsets`` replays
    a committed range deterministically for recovery, so exactly-once
    holds across restarts (files are immutable once dropped)."""

    def __init__(self, options) -> None:  # noqa: ANN001
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        new = [f for f in _discover_files(self.path) if f not in seen]
        rows = [r for f in new for r in _read_lines(f)]
        return iter(rows), {"seen": sorted(seen | set(new))}

    def readBetweenOffsets(self, start: dict, end: dict):
        replay = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        for f in replay:
            yield from _read_lines(f)

    def commit(self, end: dict) -> None:
        pass  # file drops are immutable; nothing to clean up


def read_elb_log_pyds(spark: SparkSession, path: str) -> DataFrame:
    """Raw ELB lines through the custom Python data source (idempotent
    per-session registration)."""
    spark.dataSource.register(ElbLogDataSource)
    return spark.read.format("elblog").load(path)


def stream_elb_log_pyds(spark: SparkSession, path: str) -> DataFrame:
    """Raw ELB lines as an unbounded stream tailing ``path`` for new
    log drops via the custom source's stream reader."""
    spark.dataSource.register(ElbLogDataSource)
    return spark.readStream.format("elblog").load(path)
