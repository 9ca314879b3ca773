"""Streaming sources (SURVEY.md §2.1 S3).

The driver fixtures are static parquet; we tail them with the file
streaming source, which is exactly how a production pipeline would tail
an S3 prefix of ELB log drops (/root/reference/README.md:44 — AWS
delivers one object per interval per node). Swapping in Kafka is a
one-line ``format("kafka")`` change downstream of this module.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from dataengineerchallenge_spark.sources.tables import _ensure_confs, _normalize_ts


def _staged_dir(spark: SparkSession, src: str) -> str:
    """The file streaming source tails a DIRECTORY (like an S3 prefix of
    ELB log drops); the fixture is a single parquet file, so stage a copy
    into a content-addressed dir under the shared staging root
    (staging.py) once per (file, mtime) and reuse it. Per-file atomic
    rename instead of the _SUCCESS slot protocol: a stream source must
    never observe a partial file, and the dir itself may legitimately
    grow (that is what a stream tail is)."""
    import os

    from dataengineerchallenge_spark.staging import SLOT_PREFIX, content_tag, staging_root

    p = Path(src)
    d = staging_root(spark) / f"{SLOT_PREFIX}stream_{content_tag(p, 'stream')}"
    target = d / p.name
    if not target.exists():
        d.mkdir(parents=True, exist_ok=True)
        # process-unique AND dot-hidden scratch name: concurrent drivers
        # must not truncate each other's in-flight copy, and Spark's file
        # source ignores dotfiles so a half-written copy is never listed
        tmp = d / f".{p.name}.{os.getpid()}.tmp"
        shutil.copyfile(p, tmp)
        tmp.rename(target)  # atomic: the source never sees a partial file
    return str(d)


def stream_events(spark: SparkSession, sf_dir: str, path: str | None = None) -> DataFrame:
    """``events`` as an unbounded stream.

    The file source needs an explicit schema (no inference on streams):
    we take it from a zero-cost batch read of the same file. ``ts`` is
    normalized to TIMESTAMP by the same helper as the batch path
    (``sources.tables._normalize_ts``: bigint-nanos / TIMESTAMP_NTZ /
    TIMESTAMP), so streaming and batch queries see byte-identical rows
    and ``withWatermark("ts", ...)`` is always legal.
    """
    _ensure_confs(spark)
    src = path or f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(src).schema
    df = spark.readStream.schema(schema).parquet(
        _staged_dir(spark, src) if Path(src).is_file() else src
    )
    return _normalize_ts(df)
