"""Regression armor for the fixture timestamp-type drift that broke
round 3: the driver's parquet generator has shipped ``events.ts`` as
TIMESTAMP(NANOS) (read as bigint under nanosAsLong) and later as
``timestamp[us]`` NTZ. ``_normalize_ts`` must map every generation —
nanos-bigint, NTZ, and tz-aware TIMESTAMP — to the same TIMESTAMP
column, value-identical, watermark-legal."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataengineerchallenge_spark.sources.tables import _normalize_ts

US = [1_700_000_000_000_000, 1_700_000_123_456_789, 1_700_009_999_000_001]


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tsvariants")
    paths = {}
    for name, typ, vals in [
        ("nanos", pa.timestamp("ns"), [v * 1000 for v in US]),
        ("ntz", pa.timestamp("us"), US),
        ("ltz", pa.timestamp("us", tz="UTC"), US),
    ]:
        p = str(d / f"{name}.parquet")
        pq.write_table(pa.table({"ts": pa.array(vals, type=typ)}), p)
        paths[name] = p
    return paths


def _load(spark, path):
    from dataengineerchallenge_spark.sources.tables import _ensure_confs

    _ensure_confs(spark)
    return _normalize_ts(spark.read.parquet(path))


def test_all_generations_normalize_to_timestamp(spark, variant_dirs):
    for name, path in variant_dirs.items():
        df = _load(spark, path)
        assert df.schema["ts"].dataType.typeName() == "timestamp", name


def test_all_generations_value_identical(spark, variant_dirs):
    from pyspark.sql import functions as F

    got = {
        name: sorted(
            r[0] for r in _load(spark, path).select(F.unix_micros("ts")).collect()
        )
        for name, path in variant_dirs.items()
    }
    assert got["nanos"] == got["ntz"] == got["ltz"] == sorted(US)


def test_all_generations_watermark_legal(spark, variant_dirs, tmp_path):
    """withWatermark on the normalized column must not throw
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE for any generation (the exact
    round-3 failure: NTZ passed through raw)."""
    for name, path in variant_dirs.items():
        df = _load(spark, path)
        # analysis alone surfaces the event-time type error
        df.withWatermark("ts", "10 minutes").groupBy().count().schema
