"""Physical-layout management for parquet results (S4+): small-file
compaction and Z-order (Morton-curve) clustering.

Both attack the same 100 TB problem from opposite ends:

* ``compact_files`` — many tiny files (streaming micro-batches, over-
  partitioned writes) are a NameNode/listing/scheduler tax; rewrite to
  ~``target_file_bytes`` files.
* ``zorder_by`` — one sort key gives perfect min/max pruning on ONE
  column; interleaving the bits of two keys gives good (not perfect)
  pruning on BOTH, because the Morton curve keeps locality in each
  dimension. Parquet footers then carry tight per-file/row-group
  min/max on both columns and engines skip most files for a predicate
  on either one (pinned in tests/test_layout.py by reading footers).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(c: Column) -> Column:
    """Spread a 16-bit int's bits into the even positions of a 32-bit
    value (classic magic-number Morton spread, expressed in whole-stage-
    codegen-able bit arithmetic — no UDF)."""
    for shift, mask in _MASKS:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def morton_code(a: Column, b: Column) -> Column:
    """Interleave two 16-bit-normalized columns into one Z-value."""
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def _to_u16(c: Column, lo: float, hi: float) -> Column:
    span = (hi - lo) or 1.0
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(span) * 65535.0
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), F.lit(65535))


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int) -> DataFrame:
    """Return ``df`` range-partitioned and sorted by the Morton code of
    (col_a, col_b), ready to write as ``n_files`` files with tight
    two-dimensional min/max stats.

    The normalization bounds come from one tiny eager min/max aggregate
    over the input (same stance as Delta's OPTIMIZE ZORDER): a scan-cheap
    driver action whose result is embedded as literals so the layout pass
    itself stays one repartitionByRange + local sort.
    """
    bounds = df.agg(
        F.min(col_a).cast("double"),
        F.max(col_a).cast("double"),
        F.min(col_b).cast("double"),
        F.max(col_b).cast("double"),
    ).first()
    a16 = _to_u16(F.col(col_a), bounds[0], bounds[1])
    b16 = _to_u16(F.col(col_b), bounds[2], bounds[3])
    z = morton_code(a16, b16).alias("_z")
    return (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def compact_files(df: DataFrame, target_file_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Repartition ``df`` so a subsequent write produces files of roughly
    ``target_file_bytes``. Size is taken from the optimizer's estimate of
    the plan (file-source relations report real on-disk bytes); the
    rewrite is a round-robin repartition — no keys, no sort — so it costs
    one shuffle and fixes the small-file problem a streaming sink or
    over-parallel writer leaves behind."""
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n = max(1, math.ceil(est / target_file_bytes))
    return df.repartition(n)
