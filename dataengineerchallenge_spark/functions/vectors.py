"""Vector operations over ``array<float>`` embedding columns (SURVEY.md
§2.8 F8, feeding §2.11 N3 similarity search).

Two representations, both JVM-side (no Python UDFs):

- **Array-expression form** — higher-order functions (``zip_with`` +
  ``aggregate``) computing dot/norm/cosine inside a single projection.
  Right when vectors ride along as one column of a wider row.
- **Long form** — ``posexplode`` to (id, pos, value) rows, so vector
  algebra becomes relational algebra: centroids are a groupBy-avg,
  dot products are a join+sum. Right when the same vectors feed many
  aggregations (IVF build), because Catalyst shuffles/combines it like
  any fact table — this is the 100 TB-friendly layout (column pruning,
  partial aggregation, AQE skew handling all apply).

All arithmetic is cast to double before accumulation so results agree
with the DuckDB oracle to ~1e-15 (inputs are float32, exact in double).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dbl(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ accumulated in double."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def explode_vectors(df: DataFrame, id_cols: list[str], vec_col: str) -> DataFrame:
    """Long form: one row per (ids…, pos, v) with v as double."""
    return df.select(
        *id_cols, F.posexplode(vec_col).alias("pos", "_vf")
    ).withColumn("v", F.col("_vf").cast("double")).drop("_vf")
