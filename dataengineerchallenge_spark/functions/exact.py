"""Exact-aggregation idioms for oracle-hash-stable results.

Floating-point SUM is order-dependent: Spark's parallel partial/final
aggregation and DuckDB's sequential scan can differ in the last ulps, which
ROUND(x, 4) does not reliably absorb at decision boundaries. Discipline
(SURVEY.md §7.4): integerize per row (cents / basis points — per-row double
arithmetic on identical operands is deterministic), SUM exactly as bigint,
and derive any rounded double from the exact integers.

Every helper has a Spark form and an equivalent SQL-fragment form so a
query and its DuckDB oracle are assembled from the same idiom.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ints(col: Column | str, scale: int = 0) -> Column:
    """Per-row integerize: round(col * 10^scale) as bigint.

    ROUND-then-CAST on both engines (a bare double->bigint CAST truncates in
    Spark but rounds in DuckDB — never cast directly).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**scale), 0).cast("bigint")


def cents(col: Column | str) -> Column:
    return ints(col, 2)


def bps(col: Column | str) -> Column:
    """Basis points (1e-4) — for discount/tax-like ratios."""
    return ints(col, 4)


def sql_ints(expr: str, scale: int = 0) -> str:
    return f"CAST(ROUND(({expr}) * {10**scale}) AS BIGINT)"


def sql_cents(expr: str) -> str:
    return sql_ints(expr, 2)


def sql_bps(expr: str) -> str:
    return sql_ints(expr, 4)


def avg_from_ints(sum_col: Column, count_col: Column, scale: int, digits: int = 4) -> Column:
    """round(sum / 10^scale / count, digits) — all inputs exact bigints."""
    return F.round(
        sum_col.cast("double") / F.lit(float(10**scale)) / count_col.cast("double"),
        digits,
    )


def sql_avg_from_ints(sum_expr: str, count_expr: str, scale: int, digits: int = 4) -> str:
    return (
        f"ROUND(CAST({sum_expr} AS DOUBLE) / {float(10 ** scale)} / "
        f"CAST({count_expr} AS DOUBLE), {digits})"
    )
