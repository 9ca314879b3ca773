"""Central query/oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here:

    @register("q_name", oracle="SELECT ... AS same_alias ...")
    def q_name(spark, sf_dir) -> DataFrame: ...

``oracle`` is ANSI SQL executable by DuckDB over the driver's
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). Omit it for genuinely
non-SQL-expressible ops (LSH, ML fits, streaming) — the driver then
records a weaker rows-only check.

Hash-match discipline (SURVEY.md §7.4): alias every computed column
identically on both sides; floor timestamps to seconds via
unix_timestamp/epoch before arithmetic; ROUND doubles to 4 places on
both sides; cast DuckDB HUGEINT aggregates to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, tuple[QueryFn, Optional[str]]] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a (spark, sf_dir) -> DataFrame query, with an
    optional DuckDB oracle SQL string."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        _QUERIES[name] = (fn, oracle)
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registrations run."""
    from dataengineerchallenge_spark import queries as _q  # noqa: F401

    _q.load()


def queries() -> dict[str, QueryFn]:
    load_all()
    return {n: fn for n, (fn, _) in _QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {n: o for n, (_, o) in _QUERIES.items() if o is not None}
