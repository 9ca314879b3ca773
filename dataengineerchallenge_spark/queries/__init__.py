"""Query modules — each import registers queries()/oracle_sql() pairs."""

from __future__ import annotations

import importlib

_MODULES = [
    "sessions",
    "elb",
    "relational",
    "tpch",
    "ranking",
    "aggregates",
    "dedup",
    "vectors",
    "text",
    "streaming",
    "udf",
    "ml",
    "multimodal",
    "sql_surface",
    "pipeline",
    "formats",
    "analytics",
    "sketches",
    "quality",
    "dimensions",
    "mixing",
    "graph",
    "evals",
    "search",
    "extraction",
    "classifier",
    "regressor",
]


def load() -> None:
    for m in _MODULES:
        importlib.import_module(f"dataengineerchallenge_spark.queries.{m}")
