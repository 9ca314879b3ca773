"""Cross-engine reproducible hash draws.

One construct, used by every sampler/sketch that needs a uniform the
DuckDB oracle can replay bit-for-bit: the first 8 md5 nibbles of a key
rendered as a 32-bit integer. Spark side uses conv(); DuckDB has no
conv, so the oracle spells the same number as a strpos-per-nibble
polynomial. Both templates take the key COLUMN EXPRESSION as text so
callers can pass ``doc_id``, ``user_id`` or any SQL expression without
string-surgery on a prebuilt template.
"""

from __future__ import annotations

_HEX = "0123456789abcdef"


def spark_u32(key_sql: str) -> str:
    """Spark SQL text: first-8-md5-nibbles of ``key_sql`` as BIGINT."""
    return (
        f"cast(conv(substring(md5(cast({key_sql} as string)), 1, 8), 16, 10) "
        "as bigint)"
    )


def duck_u32(key_sql: str) -> str:
    """DuckDB SQL text computing the identical 32-bit integer."""
    return " + ".join(
        f"(strpos('{_HEX}', substr(md5(CAST({key_sql} AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
