"""Local oracle-parity harness — mimics the driver's t2 check, STRICTLY.

Runs every queries()[name] via Spark and oracle_sql()[name] via DuckDB at
the given sf dir, then compares row count, column names, and an
order-insensitive STRICT value comparison: both result sets are fetched
as Arrow tables and every cell is rendered with a type tag derived from
its Arrow logical type (int width, float vs int, decimal, timestamp...).

Why strict: the driver's hash is type-sensitive — round 3's only red row
(`tpch_q11`) had all 29 values numerically equal but the oracle SUM was a
DuckDB HUGEINT (decimal128 in Arrow) where Spark produced BIGINT. The old
normalize() here smoothed exactly that difference away, so the drift
reached the driver unseen. No value normalization across type widths:
int32(7) != int64(7), double(7.0) != int64(7), decimal(7) != int64(7).

Usage:
    python tools/check.py [sf_dir] [--json OUT.json] [query ...]

Exit code 1 if any checked query fails strict parity.
"""

from __future__ import annotations

import json
import math
import sys
import time

import duckdb
import pyarrow as pa


def _type_tag(t: pa.DataType) -> str:
    """Stable tag for an Arrow logical type; distinguishes int widths,
    signedness, float widths, and decimal — collapses only representation
    details the engines never disagree on (timestamp tz name, utf8 vs
    large_utf8, list vs large_list)."""
    if pa.types.is_integer(t):
        sign = "i" if pa.types.is_signed_integer(t) else "u"
        return f"{sign}{t.bit_width}"
    if pa.types.is_floating(t):
        return f"f{t.bit_width}"
    if pa.types.is_decimal(t):
        return "dec"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{_type_tag(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{t.field(i).name}:{_type_tag(t.field(i).type)}" for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{_type_tag(t.key_type)},{_type_tag(t.item_type)}>"
    return str(t)


def _cell(v, tag: str):
    """Render one .as_py() cell under its column's type tag."""
    if v is None:
        return "\x00NULL"
    if tag.startswith("f"):
        if isinstance(v, float) and math.isnan(v):
            return "NaN"
        # repr() is the exact shortest round-trip form — no smoothing
        return repr(float(v))
    if tag == "dec":
        return str(v)
    if tag in ("ts", "date"):
        # Spark's Arrow timestamps carry tz=UTC, DuckDB's are naive; under
        # the UTC session TZ these are the same instant — compare naive-UTC.
        if getattr(v, "tzinfo", None) is not None:
            import datetime as _dt

            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if tag == "bin":
        return v.hex()
    if tag.startswith("list<"):
        inner = tag[5:-1]
        return tuple(_cell(x, inner) for x in v)
    if tag.startswith(("struct<", "map<")):
        return str(v)
    return v


def strict_rows(tbl: pa.Table) -> tuple[list[str], list[tuple]]:
    """(column-sorted tagged schema, row-sorted tagged cell tuples)."""
    names = sorted(tbl.column_names)
    tags = {n: _type_tag(tbl.schema.field(n).type) for n in names}
    cols = [tbl.column(n).to_pylist() for n in names]
    rows = [
        tuple(f"{tags[n]}:{_cell(col[i], tags[n])}" for n, col in zip(names, cols))
        for i in range(tbl.num_rows)
    ]
    return [f"{n}:{tags[n]}" for n in names], sorted(rows)


def main() -> int:
    args = [a for a in sys.argv[1:]]
    out_json = None
    if "--json" in args:
        i = args.index("--json")
        out_json = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    report: dict[str, dict] = {}
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec: dict = {"rows_match": None, "cols_match": None, "strict_match": None, "err": None}
        try:
            s_tbl = fn(spark, sf_dir).toArrow()
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"spark: {type(ex).__name__}: {ex}"
            print(f"FAIL {name}: {rec['err']}")
            report[name] = rec
            n_fail += 1
            continue
        rec["spark_rows"] = s_tbl.num_rows
        if name not in oracles:
            rec["rows_only"] = True
            report[name] = rec
            print(f"rows-only {name}: {s_tbl.num_rows} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            d_tbl = con.sql(oracles[name]).arrow()
        except Exception as ex:  # noqa: BLE001
            rec["err"] = f"duckdb: {type(ex).__name__}: {ex}"
            print(f"FAIL {name}: {rec['err']}")
            report[name] = rec
            n_fail += 1
            continue
        rec["oracle_rows"] = d_tbl.num_rows
        rec["rows_match"] = s_tbl.num_rows == d_tbl.num_rows
        rec["cols_match"] = sorted(s_tbl.column_names) == sorted(d_tbl.column_names)
        ok = rec["rows_match"] and rec["cols_match"]
        if not rec["rows_match"]:
            print(f"FAIL {name}: rowcount spark={s_tbl.num_rows} duckdb={d_tbl.num_rows}")
        if not rec["cols_match"]:
            print(
                f"FAIL {name}: cols spark={sorted(s_tbl.column_names)}"
                f" duckdb={sorted(d_tbl.column_names)}"
            )
        if ok:
            s_schema, s_rows = strict_rows(s_tbl)
            d_schema, d_rows = strict_rows(d_tbl)
            rec["strict_match"] = s_schema == d_schema and s_rows == d_rows
            if not rec["strict_match"]:
                if s_schema != d_schema:
                    print(f"FAIL {name}: type drift spark={s_schema} duckdb={d_schema}")
                else:
                    diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
                    print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                ok = rec["strict_match"]
        if ok:
            print(f"PASS {name}: {s_tbl.num_rows} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
        report[name] = rec

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "pass": n_pass,
                    "fail": n_fail,
                    "rows_only": n_rows_only,
                    "queries": report,
                },
                f,
                indent=1,
            )
        print(f"wrote {out_json}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
