"""exp() engine-parity probe (r18) — a MEASURED NEGATIVE result.

The IRLS classifier's canonical logistic sigmoid would have been the
first operator to put libm exp() on the cross-engine hash path (ln()
measured clean for the FS/JSD/Adamic-Adar family; sqrt is IEEE-correct
by spec). This probe evaluates exp over a dense deterministic grid of
EXACTLY IDENTICAL double inputs (z = k / 1e5, k integer — both engines
construct the same bit pattern) in Spark (JVM Math.exp) and DuckDB
(C libm) and compares BIT-FOR-BIT.

Finding on this container: 21,137 of 216,217 grid points (~10%)
disagree by 1 ulp — exp() is NOT hash-safe here, which is why
queries/classifier.py trains on the algebraic sigmoid
0.5 + 0.5·z/(1+|z|) (pure rational IEEE arithmetic, identical by
construction) instead of 1/(1+exp(-z)).

Usage: python tools/exp_parity.py [--step 37]
Prints one JSON line {n, mismatches, max_ulp}. Exit code 1 on any
mismatch — i.e. exit 0 would mean exp() became safe on this platform.
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=37)
    ap.add_argument("--lo", type=int, default=-4_000_000)  # z in [-40, 40]
    ap.add_argument("--hi", type=int, default=4_000_000)
    args = ap.parse_args()

    import duckdb

    from dataengineerchallenge_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("exp_parity")
    spark.sparkContext.setLogLevel("ERROR")

    n = (args.hi - args.lo) // args.step + 1
    sdf = (
        spark.range(n)
        .select((F.lit(args.lo) + F.col("id") * args.step).alias("k"))
        .select("k", F.exp(F.col("k") / 100000.0).alias("e"))
        .orderBy("k")
    )
    spark_vals = sdf.toPandas()

    con = duckdb.connect()
    duck_vals = con.sql(
        f"""SELECT k, exp(k / 100000.0) AS e FROM (
              SELECT {args.lo} + unnest(range(0, {n})) * {args.step} AS k
            ) ORDER BY k"""
    ).df()

    assert len(spark_vals) == len(duck_vals) == n
    mism = 0
    max_ulp = 0
    worst = None
    for (ks, es), (kd, ed) in zip(
        spark_vals.itertuples(index=False), duck_vals.itertuples(index=False)
    ):
        assert ks == kd
        bs, bd = bits(es), bits(ed)
        if bs != bd:
            mism += 1
            ulp = abs(bs - bd)
            if ulp > max_ulp:
                max_ulp, worst = ulp, ks
    out = {
        "metric": "exp_bit_parity_spark_vs_duckdb",
        "n": n,
        "mismatches": mism,
        "max_ulp": max_ulp,
        "worst_k": worst,
        "grid": f"k/1e5 in [{args.lo / 1e5}, {args.hi / 1e5}] step {args.step}",
    }
    print(json.dumps(out))
    sys.exit(1 if mism else 0)


if __name__ == "__main__":
    main()
