"""LPM-join scale bench → BENCH_lpm.json.

Measures the operator claim `operators/joins.py::lpm_join` makes for
100 TB: the octet-exploded equi key turns the CIDR interval lookup into
a broadcast HASH join, where the naive formulation (BETWEEN with no
equi key) plans a BroadcastNestedLoopJoin that is O(keys × blocks).

Rungs:
- ``parity``: keyed vs naive LPM on the same small corpus — identical
  (key → payload) maps, so the fast path changes nothing but the plan.
- ``crossover``: both formulations timed at a small size, then the
  keyed path alone scaled to block tables the naive path cannot touch
  (10k/100k blocks × 1M-4M keys — a real RIR/MaxMind table is ~4M
  blocks; the naive cost at that size is keys × 4M comparisons).

Deterministic: Python ``random.Random(seed)`` for blocks, Spark
``rand(seed)`` for keys. Usage:

    python tools/bench_lpm.py [--out BENCH_lpm.json]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gen_blocks(m: int, seed: int = 42) -> list[tuple]:
    """m random CIDR blocks (region, prefix_len, ip_lo, ip_hi) with
    prefix lengths 6..28 — a few wider-than-/8 blocks exercise the
    octet explode."""
    rng = random.Random(seed)
    rows = []
    for i in range(m):
        # realistic RIR-like mix: mostly /16-/24, a thin tail of /8-/15
        # aggregates, and a handful of wider-than-/8 blocks (plen 6) so
        # the octet explode is exercised; random /6s are kept rare —
        # they overlap almost everything, and per-key match fan-out, not
        # block count, is what the LPM window pays for
        if i % (m // 4 + 1) == 0 and i < 4 * (m // 4 + 1):
            plen = 6
        else:
            plen = rng.choice([rng.randint(8, 15)] + [rng.randint(16, 28)] * 9)
        base = rng.getrandbits(32)
        lo = base & ~((1 << (32 - plen)) - 1) if plen < 32 else base
        hi = lo + (1 << (32 - plen)) - 1
        rows.append((f"b{i:06d}", plen, lo, hi))
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_lpm.json")
    args = ap.parse_args()

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell"
    )
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.operators.joins import lpm_join
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-lpm")
    spark.sparkContext.setLogLevel("ERROR")

    def keys_df(n: int):
        return (
            spark.range(n)
            .select((F.rand(42) * F.lit(2**32)).cast("long").alias("ip_int"))
            .distinct()
        )

    def naive_lpm(keys, blocks):
        # the operator's own naive mode: BETWEEN with no equi key →
        # Catalyst plans a BroadcastNestedLoopJoin
        return lpm_join(keys, blocks, how="inner", mode="naive").select(
            "ip_int", "region"
        )

    def run(df):
        t0 = time.time()
        n = df.count()
        return round(time.time() - t0, 2), n

    out: dict = {"metric": "lpm_bench", "results": {}}

    # parity + small-size crossover: both plans, same answer
    bsmall = spark.createDataFrame(
        gen_blocks(1000), "region string, prefix_len int, ip_lo long, ip_hi long"
    ).cache()
    ksmall = keys_df(100_000).cache()
    ksmall.count(), bsmall.count()
    keyed = lpm_join(ksmall, bsmall, how="inner").select("ip_int", "region")
    naive = naive_lpm(ksmall, bsmall)
    a = dict(keyed.collect())
    b = dict(naive.collect())
    assert a == b, "keyed vs naive LPM diverged"
    keyed_s, n_matched = run(keyed)
    naive_s, _ = run(naive)
    nplan = naive.sample(False, 1e-6)._jdf.queryExecution().executedPlan().toString()
    out["results"]["100k_keys_x_1k_blocks"] = {
        "keyed_s": keyed_s,
        "naive_bnlj_s": naive_s,
        "speedup": round(naive_s / keyed_s, 1),
        "matched_keys": n_matched,
        "parity": True,
        "naive_plan_is_bnlj": "BroadcastNestedLoopJoin" in nplan,
    }
    print(
        f"100k x 1k: keyed {keyed_s}s vs naive BNLJ {naive_s}s "
        f"({out['results']['100k_keys_x_1k_blocks']['speedup']}x), parity OK"
    )

    # crossover rung: 1e10 naive comparisons vs the keyed path
    bmid = spark.createDataFrame(
        gen_blocks(10_000), "region string, prefix_len int, ip_lo long, ip_hi long"
    )
    kmid = keys_df(1_000_000).cache()
    kmid.count()
    keyed_mid_s, n_mid = run(lpm_join(kmid, bmid, how="inner").select("ip_int", "region"))
    naive_mid_s, _ = run(naive_lpm(kmid, bmid))
    out["results"]["1000k_keys_x_10k_blocks"] = {
        "keyed_s": keyed_mid_s,
        "naive_bnlj_s": naive_mid_s,
        "speedup": round(naive_mid_s / keyed_mid_s, 1),
        "matched_keys": n_mid,
    }
    print(
        f"1M x 10k: keyed {keyed_mid_s}s vs naive BNLJ {naive_mid_s}s "
        f"({out['results']['1000k_keys_x_10k_blocks']['speedup']}x)"
    )
    kmid.unpersist()

    # keyed path at the size the naive plan cannot touch (a real
    # MaxMind/RIR table is ~4M blocks; naive cost there is n*m)
    for n, m in ((4_000_000, 100_000),):
        blocks = spark.createDataFrame(
            gen_blocks(m), "region string, prefix_len int, ip_lo long, ip_hi long"
        )
        keys = keys_df(n).cache()
        keys.count()
        s, matched = run(lpm_join(keys, blocks, how="inner").select("ip_int", "region"))
        out["results"][f"{n//1000}k_keys_x_{m//1000}k_blocks"] = {
            "keyed_s": s,
            "matched_keys": matched,
            "naive_comparisons": n * m,
        }
        print(f"{n} x {m}: keyed {s}s ({matched} matched)")
        keys.unpersist()

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
