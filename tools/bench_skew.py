"""Skew demonstration bench (VERDICT r4 next-round #1; SURVEY.md §7.4
"Skewed session keys").

All committed fixtures (sf0.001-0.1) have uniform synthetic keys, so the
repo's skew escape hatches — session_stats_skew_safe's bounded
per-(key,day) sort and salted_agg's two-phase shuffle — were
equivalence-proven but never SHOWN to win under the condition they exist
for (/root/reference/README.md:61 "messy (ie real) data" = hot keys: a
NAT gateway or bot IP holding a double-digit share of all hits). This
bench generates that shape and measures the crossover:

- **skewed** fixture: N events, ONE hot key holding ~hot_pct% of rows
  (the bot), the rest spread uniformly over n_users keys;
- **uniform** fixture: same N rows, same columns, no hot key — the
  control showing what the escape hatch costs when skew is absent.

For each fixture it times (best of ``iters``):
  1. plain single-window ``session_stats`` — the hot key's ENTIRE
     history sorts inside one window partition = one straggler task;
  2. two-phase ``session_stats_skew_safe`` — sort bounded per
     (key, day-slice), sessions stitched at session granularity;
  3. plain ``groupBy().agg`` of count/sum/max — expected to be
     skew-IMMUNE already (map-side partial aggregation collapses the hot
     key to one row per map task before the shuffle; reported to prove
     that, not to manufacture a fake win);
  4. ``salted_agg`` of the same — expected ≈ plain on both fixtures
     (its value is retry-stable shard determinism + the window/join
     cases, not algebraic-agg speed).

Checksums (session count, sum of hits/duration/distinct-urls) are
asserted IDENTICAL between plain and skew-safe paths on both fixtures —
the bench re-proves equivalence on data it generated itself.

``--rows`` takes a comma-separated ladder of sizes: the two-phase path
pays a FIXED extra session-level shuffle but bounds the straggler sort,
so it loses below some per-key volume and wins above it — the ladder
locates that crossover empirically instead of asserting it.

Usage:
    python tools/bench_skew.py [--rows 2000000,8000000,16000000]
        [--hot-pct 30] [--iters 2] [--driver-memory SIZE]
        [--out BENCH_skew.json]

Driver memory: local-mode hosts all executors in one JVM, and the
single-window straggler sort is the memory hog — the DEFAULT ladder's
16M-row top rung with a 30% hot key needs ~2 GiB of sort buffer in one
task plus headroom, so the flag defaults to 2g per 2M rows of the
largest requested size (16M ⇒ 16g), overridable with --driver-memory.
The setting only takes effect when this process creates the JVM.

Writes the JSON artifact and prints one summary line per measurement.
Fixture parquet is cached under .benchdata/ (gitignored), keyed by
generation params.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE_TS = 1_700_000_000  # fixed epoch base: generation is fully deterministic
SPAN_S = 30 * 86_400  # events spread over 30 days
N_USERS = 2_000
EVENT_TYPES = ["view", "click", "purchase", "error", "search"]


def _gen(spark, path: str, rows: int, hot_pct: int, n_users: int = N_USERS) -> None:
    """Deterministic event fixture: hot_pct% of rows on user_id=-1."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    uid = F.when(
        F.pmod(F.xxhash64("id"), F.lit(100)) < F.lit(hot_pct), F.lit(-1)
    ).otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n_users)))
    df = spark.range(rows).select(
        F.col("id").alias("event_id"),
        uid.cast("long").alias("user_id"),
        F.timestamp_seconds(
            F.lit(BASE_TS) + F.pmod(F.xxhash64("id", F.lit(13)), F.lit(SPAN_S))
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]),
            (F.pmod(F.xxhash64("id", F.lit(17)), F.lit(len(EVENT_TYPES))) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(23)), F.lit(1_000_000)) / 100.0).alias("value"),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)


def _checksum(df):
    """Order-insensitive equivalence digest of a session-stats frame."""
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_hits").alias("hits"),
        F.sum("duration_s").alias("dur"),
        F.sum("n_unique_urls").alias("uniq"),
    ).collect()[0]
    return (r["n"], int(r["hits"]), int(r["dur"]), int(r["uniq"]))


def _time(build, iters: int) -> float:
    best = float("inf")
    for _ in range(iters):
        t0 = time.time()
        build()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", default="2000000,8000000,16000000")
    ap.add_argument("--hot-pct", type=int, default=30)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument(
        "--driver-memory",
        default=None,
        help="JVM heap for the local-mode driver (default: 2g per 2M "
        "rows of the largest --rows entry, min 4g)",
    )
    ap.add_argument("--out", default="BENCH_skew.json")
    args = ap.parse_args()
    sizes = [int(s) for s in str(args.rows).split(",") if s]

    from dataengineerchallenge_spark.operators.sessionize import (
        session_stats,
        session_stats_skew_safe,
    )
    from dataengineerchallenge_spark.operators.skew import salted_agg
    from dataengineerchallenge_spark.session import get_spark

    # local-mode driver hosts all executors: the default 1g heap OOMs on
    # multi-million-row window sorts. Must be set before the JVM starts,
    # so it only takes effect when this process creates the session.
    mem = args.driver_memory or f"{max(4, -(-sizes[-1] // 1_000_000))}g"
    os.environ.setdefault("PYSPARK_SUBMIT_ARGS", f"--driver-memory {mem} pyspark-shell")
    spark = get_spark("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata")
    out: dict = {
        "metric": "skew_bench",
        "sizes": sizes,
        "hot_pct": args.hot_pct,
        "iters": args.iters,
        "results": {},
    }
    for rows in sizes:
        run_size(spark, root, rows, args, out, salted_agg, session_stats, session_stats_skew_safe)

    biggest = sizes[-1]
    sk = out["results"][f"skewed_{biggest}"]
    un = out["results"][f"uniform_{biggest}"]
    out["sessionize_skewed_speedup_at_max"] = round(
        sk["sessionize_plain_s"] / sk["sessionize_skew_safe_s"], 2
    )
    out["sessionize_uniform_overhead_at_max"] = round(
        un["sessionize_skew_safe_s"] / un["sessionize_plain_s"], 2
    )
    out["join"] = bench_join(spark, root, biggest, args.hot_pct, args.iters)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


def bench_join(spark, root, rows, hot_pct, iters):
    """Skewed JOIN leg: a hot-key fact shuffle-joined against a dim too
    large to broadcast (broadcast disabled to force the scenario
    salted_join exists for). Measures the three levers in
    operators/skew.py's documented preference order:

      1. AQE OFF, plain SMJ        — the straggler baseline (one reducer
                                     receives the hot key's rows);
      2. AQE ON (skew-join split)  — the first lever: runtime partition
                                     splitting, zero code change;
      3. salted_join (AQE ON)      — the deterministic fallback: content-
                                     hash shards x replicated dim.

    All three checksummed identical. Honest expectation encoded in the
    operator's docstring: AQE usually suffices; salting is for when one
    key exceeds what splitting a partition can fix or when AQE is
    unavailable."""
    from dataengineerchallenge_spark.operators.skew import salted_join

    n_users = 2_000_000  # dim too big for the 10 MB broadcast threshold
    fact_path = os.path.join(root, f"ev_r{rows}_h{hot_pct}_u{n_users}")
    _gen(spark, fact_path, rows, hot_pct, n_users=n_users)
    fact = spark.read.parquet(fact_path)
    dim = spark.range(-1, n_users).select(
        F.col("id").alias("user_id"),
        (F.pmod(F.xxhash64("id", F.lit(31)), F.lit(1000)) / 10.0).alias("user_weight"),
    )

    def digest(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value") * F.col("user_weight")).alias("wv"),
        ).collect()[0]
        return (r["n"], float(r["wv"]))

    def same(c1, c2):
        # row count exact; the double sum only to relative 1e-9 — salting
        # changes accumulation order, which drifts the ~4.5e12 sum by ULPs
        return c1[0] == c2[0] and abs(c1[1] - c2[1]) <= 1e-9 * max(abs(c1[1]), 1.0)

    plain = lambda: digest(fact.join(dim, "user_id"))  # noqa: E731
    salted = lambda: digest(  # noqa: E731
        salted_join(fact, dim, key="user_id", salt_on="event_id", n_salts=16)
    )
    res: dict = {"rows": rows, "dim_rows": n_users}
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c_ref = None
        for label, fn, aqe in (
            ("join_plain_aqe_off_s", plain, "false"),
            ("join_plain_aqe_on_s", plain, "true"),
            ("join_salted_s", salted, "true"),
        ):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            c = fn()
            if c_ref is None:
                c_ref = c
                res["join_checksum"] = list(c)
            assert same(c, c_ref), f"join equivalence broke at {label}: {c} != {c_ref}"
            res[label] = _time(fn, iters)
            print(f"join {label}: {res[label]}s")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
    return res


def run_size(spark, root, rows, args, out, salted_agg, session_stats, session_stats_skew_safe):
    fixtures = {
        "skewed": os.path.join(root, f"ev_r{rows}_h{args.hot_pct}"),
        "uniform": os.path.join(root, f"ev_r{rows}_h0"),
    }
    _gen(spark, fixtures["skewed"], rows, args.hot_pct)
    _gen(spark, fixtures["uniform"], rows, 0)
    for name, path in fixtures.items():
        ev = spark.read.parquet(path)
        hot_share = (
            ev.filter(F.col("user_id") == -1).count() / rows if name == "skewed" else 0.0
        )
        res: dict = {"hot_key_share": round(hot_share, 4)}

        plain = lambda: _checksum(session_stats(ev))  # noqa: E731
        safe = lambda: _checksum(session_stats_skew_safe(ev))  # noqa: E731
        # correctness first: the two paths must agree on THIS data too
        c1, c2 = plain(), safe()
        assert c1 == c2, f"sessionizer equivalence broke on {name}: {c1} != {c2}"
        res["sessionize_checksum"] = list(c1)
        res["sessionize_plain_s"] = _time(plain, args.iters)
        res["sessionize_skew_safe_s"] = _time(safe, args.iters)

        aggs = {
            "n_events": ("value", "count"),
            "total_value": ("value", "sum"),
            "max_value": ("value", "max"),
        }

        def agg_digest(df):
            r = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("total_value"), 2).alias("tv"),
                F.round(F.sum("max_value"), 2).alias("mv"),
            ).collect()[0]
            return (r["n"], float(r["tv"]), float(r["mv"]))

        plain_agg = lambda: agg_digest(  # noqa: E731
            ev.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("total_value"),
                F.max("value").alias("max_value"),
            )
        )
        salted = lambda: agg_digest(  # noqa: E731
            salted_agg(ev, ["user_id"], aggs, salt_on=["event_id"])
        )
        a1, a2 = plain_agg(), salted()
        assert a1 == a2, f"salted_agg equivalence broke on {name}: {a1} != {a2}"
        res["agg_checksum"] = list(a1)
        res["agg_plain_s"] = _time(plain_agg, args.iters)
        res["agg_salted_s"] = _time(salted, args.iters)

        out["results"][f"{name}_{rows}"] = res
        print(
            f"{name} rows={rows}: sessionize plain {res['sessionize_plain_s']}s vs "
            f"skew_safe {res['sessionize_skew_safe_s']}s | agg plain "
            f"{res['agg_plain_s']}s vs salted {res['agg_salted_s']}s"
        )


if __name__ == "__main__":
    main()
