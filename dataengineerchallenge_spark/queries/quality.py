"""Data-quality audit battery — the validation pass a training-data
pipeline runs before any corpus ships (SURVEY.md §2.11 north star;
complements the curation pipeline in queries/pipeline.py).

Three audit surfaces, each a single declarative pass so the 100 TB cost
model is obvious:

* column profile   — one scan of the fact table, conditional aggregates
                     (null counts) + exact distinct counts; Spark plans
                     multi-distinct via one Expand (row ×k) + partial
                     aggregation, still a single shuffle.
* domain checks    — rule violations as SUM(CASE WHEN ...) over one scan
                     per table; no shuffle beyond the final 1-row agg.
* referential
  integrity        — orphan counts per FK edge via left-outer join +
                     conditional count; dims broadcast, so the fact scan
                     is the only big-data movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table, local_frame


@register(
    "dq_events_column_profile",
    oracle="""
    SELECT col, n_nulls, n_distinct, n_rows FROM (
      SELECT 'event_id' AS col,
             CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
             CAST(COUNT(*) AS BIGINT) AS n_rows FROM events
      UNION ALL
      SELECT 'ts', CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT ts) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM events
      UNION ALL
      SELECT 'user_id', CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT user_id) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM events
      UNION ALL
      SELECT 'event_type', CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT event_type) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM events
      UNION ALL
      SELECT 'value', CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT value) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM events
      UNION ALL
      SELECT 'props', CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT props) AS BIGINT), CAST(COUNT(*) AS BIGINT) FROM events
    )
    """,
)
def dq_events_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness/cardinality profile of ``events``: per column, its
    null count, exact distinct count, and the table rowcount — ONE scan.
    The six exact count-distincts compile to a single Expand (each input
    row fans to 6 tagged rows) feeding one partially-aggregated shuffle,
    not six scans; at 100 TB swap exact for approx_count_distinct and the
    Expand disappears (see approx_unique_urls_per_user)."""
    ev = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    one = ev.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_expr}) AS (col, n_nulls, n_distinct)", "n_rows"
    )


@register(
    "dq_domain_checks",
    oracle="""
    SELECT rule, n_violations, n_checked FROM (
      SELECT 'events.value >= 0' AS rule,
             CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
             CAST(COUNT(*) AS BIGINT) AS n_checked FROM events
      UNION ALL
      SELECT 'events.event_type in domain',
             CAST(SUM(CASE WHEN event_type NOT IN
                  ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM events
      UNION ALL
      SELECT 'lineitem.l_discount in [0,1]',
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_quantity > 0',
             CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM lineitem
      UNION ALL
      SELECT 'orders.o_totalprice > 0',
             CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'documents.n_chars = len(text)',
             CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM documents
    )
    """,
)
def dq_domain_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based expectation suite: ALL of a table's rules are
    conditional SUMs inside ONE aggregate over one scan (violations never
    materialize as rows — the audit of a 100 TB table is a single
    map-side aggregate per table), then ``stack`` unpivots the 1-row
    result into (rule, n_violations, n_checked) report rows. The
    documents rule is a cross-column consistency check (stored n_chars vs
    recomputed)."""

    def table_rules(df: DataFrame, rules: list[tuple[str, object]]) -> DataFrame:
        aggs = [
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias(f"_v{i}")
            for i, (_, bad) in enumerate(rules)
        ]
        one = df.agg(*aggs, F.count(F.lit(1)).alias("n_checked"))
        pairs = ", ".join(f"'{name}', _v{i}" for i, (name, _) in enumerate(rules))
        return one.selectExpr(
            f"stack({len(rules)}, {pairs}) AS (rule, n_violations)", "n_checked"
        ).select("rule", "n_violations", "n_checked")

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    checks = [
        table_rules(ev, [
            ("events.value >= 0", F.col("value") < 0),
            (
                "events.event_type in domain",
                ~F.col("event_type").isin("view", "click", "purchase", "signup", "error"),
            ),
        ]),
        table_rules(li, [
            ("lineitem.l_discount in [0,1]", (F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            ("lineitem.l_quantity > 0", F.col("l_quantity") <= 0),
        ]),
        table_rules(orders, [("orders.o_totalprice > 0", F.col("o_totalprice") <= 0)]),
        table_rules(docs, [("documents.n_chars = len(text)", F.col("n_chars") != F.length("text"))]),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT edge, n_rows, n_orphans FROM (
      SELECT 'lineitem.l_orderkey -> orders' AS edge,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey -> part', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey -> supplier', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'orders.o_custkey -> customer', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'customer.c_nationkey -> nation', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit over the star schema: for each edge, the fact row
    count and how many rows dangle (no matching dim key). Left-outer join
    + conditional count in ONE pass per edge; every dim here broadcasts,
    so each audit costs exactly one fact scan and zero shuffles. Orders
    and customer swap fact/dim roles across edges — the pattern, not the
    table, decides the join strategy."""

    def edge(fact: DataFrame, dim: DataFrame, name: str, fk: str, pk: str) -> DataFrame:
        probe = F.broadcast(dim.select(F.col(pk).alias("_pk")).distinct())
        return (
            fact.join(probe, F.col(fk) == F.col("_pk"), "left")
            .agg(
                F.lit(name).alias("edge"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).cast("long").alias("n_orphans"),
            )
            .select("edge", "n_rows", "n_orphans")
        )

    t = {n: load_table(spark, sf_dir, n) for n in
         ("lineitem", "orders", "part", "supplier", "customer", "nation")}
    edges = [
        edge(t["lineitem"], t["orders"], "lineitem.l_orderkey -> orders", "l_orderkey", "o_orderkey"),
        edge(t["lineitem"], t["part"], "lineitem.l_partkey -> part", "l_partkey", "p_partkey"),
        edge(t["lineitem"], t["supplier"], "lineitem.l_suppkey -> supplier", "l_suppkey", "s_suppkey"),
        edge(t["orders"], t["customer"], "orders.o_custkey -> customer", "o_custkey", "c_custkey"),
        edge(t["customer"], t["nation"], "customer.c_nationkey -> nation", "c_nationkey", "n_nationkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionAll(e)
    return out


# Benford first-digit shares log10(1 + 1/d), pre-rounded to the 1e-4
# grid and injected as LITERALS into both engines — the comparison
# table is part of the operator definition, not something each engine
# re-derives with its own libm (zero cross-engine float risk).
_BENFORD = {
    1: 0.3010, 2: 0.1761, 3: 0.1249, 4: 0.0969, 5: 0.0792,
    6: 0.0669, 7: 0.0580, 8: 0.0512, 9: 0.0458,
}


def _benford_oracle() -> str:
    lit = " UNION ALL ".join(
        f"SELECT {d} AS digit, {s} AS benford_share" for d, s in _BENFORD.items()
    )
    return f"""
    WITH v AS (
      SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    n AS (SELECT digit, count(*) AS n_orders FROM v GROUP BY digit),
    t AS (SELECT count(*) AS total FROM v),
    b AS ({lit})
    SELECT b.digit,
           CAST(COALESCE(n.n_orders, 0) AS BIGINT) AS n_orders,
           ROUND(COALESCE(n.n_orders, 0) * 1.0 / t.total, 4) AS observed_share,
           b.benford_share,
           ROUND(ABS(ROUND(COALESCE(n.n_orders, 0) * 1.0 / t.total, 4)
                     - b.benford_share), 4) AS abs_dev
    FROM b LEFT JOIN n ON n.digit = b.digit CROSS JOIN t
    """


@register("dq_benford_order_totals", oracle=_benford_oracle())
def dq_benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DQ+ Benford first-significant-digit screen (Newcomb 1881 /
    Benford 1938; Nigrini's standard fraud/entry-error audit) over
    order totals: values spanning several magnitudes should put ~30.1%
    of first digits at 1 and only ~4.6% at 9 — fabricated or
    unit-mangled figures (a feed switching cents for dollars, a default
    value flooding one bucket) bend the curve immediately, which is why
    it sits in every financial DQ battery next to the null/domain/RI
    checks this family already runs. Emits per-digit observed vs
    expected shares and the absolute deviation; the expected shares are
    pre-rounded LITERALS shared by both engines (the one defensible
    place for a constant table — re-deriving log10 per engine would
    import exactly the cross-libm drift the repo's hash discipline
    exists to exclude). First digits come from the string rendering's
    leading character (values are >= 1 by the guard, so the first char
    IS the first significant digit on both engines — no log10 floor at
    power-of-ten boundaries). On the synthetic fixture the totals are
    drawn roughly uniformly on [1k, 500k], so digits 1-4 OVERSHOOT
    Benford and 6-9 undershoot — the honest negative control: the
    screen flags the fixture as non-Benford, exactly what a uniform
    generator should produce (pinned in pytest; a log-uniform corpus
    pins the positive control).

    Scale shape: one map-side digit projection + a 9-row aggregate —
    partial-agg friendly, no shuffle beyond the 9-key fold; the
    expected table is a broadcast literal frame."""
    orders = load_table(spark, sf_dir, "orders")
    v = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    n = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    t = v.agg(F.count(F.lit(1)).alias("total"))
    b = local_frame(
        spark, [(d, s) for d, s in _BENFORD.items()], "digit long, benford_share double"
    )
    obs = F.round(F.coalesce("n_orders", F.lit(0)) * 1.0 / F.col("total"), 4)
    return (
        b.join(n, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            obs.alias("observed_share"),
            "benford_share",
            F.round(F.abs(obs - F.col("benford_share")), 4).alias("abs_dev"),
        )
    )


@register(
    "event_key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS c
      FROM events GROUP BY event_type, user_id
    ),
    t AS (
      SELECT event_type, SUM(c) AS n, COUNT(*) AS n_keys,
             SUM(c * c) AS sum_sq, MAX(c) AS top_c
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(ROUND(sum_sq * 1000000.0 / (n * 1.0 * n), 0) AS BIGINT)
             AS hhi_micropoints,
           CAST(ROUND(top_c * 1000000.0 / n, 0) AS BIGINT)
             AS top_key_share_micropoints
    FROM t
    """,
)
def event_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-SKEW profiler — the pre-join audit that decides whether a
    shuffle needs salting BEFORE it stalls a stage (the decision the
    skew-safe sessionizer's BENCH_skew crossover prices): per
    event_type, the Herfindahl-Hirschman concentration of the user_id
    distribution (HHI = Σ share² — 1/n_keys when uniform, → 1 as one
    key dominates) and the top key's share. Σc² is an exact bigint
    (the AMS F2 sketch's moment, computed exactly here), widened to
    double only inside the final ROUND — so the profile is hash-exact
    and cheap enough to run on every ingest.

    Scale: one (type, key) partial-agg — the same two-level shape as
    every sketch register build; no sort, no collect."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = c.groupBy("event_type").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        F.max("c").alias("top_c"),
    )
    return t.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.round(F.col("sum_sq") * 1000000.0 / (F.col("n") * 1.0 * F.col("n")), 0)
        .cast("bigint")
        .alias("hhi_micropoints"),
        F.round(F.col("top_c") * 1000000.0 / F.col("n"), 0)
        .cast("bigint")
        .alias("top_key_share_micropoints"),
    )


@register(
    "stream_event_key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, COUNT(*) AS c
      FROM events GROUP BY event_type, user_id
    ),
    t AS (
      SELECT event_type, SUM(c) AS n, COUNT(*) AS n_keys,
             SUM(c * c) AS sum_sq, MAX(c) AS top_c
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(ROUND(sum_sq * 1000000.0 / (n * 1.0 * n), 0) AS BIGINT)
             AS hhi_micropoints,
           CAST(ROUND(top_c * 1000000.0 / n, 0) AS BIGINT)
             AS top_key_share_micropoints
    FROM t
    """,
)
def stream_event_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``event_key_skew_profile`` — skew monitoring as a
    continuously maintained register store, so the salt-or-not decision
    tracks the live key distribution instead of yesterday's profile:
    each micro-batch folds its OWN (event_type, user_id, count)
    partials via foreachBatch (epoch-keyed overwrite, idempotent under
    retry); counts are LINEAR, so the drained store sums to exactly the
    batch registers under any stream slicing, and the HHI/top-share
    closing arithmetic (Σc² recomputed from folded counts at drain —
    Σc² itself is NOT linear, which is why the register is the count
    table, not the moment) shares the batch oracle hash-for-hash."""
    import shutil
    import tempfile

    from dataengineerchallenge_spark.queries.sketches import (
        _staged_event_type_user_stream,
    )

    payload = _staged_event_type_user_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_skew_")
    regs_dir, ckpt = f"{scratch}/regs", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        reg = mb.groupBy("event_type", "user_id").agg(
            F.count(F.lit(1)).alias("c")
        )
        reg.write.mode("overwrite").parquet(f"{regs_dir}/epoch_id={epoch_id}")

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "stream skew")
        c = (
            spark.read.parquet(regs_dir)
            .groupBy("event_type", "user_id")
            .agg(F.sum("c").alias("c"))
        )
        t = c.groupBy("event_type").agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
            F.max("c").alias("top_c"),
        )
        out = t.select(
            "event_type",
            F.col("n").cast("long").alias("n_events"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.round(
                F.col("sum_sq") * 1000000.0 / (F.col("n") * 1.0 * F.col("n")), 0
            )
            .cast("bigint")
            .alias("hhi_micropoints"),
            F.round(F.col("top_c") * 1000000.0 / F.col("n"), 0)
            .cast("bigint")
            .alias("top_key_share_micropoints"),
        )
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result
