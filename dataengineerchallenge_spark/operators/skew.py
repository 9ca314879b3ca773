"""Skew-handling operators (SURVEY.md §4 — AQE skew-join + salting;
/root/reference/README.md:61's "messy (ie real) data" at 100 TB means
hot keys: one bot IP can hold 1% of all hits).

Three levers, in preference order:

1. **AQE** (on by default in session.py): skewed-JOIN partitions are
   split at runtime. Covers joins, NOT single-key aggregate/window hot
   spots.
2. **Salted two-phase aggregation** (here): for algebraic aggregates
   (count/sum/min/max), shard each key across ``n_salts`` sub-keys,
   partially aggregate, then re-aggregate without the salt. The hot key's
   work spreads over ``n_salts`` tasks; correctness is unchanged because
   the aggregates are associative. This is the documented fallback for
   the sessionizer's per-key aggregates when one IP dominates
   (operators/sessionize.py) — the ORDER-dependent window pass itself
   cannot be salted; its escape hatches are (a) the batch two-phase
   day-sliced sessionizer (operators/sessionize.py:
   session_stats_skew_safe — sort bounded per (key, slice), oracle-proven
   equivalent) and (b) the streaming session_window (state-merge, no
   per-key sort) in streaming/sessionize.py.
3. **Broadcast** the small side so the skewed key never shuffles at all
   (queries/relational.py region_revenue).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# partial-aggregate expression, then the matching final re-aggregate.
# 'count' is COUNT(*) row-count semantics (count(lit(1)) — NULLs in the
# column still count), matching the oracle's COUNT(*); use 'count_col'
# semantics via sum(when(col.isNotNull,1)) in the caller if needed.
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), lambda p: F.sum(p)),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str | Column, str]],
    salt_on: list[str | Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: ``aggs`` maps output alias →
    (column, fn) with fn ∈ count|sum|min|max.

    Phase 1 groups by (keys…, salt) where salt spreads rows of one key
    over ``n_salts`` reducers; phase 2 folds the partials back per key.
    Both phases get map-side partial aggregation from Spark, so the extra
    exchange carries ≤ n_salts rows per key — negligible — while the
    phase-1 shuffle is skew-free by construction.

    The salt is a CONTENT hash — xxhash64 of (keys…, salt_on…) — so a
    row's shard assignment is a pure function of its data and identical
    across stage retries and repartitionings (the same discipline as
    ``salted_join``; monotonically_increasing_id would make retry
    behavior nondeterministic). ``salt_on`` is REQUIRED and must name
    column(s) with high per-key cardinality — a row id, a fine
    timestamp (ADVICE r5: an earlier default of the aggregated value
    columns silently degenerated to ONE shard whenever a hot key's
    values were flat, e.g. counting a constant flag, reinstating the
    exact skew this operator removes). Results are provably unchanged
    by the choice (algebraic aggregates); only the shard layout is at
    stake.

    avg is deliberately absent: express it as sum/count in the caller
    (algebraic decomposition), never salt a non-decomposable aggregate.
    """
    if not salt_on:
        raise ValueError(
            "salt_on must name at least one high-cardinality column; "
            "salting on nothing (or flat columns) collapses the hot key "
            "back into a single shard"
        )
    salt_cols = [F.col(c) if isinstance(c, str) else c for c in salt_on]
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], *salt_cols), F.lit(n_salts))
    partial_exprs = []
    final_exprs = []
    for alias, (col, fn) in aggs.items():
        try:
            partial_fn, final_fn = _ALGEBRAIC[fn]
        except KeyError:
            raise ValueError(f"non-algebraic aggregate {fn!r}; decompose it first") from None
        partial_exprs.append(partial_fn(col).alias(f"_p_{alias}"))
        final_exprs.append(final_fn(F.col(f"_p_{alias}")).alias(alias))
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_on: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Salted equi-join for big ⋈ medium where one join key is hot and
    the small side is too large to broadcast: shard the big side's rows
    across ``n_salts`` sub-keys (deterministic content hash of
    ``salt_on``, so the shard assignment is reproducible across runs and
    repartitionings), replicate the small side once per salt, and join on
    (key, salt). The hot key's probe rows spread over ``n_salts``
    reducers instead of one.

    Trade-off, stated: the small side shuffles n_salts× its size — worth
    it only when the skew stall exceeds that replication cost (AQE's
    runtime skew split, on in session.py, is the first lever; this is the
    deterministic fallback when a single key exceeds what splitting one
    partition can fix). Inner join only: replicated rows of ``small``
    that match nothing vanish in the join, so multiplicity is unchanged.
    """
    salt_col = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salts)))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
