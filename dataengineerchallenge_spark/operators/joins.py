"""Join operators Spark lacks as single primitives (SURVEY.md §2.3 J6-J7).

Both are compositions of existing DataFrame ops (the preferred custom-op
path): no Python UDFs, no RDDs — every piece stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts_s",
    right_ts: str = "ts_s",
    payload: Sequence[str] = (),
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: attach the latest right row with
    ``right.ts <= left.ts`` per key — the feature-building primitive for
    the reference's MLE goals (/root/reference/README.md:21-23).

    Union-tag + last(ignorenulls) over one window: a SINGLE shuffle on the
    key, no range blow-up, no per-key driver loop — this scales linearly
    where a naive range join is O(left × right) per key. Right rows sort
    before left rows at equal timestamps (``_side`` 0 < 1), giving <=
    semantics. Payload columns come back suffixed ``_asof``.
    """
    on = list(on)
    payload = list(payload)
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    for p in payload:
        lhs = lhs.withColumn(f"{p}_asof", F.lit(None).cast(right.schema[p].dataType))
    # tie_break columns must ride along on the right side too, else right
    # rows sort with NULL tie keys and equal-timestamp ties resolve
    # nondeterministically (diverging from an oracle ordering on real ids).
    rhs = right.select(
        *on,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.col(t) for t in tie_break if t not in on],
        *[F.col(p).alias(f"{p}_asof") for p in payload],
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side", *tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{p}_asof", ignorenulls=True).over(w).alias(f"{p}_asof_f")
            for p in payload
        ],
    )
    out = filled.filter(F.col("_side") == 1)
    for p in payload:
        out = out.drop(f"{p}_asof").withColumnRenamed(f"{p}_asof_f", f"{p}_asof")
    # drop tie columns that exist only on the right side — after the
    # union+filter they are all-NULL passengers, not part of the contract
    for t in tie_break:
        if t not in left.columns:
            out = out.drop(t)
    return out.drop("_side", "_ats")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    conditions: Column,
    how: str = "inner",
) -> DataFrame:
    """Interval/θ join with an equi prefix (J6): Catalyst hash/SMJ-joins on
    the equi keys and applies the range predicate as a residual filter —
    never a cartesian product. Keys must keep per-key cardinality bounded
    at scale (e.g. user_id, date bucket)."""
    return left.alias("l").join(
        right.alias("r"),
        on=[*[F.col(f"l.{c}") == F.col(f"r.{c}") for c in on], conditions],
        how=how,
    )


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_s: int,
    max_span_bins: int = 4096,
    with_quarantine: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """J6+ interval-containment join with NO equi key — the case
    ``range_join`` can't take: without an equi prefix Catalyst plans a
    BroadcastNestedLoopJoin, O(points × intervals), which is a
    wall at 100 TB.

    Technique (the standard bin/bucket decomposition): quantize time into
    fixed ``bin_s``-second bins; each point lands in exactly one bin, each
    interval is exploded into every bin it overlaps; join on the bin as a
    manufactured equi key (hash/SMJ, shuffles only matching bins) and
    re-check the exact containment predicate as a residual. Each
    (point, interval) pair can meet in at most the point's single bin, so
    the join produces no duplicates and needs no post-dedup. Cost is
    linear in points + interval-bin expansions; choose ``bin_s`` near the
    typical interval width so expansion stays O(1) per interval.

    Corrupt-interval guard (same quarantine stance as the ELB parser's
    malformed-row handling, sources/elb.py P5): on messy data one bad row
    — an epoch-0 start, a year-2100 end from a sloppy parse, a reversed
    interval — would explode into millions of bin rows (and
    ``F.sequence`` hard-fails past ~2^31 elements, descends silently when
    start > end). Intervals with NULL bounds or ``start > end`` are
    structurally corrupt and are excluded from the join instead of
    killing the job; pass ``with_quarantine=True`` to also get the
    rejected intervals back as a second DataFrame with a
    ``reject_reason`` column (``null_bound`` / ``reversed`` /
    ``over_max_span``) for audit, mirroring ``elb_malformed_audit``.

    A span wider than ``max_span_bins`` bins is DIFFERENT: it can be a
    legitimately wide interval (a month-long promo window against a
    small ``bin_s``), and silently dropping it would change join results
    with no signal (ADVICE r5). So without a quarantine channel the
    operator FAILS LOUD: any over-span interval raises at execution time
    with instructions to coarsen ``bin_s`` / raise ``max_span_bins`` (a
    wide valid interval should usually get a wider bin, keeping its
    expansion O(1)) or to opt into ``with_quarantine=True`` for triage.

    Both ts columns are epoch seconds (the engine's hash-safe time
    representation, SURVEY.md §7.4)."""
    if bin_s <= 0:
        raise ValueError(f"bin_s must be positive, got {bin_s}")
    if max_span_bins <= 0:
        raise ValueError(f"max_span_bins must be positive, got {max_span_bins}")
    start_bin = F.floor(F.col(start_ts) / bin_s)
    end_bin = F.floor(F.col(end_ts) / bin_s)
    over_span = (
        F.lit("over_max_span")
        if with_quarantine
        else F.raise_error(
            F.concat(
                F.lit(
                    "binned_interval_join: interval spans more than "
                    f"max_span_bins={max_span_bins} bins of bin_s={bin_s}s "
                    "(start="
                ),
                F.col(start_ts).cast("string"),
                F.lit(", end="),
                F.col(end_ts).cast("string"),
                F.lit(
                    "); a valid-but-wide interval must not be dropped "
                    "silently — coarsen bin_s, raise max_span_bins, or "
                    "pass with_quarantine=True to triage"
                ),
            )
        )
    )
    reject = (
        F.when(F.col(start_ts).isNull() | F.col(end_ts).isNull(), F.lit("null_bound"))
        .when(F.col(start_ts) > F.col(end_ts), F.lit("reversed"))
        .when(end_bin - start_bin + 1 > max_span_bins, over_span)
    )
    tagged = intervals.withColumn("_reject", reject)
    # The explode sits strictly downstream of the reject filter, so
    # F.sequence never evaluates on a quarantined row.
    iv = (
        tagged.filter(F.col("_reject").isNull())
        .drop("_reject")
        .withColumn("_bin", F.explode(F.sequence(start_bin, end_bin)))
    )
    p = points.withColumn("_bin", F.floor(F.col(point_ts) / bin_s))
    joined = (
        p.join(iv, "_bin")
        .filter((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts)))
        .drop("_bin")
    )
    if with_quarantine:
        quarantined = tagged.filter(F.col("_reject").isNotNull()).withColumnRenamed(
            "_reject", "reject_reason"
        )
        return joined, quarantined
    return joined


def lpm_join(
    keys: DataFrame,
    blocks: DataFrame,
    key_int: str = "ip_int",
    lo: str = "ip_lo",
    hi: str = "ip_hi",
    prefix_len: str = "prefix_len",
    payload: Sequence[str] = ("region",),
    how: str = "left",
    mode: str = "keyed",
    naive_budget_rows: int = 4096,
) -> DataFrame:
    """Longest-prefix-match lookup join (J10): attach the MOST SPECIFIC
    covering block's payload to each key — the GeoIP / RIR-delegation /
    routing-table lookup every log pipeline runs on client IPs
    (/root/reference/README.md:42's "what additional data" enrichment).

    Blocks are (lo, hi, prefix_len, payload...) integer ranges (CIDR
    ``a.b.c.d/p`` → [base, base + 2^(32-p) - 1]); overlapping prefixes
    resolve by ``prefix_len`` DESC — the router's rule, so a /24 pop
    block beats its covering /21 anycast block.

    Spark-first at scale, composed from existing ops (no UDFs):

    1. **Manufactured equi key**: every block is exploded across the
       leading octets it covers (``sequence(lo>>24, hi>>24)`` — one row
       per covered /8, so even a /0 bounds at 256 rows) and each key
       hashes to exactly one octet. The interval join becomes a hash
       join on the octet with a BETWEEN residual — never a
       nested-loop over the full dim (same bin/bucket decomposition as
       ``binned_interval_join``, with the /8 grid as the bins).
    2. **Broadcast dim**: a real MaxMind/RIR table is ~4M blocks ≈ tens
       of MB exploded — broadcast-sized; the fact side never shuffles.
    3. **LPM window**: per-key ``row_number`` over ``prefix_len`` DESC
       (payload columns, then ``lo``, break exact ties
       deterministically), keep the first.

    Call with the DISTINCT key frame (the per-key window assumes one
    input row per key value), then equi-join the result back to the
    fact stream — the match runs once per key, not once per event.
    ``how='left'`` keeps unmatched keys with NULL payload (coalesce a
    default downstream, e.g. 'unrouted').

    ``mode`` (measured crossover, BENCH_lpm.json — the same
    size-adaptive stance as the dedup candidate join): ``'keyed'`` is
    the scale default above; ``'naive'`` skips the octet key and lets
    Catalyst plan the BETWEEN as a BroadcastNestedLoopJoin — FASTER for
    toy dims (0.42 s vs 0.59 s at 100k keys × 1k blocks: the explode +
    equi-hash overhead outweighs ~1e8 trivial comparisons) but
    O(keys × blocks) after that (2.96 s vs 1.36 s at 1M × 10k, hopeless
    at a 4M-block real table where keyed runs 4.8 s); ``'auto'`` counts
    the dim (dimension-sized by contract, so the driver-side count is
    one tiny job) and picks naive only under ``naive_budget_rows``.
    Both formulations return identical rows (asserted per-run in
    tools/bench_lpm.py and pinned in tests)."""
    payload = list(payload)
    if mode not in ("keyed", "naive", "auto"):
        raise ValueError(f"lpm_join mode must be keyed|naive|auto, got {mode!r}")
    if mode == "auto":
        mode = "naive" if blocks.count() <= naive_budget_rows else "keyed"
    w = Window.partitionBy(key_int).orderBy(
        F.desc(prefix_len), *[F.asc(p) for p in payload], F.asc(lo)
    )
    if mode == "naive":
        pairs = keys.join(
            F.broadcast(blocks),
            F.col(key_int).between(F.col(lo), F.col(hi)),
            "inner",
        )
    else:
        exploded = blocks.withColumn(
            "_octet1",
            F.explode(F.sequence(F.shiftright(F.col(lo), 24), F.shiftright(F.col(hi), 24))),
        )
        keyed = keys.withColumn("_octet1", F.shiftright(F.col(key_int), 24))
        pairs = keyed.join(
            F.broadcast(exploded),
            on=[
                keyed["_octet1"] == exploded["_octet1"],
                F.col(key_int).between(F.col(lo), F.col(hi)),
            ],
            how="inner",
        )
    matched = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(key_int, *payload)
    )
    return keys.join(matched, key_int, how)
