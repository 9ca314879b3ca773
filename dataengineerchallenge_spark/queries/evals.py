"""Classifier-evaluation operators — the metrics pass a training-data
pipeline runs over SCORED examples (quality classifiers, dedup
confidence, reranker outputs) before trusting a filter threshold:
exact ROC-AUC, average precision (PR-AUC), reliability-diagram
calibration bins, and Brier/ECE summaries.

Reference semantics are the textbook/sklearn definitions (public):
ROC-AUC as the tie-corrected Mann-Whitney rank-sum statistic; average
precision as the step-wise sum P(k)·ΔR(k) over DISTINCT-score
thresholds; ECE as the bin-weighted |accuracy − confidence| gap
(Naeini et al., AAAI 2015); Brier as mean squared error of the
probability. No sklearn at runtime — every metric is a declarative
Spark plan with an unrolled SQL oracle.

The evaluated "classifier" is deliberately model-free so both engines
replay it exactly: predicted P(lang = 'en') := stopword ratio
(|{the, a}| hits / token count) — a weak but real signal on the
fixture (articles are English function words), and crucially a pure
per-row rational so there is no trained state to ship. The LABEL is
the documents table's ground-truth ``lang``.

Scale shape (100 TB of scored docs): every metric here is one
token-stat map pass + one aggregate keyed on the DISTINCT SCORE
(cardinality ≪ rows — scores are small rationals), then a window over
the per-score groups. The windows order score GROUPS, not rows: the
sort input is |distinct scores| per partition key, bounded and tiny,
never the corpus. Nothing collects to the driver; the only shuffles
are the two keyed aggregates.

Float discipline (SURVEY.md §7.4): ranks, tie counts, cumulative
TP/FP, and bin tallies are exact integers; each metric performs ONE
double division at the very end inside ROUND (identical operand DAG
both engines). Where a metric sums per-group float terms (average
precision, Brier), each term is integerized to nano-points FIRST so
the sum is order-free bigint arithmetic — the bm25_micropoints_frame
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table, local_frame

_STOPWORDS = ("the", "a")

# Shared oracle CTE: per-doc (source, y, p) — predicted probability p is
# the stopword ratio, label y is ground-truth English.
_SCORED_CTE = """
scored AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         CAST(len(list_filter(string_split(text, ' '),
                              x -> x IN ('the', 'a'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS p
  FROM documents
)
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, y, p): the model-free English scorer over documents —
    one map pass, no shuffle; mirrors _SCORED_CTE token for token."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    return docs.select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        (stop_hits.cast("double") / F.size(toks)).alias("p"),
    )


@register(
    "classifier_auc_by_source",
    oracle=f"""
    WITH {_SCORED_CTE},
    g AS (
      SELECT source, p, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY source, p
    ),
    r AS (
      SELECT source, cnt, pos,
             COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumprev
      FROM g
    ),
    m AS (
      SELECT source,
             SUM(pos) AS np, SUM(cnt) - SUM(pos) AS nn,
             SUM(pos * (2 * cumprev + cnt + 1)) AS rank2
      FROM r GROUP BY source
    )
    SELECT source,
           CAST(np AS BIGINT) AS n_pos,
           CAST(nn AS BIGINT) AS n_neg,
           CAST(ROUND((rank2 - np * (np + 1)) * 1000000.0 / (2 * np * nn), 0)
                AS BIGINT) AS auc_micropoints
    FROM m WHERE np > 0 AND nn > 0
    """,
)
def classifier_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC-AUC per source shard — the Mann-Whitney
    rank-sum form: AUC = (R⁺ − P(P+1)/2) / (P·N) with AVERAGE ranks on
    tied scores. Tie handling is done in integers: grouping by distinct
    score, a tie group starting after ``cumprev`` rows with ``cnt``
    members has doubled average rank 2·cumprev + cnt + 1, so the doubled
    positive rank-sum is an exact bigint and one final division lands in
    ROUND. Degenerate shards (single-class) are dropped rather than
    emitting NULL (same guard both engines).

    At 100 TB: the rank window orders DISTINCT scores within a source
    (thousands of rationals), not documents — the heavy lifting is the
    (source, p) partial-agg, one shuffle."""
    return auc_by_group(_scored_docs(spark, sf_dir), "source")


def auc_by_group(scored: DataFrame, group: str) -> DataFrame:
    """Tie-corrected rank-sum ROC-AUC of (y, p) per ``group`` — the
    reusable metric core (fed hand-built frames in tests)."""
    g = scored.groupBy(group, "p").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    return auc_from_score_groups(g, group)


def auc_from_score_groups(g: DataFrame, group: str) -> DataFrame:
    """AUC from pre-aggregated (group, p, cnt, pos) tallies. Split out
    because the tallies are LINEAR REGISTERS (counts add across any
    data slicing), which is what makes the streaming twin possible: a
    drain folds per-batch tallies by addition and reuses this exact
    ranking arithmetic."""
    w = (
        Window.partitionBy(group)
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn("cumprev", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
    m = r.groupBy(group).agg(
        F.sum("pos").alias("np"),
        (F.sum("cnt") - F.sum("pos")).alias("nn"),
        F.sum(F.col("pos") * (2 * F.col("cumprev") + F.col("cnt") + 1)).alias(
            "rank2"
        ),
    )
    return m.filter((F.col("np") > 0) & (F.col("nn") > 0)).select(
        group,
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        F.round(
            (F.col("rank2") - F.col("np") * (F.col("np") + 1))
            * 1000000.0
            / (2 * F.col("np") * F.col("nn")),
            0,
        )
        .cast("bigint")
        .alias("auc_micropoints"),
    )


@register(
    "classifier_pr_auc",
    oracle=f"""
    WITH {_SCORED_CTE},
    g AS (
      SELECT p, COUNT(*) AS cnt, SUM(y) AS pos FROM scored GROUP BY p
    ),
    c AS (
      SELECT p, pos,
             SUM(pos) OVER (ORDER BY p DESC) AS cum_tp,
             SUM(cnt) OVER (ORDER BY p DESC) AS cum_n
      FROM g
    ),
    t AS (
      SELECT CAST(ROUND(pos * 1000000000.0 * cum_tp / cum_n, 0) AS BIGINT)
               AS term_nano,
             pos
      FROM c
    ),
    m AS (
      SELECT SUM(pos) AS np, COUNT(*) AS nt, SUM(term_nano) AS st FROM t
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(nt AS BIGINT) AS n_thresholds,
           CAST(ROUND(st / (1000.0 * np), 0) AS BIGINT) AS ap_micropoints
    FROM m WHERE np > 0
    """,
)
def classifier_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision (area under the precision-recall curve by the
    step rule): AP = Σ_thresholds ΔR(t)·P(t), thresholds = distinct
    scores descending, precision = cumTP/cumN and recall mass ΔR =
    pos_t/P — the definition that is well-posed under ties (a whole tie
    group enters at once). Each threshold's ΔR·P term is integerized to
    nano-points before the sum (order-free bigint addition; summing raw
    doubles would expose engine summation order), then one division by
    P closes it out.

    PR-AUC is the metric that matters for CURATION filters, where
    positives (keep-worthy docs) are rare and ROC-AUC saturates."""
    return pr_auc(_scored_docs(spark, sf_dir))


def pr_auc(scored: DataFrame) -> DataFrame:
    """Step-rule average precision of (y, p) — the metric core."""
    g = scored.groupBy("p").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
    )
    return pr_auc_from_score_groups(g)


def pr_auc_from_score_groups(g: DataFrame) -> DataFrame:
    """AP from pre-aggregated (p, cnt, pos) tallies — the same linear
    registers the AUC drain folds, so the streaming twin reuses this
    closing arithmetic verbatim."""
    w = Window.orderBy(F.desc("p")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = g.select(
        "pos",
        F.sum("pos").over(w).alias("cum_tp"),
        F.sum("cnt").over(w).alias("cum_n"),
    )
    t = c.select(
        "pos",
        F.round(
            F.col("pos") * 1000000000.0 * F.col("cum_tp") / F.col("cum_n"), 0
        )
        .cast("bigint")
        .alias("term_nano"),
    )
    m = t.agg(
        F.sum("pos").alias("np"),
        F.count(F.lit(1)).alias("nt"),
        F.sum("term_nano").alias("st"),
    )
    # Degenerate-input guard (mirrored in every oracle via WHERE np > 0):
    # with zero positives Spark's st/np is NULL while DuckDB's is inf
    # (whose BIGINT cast errors) — drop the row identically instead.
    return m.filter(F.col("np") > 0).select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nt").cast("long").alias("n_thresholds"),
        F.round(F.col("st") / (1000.0 * F.col("np")), 0)
        .cast("bigint")
        .alias("ap_micropoints"),
    )


# Per-row fixed-point pieces shared by the calibration queries: the
# predicted probability integerized per ROW (round-half-up to micro),
# so bin means are exact integer sums divided once.
_BIN = "LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9)"


@register(
    "score_calibration_bins",
    oracle=f"""
    WITH {_SCORED_CTE},
    rows_fixed AS (
      SELECT {_BIN} AS bin, y,
             CAST(ROUND(p * 1000000.0, 0) AS BIGINT) AS p_micro
      FROM scored
    ),
    b AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos, SUM(p_micro) AS sum_p
      FROM rows_fixed GROUP BY bin
    )
    SELECT CAST(bin AS BIGINT) AS bin,
           CAST(n AS BIGINT) AS n,
           CAST(n_pos AS BIGINT) AS n_pos,
           CAST(ROUND(sum_p * 1.0 / n, 0) AS BIGINT) AS conf_micropoints,
           CAST(ROUND(n_pos * 1000000.0 / n, 0) AS BIGINT) AS acc_micropoints,
           CAST(ABS(ROUND(sum_p * 1.0 / n, 0) - ROUND(n_pos * 1000000.0 / n, 0))
                AS BIGINT) AS gap_micropoints
    FROM b
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: 10 equal-width probability bins, each with
    its mean predicted probability (confidence) and empirical positive
    rate (accuracy) — the per-bin gaps ARE the calibration curve a
    quality-filter threshold gets read off of. Per-row probabilities are
    integerized to micro-points before the bin sum, so the bin mean is
    an exact integer ratio — no float accumulation crosses a row
    boundary in either engine.

    One map pass + one 10-key aggregate; partial aggregation makes the
    hot bins (scores cluster low) map-side cheap at any scale."""
    s = _scored_docs(spark, sf_dir)
    rows_fixed = s.select(
        F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9)).alias("bin"),
        "y",
        F.round(F.col("p") * 1000000.0, 0).cast("bigint").alias("p_micro"),
    )
    b = rows_fixed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("p_micro").alias("sum_p"),
    )
    conf = F.round(F.col("sum_p") * 1.0 / F.col("n"), 0)
    acc = F.round(F.col("n_pos") * 1000000.0 / F.col("n"), 0)
    return b.select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        conf.cast("bigint").alias("conf_micropoints"),
        acc.cast("bigint").alias("acc_micropoints"),
        F.abs(conf - acc).cast("bigint").alias("gap_micropoints"),
    )


@register(
    "classifier_brier_ece",
    oracle=f"""
    WITH {_SCORED_CTE},
    rows_fixed AS (
      SELECT {_BIN} AS bin, y,
             CAST(ROUND(p * 1000000.0, 0) AS BIGINT) AS p_micro,
             CAST(ROUND((p - y) * (p - y) * 1000000000.0, 0) AS BIGINT)
               AS brier_nano
      FROM scored
    ),
    b AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos, SUM(p_micro) AS sum_p,
             SUM(brier_nano) AS bnano
      FROM rows_fixed GROUP BY bin
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(ROUND(SUM(bnano) / (1000.0 * SUM(n)), 0) AS BIGINT)
             AS brier_micropoints,
           CAST(ROUND(SUM(n * ABS(ROUND(sum_p * 1.0 / n, 0)
                                  - ROUND(n_pos * 1000000.0 / n, 0)))
                      * 1.0 / SUM(n), 0) AS BIGINT)
             AS ece_micropoints
    FROM b
    """,
)
def classifier_brier_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row scorecard: Brier score (mean squared error of the
    predicted probability) and expected calibration error (bin-weighted
    mean |confidence − accuracy| over the 10 reliability bins). Per-row
    squared errors are integerized to nano-points so the corpus sum is
    exact; ECE reuses the bins' integer gap arithmetic. Both metrics
    fold through ONE 10-key aggregate (Brier partial-sums per bin, then
    over bins) — the whole scorecard is a single map + single shuffle."""
    s = _scored_docs(spark, sf_dir)
    rows_fixed = s.select(
        F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9)).alias("bin"),
        "y",
        F.round(F.col("p") * 1000000.0, 0).cast("bigint").alias("p_micro"),
        F.round(
            (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")) * 1000000000.0,
            0,
        )
        .cast("bigint")
        .alias("brier_nano"),
    )
    b = rows_fixed.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum("p_micro").alias("sum_p"),
        F.sum("brier_nano").alias("bnano"),
    )
    conf = F.round(F.col("sum_p") * 1.0 / F.col("n"), 0)
    acc = F.round(F.col("n_pos") * 1000000.0 / F.col("n"), 0)
    return b.agg(
        F.sum("n").cast("long").alias("n"),
        F.round(F.sum("bnano") / (1000.0 * F.sum("n")), 0)
        .cast("bigint")
        .alias("brier_micropoints"),
        F.round(F.sum(F.col("n") * F.abs(conf - acc)) * 1.0 / F.sum("n"), 0)
        .cast("bigint")
        .alias("ece_micropoints"),
    )


def _staged_scored_doc_stream(spark: SparkSession, sf_dir: str) -> str:
    """Documents written as 3 doc-hashed parquet files — the scored-
    example delivery an online eval monitor tails (one file per
    trigger; scoring happens inside the monitor, on the batch)."""
    from pathlib import Path

    from dataengineerchallenge_spark.sources.sinks import write_result
    from dataengineerchallenge_spark.staging import staged

    def build(out: Path) -> None:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "text"
        )
        write_result(docs.repartition(3, "doc_id"), str(out))

    return staged(
        spark,
        "auc_delivery",
        Path(sf_dir) / "documents.parquet",
        "auc_delivery_v1",
        build,
    )


@register(
    "stream_classifier_auc",
    oracle=f"""
    WITH {_SCORED_CTE},
    g AS (
      SELECT source, p, COUNT(*) AS cnt, SUM(y) AS pos
      FROM scored GROUP BY source, p
    ),
    r AS (
      SELECT source, cnt, pos,
             COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumprev
      FROM g
    ),
    m AS (
      SELECT source,
             SUM(pos) AS np, SUM(cnt) - SUM(pos) AS nn,
             SUM(pos * (2 * cumprev + cnt + 1)) AS rank2
      FROM r GROUP BY source
    )
    SELECT source,
           CAST(np AS BIGINT) AS n_pos,
           CAST(nn AS BIGINT) AS n_neg,
           CAST(ROUND((rank2 - np * (np + 1)) * 1000000.0 / (2 * np * nn), 0)
                AS BIGINT) AS auc_micropoints
    FROM m WHERE np > 0 AND nn > 0
    """,
)
def stream_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``classifier_auc_by_source`` — the eval family's
    first streaming member, possible because AUC's sufficient
    statistics are LINEAR: the (source, p) -> (cnt, pos) tallies add
    across any data slicing, so each micro-batch scores only its own
    documents and commits its own tallies under an epoch_id-keyed
    overwrite (the cm/hll/MAD/PSI drain contract), and the drained fold
    feeds the IDENTICAL ranking arithmetic (`auc_from_score_groups`).
    An eval monitor in this shape tracks a live classifier's AUC
    without ever re-scoring history. Shares the batch oracle
    hash-for-hash."""
    import shutil
    import tempfile

    payload = _staged_scored_doc_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_auc_")
    tallies, ckpt = f"{scratch}/tallies", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        toks = F.split("text", " ")
        stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
        scored = mb.select(
            "source",
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
            (stop_hits.cast("double") / F.size(toks)).alias("p"),
        )
        scored.groupBy("source", "p").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
        ).write.mode("overwrite").parquet(f"{tallies}/epoch_id={epoch_id}")

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "auc stream")
        g = (
            spark.read.parquet(tallies)
            .groupBy("source", "p")
            .agg(F.sum("cnt").alias("cnt"), F.sum("pos").alias("pos"))
        )
        out = auc_from_score_groups(g, "source")
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result


@register(
    "stream_classifier_brier_ece",
    oracle=f"""
    WITH {_SCORED_CTE},
    rows_fixed AS (
      SELECT {_BIN} AS bin, y,
             CAST(ROUND(p * 1000000.0, 0) AS BIGINT) AS p_micro,
             CAST(ROUND((p - y) * (p - y) * 1000000000.0, 0) AS BIGINT)
               AS brier_nano
      FROM scored
    ),
    b AS (
      SELECT bin, COUNT(*) AS n, SUM(y) AS n_pos, SUM(p_micro) AS sum_p,
             SUM(brier_nano) AS bnano
      FROM rows_fixed GROUP BY bin
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(ROUND(SUM(bnano) / (1000.0 * SUM(n)), 0) AS BIGINT)
             AS brier_micropoints,
           CAST(ROUND(SUM(n * ABS(ROUND(sum_p * 1.0 / n, 0)
                                  - ROUND(n_pos * 1000000.0 / n, 0)))
                      * 1.0 / SUM(n), 0) AS BIGINT)
             AS ece_micropoints
    FROM b
    """,
)
def stream_classifier_brier_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE twin of ``classifier_brier_ece`` — like the AUC twin, the
    calibration scorecard's sufficient statistics are LINEAR: per-bin
    (n, positives, Σp_micro, Σbrier_nano) registers add across any
    micro-batch slicing (the per-row integerization that made the batch
    metric order-free is exactly what makes it drain-mergeable). Each
    batch scores its own documents, commits 10-bin tallies under an
    epoch_id-keyed overwrite; the drain folds by addition and closes
    with the same two rounded divisions — shares the batch oracle
    hash-for-hash."""
    import shutil
    import tempfile

    payload = _staged_scored_doc_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_brier_")
    tallies, ckpt = f"{scratch}/tallies", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        toks = F.split("text", " ")
        stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
        scored = mb.select(
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
            (stop_hits.cast("double") / F.size(toks)).alias("p"),
        )
        rows_fixed = scored.select(
            F.least(F.floor(F.col("p") * 10).cast("bigint"), F.lit(9)).alias("bin"),
            "y",
            F.round(F.col("p") * 1000000.0, 0).cast("bigint").alias("p_micro"),
            F.round(
                (F.col("p") - F.col("y")) * (F.col("p") - F.col("y")) * 1000000000.0,
                0,
            )
            .cast("bigint")
            .alias("brier_nano"),
        )
        rows_fixed.groupBy("bin").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("p_micro").alias("sum_p"),
            F.sum("brier_nano").alias("bnano"),
        ).write.mode("overwrite").parquet(f"{tallies}/epoch_id={epoch_id}")

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "brier stream")
        b = (
            spark.read.parquet(tallies)
            .groupBy("bin")
            .agg(
                F.sum("n").alias("n"),
                F.sum("n_pos").alias("n_pos"),
                F.sum("sum_p").alias("sum_p"),
                F.sum("bnano").alias("bnano"),
            )
        )
        conf = F.round(F.col("sum_p") * 1.0 / F.col("n"), 0)
        acc = F.round(F.col("n_pos") * 1000000.0 / F.col("n"), 0)
        out = b.agg(
            F.sum("n").cast("long").alias("n"),
            F.round(F.sum("bnano") / (1000.0 * F.sum("n")), 0)
            .cast("bigint")
            .alias("brier_micropoints"),
            F.round(F.sum(F.col("n") * F.abs(conf - acc)) * 1.0 / F.sum("n"), 0)
            .cast("bigint")
            .alias("ece_micropoints"),
        )
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result


@register(
    "stream_classifier_pr_auc",
    oracle=f"""
    WITH {_SCORED_CTE},
    g AS (
      SELECT p, COUNT(*) AS cnt, SUM(y) AS pos FROM scored GROUP BY p
    ),
    c AS (
      SELECT p, pos,
             SUM(pos) OVER (ORDER BY p DESC) AS cum_tp,
             SUM(cnt) OVER (ORDER BY p DESC) AS cum_n
      FROM g
    ),
    t AS (
      SELECT CAST(ROUND(pos * 1000000000.0 * cum_tp / cum_n, 0) AS BIGINT)
               AS term_nano,
             pos
      FROM c
    ),
    m AS (
      SELECT SUM(pos) AS np, COUNT(*) AS nt, SUM(term_nano) AS st FROM t
    )
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(nt AS BIGINT) AS n_thresholds,
           CAST(ROUND(st / (1000.0 * np), 0) AS BIGINT) AS ap_micropoints
    FROM m WHERE np > 0
    """,
)
def stream_classifier_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE average precision — the third online eval, riding the
    SAME (p) -> (cnt, pos) linear tallies as the AUC twin (one drain
    schema serves both ranking metrics; a real monitor commits the
    tallies once and reads every metric off them). Per-batch scoring +
    epoch-keyed commits, drained fold closed by
    ``pr_auc_from_score_groups`` — shares the batch oracle."""
    import shutil
    import tempfile

    payload = _staged_scored_doc_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_ap_")
    tallies, ckpt = f"{scratch}/tallies", f"{scratch}/ckpt"

    def update(mb: DataFrame, epoch_id: int) -> None:
        toks = F.split("text", " ")
        stop_hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
        scored = mb.select(
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
            (stop_hits.cast("double") / F.size(toks)).alias("p"),
        )
        scored.groupBy("p").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("y").alias("pos")
        ).write.mode("overwrite").parquet(f"{tallies}/epoch_id={epoch_id}")

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, update, ckpt, "ap stream")
        g = (
            spark.read.parquet(tallies)
            .groupBy("p")
            .agg(F.sum("cnt").alias("cnt"), F.sum("pos").alias("pos"))
        )
        out = pr_auc_from_score_groups(g)
        result = local_frame(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return result
