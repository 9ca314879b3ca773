"""Training-mix construction: importance resampling by quality and
domain mixing to target source proportions — the sampling stage that
turns a curated corpus into a pretraining mixture.

Both use content-hash acceptance (md5 of the doc key), NOT ``df.sample``:
RNG samples depend on engine, seed plumbing and partitioning, while a
hash threshold is bit-reproducible across engines, reruns and
repartitionings — so the DuckDB twin hash-matches row for row, and at
100 TB the predicate is a per-row map that pushes to the scan (the only
shuffles here are the tiny per-source/global count aggregates, which
broadcast back into the row predicate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.text import quality_frame
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table

_HEX = "0123456789abcdef"
# first md5 byte of the doc key as an integer 0..255 (same recipe as
# events_hash_sample; strpos/instr spelled per engine)
_SPARK_BUCKET = (
    "(instr('{hex}', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 16 "
    "+ instr('{hex}', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
).format(hex=_HEX)
_DUCK_BUCKET = (
    "(strpos('{hex}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
    "+ strpos('{hex}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1"
).format(hex=_HEX)


@register(
    "importance_resample_by_quality",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_words,
             round(len(list_filter(string_split(text, ' '),
                       w -> list_contains(['the', 'a'], w)))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS stopword_ratio,
             round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS type_token_ratio
      FROM documents
    ), q AS (
      SELECT doc_id, source,
             round(0.4 * least(n_words / 50.0, 1.0)
                   + 0.3 * type_token_ratio
                   + 0.3 * (1.0 - stopword_ratio), 5) AS quality
      FROM m
    ), mx AS (SELECT max(quality) AS qmax FROM q)
    SELECT doc_id, source, quality
    FROM q, mx
    WHERE ({_DUCK_BUCKET}) / 256.0
          < (quality / qmax) * (quality / qmax)
    """,
)
def importance_resample_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-temperature resampling: each doc survives with probability
    (quality/q_max)^2 — temperature 2 upweights high-quality documents
    smoothly instead of a hard threshold cut. The acceptance draw is the
    doc's md5 bucket, the probability an exact float expression (explicit
    multiply, not pow(), so both engines execute identical IEEE ops).
    q_max is a 1-row aggregate crossJoined (broadcast) into the per-row
    predicate — fully lazy, no driver round-trip."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_frame(docs).select("doc_id", "source", "quality")
    qmax = q.agg(F.max("quality").alias("qmax"))
    p = (F.col("quality") / F.col("qmax")) * (F.col("quality") / F.col("qmax"))
    return (
        q.crossJoin(F.broadcast(qmax))
        .filter(F.expr(_SPARK_BUCKET) / 256.0 < p)
        .select("doc_id", "source", "quality")
    )


@register(
    "corpus_mix_by_source",
    oracle=f"""
    WITH w AS (
      SELECT source, count(*) AS n_s,
             CASE WHEN CAST(regexp_extract(source, '[0-9]+') AS INT) % 2 = 0
                  THEN 2.0 ELSE 1.0 END AS wt
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(wt) AS wsum, SUM(n_s) AS n FROM w
    ), rates AS (
      SELECT w.source,
             least(1.0, (w.wt / tot.wsum) * 0.5 * tot.n / w.n_s) AS r
      FROM w, tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates ON rates.source = d.source
    WHERE ({_DUCK_BUCKET}) / 256.0 < rates.r
    """,
)
def corpus_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: sample each source at the rate that makes the kept
    corpus (~50% of the total) match TARGET proportions — here a
    deterministic 2:1 weighting of even- over odd-numbered sources.
    rate_s = min(1, share_s · keep_total / n_s), computed from two tiny
    aggregates (per-source counts + their weighted sum) broadcast back
    into a per-row hash-acceptance predicate. This is the knob a
    pretraining mix actually turns: domain weights, not per-row
    quality."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s")).withColumn(
        "wt",
        F.when(
            F.regexp_extract("source", "[0-9]+", 0).cast("int") % 2 == 0, F.lit(2.0)
        ).otherwise(F.lit(1.0)),
    )
    tot = w.agg(F.sum("wt").alias("wsum"), F.sum("n_s").alias("n"))
    rates = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0), (F.col("wt") / F.col("wsum")) * 0.5 * F.col("n") / F.col("n_s")
        ).alias("r"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(F.expr(_SPARK_BUCKET) / 256.0 < F.col("r"))
        .select("doc_id", "source")
    )
