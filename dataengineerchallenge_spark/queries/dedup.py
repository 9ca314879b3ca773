"""Dedup query battery over the ``documents`` corpus (SURVEY.md §2.11
N1/N2, §2.3 J9; provenance /root/reference/README.md:61 "messy (ie real)
data" extended to the driver's LLM-corpus north star).

Oracle strategy: the fixture corpus has no exact-duplicate texts, so
``exact_dedup_docs`` deduplicates a self-union (two identical "delivery
batches", the shape of re-delivered log partitions, README.md:44) — every
content group has exactly 2 rows and the operator must keep the min
doc_id. ``near_dup_jaccard`` is the EXACT shingle-Jaccard join with a
plain-SQL DuckDB twin; the MinHash-LSH and SimHash variants are
approximate/seeded and therefore rows-only, pinned by pytest against the
exact anchor (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators import dedup as D
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table


@register(
    "exact_dedup_docs",
    oracle="""
    SELECT sha256(text)            AS content_sha,
           min(doc_id)             AS doc_id,
           arg_min(text, doc_id)   AS text,
           arg_min(lang, doc_id)   AS lang,
           arg_min(source, doc_id) AS source,
           arg_min(n_chars, doc_id) AS n_chars
    FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    GROUP BY sha256(text)
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1 exact content-hash dedup: two identical delivery batches in,
    one surviving row per distinct text out (keep-first by doc_id)."""
    docs = load_table(spark, sf_dir, "documents")
    doubled = docs.unionByName(docs)
    return D.exact_dedup(doubled, content_cols=["text"], order_col="doc_id")


@register(
    "near_dup_jaccard",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    s AS (SELECT doc_id,
                 list_distinct([array_to_string(ws[i:i+2], ' ')
                                FOR i IN range(1, len(ws)-1)]) AS sh
          FROM t)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """,
)
def near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 exact anchor: 3-word-shingle Jaccard ≥ 0.5 via inverted-index
    self-join (hash join on the shingle key — no crossJoin anywhere)."""
    docs = load_table(spark, sf_dir, "documents")
    return D.shingle_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)


@register("near_dup_minhash")
def near_dup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2/J9 scale path: MinHash + banded LSH approximate similarity
    self-join (seeded). Rows-only per contract (hash-collision dependent);
    recall vs the exact anchor is pinned in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, "doc_id", "text", n=3, max_jaccard_dist=0.5)


@register("simhash_near_dups")
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2 SimHash variant: 64-bit fingerprint, 16-bit band candidate join,
    exact hamming verification. Rows-only (xxhash64 is Spark-specific, no
    DuckDB twin); determinism + planted-pair recall pinned by pytest."""
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3)


@register(
    "dedup_survivor_stats",
    oracle="""
    WITH deduped AS (
      SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang
      FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      GROUP BY sha256(text)
    )
    SELECT lang, count(*)::BIGINT AS n_docs
    FROM deduped GROUP BY lang
    """,
)
def dedup_survivor_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-dedup corpus composition — dedup feeding a downstream agg
    (the usual pipeline shape: dedup → stats → sampling)."""
    docs = load_table(spark, sf_dir, "documents")
    deduped = D.exact_dedup(docs.unionByName(docs), ["text"], "doc_id")
    return deduped.groupBy("lang").agg(F.count("*").alias("n_docs"))
