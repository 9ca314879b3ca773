"""End-to-end corpus-curation pipeline (the flagship LLM-training-data
shape the north star describes): ingest (with duplicated delivery
batches) → exact dedup → quality filter → language-ID over the
survivors → fingerprint → curated manifest.

Every stage is an operator verified on its own elsewhere (N1 dedup, N4
quality/lang-id/fingerprint); this query verifies their COMPOSITION —
where real pipelines break (stage order, schema drift between stages,
training the lang model on the wrong corpus). The whole thing is one
Catalyst plan: dedup shuffles on the content hash, quality is a per-row
map on the survivors, the lang model is a broadcast side-frame, the
fingerprint another per-row map — so at 100 TB the pipeline costs one
content-hash exchange plus the small lang-model aggregates, nothing
quadratic anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.dedup import exact_dedup, word_shingles
from dataengineerchallenge_spark.queries.text import lang_id_frame, quality_frame
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table

_QUALITY_MIN = 0.72


@register(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH deduped AS (
      SELECT min(doc_id) AS doc_id,
             arg_min(text, doc_id) AS text,
             arg_min(lang, doc_id) AS lang
      FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      GROUP BY sha256(text)
    ),
    scored AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS n_words,
             round(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
                   + 0.3 * round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                                 / len(string_split(text, ' ')), 4)
                   + 0.3 * (1.0 - round(len(list_filter(string_split(text, ' '),
                                w -> list_contains(['the', 'a'], w)))::DOUBLE
                                / len(string_split(text, ' ')), 4)), 5) AS quality
      FROM deduped
    ),
    kept AS (SELECT * FROM scored WHERE quality >= {_QUALITY_MIN}),
    tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM kept),
    lw AS (SELECT lang AS l, w, count(*)::DOUBLE AS c FROM tok GROUP BY lang, w),
    ltot AS (SELECT lang AS l, count(*)::DOUBLE AS n FROM tok GROUP BY lang),
    vocab AS (SELECT count(DISTINCT w)::DOUBLE AS v FROM tok),
    langs AS (SELECT DISTINCT lang AS l FROM kept),
    pred AS (
      SELECT doc_id, l AS pred_lang
      FROM (
        SELECT t.doc_id, langs.l,
               sum(ln((coalesce(lw.c, 0) + 1) / (ltot.n + vocab.v))) AS score
        FROM tok t CROSS JOIN langs
        LEFT JOIN lw ON lw.l = langs.l AND lw.w = t.w
        JOIN ltot ON ltot.l = langs.l CROSS JOIN vocab
        GROUP BY t.doc_id, langs.l
      )
      QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, l) = 1
    ),
    fp AS (
      SELECT doc_id,
             list_sort(list_distinct(
               list_transform([array_to_string(ws[i:i+2], ' ')
                               FOR i IN range(1, len(ws)-1)], x -> md5(x))))[1]
               AS fingerprint
      FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM kept)
    )
    SELECT k.doc_id, k.lang, p.pred_lang, k.quality,
           CAST(k.n_words AS BIGINT) AS n_words, f.fingerprint
    FROM kept k JOIN pred p USING (doc_id) JOIN fp f USING (doc_id)
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus manifest: survivors of dedup + quality ≥ 0.72, with
    predicted language (model trained on the survivors themselves) and
    content fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    ingested = docs.unionByName(docs)  # duplicated delivery batches
    deduped = exact_dedup(ingested, content_cols=["text"], order_col="doc_id")
    # Stage the curated survivors once: the lang model derives five
    # side-frames from this subtree and branch-specific column pruning
    # defeats ReuseExchange, so without staging the dedup+quality phase
    # re-runs per branch (measured: 12 scans, 6-10 s and high variance at
    # sf0.1 vs ~2.8 s staged). localCheckpoint materializes to executor
    # blocks and is GC'd with the frame (unlike persist(), nothing
    # accretes across calls); at 100 TB the same phase boundary goes
    # through a parquet sink (sources/sinks.py) instead.
    kept = (
        quality_frame(deduped)
        .filter(F.col("quality") >= _QUALITY_MIN)
        .localCheckpoint(eager=False)
    )
    preds = lang_id_frame(kept.select("doc_id", "lang", "text"))
    # F.get (NULL on empty), not element_at (ANSI throw) — see doc_fingerprints
    fingerprint = F.get(
        F.array_sort(F.array_distinct(F.transform(word_shingles("text", 3), lambda s: F.md5(s)))), 0
    )
    return (
        kept.withColumn("fingerprint", fingerprint)
        .join(preds, "doc_id")
        .select(
            "doc_id", "lang", "pred_lang", "quality",
            F.col("n_words").cast("long").alias("n_words"), "fingerprint",
        )
    )
