"""HTML main-text extraction — the front of the LLM data pipeline
(VERDICT r16 next-round #3). Every text operator in this engine
consumes ``documents.text`` already clean; a real crawl starts at
markup, and boilerplate removal is the highest-volume operator such a
pipeline runs. This module implements a jusText-class extractor
(Pomikálek 2011, "Removing boilerplate and duplicate content from web
corpora" — public; trafilatura composes the same density rules):

1. block segmentation on closing block-level tags,
2. tag strip,
3. context-free block classification from link density, stopword
   density, and length,
4. jusText's context-sensitive REVISION pass: short and near-good
   blocks inherit goodness from their nearest classified neighbors.

Fixture: the container ships no crawl corpus, so both engines WRAP
``documents.text`` into boilerplate-laden HTML deterministically
in-plan (nav bar with links, cookie banner, ``<p>``-chunked body,
footer — the ``multimodal_synth_codec_audit`` synth-payload
precedent), then run the extractor on the wrapped column. That makes
the round-trip a *verifiable contract*: the output pins, per document
and hash-checked against DuckDB, that every boilerplate block is
dropped and the body survives BYTE-IDENTICALLY (``body_intact``).

Float discipline: none needed — every rule is integer arithmetic
(cross-multiplied ratios, token counts, link counts).

Scale shape (100 TB of raw HTML): embarrassingly parallel — one map
pass per document; the only window orders BLOCKS WITHIN one document
(bounded by page size, never corpus-sized), and the final assembly is
a per-doc aggregate. No shuffle touches more than (doc_id, block)
rows; the wrap stage disappears entirely on real crawl input.

Known failure mode, kept honest: a document whose text contains no
stopwords at all yields no good block, so the whole body is dropped
(``n_kept_blocks = 0``) — jusText's documented language-dependence
(its stoplists are per-language; ours is the engine's fixed {'the',
'a'} scorer list, with the lang-id confusion rung pricing the
substitution). ~9% of fixture docs hit this, visible in the output
rather than patched around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table

# Wrap geometry: body text is split into nch = floor(n/20) BALANCED
# chunks (sizes floor(n/nch) and floor(n/nch)+1, so every body chunk
# is >= 20 tokens and never classified "short" at any doc length; min
# doc length is 10 tokens -> one whole-doc chunk). Boilerplate
# templates are stopword-free by construction.
_CHUNK = 20
_NAV = (
    '<div class="nav"><a href="/">Home</a> <a href="/docs">Docs</a>'
    ' <a href="/pricing">Pricing</a> Sign in</div>'
)
_COOKIE = '<div class="cookie">This site uses cookies consent required</div>'
_FOOTER = '<div class="footer">Copyright 2026 Terms Privacy Contact Imprint</div>'

# Classification thresholds (integer cross-multiplication, no floats):
# bad        : 2 * links >= tokens            (link-dominated)
# good       : >= 1 stopword hit AND >= 10 tokens
# short      : < 10 tokens                     -> good iff BOTH nearest
#                                                classified neighbors good
# near-good  : everything else                 -> good iff EITHER is good
_MIN_TOKENS = 10
_STOPWORDS = ("the", "a")

_EXTRACT_ORACLE = f"""
WITH wrapped AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n,
         GREATEST(1, len(string_split(text, ' ')) // {_CHUNK}) AS nch
  FROM documents
),
sized AS (
  SELECT doc_id, text, toks, n, nch, n // nch AS q, n % nch AS r FROM wrapped
),
html AS (
  SELECT doc_id, text,
         '<html><head><title>doc ' || doc_id || '</title></head><body>'
         || '{_NAV}' || '{_COOKIE}'
         || array_to_string(
              [ '<p>' || array_to_string(
                  toks[(i - 1) * q + LEAST(i - 1, r) + 1
                       : i * q + LEAST(i, r)], ' ') || '</p>'
                FOR i IN range(1, nch + 1) ], '')
         || '{_FOOTER}' || '</body></html>' AS page
  FROM sized
),
blocks AS (
  SELECT doc_id, text, i AS idx, raw
  FROM (
    SELECT doc_id, text, string_split_regex(page, '</(div|p|head)>') AS bs
    FROM html
  ), LATERAL (SELECT unnest(bs) AS raw, generate_subscripts(bs, 1) AS i)
),
feat AS (
  SELECT doc_id, text, idx,
         TRIM(regexp_replace(raw, '<[^>]*>', ' ', 'g')) AS txt,
         (length(raw) - length(replace(raw, '<a href', ''))) // 7 AS links
  FROM blocks
),
cls AS (
  SELECT doc_id, text, idx, txt,
         CASE WHEN txt = '' THEN 0
              ELSE len(string_split_regex(txt, ' +')) END AS toks,
         CASE WHEN txt = '' THEN 0
              ELSE len(list_filter(string_split_regex(txt, ' +'),
                                   x -> x IN ('the', 'a'))) END AS stops,
         links
  FROM feat
),
cf AS (
  SELECT doc_id, text, idx, txt, toks,
         CASE WHEN toks = 0 THEN 'bad'
              WHEN 2 * links >= toks AND links > 0 THEN 'bad'
              WHEN stops >= 1 AND toks >= {_MIN_TOKENS} THEN 'good'
              WHEN toks < {_MIN_TOKENS} THEN 'short'
              ELSE 'near' END AS c
  FROM cls
),
ctx AS (
  SELECT doc_id, text, idx, txt, c,
         COALESCE(last_value(CASE WHEN c IN ('good', 'bad') THEN c END
                             IGNORE NULLS)
                  OVER (PARTITION BY doc_id ORDER BY idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  'bad') AS prevc,
         COALESCE(first_value(CASE WHEN c IN ('good', 'bad') THEN c END
                              IGNORE NULLS)
                  OVER (PARTITION BY doc_id ORDER BY idx
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
                  'bad') AS nextc
  FROM cf
),
fin AS (
  SELECT doc_id, text, idx, txt,
         CASE WHEN c = 'good' THEN 1
              WHEN c = 'near' AND (prevc = 'good' OR nextc = 'good') THEN 1
              WHEN c = 'short' AND prevc = 'good' AND nextc = 'good' THEN 1
              ELSE 0 END AS keep
  FROM ctx
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(keep) AS BIGINT) AS n_kept_blocks,
       CAST(length(COALESCE(string_agg(CASE WHEN keep = 1 THEN txt END, ' '
                                       ORDER BY idx), '')) AS BIGINT)
         AS extracted_chars,
       CAST(CASE WHEN COALESCE(string_agg(CASE WHEN keep = 1 THEN txt END, ' '
                                          ORDER BY idx), '') = ANY_VALUE(text)
                 THEN 1 ELSE 0 END AS BIGINT) AS body_intact
FROM fin GROUP BY doc_id
"""


def wrap_documents_html(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, text, page): the deterministic
    boilerplate wrap both engines replay token-for-token. Chunks are
    BALANCED — the first ``n mod nch`` chunks take ``floor(n/nch)+1``
    tokens, the rest ``floor(n/nch)`` — so the shortest body chunk is
    ``floor(n/nch) >= 20`` tokens (``nch = n div 20`` implies
    ``n >= 20*nch``), never in the 'short' class at ANY doc length.
    (All-ceil sizing had a collapsing last chunk for most n >= 261.)"""
    toks = F.split("text", " ")
    n = F.size(toks)
    nch = F.greatest(F.lit(1), F.expr(f"size(split(text, ' ')) div {_CHUNK}"))
    d = (
        docs.select(
            "doc_id",
            "text",
            toks.alias("toks"),
            n.alias("n"),
            nch.alias("nch"),
        )
        .withColumn("q", F.expr("n div nch"))
        .withColumn("r", F.expr("n % nch"))
    )
    body = F.expr(
        "array_join(transform(sequence(1, nch),"
        " i -> concat('<p>', array_join("
        "slice(toks, (i - 1) * q + least(i - 1, r) + 1,"
        " q + if(i <= r, 1, 0)), ' '),"
        " '</p>')), '')"
    )
    return d.select(
        "doc_id",
        "text",
        F.concat(
            F.lit("<html><head><title>doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title></head><body>"),
            F.lit(_NAV),
            F.lit(_COOKIE),
            body,
            F.lit(_FOOTER),
            F.lit("</body></html>"),
        ).alias("page"),
    )


def extract_main_text_frame(pages: DataFrame) -> DataFrame:
    """(doc_id, page [, text]) -> per-doc extraction audit: the
    jusText-class two-pass classifier over tag-stripped blocks. If a
    ``text`` column rides along, ``body_intact`` pins byte-identical
    recovery; otherwise callers drop that column."""
    blocks = pages.select(
        "doc_id",
        "text",
        F.posexplode(F.split("page", "</(div|p|head)>")).alias("idx", "raw"),
    )
    txt = F.trim(F.regexp_replace("raw", "<[^>]*>", " "))
    feat = blocks.select(
        "doc_id",
        "text",
        "idx",
        txt.alias("txt"),
        ((F.length("raw") - F.length(F.replace(F.col("raw"), F.lit("<a href"))))
         / 7).cast("long").alias("links"),
    )
    toks = F.when(F.col("txt") == "", 0).otherwise(
        F.size(F.split("txt", " +"))
    )
    stops = F.when(F.col("txt") == "", 0).otherwise(
        F.size(F.filter(F.split("txt", " +"), lambda x: x.isin(*_STOPWORDS)))
    )
    cf = feat.select(
        "doc_id",
        "text",
        "idx",
        "txt",
        toks.alias("toks"),
        F.when(toks == 0, "bad")
        .when(
            (2 * F.col("links") >= toks) & (F.col("links") > 0), "bad"
        )
        .when((stops >= 1) & (toks >= _MIN_TOKENS), "good")
        .when(toks < _MIN_TOKENS, "short")
        .otherwise("near")
        .alias("c"),
    )
    wdoc = Window.partitionBy("doc_id").orderBy("idx")
    classified = F.when(F.col("c").isin("good", "bad"), F.col("c"))
    ctx = cf.select(
        "doc_id",
        "text",
        "idx",
        "txt",
        "c",
        F.coalesce(
            F.last(classified, ignorenulls=True).over(
                wdoc.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit("bad"),
        ).alias("prevc"),
        F.coalesce(
            F.first(classified, ignorenulls=True).over(
                wdoc.rowsBetween(1, Window.unboundedFollowing)
            ),
            F.lit("bad"),
        ).alias("nextc"),
    )
    keep = (
        F.when(F.col("c") == "good", 1)
        .when(
            (F.col("c") == "near")
            & ((F.col("prevc") == "good") | (F.col("nextc") == "good")),
            1,
        )
        .when(
            (F.col("c") == "short")
            & (F.col("prevc") == "good")
            & (F.col("nextc") == "good"),
            1,
        )
        .otherwise(0)
    )
    fin = ctx.select("doc_id", "text", "idx", "txt", keep.alias("keep"))
    extracted = F.coalesce(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN keep = 1"
                " THEN struct(idx, txt) END)), s -> s.txt)"
            ),
            " ",
        ),
        F.lit(""),
    )
    return fin.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("keep").cast("long").alias("n_kept_blocks"),
        F.length(extracted).cast("long").alias("extracted_chars"),
        F.when(extracted == F.any_value("text"), 1)
        .otherwise(0)
        .cast("long")
        .alias("body_intact"),
    )


@register("extract_main_text", oracle=_EXTRACT_ORACLE)
def extract_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText-class main-text extraction over deterministically
    boilerplate-wrapped documents — see the module docstring for the
    wrap, the two-pass classifier, and the byte-identical recovery
    contract. Per doc: block counts, kept-block count, extracted byte
    length, and ``body_intact`` (extracted text == the pre-wrap body,
    1/0) — all hash-checked, so the oracle grades the extractor's
    DECISIONS and its reconstruction, not just row counts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return extract_main_text_frame(wrap_documents_html(docs))
