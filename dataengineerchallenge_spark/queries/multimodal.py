"""Registered multimodal queries (N5). The payloads are deterministic
(header + document text bytes), so even the Arrow decode path is
hash-checked: DuckDB recomputes byte stats from the same text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.multimodal import (
    extract_payload_features,
    with_payloads,
)
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table


@register(
    "multimodal_manifest",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
           CAST(4 + strlen(text) AS BIGINT) AS n_bytes,
           sha256('MM1:' || text) AS content_sha
    FROM documents
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5: binary payload column + typed metadata struct — the manifest
    projection reads ONLY metadata, so parquet column pruning would skip
    payload IO entirely at scale (.explain shows payload absent)."""
    mm = with_payloads(load_table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.content_sha").alias("content_sha"),
    )


@register(
    "multimodal_features",
    oracle="""
    WITH t AS (SELECT doc_id, 'MM1:' || text AS payload_txt FROM documents)
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png' ELSE 'audio/wav' END AS mime,
           CAST(strlen(payload_txt) AS BIGINT) AS n_bytes,
           round(list_avg([unicode(payload_txt[i])
                           FOR i IN range(1, len(payload_txt)+1)]), 4) AS mean_byte,
           list_max([unicode(payload_txt[i])
                     FOR i IN range(1, len(payload_txt)+1)])::INT AS max_byte,
           true AS header_ok
    FROM t
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 decode/feature-extract through mapInPandas (fake codec): the
    Arrow binary round-trip and per-payload numpy feature math are the
    real thing; only the codec call is stubbed (ASCII text ⇒ byte values
    == codepoints, which is what the DuckDB twin recomputes)."""
    mm = with_payloads(load_table(spark, sf_dir, "documents"))
    feats = extract_payload_features(mm, codec="fake")
    return feats.select(
        "doc_id", "mime", "n_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        "max_byte", "header_ok",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH t AS (SELECT doc_id, 'MM1:' || text AS p FROM documents),
    g AS (SELECT doc_id,
                 [round(list_avg([unicode(p[i]) FOR i IN range(j*16+1, j*16+17)]), 4)
                  FOR j IN range(0, strlen(p)//16)] AS fm
          FROM t)
    SELECT doc_id, frame_idx, frame_mean FROM (
      SELECT doc_id,
             CAST(generate_subscripts(fm, 1) - 1 AS BIGINT) AS frame_idx,
             unnest(fm) AS frame_mean
      FROM g
    ) WHERE frame_idx % 2 = 0
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 frame-sampling (video-keyframe shape): one payload → one row
    per kept 16-byte frame (every 2nd complete frame), mean level per
    frame — the one-to-many mapInPandas emitter a real frame sampler
    uses, hash-checked byte-for-byte."""
    from dataengineerchallenge_spark.operators.multimodal import sample_frames

    mm = with_payloads(load_table(spark, sf_dir, "documents"))
    out = sample_frames(mm, frame_bytes=16, every_k=2)
    return out.select("doc_id", "frame_idx", F.round("frame_mean", 4).alias("frame_mean"))


@register(
    "multimodal_resample",
    oracle="""
    WITH t AS (SELECT doc_id, 'MM1:' || text AS p FROM documents
               WHERE strlen('MM1:' || text) >= 8)
    SELECT doc_id,
           """ + ", ".join(
        f"round(list_avg([unicode(p[i]) FOR i IN "
        f"range(strlen(p)*{k}//8 + 1, strlen(p)*{k+1}//8 + 1)]), 4) AS s{k}"
        for k in range(8)
    ) + """
    FROM t
    """,
)
def multimodal_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 resize (thumbnail shape): every payload downsampled to a fixed
    8-wide signal row by integer-boundary bucket means — fixed output
    dims regardless of input size, the defining property of a resize
    stage."""
    from dataengineerchallenge_spark.operators.multimodal import resample_payloads

    mm = with_payloads(load_table(spark, sf_dir, "documents"))
    out = resample_payloads(mm)
    return out.select(
        "doc_id", *[F.round(f"s{k}", 4).alias(f"s{k}") for k in range(8)]
    )


@register(
    "multimodal_synth_codec_audit",
    oracle="""
    WITH dims AS (
      SELECT doc_id, text,
             8 + doc_id % 9 AS w,
             8 + (doc_id // 7) % 9 AS h,
             (doc_id % 97 <> 0 AND coalesce(strlen(text), 0) > 0) AS ok
      FROM documents
    )
    SELECT doc_id,
           ok AS decode_ok,
           CASE WHEN ok THEN CAST(w AS INT) END AS width,
           CASE WHEN ok THEN CAST(h AS INT) END AS height,
           CASE WHEN ok THEN CAST(w * h AS BIGINT) END AS n_px,
           CASE WHEN ok THEN
             round(list_avg([unicode(text[(i % strlen(text)) + 1]) % 256
                             FOR i IN range(0, w * h)]), 4)
           END AS mean_px,
           CASE WHEN ok THEN
             CAST(len(list_distinct([unicode(text[(i % strlen(text)) + 1]) % 256
                                     FOR i IN range(0, w * h)])) AS INT)
           END AS distinct_px
    FROM dims
    """,
)
def multimodal_synth_codec_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N5 synthetic-codec conformance: a REAL variable-length container
    (SRLE1: magic + uint16 dims + RLE runs, operators/multimodal.py) is
    encoded AND decoded in Spark mapInPandas stages, and the decoded
    per-image stats are hash-checked against a DuckDB twin that
    recomputes them from first principles (pixels = text code points
    mod 256 cycled into the doc-derived WxH grid — character-indexed in
    BOTH engines, so non-ASCII fixture text can't drift the hash). A bug
    anywhere in the codec — header layout, run splitting at 255, run-sum
    validation, dimension round-trip — breaks the hash. Every 97th
    payload is shipped truncated, and empty/NULL-text docs ship as empty
    containers; both must land as decode_ok=false quarantine rows with
    NULL stats, never a task failure: the malformed-object discipline a
    100 TB media crawl requires (one bad blob must not kill a job)."""
    from dataengineerchallenge_spark.operators.multimodal import (
        decode_synth_images,
        with_synth_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_synth_images(with_synth_images(docs))
    return decoded.select(
        "doc_id", "decode_ok", "width", "height", "n_px",
        F.round("mean_px", 4).alias("mean_px"), "distinct_px",
    )
