"""Multimodal payload columns (SURVEY.md §2.11 N5): carry opaque binary
media (image/audio/video) through the engine as ``BinaryType`` columns
with a typed metadata struct, and process them with Arrow-batched
``mapInPandas`` — the shape a 100 TB training-data pipeline uses for
decode / feature-extract / resize / frame-sample stages.

The container has no media codecs (PIL/ffmpeg), so DECODE IS STUBBED:
``decode_payload(..., codec="real")`` raises NotImplementedError by
design, and the deterministic "fake codec" treats the payload bytes
themselves as the decoded signal. Everything around the stub — schema,
binary column plumbing, metadata struct, Arrow batch iteration, the
byte-level feature math — is real and oracle-checked.

Scale notes: payloads ride in the same rows as their metadata, so
predicate pushdown on metadata (mime, n_bytes) prunes parquet row
groups BEFORE payload IO; mapInPandas streams Arrow batches, so peak
memory is one batch of payloads per core, not a partition; per-batch
codec init amortizes (see functions/udfs.py D4 discussion).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAGIC = "MM1:"  # fake container header for the synthetic payloads

PAYLOAD_FEATURES_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, "
    "mean_byte double, max_byte int, header_ok boolean"
)


def with_payloads(docs: DataFrame) -> DataFrame:
    """Attach a deterministic binary payload + metadata struct to each
    document (stands in for e.g. a thumbnail column). Payload bytes are
    the UTF-8 of header+text, so every engine can recompute them."""
    payload = F.encode(F.concat(F.lit(_MAGIC), F.col("text")), "UTF-8")
    mime = F.when(F.col("doc_id") % 3 == 0, "image/png").otherwise("audio/wav")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("content_sha"),
        ).alias("meta"),
    )


def decode_payload(batch: np.ndarray, codec: str):
    """Decode one payload. ``codec="real"`` is where PIL/soundfile/ffmpeg
    would run — unavailable in this environment, so it raises; the
    "fake" codec returns the raw byte array as the decoded signal."""
    if codec == "real":
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not installed in this container; "
            "the fake codec exercises the identical Spark plumbing"
        )
    return np.frombuffer(batch, dtype=np.uint8)


def payload_feature_batches(codec: str = "fake"):
    """mapInPandas stage: binary payloads → per-payload features
    (byte-level stats via the fake codec; a real codec would emit e.g.
    image dimensions or audio RMS through the same iterator shape)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = [decode_payload(p, codec) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(s) for s in sigs],
                    "mean_byte": [float(s.mean()) for s in sigs],
                    "max_byte": [int(s.max()) for s in sigs],
                    "header_ok": [bytes(s[:4]).decode("utf-8", "replace") == _MAGIC for s in sigs],
                }
            )

    return gen


def extract_payload_features(mm: DataFrame, codec: str = "fake") -> DataFrame:
    return mm.mapInPandas(payload_feature_batches(codec), PAYLOAD_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id bigint, frame_idx bigint, frame_mean double"


def frame_sample_batches(frame_bytes: int = 16, every_k: int = 2, codec: str = "fake"):
    """mapInPandas frame-sampling stage (one payload → many frame rows,
    the video-keyframe shape): split the decoded signal into complete
    ``frame_bytes``-sized frames, keep every ``every_k``-th, emit one row
    per kept frame with its mean level."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, means = [], [], []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                s = decode_payload(p, codec)
                # no rounding here: Python round() is half-EVEN, while both
                # engines' SQL ROUND is half-up — callers F.round the output
                for j in range(0, len(s) // frame_bytes, every_k):
                    fr = s[j * frame_bytes : (j + 1) * frame_bytes]
                    doc_ids.append(did)
                    idxs.append(j)
                    means.append(float(fr.mean()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return gen


def sample_frames(mm: DataFrame, frame_bytes: int = 16, every_k: int = 2) -> DataFrame:
    return mm.mapInPandas(frame_sample_batches(frame_bytes, every_k), FRAME_SAMPLE_SCHEMA)


RESAMPLE_SCHEMA = "doc_id bigint, " + ", ".join(f"s{k} double" for k in range(8))


def resample_batches(n_buckets: int = 8, codec: str = "fake"):
    """mapInPandas resize stage (image-thumbnail shape): downsample each
    decoded signal to a fixed ``n_buckets``-wide row by averaging integer
    bucket spans [k·L/n, (k+1)·L/n) — the same integer boundaries the
    DuckDB twin computes, so the resize is bit-checkable."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": []}
            for k in range(n_buckets):
                out[f"s{k}"] = []
            for did, p in zip(pdf["doc_id"], pdf["payload"]):
                s = decode_payload(p, codec)
                L = len(s)
                if L < n_buckets:
                    continue  # no complete resize possible; dropped both sides
                out["doc_id"].append(did)
                for k in range(n_buckets):
                    seg = s[L * k // n_buckets : L * (k + 1) // n_buckets]
                    out[f"s{k}"].append(float(seg.mean()))  # F.round'd by caller
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    **{
                        f"s{k}": pd.Series(out[f"s{k}"], dtype="float64")
                        for k in range(n_buckets)
                    },
                }
            )

    return gen


def resample_payloads(mm: DataFrame) -> DataFrame:
    return mm.mapInPandas(resample_batches(), RESAMPLE_SCHEMA)
