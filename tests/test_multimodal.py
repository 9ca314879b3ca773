"""Multimodal plumbing (N5): binary schema, Arrow round-trip, stub gate."""

from __future__ import annotations

import pytest

from dataengineerchallenge_spark.operators.multimodal import (
    decode_payload,
    extract_payload_features,
    with_payloads,
)
from dataengineerchallenge_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_payload_column_is_binary_with_typed_meta(spark):
    mm = with_payloads(load_table(spark, SF_DIR, "documents"))
    kinds = dict(mm.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string,n_bytes:int")


def test_real_codec_is_explicitly_stubbed():
    import numpy as np

    with pytest.raises(NotImplementedError):
        decode_payload(np.frombuffer(b"MM1:x", dtype=np.uint8), codec="real")


def test_fake_codec_features_deterministic_and_consistent(spark):
    mm = with_payloads(load_table(spark, SF_DIR, "documents"))
    f1 = {r["doc_id"]: (r["n_bytes"], r["mean_byte"]) for r in extract_payload_features(mm).collect()}
    f2 = {r["doc_id"]: (r["n_bytes"], r["mean_byte"]) for r in extract_payload_features(mm).collect()}
    assert f1 == f2
    # n_bytes == metadata n_bytes (decode saw exactly the stored payload)
    meta = {r["doc_id"]: r["n"] for r in mm.selectExpr("doc_id", "meta.n_bytes AS n").collect()}
    assert all(f1[d][0] == meta[d] for d in meta)


def test_header_check_flags_all_rows(spark):
    mm = with_payloads(load_table(spark, SF_DIR, "documents"))
    rows = extract_payload_features(mm).collect()
    assert all(r["header_ok"] for r in rows)
