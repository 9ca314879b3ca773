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


# --- SRLE synthetic-codec conformance ----------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from dataengineerchallenge_spark.operators.multimodal import (
    decode_srle,
    decode_synth_images,
    encode_srle,
    with_synth_images,
)


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        np.uint8,
        st.tuples(st.integers(1, 40), st.integers(1, 40)),
        elements=st.integers(0, 255),
    )
)
def test_srle_roundtrip_random_images(img):
    assert np.array_equal(decode_srle(encode_srle(img)), img)


def test_srle_long_runs_split_at_255():
    # a constant 20x40 image = one 800-px run -> must split into 255-runs
    img = np.full((20, 40), 7, dtype=np.uint8)
    enc = encode_srle(img)
    assert np.array_equal(decode_srle(enc), img)
    runs = np.frombuffer(enc, dtype=np.uint8, offset=9)[0::2]
    assert runs.max() == 255 and runs.sum() == 800


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:-1],                        # truncated run pair
        lambda b: b"XRLE\x01" + b[5:],           # bad magic
        lambda b: b"SRLE\x02" + b[5:],           # bad version
        lambda b: b[:9] + b[11:],                # dropped run -> sum mismatch
        lambda b: b[:9],                         # header only
        lambda b: b"",                           # empty
    ],
)
def test_srle_malformations_raise(mutate):
    enc = encode_srle(np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises(ValueError):
        decode_srle(mutate(enc))


def test_synth_codec_empty_and_non_ascii_text(spark):
    """ADVICE r4 (medium): empty text must quarantine (not ZeroDivisionError
    the task), and non-ASCII text must decode with code-point-mod-256
    pixels — the same definition the DuckDB oracle uses — so a regenerated
    fixture with unicode or empty docs can't silently break hash parity."""
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "héllo wörldé"), (4, "中文abc"), (5, "plain")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decode_synth_images(with_synth_images(docs)).collect()}
    assert len(rows) == 5
    for did in (1, 2):
        assert rows[did]["decode_ok"] is False and rows[did]["mean_px"] is None
    for did, text in ((3, "héllo wörldé"), (4, "中文abc"), (5, "plain")):
        r = rows[did]
        assert r["decode_ok"] is True
        w, h = 8 + did % 9, 8 + (did // 7) % 9
        cps = [ord(c) % 256 for c in text]
        px = [cps[i % len(cps)] for i in range(w * h)]
        assert r["width"] == w and r["height"] == h and r["n_px"] == w * h
        assert abs(r["mean_px"] - sum(px) / len(px)) < 1e-9
        assert r["distinct_px"] == len(set(px))


def test_synth_codec_spark_roundtrip_and_quarantine(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = decode_synth_images(with_synth_images(docs)).collect()
    assert len(out) == docs.count()
    bad = [r for r in out if not r["decode_ok"]]
    good = [r for r in out if r["decode_ok"]]
    # every 97th doc is shipped corrupt and must quarantine with NULL stats
    assert {r["doc_id"] % 97 == 0 for r in bad} == {True}
    assert all(r["width"] is None and r["mean_px"] is None for r in bad)
    # decoded dims follow the deterministic generator rule
    assert all(
        r["width"] == 8 + r["doc_id"] % 9
        and r["height"] == 8 + (r["doc_id"] // 7) % 9
        and r["n_px"] == r["width"] * r["height"]
        for r in good
    )
