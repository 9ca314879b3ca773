"""Perceptual payload near-dup (N5+, r15): aHash fingerprint exactness,
banding losslessness on the real corpus, and the re-encode recall the
query docstring claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _fingerprints(spark, mm):
    from dataengineerchallenge_spark.operators.multimodal import payload_ahash

    return payload_ahash(mm).select(F.col("doc_id").alias("_id"), "fa", "fb")


def test_ahash_bits_are_integer_exact(spark):
    # closed form: payload of 64 bytes, first 32 high (255), last 32 low
    # (0) -> segments 0..31 above the global mean, 32..63 below
    import pandas as pd

    from dataengineerchallenge_spark.operators.multimodal import ahash_batches

    payload = bytes([255] * 32 + [0] * 32)
    pdf = pd.DataFrame({"doc_id": [1], "payload": [payload]})
    out = pd.concat(ahash_batches("fake")(iter([pdf])))
    assert out["fa"].tolist() == [0xFFFFFFFF]
    assert out["fb"].tolist() == [0]


def test_ahash_skips_short_payloads(spark):
    import pandas as pd

    from dataengineerchallenge_spark.operators.multimodal import ahash_batches

    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"x" * 63, b"y" * 64]})
    out = pd.concat(ahash_batches("fake")(iter([pdf])))
    assert out["doc_id"].tolist() == [2]


def test_banding_lossless_vs_naive_all_pairs(spark):
    # the pigeonhole pin on REAL fingerprints: banded pairs at hamming<=3
    # must equal the brute-force all-pairs join over the same frame
    from dataengineerchallenge_spark.operators.dedup import banded_hamming_pairs
    from dataengineerchallenge_spark.operators.multimodal import with_payloads
    from dataengineerchallenge_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    mm = with_payloads(docs).unionByName(
        with_payloads(docs, magic="MMv2", id_offset=1_000_000)
    )
    sh = _fingerprints(spark, mm).localCheckpoint()
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in banded_hamming_pairs(sh, max_hamming=3).collect()
    }
    a, b = sh.alias("a"), sh.alias("b")
    hm = F.bit_count(
        F.col("a.fa").bitwiseXOR(F.col("b.fa"))
    ) + F.bit_count(F.col("a.fb").bitwiseXOR(F.col("b.fb")))
    naive = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hm.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert banded == naive
    assert len(banded) > 0


def test_reencode_recall_dominates(spark):
    # the re-encode delivery is the query's raison d'etre: at hamming<=3
    # the bulk of MM1->MMv2 self-pairs must be found (header flips only
    # a few low segments), and misses must all be SHORT payloads where
    # the 4 header bytes span whole segments
    from dataengineerchallenge_spark.queries.multimodal import payload_near_dups
    from dataengineerchallenge_spark.sources.tables import load_table

    out = payload_near_dups(spark, SF_SMOKE)
    self_pairs = out.filter(~F.col("cross_doc")).count()
    eligible = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.length("text") + 4 >= 64)
        .count()
    )
    assert self_pairs / eligible > 0.9
