"""r15 curation addition: the composed Gopher repetition flag —
closed-form pin against the raw component scores."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_gopher_flag_composition(spark):
    from dataengineerchallenge_spark.queries.text import doc_gopher_repetition_flags

    out = {
        r["doc_id"]: r
        for r in doc_gopher_repetition_flags(spark, SF_SMOKE).collect()
    }
    # fixture docs draw words ~uniformly, so top-word shares stay low and
    # the flag composes with the n-gram rules: recompute the flag from
    # the published thresholds over the raw components
    from dataengineerchallenge_spark.queries.text import doc_repetition_scores
    from dataengineerchallenge_spark.sources.tables import load_table

    frac = {
        r["doc_id"]: (r["dup_bigram_frac"], r["dup_trigram_frac"])
        for r in doc_repetition_scores(spark, SF_SMOKE).collect()
    }
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    for d, r in out.items():
        ws = docs[d]
        top = max(ws.count(w) for w in set(ws)) / len(ws)
        want = top > 0.20 or frac[d][0] > 0.30 or frac[d][1] > 0.20
        assert r["repetitive"] == want, d
        assert abs(r["top_word_share"] - round(top, 4)) < 1e-9


def test_rake_closed_form(spark, tmp_path):
    """Hand-computed RAKE on a two-stopword toy doc: phrases split at
    'the'/'a', degree = sum of containing-phrase lengths, phrase score
    = sum of member degrees, tie broken alphabetically."""
    import os

    rows = [(1, "deep learning the deep model a fast model", "en", "s", 41)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = os.path.join(str(tmp_path), "rake")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    from dataengineerchallenge_spark.queries.text import rake_keyphrases

    got = [
        (r["kp_rank"], r["phrase"], r["n_words"], r["deg_score"], r["ratio_score"])
        for r in rake_keyphrases(spark, sf).orderBy("kp_rank").collect()
    ]
    # deg: deep=4, learning=2, model=4, fast=2 (each word's containing
    # phrases are length 2); scores: deep model=8, deep learning=6,
    # fast model=6; every deg/freq ratio is 2.0 so ratios are 4.0 each
    assert got == [
        (1, "deep model", 2, 8, 4.0),
        (2, "deep learning", 2, 6, 4.0),
        (3, "fast model", 2, 6, 4.0),
    ]


def test_rake_all_stopword_and_repeated_phrase(spark, tmp_path):
    import os

    rows = [
        (1, "the a the", "en", "s", 9),  # no candidates at all
        (2, "hot cake the hot cake", "en", "s", 21),  # duplicate phrase
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = os.path.join(str(tmp_path), "rake2")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    from dataengineerchallenge_spark.queries.text import rake_keyphrases

    rows_out = rake_keyphrases(spark, sf).collect()
    assert {r["doc_id"] for r in rows_out} == {2}
    # the repeated candidate collapses to ONE row, scored from both
    # occurrences: hot/cake freq 2 deg 4 -> phrase deg_score 8
    assert len(rows_out) == 1
    r = rows_out[0]
    assert (r["phrase"], r["deg_score"], r["ratio_score"]) == ("hot cake", 8, 4.0)


def test_token_weighted_percentiles_closed_form(spark, tmp_path):
    """One 60-token high-quality doc vs three 3-token low-quality docs:
    the doc-weighted median is a small doc's quality, the token-weighted
    median the big doc's — the doc/token distinction the rung exists
    for. Recomputed by hand from the quality_frame definition."""
    import os

    big = " ".join(f"w{i}" for i in range(60))  # 60 distinct words
    small = "x x x"
    rows = [(1, big, "en", "s", len(big))] + [
        (i, small, "en", "s", 5) for i in (2, 3, 4)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = os.path.join(str(tmp_path), "twq")
    df.write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    from dataengineerchallenge_spark.queries.text import (
        token_weighted_quality_percentiles,
    )

    got = {
        r["pct"]: (r["doc_weighted_quality"], r["token_weighted_quality"])
        for r in token_weighted_quality_percentiles(spark, sf).collect()
    }
    # quality(big): 0.4*1 + 0.3*1.0 (ttr 60/60) + 0.3*1.0 (no stopwords) = 1.0
    # quality(small): 0.4*(3/50) + 0.3*round(1/3,4) + 0.3*1 = 0.42399
    q_small = round(0.4 * (3 / 50.0) + 0.3 * round(1 / 3, 4) + 0.3, 5)
    # docs: 4 docs sorted [s,s,s,big]; p50 rank ceil(2)=2 -> small
    assert got[50][0] == q_small
    # tokens: W=69; p50 threshold ceil(34.5)=35; cum [3,6,9,69] -> big doc
    assert got[50][1] == 1.0
    # p90 doc rank ceil(3.6)=4 -> the big doc on both axes
    assert got[90] == (1.0, 1.0)
    # p25: doc rank 1 -> small; token threshold ceil(17.25)=18 -> big
    assert got[25] == (q_small, 1.0)


def test_lang_id_confusion_diagonal_and_shares(spark):
    """The confusion matrix must agree with doc_lang_id's predictions
    joined to truth, rows normalize to 1e6, and the fixture's scorer
    keeps a dominant diagonal."""
    from tests.conftest import SF_SMOKE

    from dataengineerchallenge_spark.queries.text import (
        doc_lang_id,
        lang_id_confusion,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    cm = lang_id_confusion(spark, SF_SMOKE).collect()
    # reconstruct from the registered predictor + truth
    truth = {
        r["doc_id"]: r["lang"]
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    from collections import Counter

    want = Counter(
        (truth[r["doc_id"]], r["pred_lang"])
        for r in doc_lang_id(spark, SF_SMOKE).collect()
    )
    got = {(r["true_lang"], r["pred_lang"]): r["n_docs"] for r in cm}
    assert got == dict(want)
    # rows normalize to ~1e6 micropoints
    from collections import defaultdict

    sums = defaultdict(int)
    for r in cm:
        sums[r["true_lang"]] += r["share_mp"]
    assert all(abs(v - 1_000_000) <= len(cm) for v in sums.values())
    # diagonal dominance: every class's top cell is its own diagonal
    best = {}
    for r in cm:
        cur = best.get(r["true_lang"])
        if cur is None or r["n_docs"] > cur[1]:
            best[r["true_lang"]] = (r["pred_lang"], r["n_docs"])
    assert all(p == t for t, (p, _) in best.items())
