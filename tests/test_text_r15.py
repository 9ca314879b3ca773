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
