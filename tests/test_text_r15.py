"""r15 curation additions: benchmark decontamination + composed Gopher
repetition flag — closed-form pins on planted inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_decontamination_counts_match_planted_overlap(spark):
    from dataengineerchallenge_spark.queries.dedup import (
        _DECON_MOD,
        _DECON_N,
        benchmark_decontamination,
    )
    from dataengineerchallenge_spark.sources.tables import load_table

    out = {r["doc_id"]: r for r in benchmark_decontamination(spark, SF_SMOKE).collect()}
    # no eval doc may appear in the output, and every flagged doc's
    # shared-gram count is positive
    assert all(d % _DECON_MOD != 0 for d in out)
    assert all(r["n_shared_grams"] >= 1 for r in out.values())
    assert all(r["eval_doc_hits"] >= r["n_shared_grams"] for r in out.values())
    # brute-force recompute on the smoke fixture
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    ev_grams: dict[str, set] = {}
    for d, ws in docs.items():
        if d % _DECON_MOD == 0:
            for i in range(len(ws) - _DECON_N + 1):
                ev_grams.setdefault(" ".join(ws[i : i + _DECON_N]), set()).add(d)
    expect = {}
    for d, ws in docs.items():
        if d % _DECON_MOD == 0:
            continue
        shared = {
            " ".join(ws[i : i + _DECON_N])
            for i in range(len(ws) - _DECON_N + 1)
        } & ev_grams.keys()
        if shared:
            expect[d] = (len(shared), sum(len(ev_grams[g]) for g in shared))
    assert {d: (r["n_shared_grams"], r["eval_doc_hits"]) for d, r in out.items()} == expect


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
