"""Round-16 text pins: Kneser-Ney perplexity against a pure-python
reference implementation of the interpolated-KN formula on a tiny
hand-checkable corpus, plus ordering sanity on the fixture."""

from __future__ import annotations

import math
from collections import Counter

from dataengineerchallenge_spark.queries.text import (
    _KN_DISCOUNT,
    kn_perplexity_frame,
)

SF_DIR = "/root/testdata/sf0.001"


def _kn_reference(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    """(n_bigrams, bits_micropoints) per doc via the textbook formula,
    replicating the operator's nano-point rounding discipline."""
    bgs = {
        did: [
            (ws[i], ws[i + 1])
            for ws in [t.split(" ")]
            for i in range(len(ws) - 1)
        ]
        for did, t in texts.items()
    }
    all_bg = [b for lst in bgs.values() for b in lst]
    cbg = Counter(all_bg)
    cctx = Counter(b[0] for b in all_bg)
    types = set(all_bg)
    n1f = Counter(b[0] for b in types)
    n1b = Counter(b[1] for b in types)
    tt = len(types)
    out = {}
    for did, lst in bgs.items():
        nanos = []
        for b in lst:
            p = (cbg[b] - _KN_DISCOUNT) / cctx[b[0]] + _KN_DISCOUNT * n1f[
                b[0]
            ] / cctx[b[0]] * (n1b[b[1]] / tt)
            nanos.append(round(-math.log2(p) * 1e9))
        out[did] = (len(lst), round(sum(nanos) / (len(lst) * 1000.0)))
    return out


def test_kn_matches_reference_on_tiny_corpus(spark):
    texts = {
        1: "san francisco is in california",
        2: "san diego is in california too",
        3: "francisco san francisco is nice",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["bits_micropoints"])
        for r in kn_perplexity_frame(docs).collect()
    }
    assert got == _kn_reference(texts)


def test_kn_continuation_signal(spark):
    """KN's signature: a next-word seen MANY times but after only one
    context ("francisco" after "san") must carry LESS continuation
    mass than a word following many contexts. Bigram "q francisco"
    (novel context, backoff-dominated) must therefore cost MORE bits
    than "q is" at equal bigram count — Laplace can't separate them."""
    texts = {
        1: "san francisco san francisco san francisco",
        2: "a is b is c is d is",
        3: "q francisco x",
        4: "q is y",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["bits_micropoints"] for r in kn_perplexity_frame(docs).collect()}
    assert rows[3] > rows[4]


def test_kn_fixture_bits_positive_and_bounded(spark):
    from dataengineerchallenge_spark.sources.tables import load_table

    f = kn_perplexity_frame(load_table(spark, SF_DIR, "documents"))
    rows = f.collect()
    assert len(rows) == 500
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert 0 < r["bits_micropoints"] < 40_000_000  # < 40 bits/bigram
        assert r["perplexity"] > 1.0


def test_pmi_respects_support_floor_and_agrees_with_counts(spark):
    from dataengineerchallenge_spark.queries.text import token_pmi_collocations

    rows = token_pmi_collocations(spark, SF_DIR).collect()
    assert len(rows) == 20
    assert all(r["n_cooccur"] >= 5 for r in rows)
    # descending PMI with bigram tie-break
    keys = [(-r["pmi_micropoints"], r["bigram"]) for r in rows]
    assert keys == sorted(keys)


def test_jsd_bounds_and_symmetric_pairs(spark):
    import math

    from dataengineerchallenge_spark.queries.text import source_jsd_matrix

    rows = source_jsd_matrix(spark, SF_DIR).collect()
    assert len(rows) == 190  # C(20, 2) unordered pairs
    ln2_micro = math.log(2) * 1_000_000
    for r in rows:
        assert r["source_a"] < r["source_b"]  # canonical unordered key
        assert 0 <= r["jsd_micropoints"] <= ln2_micro + 1
