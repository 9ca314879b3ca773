"""Pins for the staged inverted-index retrieval family
(queries/search.py): serve == inline row-for-row, the physical plan
actually prunes (DPP on the bucket partitions + pushed term literal),
and phrase adjacency agrees with a brute-force recount.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.search import (
    _PHRASE,
    _staged_inverted_index,
    conjunctive_search_inverted_staged,
    phrase_search_inverted,
    phrase_search_inverted_staged,
    postings_frame,
)
from dataengineerchallenge_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_staged_serve_equals_inline(spark):
    inline = sorted(
        tuple(r) for r in phrase_search_inverted(spark, SF_DIR).collect()
    )
    served = sorted(
        tuple(r) for r in phrase_search_inverted_staged(spark, SF_DIR).collect()
    )
    assert inline == served and len(inline) > 0


def test_phrase_matches_brute_force(spark):
    docs = load_table(spark, SF_DIR, "documents")
    w1, w2 = _PHRASE
    brute = (
        docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.expr(
                        "transform(sequence(0, size(split(text, ' ')) - 2),"
                        f" i -> split(text, ' ')[i] = '{w1}'"
                        f" and split(text, ' ')[i + 1] = '{w2}')"
                    ),
                    lambda x: x,
                )
            ).alias("n"),
        )
        .filter(F.col("n") >= 1)
        .collect()
    )
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search_inverted_staged(spark, SF_DIR).collect()
    }
    assert got == {r["doc_id"]: r["n"] for r in brute}


def test_serve_plan_prunes_partitions_and_pushes_terms(spark):
    df = phrase_search_inverted_staged(spark, SF_DIR)
    df.collect()  # executed plan (post-AQE) carries the final scans
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression(bucket" in plan
    assert "In(term, [" in plan  # literal IN pushed into the scan


def test_postings_store_layout(spark):
    path = _staged_inverted_index(spark, SF_DIR)
    store = spark.read.parquet(f"{path}/postings")
    # bucket is a partition column; postings carry sorted positions
    assert set(store.columns) == {"term", "doc_id", "tf", "positions", "bucket"}
    bad = store.filter(
        F.col("positions") != F.sort_array("positions")
    ).count()
    assert bad == 0
    # tf equals the positions length (one posting row per (term, doc))
    assert store.filter(F.col("tf") != F.size("positions")).count() == 0
    # postings reconstruct the corpus token count exactly
    n_tokens = (
        load_table(spark, SF_DIR, "documents")
        .select(F.size(F.split("text", " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert store.agg(F.sum("tf")).collect()[0][0] == n_tokens


def test_conjunctive_requires_all_terms(spark):
    rows = conjunctive_search_inverted_staged(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, SF_DIR, "documents")
        .filter(F.col("doc_id").isin([r["doc_id"] for r in rows]))
        .collect()
    }
    for r in rows:
        ws = docs[r["doc_id"]].split(" ")
        assert all(t in ws for t in ("vector", "stream", "hash"))
        assert r["score"] == sum(
            ws.count(t) for t in ("vector", "stream", "hash")
        )


def test_online_maintenance_equals_rebuild_and_multibatch(spark):
    """The online-maintained postings (history + streamed deltas) must
    equal the full-corpus rebuild row-for-row, and the drain must have
    processed >= 2 micro-batches (3 one-file triggers)."""
    from dataengineerchallenge_spark.queries.search import stream_postings_merge

    epochs: list = []
    maintained = stream_postings_merge(spark, SF_DIR, epochs=epochs)
    assert len(epochs) >= 2
    full = postings_frame(load_table(spark, SF_DIR, "documents"))
    key = lambda r: (r["term"], r["doc_id"])  # noqa: E731
    got = {
        key(r): (r["tf"], tuple(r["positions"]), r["bucket"])
        for r in maintained.collect()
    }
    want = {
        key(r): (r["tf"], tuple(r["positions"]), r["bucket"])
        for r in full.collect()
    }
    assert got == want


def test_bm25_served_equals_scan_path(spark):
    """The index-served BM25 must reproduce the scan-path top-20
    (identical arithmetic, df from postings, dl/stats from the store)."""
    from dataengineerchallenge_spark.queries.search import (
        bm25_search_inverted_staged,
    )
    from dataengineerchallenge_spark.queries.text import bm25_keyword_search

    served = [tuple(r) for r in bm25_search_inverted_staged(spark, SF_DIR).collect()]
    scan = [tuple(r) for r in bm25_keyword_search(spark, SF_DIR).collect()]
    assert served == scan and len(served) == 20
