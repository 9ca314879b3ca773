"""Round-16 pins (VERDICT r15 next-round #2):

suffix_dup_spans — the exact-ExactSubstr half of Lee et al. 2022 via
suffix keys + the two-level global rank — must

- reproduce hand-computable maximal spans on a planted corpus,
  including a 4-word duplicate every 5-gram clips and a long quoted
  block reported as ONE maximal extent;
- be a coverage SUPERSET of the fixed 5-gram pass at threshold 4
  (every gram-covered position falls inside some suffix span) while
  finding at least one 4-word span the gram pass misses entirely;
- heal key truncation: span extents are identical for any key budget
  >= the threshold (the interval-merge losslessness argument).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators import dedup as D
from dataengineerchallenge_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def qs():
    return queries()


def _spans(df):
    return sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["span_len"])
        for r in df.collect()
    )


def test_suffix_spans_planted_corpus(spark):
    """Hand-checked maximal extents: a 4-word duplicate (clipped by any
    5-gram), a 7-word quoted block as one extent, and a unique doc."""
    rows = [
        # docs 1/2 share exactly "q w e r" (4 words) at positions 1 and 0
        (1, "x q w e r y z a b"),
        (2, "q w e r k l m n o"),
        # docs 3/4 share the 7-word block "c1 c2 c3 c4 c5 c6 c7"
        (3, "h1 h2 c1 c2 c3 c4 c5 c6 c7 t1"),
        (4, "c1 c2 c3 c4 c5 c6 c7 u1 u2 u3"),
        (5, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _spans(D.suffix_dup_span_frame(df, "doc_id", "text", min_len=4, key_words=24))
    assert got == [
        (1, 1, 5, 4),
        (2, 0, 4, 4),
        (3, 2, 9, 7),
        (4, 0, 7, 7),
    ]


def test_suffix_spans_merge_overlaps_and_self_repeats_dont_count(spark):
    """Two cross-doc spans overlapping in one doc merge into one maximal
    extent; a phrase repeated only WITHIN one doc is not duplication."""
    rows = [
        # doc 1 overlaps doc 2 on words 0-4 ("a b c d e") and doc 3 on
        # words 3-7 ("d e f g h") -> one merged extent [0, 8)
        (1, "a b c d e f g h"),
        (2, "a b c d e z1 z2 z3"),
        (3, "y1 y2 d e f g h y3"),
        # doc 4 repeats its own 4-gram twice; no other doc has it
        (4, "p q r s k p q r s"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = _spans(D.suffix_dup_span_frame(df, "doc_id", "text", min_len=4, key_words=24))
    assert (1, 0, 8, 8) in got
    assert [g for g in got if g[0] == 4] == []


def test_suffix_spans_superset_of_gram_pass_and_finds_clipped(spark, qs):
    """On the fixture corpus: every position the 5-gram pass covers lies
    inside a suffix span (threshold 4 < gram size 5), and at least one
    4-word span exists whose positions the gram pass never covers —
    the boundary the fixed pass clips (VERDICT r15 #2's 'pin')."""
    spans = _spans(qs["suffix_dup_spans"](spark, SF_DIR))
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for d, s, e, _ in spans:
        by_doc.setdefault(d, []).append((s, e))

    # recompute the 5-gram covered positions exactly as dup_span does
    from dataengineerchallenge_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    base = docs.select(F.col("doc_id").alias("_id"), F.col("text").alias("_txt"))
    words = F.split(F.col("_txt"), " ")
    k = F.size(words) - F.lit(4)
    gram_at = lambda i: F.struct(  # noqa: E731
        i.alias("start"), F.concat_ws(" ", F.slice(words, i + 1, 5)).alias("g")
    )
    grams = F.when(k > 0, F.transform(F.sequence(F.lit(0), k - 1), gram_at)).otherwise(
        F.array().cast("array<struct<start:int,g:string>>")
    )
    sh = base.select("_id", F.explode(grams).alias("_s")).select(
        "_id", F.col("_s.start").alias("start"), F.col("_s.g").alias("g")
    )
    dup = (
        sh.groupBy("g")
        .agg(F.count_distinct("_id").alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("g")
    )
    covered = (
        sh.join(dup, "g")
        .select(
            "_id",
            F.explode(F.sequence(F.col("start"), F.col("start") + 4)).alias("pos"),
        )
        .distinct()
        .collect()
    )
    cov = {(r["_id"], r["pos"]) for r in covered}
    assert cov, "fixture lost its shared 5-grams"

    def in_span(d, p):
        return any(s <= p < e for s, e in by_doc.get(d, []))

    missing = [dp for dp in cov if not in_span(*dp)]
    assert missing == [], f"gram-covered positions outside suffix spans: {missing[:5]}"

    clipped = [
        (d, s, e)
        for d, s, e, ln in spans
        if ln == 4 and all((d, p) not in cov for p in range(s, e))
    ]
    assert clipped, "expected a 4-word span the 5-gram pass clips"


def test_suffix_spans_truncation_invariant(spark):
    """Key budgets 4 (= threshold) and 64 give identical maximal extents:
    interval merge heals truncation for any key_words >= min_len."""
    rows = [
        (1, "w1 " + " ".join(f"s{i}" for i in range(12)) + " w2"),
        (2, " ".join(f"s{i}" for i in range(12)) + " v1 v2"),
        (3, "u1 u2 u3 u4 u5 u6 u7"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tight = _spans(D.suffix_dup_span_frame(df, "doc_id", "text", min_len=4, key_words=4))
    wide = _spans(D.suffix_dup_span_frame(df, "doc_id", "text", min_len=4, key_words=64))
    assert tight == wide
    assert (1, 1, 13, 12) in tight and (2, 0, 12, 12) in tight
