"""Pins for the jusText-class HTML main-text extractor (VERDICT r16
next-round #3): boilerplate blocks must be dropped, body text must
survive byte-identically for every stopword-bearing document, and the
context-sensitive revision pass must behave per contract on
hand-built pages."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineerchallenge_spark.queries.extraction import (
    extract_main_text,
    extract_main_text_frame,
    wrap_documents_html,
)
from dataengineerchallenge_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_body_survives_iff_doc_has_stopwords(spark):
    """The recovery contract: body_intact == 1 exactly for docs with at
    least one stopword ('the'/'a'); zero-stop docs drop every body
    block (the documented jusText language-dependence) and keep NO
    boilerplate either."""
    out = extract_main_text(spark, SF_DIR)
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.size(
            F.filter(F.split("text", " "), lambda x: x.isin("the", "a"))
        ).alias("nstop"),
    )
    j = {r["doc_id"]: r for r in out.join(docs, "doc_id").collect()}
    assert len(j) == 500
    for r in j.values():
        if r["nstop"] > 0:
            assert r["body_intact"] == 1, r
            assert r["n_kept_blocks"] >= 1, r
        else:
            assert r["body_intact"] == 0 and r["n_kept_blocks"] == 0, r
        # boilerplate (head/nav/cookie/footer/tail = 5 non-body blocks)
        # must never be kept: kept count is bounded by body chunk count
        assert r["n_kept_blocks"] <= r["n_blocks"] - 5, r


def test_revision_pass_on_handbuilt_page(spark):
    """Context-sensitive revision per contract: a zero-stopword 'near'
    block between good blocks is revived; a short block with a bad
    neighbor is not; a link-dominated block is bad regardless."""
    body = (
        "the quick brown fox jumps over the lazy dog again and again ok "  # good
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "  # near
        "the second stopword bearing block closes out this tiny page ok"  # good
    ).split(" ")
    page = (
        "<html><head><title>t</title></head><body>"
        '<div class="nav"><a href="/">Home</a> <a href="/x">X</a> go</div>'
        + "".join(
            f"<p>{' '.join(body[i:i + 12])}</p>" for i in range(0, 36, 12)
        )
        + '<div class="footer">Copyright Terms</div></body></html>'
    )
    df = spark.createDataFrame(
        [(1, " ".join(body), page)], "doc_id long, text string, page string"
    )
    row = extract_main_text_frame(df).collect()[0]
    # head, nav, 3 body chunks, footer, tail
    assert row["n_blocks"] == 7
    assert row["n_kept_blocks"] == 3  # middle near-good block revived
    assert row["body_intact"] == 1


def test_wrap_is_reversible_chunking(spark):
    """The wrap's ceil-even chunking must partition the token stream:
    stripping tags from the <p> blocks and rejoining reproduces text
    for every fixture doc (independent of the classifier)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    w = wrap_documents_html(docs)
    rebuilt = w.select(
        "doc_id",
        "text",
        F.array_join(
            F.expr(
                "transform(filter(split(page, '</p>'), b -> b like '%<p>%'),"
                " b -> regexp_replace(b, '^.*<p>', ''))"
            ),
            " ",
        ).alias("back"),
    )
    assert rebuilt.filter(F.col("back") != F.col("text")).count() == 0
