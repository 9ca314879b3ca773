"""SemDeDup corpus rung (r15) + CCNet lang-quality grid invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_semantic_dedup_keep_one_invariants(spark):
    from dataengineerchallenge_spark.queries.vectors import semantic_dedup_corpus

    out = semantic_dedup_corpus(spark, SF_SMOKE).localCheckpoint()
    # kept <=> the row IS its cluster label (min-id survivor)
    assert out.filter(
        F.col("kept") != (F.col("vec_id") == F.col("semantic_cluster"))
    ).count() == 0
    # exactly one survivor per cluster, and it is the cluster minimum
    per = out.groupBy("semantic_cluster").agg(
        F.sum(F.col("kept").cast("int")).alias("n_kept"),
        F.min("vec_id").alias("mn"),
    )
    assert per.filter(F.col("n_kept") != 1).count() == 0
    assert per.filter(F.col("mn") != F.col("semantic_cluster")).count() == 0


def test_semantic_dedup_reembedding_recall(spark):
    # the three deliveries of one base vector are semantic dups by
    # construction (cosine >= 0.999); the only sanctioned miss is the
    # SemDeDup cluster-boundary split, which must stay rare
    from dataengineerchallenge_spark.queries.vectors import (
        _SEM_OFF,
        semantic_dedup_corpus,
    )

    out = semantic_dedup_corpus(spark, SF_SMOKE)
    base = out.select(
        (F.col("vec_id") % _SEM_OFF).alias("base_id"), "semantic_cluster"
    )
    per = base.groupBy("base_id").agg(
        F.count_distinct("semantic_cluster").alias("nc")
    )
    n = per.count()
    fully_merged = per.filter(F.col("nc") == 1).count()
    assert fully_merged / n > 0.9


def test_lang_quality_buckets_partition_and_share(spark):
    from dataengineerchallenge_spark.queries.text import (
        corpus_lang_quality_buckets,
        lang_quality_bucket_frame,
    )

    b = lang_quality_bucket_frame(spark, SF_SMOKE).localCheckpoint()
    g = corpus_lang_quality_buckets(spark, SF_SMOKE).localCheckpoint()
    # rollup partitions the per-doc frame exactly
    assert g.agg(F.sum("n_docs")).collect()[0][0] == b.count()
    # token_share sums to ~1 per language and every lang has 3 buckets
    per_lang = g.groupBy("lang").agg(
        F.sum("token_share").alias("s"), F.count(F.lit(1)).alias("nb")
    )
    for r in per_lang.collect():
        assert abs(r["s"] - 1.0) < 5e-3
        assert r["nb"] == 3
    # terciles: no bucket may exceed half its language's docs (ties can
    # skew past n/3, but a degenerate all-in-one bucket is a bug)
    tot = g.groupBy("lang").agg(F.sum("n_docs").alias("n"))
    skew = g.join(tot, "lang").filter(F.col("n_docs") > F.col("n") * 0.5)
    assert skew.count() == 0


def test_ccnet_grid_mix_rates(spark):
    from dataengineerchallenge_spark.queries.mixing import ccnet_grid_mix
    from dataengineerchallenge_spark.queries.text import lang_quality_bucket_frame

    kept = ccnet_grid_mix(spark, SF_SMOKE).localCheckpoint()
    b = lang_quality_bucket_frame(spark, SF_SMOKE)
    totals = {r["bucket"]: r["n"] for r in
              b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept_n = {r["bucket"]: r["n"] for r in
              kept.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    # head rate is 1.0: every head doc survives the hash acceptance
    assert kept_n.get("head", 0) == totals["head"]
    # tail is cut hard (rate 0.1): binomial bounds are loose on purpose
    assert kept_n.get("tail", 0) < totals["tail"] * 0.3


def test_hybrid_rrf_fusion_properties(spark, tmp_path):
    """RRF closed forms on a corpus engineered so the legs disagree:
    the doc strong in BOTH legs outranks the doc that tops one leg but
    misses the other; single-leg docs carry -1 in the missing leg."""
    import os

    # doc 0 is the seed (excluded). doc 1: contains query terms AND is
    # the semantic near-match. doc 2: lexically perfect, semantically
    # opposite. doc 3: semantic-only. doc 4: neither.
    docs = [
        (0, "vector stream hash seed", "en", "s", 23),
        (1, "vector stream other words here", "en", "s", 29),
        (2, "vector stream hash vector stream hash", "en", "s", 37),
        (3, "nothing relevant lexically", "en", "s", 26),
        (4, "completely unrelated text", "en", "s", 25),
    ]
    embs = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 0),   # near the seed
        (2, [-1.0, 0.0, 0.0], 1),   # opposite
        (3, [0.95, 0.2, 0.1], 0),   # near the seed
        (4, [0.0, 1.0, 0.0], 1),    # orthogonal
    ]
    sf = os.path.join(str(tmp_path), "rrf")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))

    from dataengineerchallenge_spark.queries.vectors import hybrid_search_rrf

    rows = hybrid_search_rrf(spark, sf).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    order = [r["doc_id"] for r in rows]
    # doc 1 is in both legs; doc 2 tops the lexical leg only (cosine
    # rank worst); doc 1 must outrank doc 2 and doc 3 (semantic-first)
    assert order[0] == 1
    assert by_doc[1]["lex_rank"] > 0 and by_doc[1]["sem_rank"] > 0
    # every returned doc has at least one positive leg rank, and a doc
    # absent from a leg carries the -1 sentinel, never null
    for r in rows:
        assert r["lex_rank"] >= -1 and r["sem_rank"] >= -1
        assert r["lex_rank"] > 0 or r["sem_rank"] > 0
        assert r["rrf_micropoints"] > 0
    # fusion math spot check for doc 1: 1/(60+l) + 1/(60+s) micropoints
    l, s_ = by_doc[1]["lex_rank"], by_doc[1]["sem_rank"]
    assert by_doc[1]["rrf_micropoints"] == round(
        (1.0 / (60 + l) + 1.0 / (60 + s_)) * 1_000_000
    )


def test_mmr_skips_redundant_near_duplicates(spark, tmp_path):
    """A near-duplicate cluster sits ~26 degrees off the seed; a diverse
    doc of comparable relevance sits ~27 degrees off on the OTHER side
    (mutual sim to the cluster only ~0.6). Pure relevance would take the
    whole cluster first; MMR must interleave: cluster top pick, then the
    diverse doc (its marginal objective beats the second copy's
    redundancy-crushed score), then the remaining copies."""
    import os

    embs = [
        (0, [1.0, 0.0, 0.0], 0),          # seed
        (1, [0.9, 0.4359, 0.0], 0),       # cluster: rel ~ 9000
        (2, [0.899, 0.438, 0.0], 0),      # cluster: rel ~ 8990, sim(c1) ~ 1
        (3, [0.898, 0.44, 0.0], 0),       # cluster: rel ~ 8980
        (4, [0.89, -0.456, 0.0], 1),      # diverse: rel ~ 8900, sim(c*) ~ .60
        (5, [0.0, 0.0, 1.0], 2),          # orthogonal filler
    ]
    sf = os.path.join(str(tmp_path), "mmr")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))

    from dataengineerchallenge_spark.queries.vectors import mmr_diversified_topk

    all_rows = sorted(
        mmr_diversified_topk(spark, sf).collect(), key=lambda r: r["mmr_rank"]
    )
    # pool of 5 candidates < k=10: the greedy stops at pool exhaustion
    assert len(all_rows) == 5
    order = [r["doc_id"] for r in all_rows]
    # relevance order would be 1,2,3,4,5; MMR lifts the diverse doc to
    # rank 2 past BOTH remaining near-copies
    assert order[:2] == [1, 4]
    assert set(order[2:4]) == {2, 3}
    assert order[4] == 5
    # pick 1 carries the no-redundancy sentinel; later picks a real obj
    assert all_rows[0]["mmr_obj"] == -1
    assert all(r["mmr_obj"] > 0 for r in all_rows[1:4])


def test_retrieval_eval_closed_form(spark, tmp_path):
    """Hand-computed precision/nDCG on a 4-candidate corpus where the
    cosine ranking interleaves relevant and irrelevant docs."""
    import os

    # seed label 0; relevant docs 1,3 (label 0); irrelevant 2,4 (label 1)
    embs = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.99, 0.1, 0.0], 0),    # cos rank 1, relevant
        (2, [0.95, 0.2, 0.0], 1),    # cos rank 2, irrelevant
        (3, [0.9, 0.3, 0.0], 0),     # cos rank 3, relevant
        (4, [0.0, 1.0, 0.0], 1),     # cos rank 4, irrelevant
    ]
    docs = [(i, "no query terms here", "en", "s", 19) for i in range(5)]
    sf = os.path.join(str(tmp_path), "reval")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(sf, "documents.parquet"))

    from dataengineerchallenge_spark.queries.vectors import (
        _NDCG_DISC,
        retrieval_eval_labels,
    )

    got = {r["method"]: r for r in retrieval_eval_labels(spark, sf).collect()}
    c = got["cosine"]
    assert c["hits_at_10"] == 2 and c["precision_at_10"] == 0.2
    # DCG: relevant at ranks 1 and 3; IDCG: 2 relevant -> ranks 1+2
    assert c["dcg_micropoints"] == _NDCG_DISC[1] + _NDCG_DISC[3]
    assert c["idcg_micropoints"] == _NDCG_DISC[1] + _NDCG_DISC[2]
    assert c["ndcg_micropoints"] == round(
        (_NDCG_DISC[1] + _NDCG_DISC[3]) * 1_000_000
        / (_NDCG_DISC[1] + _NDCG_DISC[2])
    )
    # no doc contains the BM25 terms, so the rrf list reduces to the
    # cosine leg's order: identical metrics
    assert got["rrf"]["ndcg_micropoints"] == c["ndcg_micropoints"]


def test_hard_negatives_are_wrong_label_and_ranked(spark, tmp_path):
    import os

    embs = [
        (0, [1.0, 0.0, 0.0], 0),      # query, label 0
        (1, [0.99, 0.14, 0.0], 0),    # same label: must NOT appear
        (2, [0.98, 0.2, 0.0], 1),     # hard negative (closest wrong)
        (3, [0.7, 0.71, 0.0], 1),     # easier negative
        (4, [0.0, 0.0, 1.0], 2),      # easy negative
    ]
    sf = os.path.join(str(tmp_path), "hneg")
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))
    from dataengineerchallenge_spark.queries.vectors import ann_hard_negatives

    rows = [r for r in ann_hard_negatives(spark, sf).collect() if r["query_id"] == 0]
    rows.sort(key=lambda r: r["neg_rank"])
    ids = [r["neg_id"] for r in rows]
    assert ids == [2, 3, 4]  # same-label doc 1 excluded, hardness order kept
    assert all(r["neg_label"] != r["query_label"] for r in rows)
    assert rows[0]["cos_bp"] > rows[1]["cos_bp"] > rows[2]["cos_bp"]
