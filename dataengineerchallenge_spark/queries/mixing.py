"""Training-mix construction: importance resampling by quality and
domain mixing to target source proportions — the sampling stage that
turns a curated corpus into a pretraining mixture.

Both use content-hash acceptance (md5 of the doc key), NOT ``df.sample``:
RNG samples depend on engine, seed plumbing and partitioning, while a
hash threshold is bit-reproducible across engines, reruns and
repartitionings — so the DuckDB twin hash-matches row for row, and at
100 TB the predicate is a per-row map that pushes to the scan (the only
shuffles here are the tiny per-source/global count aggregates, which
broadcast back into the row predicate)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineerchallenge_spark.functions.hashing import duck_u32, spark_u32
from dataengineerchallenge_spark.queries.text import quality_frame
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table

_HEX = "0123456789abcdef"
# first md5 byte of the doc key as an integer 0..255 (same recipe as
# events_hash_sample; strpos/instr spelled per engine)
_SPARK_BUCKET = (
    "(instr('{hex}', substring(md5(cast(doc_id as string)), 1, 1)) - 1) * 16 "
    "+ instr('{hex}', substring(md5(cast(doc_id as string)), 2, 1)) - 1"
).format(hex=_HEX)
_DUCK_BUCKET = (
    "(strpos('{hex}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 "
    "+ strpos('{hex}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1"
).format(hex=_HEX)


@register(
    "importance_resample_by_quality",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_words,
             round(len(list_filter(string_split(text, ' '),
                       w -> list_contains(['the', 'a'], w)))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS stopword_ratio,
             round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS type_token_ratio
      FROM documents
    ), q AS (
      SELECT doc_id, source,
             round(0.4 * least(n_words / 50.0, 1.0)
                   + 0.3 * type_token_ratio
                   + 0.3 * (1.0 - stopword_ratio), 5) AS quality
      FROM m
    ), mx AS (SELECT max(quality) AS qmax FROM q)
    SELECT doc_id, source, quality
    FROM q, mx
    WHERE ({_DUCK_BUCKET}) / 256.0
          < (quality / qmax) * (quality / qmax)
    """,
)
def importance_resample_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-temperature resampling: each doc survives with probability
    (quality/q_max)^2 — temperature 2 upweights high-quality documents
    smoothly instead of a hard threshold cut. The acceptance draw is the
    doc's md5 bucket, the probability an exact float expression (explicit
    multiply, not pow(), so both engines execute identical IEEE ops).
    q_max is a 1-row aggregate crossJoined (broadcast) into the per-row
    predicate — fully lazy, no driver round-trip."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_frame(docs).select("doc_id", "source", "quality")
    qmax = q.agg(F.max("quality").alias("qmax"))
    p = (F.col("quality") / F.col("qmax")) * (F.col("quality") / F.col("qmax"))
    return (
        q.crossJoin(F.broadcast(qmax))
        .filter(F.expr(_SPARK_BUCKET) / 256.0 < p)
        .select("doc_id", "source", "quality")
    )


@register(
    "corpus_mix_by_source",
    oracle=f"""
    WITH w AS (
      SELECT source, count(*) AS n_s,
             CASE WHEN CAST(regexp_extract(source, '[0-9]+') AS INT) % 2 = 0
                  THEN 2.0 ELSE 1.0 END AS wt
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(wt) AS wsum, SUM(n_s) AS n FROM w
    ), rates AS (
      SELECT w.source,
             least(1.0, (w.wt / tot.wsum) * 0.5 * tot.n / w.n_s) AS r
      FROM w, tot
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates ON rates.source = d.source
    WHERE ({_DUCK_BUCKET}) / 256.0 < rates.r
    """,
)
def corpus_mix_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: sample each source at the rate that makes the kept
    corpus (~50% of the total) match TARGET proportions — here a
    deterministic 2:1 weighting of even- over odd-numbered sources.
    rate_s = min(1, share_s · keep_total / n_s), computed from two tiny
    aggregates (per-source counts + their weighted sum) broadcast back
    into a per-row hash-acceptance predicate. This is the knob a
    pretraining mix actually turns: domain weights, not per-row
    quality."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_s")).withColumn(
        "wt",
        F.when(
            F.regexp_extract("source", "[0-9]+", 0).cast("int") % 2 == 0, F.lit(2.0)
        ).otherwise(F.lit(1.0)),
    )
    tot = w.agg(F.sum("wt").alias("wsum"), F.sum("n_s").alias("n"))
    rates = w.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0), (F.col("wt") / F.col("wsum")) * 0.5 * F.col("n") / F.col("n_s")
        ).alias("r"),
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .filter(F.expr(_SPARK_BUCKET) / 256.0 < F.col("r"))
        .select("doc_id", "source")
    )


# 32-bit uniform from the first 8 md5 nibbles of the doc key — the
# Efraimidis-Spirakis draw needs more resolution than the 1-byte
# acceptance bucket above (ties in an 8-bit u would make top-k order
# depend on the tie-break far too often). Shared construct:
# functions/hashing.py (the HLL sketch draws from the same well).
_DUCK_U32 = duck_u32("doc_id")

_ES_K = 100


@register(
    "weighted_sample_docs",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             len(string_split(text, ' ')) AS n_words,
             round(len(list_filter(string_split(text, ' '),
                       w -> list_contains(['the', 'a'], w)))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS stopword_ratio,
             round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                   / len(string_split(text, ' ')), 4) AS type_token_ratio
      FROM documents
    ), q AS (
      SELECT doc_id, source,
             round(0.4 * least(n_words / 50.0, 1.0)
                   + 0.3 * type_token_ratio
                   + 0.3 * (1.0 - stopword_ratio), 5) AS quality
      FROM m
    ), keyed AS (
      SELECT doc_id, source, quality,
             round(ln((({_DUCK_U32}) + 0.5) / 4294967296.0) / quality, 8) AS es_key
      FROM q
    )
    SELECT doc_id, source, quality,
           CAST(row_number() OVER (ORDER BY es_key DESC, doc_id) AS BIGINT)
             AS sel_rank
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {_ES_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact sample size k=100:
    the Efraimidis-Spirakis exponential race (each doc draws priority
    u^(1/w) — equivalently ln(u)/w — and the k largest priorities are the
    sample, inclusion probability proportional to weight w = quality).
    The uniform u is the doc's first-8-md5-nibbles integer, so the draw
    is bit-reproducible across engines/reruns/partitionings like every
    sampler in this module; priorities are rounded to 8 decimals BEFORE
    ranking (ln() may differ between libms in the last ulp; the 1e-8 grid
    snaps both engines to the same order) with doc_id as the total-order
    tie-break.

    Scale: the plan is a per-row map + TakeOrderedAndProject — each
    partition keeps its local top-k and only k-row heaps reach the
    driver-side merge; no global sort, no shuffle of the corpus. This is
    the exact-k complement to ``importance_resample_by_quality``'s
    acceptance sampling (which keeps probability exact but only the
    EXPECTED sample size)."""
    docs = load_table(spark, sf_dir, "documents")
    q = quality_frame(docs).select("doc_id", "source", "quality")
    return es_weighted_sample(q, "doc_id", "quality", _ES_K).select(
        "doc_id", "source", "quality", "sel_rank"
    )


def es_weighted_sample(df: DataFrame, id_col: str, weight_col: str, k: int) -> DataFrame:
    """Efraimidis-Spirakis exact-k weighted sample of ``df`` (weights
    must be > 0): appends ``es_key`` (rounded priority) and ``sel_rank``
    (1..k) to the k selected rows. Deterministic in the id column alone —
    the uniform draw is md5-derived, the ranking grid-snapped, ties
    broken by id."""
    u = (F.expr(spark_u32(id_col)) + 0.5) / F.lit(4294967296.0)
    keyed = df.withColumn(
        "es_key", F.round(F.log(u) / F.col(weight_col), 8)
    )
    topk = keyed.orderBy(F.desc("es_key"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("es_key"), F.asc(id_col))
    return topk.withColumn("sel_rank", F.row_number().over(w).cast("long"))


# CCNet grid sampling rates: keep the fluent head whole, halve the
# middle, keep a tail sliver for diversity — the downsample-by-quality
# practice Wenzek et al. describe. Literals shared verbatim by the
# Spark predicate and the DuckDB twin.
_GRID_RATES = {"head": "1.0", "middle": "0.5", "tail": "0.1"}


def _grid_mix_oracle() -> str:
    from dataengineerchallenge_spark.queries.text import LANG_QUALITY_GRID_CTES

    case = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _GRID_RATES.items()
    )
    return f"""
    WITH {LANG_QUALITY_GRID_CTES}
    SELECT doc_id, pred_lang AS lang, bucket
    FROM b
    WHERE ({_DUCK_BUCKET}) / 256.0 < CASE bucket {case} END
    """


@register("ccnet_grid_mix", oracle=_grid_mix_oracle())
def ccnet_grid_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampling stage fed by `corpus_lang_quality_buckets` (VERDICT
    r14 #3 bonus): draw the pretraining mix from the lang x perplexity-
    tercile grid — head kept whole, middle at 0.5, tail at 0.1 — using
    the repo's content-hash acceptance (md5 bucket of the doc key), so
    the kept set is bit-reproducible across engines, reruns and
    repartitionings, exactly like every other mixing rung here. The
    grid assignment frame is shared with the bucketing rollup
    (queries/text.py:lang_quality_bucket_frame); sampling adds one
    per-row map predicate — no new shuffle at any scale."""
    from dataengineerchallenge_spark.queries.text import lang_quality_bucket_frame

    rate = F.when(F.col("bucket") == "head", F.lit(1.0)).when(
        F.col("bucket") == "middle", F.lit(0.5)
    ).otherwise(F.lit(0.1))
    return (
        lang_quality_bucket_frame(spark, sf_dir)
        .filter(F.expr(_SPARK_BUCKET) / 256.0 < rate)
        .select("doc_id", F.col("pred_lang").alias("lang"), "bucket")
    )


@register("ccnet_grid_mix_staged", oracle=_grid_mix_oracle())
def ccnet_grid_mix_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVE rung of `ccnet_grid_mix`: the mix draw reads the staged
    per-doc signal store (queries/text.py:_staged_lang_quality_signals)
    and applies only the hash-acceptance predicate — re-drawing a mix
    with different rates costs one scan, which is the CCNet production
    lifecycle (scores frozen per snapshot, mixes re-drawn freely).
    Same oracle, same hash as the inline twin."""
    from dataengineerchallenge_spark.queries.text import (
        _staged_lang_quality_signals,
    )

    b = spark.read.parquet(_staged_lang_quality_signals(spark, sf_dir))
    rate = F.when(F.col("bucket") == "head", F.lit(1.0)).when(
        F.col("bucket") == "middle", F.lit(0.5)
    ).otherwise(F.lit(0.1))
    return b.filter(F.expr(_SPARK_BUCKET) / 256.0 < rate).select(
        "doc_id", F.col("pred_lang").alias("lang"), "bucket"
    )


_NEG_PROBES = 10
_NEG_K = 3


def _neg_oracle() -> str:
    key = "CAST(c AS VARCHAR) || ':' || CAST(j AS VARCHAR)"
    return f"""
    WITH pos AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS item
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    np AS (SELECT COUNT(*) AS n_items FROM part),
    users AS (SELECT DISTINCT c FROM pos),
    probes AS (
      SELECT u.c, j, ({duck_u32(key)}) % np.n_items AS cand
      FROM users u CROSS JOIN (SELECT unnest(range(0, {_NEG_PROBES})) AS j)
      CROSS JOIN np
    ),
    negs AS (
      SELECT p.c, p.j, p.cand FROM probes p
      LEFT JOIN pos ON pos.c = p.c AND pos.item = p.cand
      WHERE pos.c IS NULL
    ),
    dedup AS (
      SELECT c, j, cand,
             ROW_NUMBER() OVER (PARTITION BY c, cand ORDER BY j) AS dup_rn
      FROM negs
    ),
    ranked AS (
      SELECT c, j, cand,
             ROW_NUMBER() OVER (PARTITION BY c ORDER BY j) AS rn
      FROM dedup WHERE dup_rn = 1
    )
    SELECT c AS custkey,
           CAST(j AS BIGINT) AS probe_idx,
           CAST(cand AS BIGINT) AS neg_partkey
    FROM ranked WHERE rn <= {_NEG_K}
    """


@register("purchase_negative_samples", oracle=_neg_oracle())
def purchase_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic NEGATIVE SAMPLING for recommendation / contrastive
    training pairs: for every purchasing customer, up to 3 parts they
    have NEVER bought, drawn by hash-probe rejection (probe j's
    candidate is md5-u32(custkey:j) mod |parts|; reject probes that hit
    the positive set or repeat an earlier candidate, keep the first 3
    survivors by probe order). The md5 probe stream is the repo's
    cross-engine hash construct, so sampling is bit-reproducible across
    engines, reruns, and repartitionings — no RNG state anywhere.

    Scale shape: this is how negative sampling avoids the |users| x
    |items| cross join — work is a CONSTANT 10 probe rows per user, and
    the single big operation is the probes-vs-positives left-anti join,
    an equi-join on (custkey, partkey) that shuffles 10|users| rows
    against the distinct-pairs frame. A user whose probes all collide
    with positives yields fewer than 3 negatives (probability (r/|P|)^10
    at positive rate r — raise the probe budget, not a driver loop);
    parts are contiguously keyed 0..n-1 so mod maps straight to a key,
    a dimension-table property the fixture shares with TPC-H."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pos = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("item"))
        .distinct()
    )
    n_items = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).alias("n_items")
    )
    users = pos.select("c").distinct()
    key = "CAST(c AS STRING) || ':' || CAST(j AS STRING)"
    probes = (
        users.crossJoin(
            F.broadcast(
                users.sparkSession.range(_NEG_PROBES).select(
                    F.col("id").cast("int").alias("j")
                )
            )
        )
        .crossJoin(F.broadcast(n_items))
        .withColumn("cand", F.expr(spark_u32(key)) % F.col("n_items"))
    )
    negs = probes.join(pos, (probes["c"] == pos["c"]) & (probes["cand"] == pos["item"]), "left_anti")
    w_dup = Window.partitionBy("c", "cand").orderBy("j")
    w_rank = Window.partitionBy("c").orderBy("j")
    return (
        negs.withColumn("dup_rn", F.row_number().over(w_dup))
        .filter(F.col("dup_rn") == 1)
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _NEG_K)
        .select(
            F.col("c").alias("custkey"),
            F.col("j").cast("long").alias("probe_idx"),
            F.col("cand").cast("long").alias("neg_partkey"),
        )
    )


@register(
    "source_quantile_normalize_length",
    oracle="""
    WITH d AS (
      SELECT doc_id, source, strlen(text) AS n_chars FROM documents
    ),
    tot AS (SELECT COUNT(*) AS nn FROM d),
    per_src AS (SELECT source, COUNT(*) AS ns FROM d GROUP BY source),
    ranked AS (
      SELECT d.doc_id, d.source, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY d.source
                                ORDER BY d.n_chars, d.doc_id) AS r,
             per_src.ns, tot.nn
      FROM d JOIN per_src USING (source) CROSS JOIN tot
    ),
    gq AS (
      SELECT ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS gr,
             n_chars AS norm_chars
      FROM d
    )
    SELECT ranked.doc_id, ranked.source,
           CAST(ranked.n_chars AS BIGINT) AS n_chars,
           CAST(gq.norm_chars AS BIGINT) AS normalized_chars
    FROM ranked
    JOIN gq ON gq.gr = (ranked.r * ranked.nn + ranked.ns - 1) // ranked.ns
    """,
)
def source_quantile_normalize_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source QUANTILE NORMALIZATION (the microarray-lineage
    transform, Bolstad et al. 2003, now the standard cross-batch score
    equalizer): each document's value is replaced by the GLOBAL
    distribution's datum at the same within-source quantile, so every
    source ends up with an identical marginal distribution and a single
    threshold means the same thing in all of them. Demonstrated on doc
    length (an integer, so the mapping is exact end to end); the same
    plan normalizes any per-doc score a filter thresholds on.

    Rank matching is nearest-rank: within-source rank r of n_s maps to
    global rank ceil(r·N/n_s), all integer arithmetic with doc_id
    tie-breaks — both engines select the identical global datum. The
    within-source windows partition by source; the one global ordering
    is fixture-grain (the 100 TB form is the two-level sampled range
    rank the sorted-neighborhood operator demonstrates, or a mergeable
    quantile sketch lookup — one substitution, same contract)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", F.length("text").alias("n_chars"))
    tot = d.agg(F.count(F.lit(1)).alias("nn"))
    per_src = d.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))
    w_s = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = (
        d.withColumn("r", F.row_number().over(w_s))
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "g_rank",
            F.floor(
                (F.col("r") * F.col("nn") + F.col("ns") - 1) / F.col("ns")
            ).cast("long"),
        )
    )
    w_g = Window.orderBy("n_chars", "doc_id")
    glob = d.select(
        F.row_number().over(w_g).cast("long").alias("gr"),
        F.col("n_chars").alias("norm_chars"),
    )
    return ranked.join(glob, ranked["g_rank"] == glob["gr"]).select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("norm_chars").cast("long").alias("normalized_chars"),
    )


@register(
    "sqrt_temperature_mix_weights",
    oracle="""
    WITH s AS (
      SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS n_tokens
      FROM documents GROUP BY source
    ),
    r AS (
      SELECT source, n_tokens,
             CAST(ROUND(sqrt(n_tokens) * 1000000.0, 0) AS BIGINT) AS sq_micro
      FROM s
    ),
    t AS (SELECT SUM(n_tokens) AS tn, SUM(sq_micro) AS tsq FROM r)
    SELECT r.source, r.n_tokens,
           CAST(ROUND(r.n_tokens * 1000000.0 / t.tn, 0) AS BIGINT)
             AS raw_share_micropoints,
           CAST(ROUND(r.sq_micro * 1000000.0 / t.tsq, 0) AS BIGINT)
             AS temp_share_micropoints
    FROM r CROSS JOIN t
    """,
)
def sqrt_temperature_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing weights at τ = 1/2 — the
    up-weight-the-tail reweighting multi-corpus LLM recipes apply
    (domain weight ∝ n^τ; τ=0.7 in GPT-3's mixture, τ≈0.5 in
    multilingual sampling à la mBERT/XLM-R): small sources gain share,
    the head loses, without the uniform extreme of τ=0. This rung
    computes the WEIGHT TABLE; ``corpus_mix_by_source`` is the
    execution half (hash-acceptance sampling toward target
    proportions) that such a table feeds. τ is PINNED at
    1/2 because n^0.5 = sqrt(n) is IEEE-754 CORRECTLY ROUNDED in both
    engines — a general pow(n, 0.7) is libm-implementation-defined and
    would hang every share on a last-ulp edge (the discipline note the
    EWMA rung's α=1/2 shares). Each sqrt integerizes to micropoints
    per source BEFORE the normalizing sum, so the denominator is
    order-free bigint addition; raw token shares ride along so the
    output IS the reweighting decision table.

    Scale: one (source, Σ tokens) partial-agg over the corpus; the
    normalization runs on |sources| rows."""
    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"))
    )
    r = s.select(
        "source",
        "n_tokens",
        F.round(F.sqrt("n_tokens") * 1000000.0, 0).cast("long").alias("sq_micro"),
    )
    t = r.agg(
        F.sum("n_tokens").alias("tn"), F.sum("sq_micro").alias("tsq")
    )
    return r.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        F.round(F.col("n_tokens") * 1000000.0 / F.col("tn"), 0)
        .cast("bigint")
        .alias("raw_share_micropoints"),
        F.round(F.col("sq_micro") * 1000000.0 / F.col("tsq"), 0)
        .cast("bigint")
        .alias("temp_share_micropoints"),
    )


_STRAT_K = 10


@register(
    "stratified_sample_docs",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY ({duck_u32("doc_id || '~strat'")}), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source, CAST(rn AS BIGINT) AS draw_rank
    FROM r WHERE rn <= {_STRAT_K}
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED exact-k sampling — k = {_STRAT_K} docs per source,
    drawn by ranking each stratum on the cross-engine md5-u32 of the
    doc id (+ salt, doc_id tie-break): every stratum is guaranteed its
    full quota regardless of size skew, the property
    `events_hash_sample`'s Bernoulli thinning can't give (its per-
    stratum counts are binomial) and `weighted_sample_docs`' global
    A-ES draw doesn't target. The draw_rank column makes the sample
    NESTED: the k=5 sample is exactly rows with draw_rank <= 5, so one
    materialization serves every smaller quota — the property that
    lets an eval-set refresh shrink without re-drawing.

    Scale: one hash + per-stratum top-k (TakeOrderedAndProject within
    partitions after a source-keyed exchange) — no global sort."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.expr(spark_u32("concat(cast(doc_id as string), '~strat')"))
    w = Window.partitionBy("source").orderBy(h, F.asc("doc_id"))
    return (
        docs.select("doc_id", "source")
        .withColumn("draw_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("draw_rank") <= _STRAT_K)
    )
