"""Inverted-index retrieval — the build/serve split for TEXT SEARCH
(the graph/ANN/dedup families already stage their state; this gives the
keyword-retrieval path the same lifecycle).

Store layout (``_staged_inverted_index``): positional postings
(term, doc_id, tf, positions) hash-bucketed into ``_N_BUCKETS``
partition directories on ``pmod(xxhash64(term), N)`` and sorted by
(term, doc_id) within each bucket. Serving joins the postings against a
BROADCAST frame of query terms keyed on (bucket, term), so:

* the bucket partition column gives Spark DYNAMIC PARTITION PRUNING —
  a 2-term query physically reads at most 2 of the bucket directories,
  never the index;
* the within-bucket (term, doc_id) sort gives parquet row-group
  min/max pruning on the term equality inside each surviving bucket;
* positions ride along as an int array, so PHRASE adjacency is an
  array intersect (positions+1 ∩ positions), no re-tokenization.

Why buckets and not partitionBy(term): a real vocabulary is millions
of terms — one directory per term is a small-files catastrophe; a
fixed bucket count scales with the cluster, and term-level selectivity
comes from row-group pruning inside the bucket. This is the classic
distributed inverted-index layout (document-partitioned postings,
e.g. the Lucene/Elasticsearch shard model) expressed as parquet.

Oracles recompute phrase hits / conjunctive ranks straight from
``documents``, so the staged index is value-checked end-to-end against
first principles, the same discipline as the IVF-PQ serve rungs.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import load_table, local_frame, spread
from dataengineerchallenge_spark.staging import staged

_N_BUCKETS = 16
_PHRASE = ("window", "join")
_CONJ_TERMS = ("vector", "stream", "hash")


def _bucket(term_col):
    return F.pmod(F.xxhash64(term_col), F.lit(_N_BUCKETS)).cast("int")


def postings_frame(docs: DataFrame) -> DataFrame:
    """(bucket, term, doc_id, tf, positions) positional postings —
    one token explode + one (term, doc_id) aggregate."""
    toks = spread(docs).select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    return toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    ).withColumn("bucket", _bucket(F.col("term")))


def _staged_inverted_index(spark: SparkSession, sf_dir: str) -> str:
    """Build-once positional postings store, bucket-partitioned and
    term-sorted within buckets (row-group pruning on term)."""

    def build(out: Path) -> None:
        docs = load_table(spark, sf_dir, "documents")
        p = postings_frame(docs)
        (
            p.repartition(_N_BUCKETS, "bucket")
            .sortWithinPartitions("term", "doc_id")
            .write.partitionBy("bucket")
            .parquet(str(out / "postings"))
        )
        # per-doc lengths + 1-row corpus stats ride in the same slot so
        # a BM25 serve needs NOTHING outside the index (df comes from
        # the postings themselves: one row per (term, doc))
        dl = docs.select(
            "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl")
        )
        dl.write.parquet(str(out / "doclen"))
        dl.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.avg("dl").alias("avgdl"),
        ).write.parquet(str(out / "stats"))

    return staged(
        spark,
        "invidx",
        Path(sf_dir) / "documents.parquet",
        "invidx_v2",
        build,
    )


def _query_terms(spark: SparkSession, terms) -> DataFrame:
    """Tiny broadcast frame of query terms with their bucket keys —
    joining on (bucket, term) is what arms dynamic partition pruning."""
    qt = local_frame(
        spark, [(t, i) for i, t in enumerate(terms)], "term string, slot int"
    )
    return qt.withColumn("bucket", _bucket(F.col("term")))


def _phrase_hits(postings: DataFrame, qt: DataFrame, terms) -> DataFrame:
    """(doc_id, n_matches >= 1) for the two-slot phrase in ``qt``:
    postings ⋈ broadcast terms, then adjacency = |(posA+1) ∩ posB|.
    The literal ``term IN (...)`` predicate is applied BEFORE the join —
    the join alone only arms partition-level DPP, while the literal
    lands in PushedFilters and row-group-prunes on the within-bucket
    term sort (verified in tests/test_search.py plan pins)."""
    # The slot assignment below keys on term equality, so it is only
    # correct for a 2-term phrase of DISTINCT tokens ("the the" would
    # put both occurrences in both slots) — fail loudly on reuse.
    if len(terms) != 2 or len(set(terms)) != 2:
        raise ValueError(
            "_phrase_hits requires exactly 2 distinct terms, got "
            f"{list(terms)!r}"
        )
    hits = (
        postings.filter(F.col("term").isin(*terms))
        .join(F.broadcast(qt), ["bucket", "term"])
        .select("doc_id", "slot", "positions")
    )
    a = hits.filter(F.col("slot") == 0).select(
        "doc_id", F.col("positions").alias("pos_a")
    )
    b = hits.filter(F.col("slot") == 1).select(
        "doc_id", F.col("positions").alias("pos_b")
    )
    n = F.size(
        F.array_intersect(
            F.transform(F.col("pos_a"), lambda x: x + 1), F.col("pos_b")
        )
    )
    return (
        a.join(b, "doc_id")
        .select("doc_id", n.cast("long").alias("n_matches"))
        .filter(F.col("n_matches") >= 1)
    )


_PHRASE_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
m AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM t)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM m WHERE ws[i] = '{_PHRASE[0]}' AND ws[i + 1] = '{_PHRASE[1]}'
GROUP BY doc_id
"""


@register("phrase_search_inverted", oracle=_PHRASE_ORACLE)
def phrase_search_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query ("window join") answered from positional
    postings built IN-PLAN — the inline twin of the staged serve below
    (same join + adjacency-intersect logic, postings_frame shared), so
    the pair prices what the staged store saves."""
    p = postings_frame(load_table(spark, sf_dir, "documents"))
    return _phrase_hits(p, _query_terms(spark, _PHRASE), _PHRASE)


@register("phrase_search_inverted_staged", oracle=_PHRASE_ORACLE)
def phrase_search_inverted_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase query served from the STAGED postings store: broadcast
    the 2-term query frame, dynamic-partition-prune to <= 2 of the 16
    bucket directories, row-group-prune on term inside them, adjacency
    by array intersect. Per-query work is O(postings of the query
    terms) — the index is never scanned, which is the whole point of
    an inverted index at 100 TB."""
    path = _staged_inverted_index(spark, sf_dir)
    postings = spark.read.parquet(f"{path}/postings")
    return _phrase_hits(postings, _query_terms(spark, _PHRASE), _PHRASE)


_CONJ_ORACLE = f"""
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
tf AS (
  SELECT doc_id, w, count(*) AS c FROM tok
  WHERE w IN ('{_CONJ_TERMS[0]}', '{_CONJ_TERMS[1]}', '{_CONJ_TERMS[2]}')
  GROUP BY doc_id, w
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score
FROM tf GROUP BY doc_id HAVING count(*) = 3
ORDER BY score DESC, doc_id LIMIT 20
"""


@register("conjunctive_search_inverted_staged", oracle=_CONJ_ORACLE)
def conjunctive_search_inverted_staged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conjunctive (AND) keyword query over the staged postings store,
    ranked by summed term frequency, top 20 (TakeOrderedAndProject,
    deterministic doc_id tie-break). Same pruning story as the phrase
    serve; the AND is a count-distinct-terms == |query| HAVING on the
    postings hits — document-at-a-time intersection without ever
    materializing per-term doc lists."""
    path = _staged_inverted_index(spark, sf_dir)
    postings = spark.read.parquet(f"{path}/postings")
    qt = _query_terms(spark, _CONJ_TERMS)
    hits = postings.filter(F.col("term").isin(*_CONJ_TERMS)).join(
        F.broadcast(qt), ["bucket", "term"]
    )
    ranked = (
        hits.groupBy("doc_id")
        .agg(
            F.count_distinct("term").alias("_nt"),
            F.sum("tf").alias("score"),
        )
        .filter(F.col("_nt") == len(_CONJ_TERMS))
        .select("doc_id", F.col("score").cast("long").alias("score"))
    )
    return ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


# --- online index maintenance (the lifecycle rung every other staged
# family already has: build / serve / ONLINE APPEND) ---------------------


def _staged_postings_history(spark: SparkSession, sf_dir: str) -> str:
    """Postings of the 90% HISTORY corpus (doc_id % 10 != 0) in the same
    bucketed layout as the full store — the state an online indexer
    starts from."""

    def build(out: Path) -> None:
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 != 0
        )
        (
            postings_frame(docs)
            .repartition(_N_BUCKETS, "bucket")
            .sortWithinPartitions("term", "doc_id")
            .write.partitionBy("bucket")
            .parquet(str(out / "postings"))
        )

    return staged(
        spark,
        "invidx_hist",
        Path(sf_dir) / "documents.parquet",
        "invidx_hist_v1",
        build,
    )


def _staged_doc_delivery_stream(spark: SparkSession, sf_dir: str) -> str:
    """The held-out 10% of documents written as 3 doc-hashed parquet
    files — one file per trigger. Documents are atomic rows (unlike the
    edge store's order groups), so ANY file split preserves per-batch
    postings exactness; hashing just balances the batches."""
    from dataengineerchallenge_spark.sources.sinks import write_result

    def build(out: Path) -> None:
        docs = load_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 10 == 0
        )
        write_result(docs.repartition(3, "doc_id"), str(out))

    return staged(
        spark,
        "invidx_delivery",
        Path(sf_dir) / "documents.parquet",
        "invidx_delivery_v1",
        build,
    )


def stream_postings_merge(
    spark: SparkSession, sf_dir: str, epochs: list | None = None, timeout_s: int = 300
) -> DataFrame:
    """Drive the ONLINE index-maintenance loop: tail the document
    delivery as a file stream, index each micro-batch with the SAME
    postings_frame as the batch build, and commit its postings under an
    epoch_id-keyed overwrite (retry-idempotent; history is never
    re-read inside the loop — each batch's work is delta-sized). New
    documents create brand-new (term, doc_id) posting keys, so the
    drain is a pure union with history; the defensive fold (sum tf,
    flatten positions) documents the general merge contract and is the
    identity here. Maintained store == full rebuild is pinned
    row-for-row in tests/test_search.py; `stream_inverted_index_serve`
    proves it on real data by hash-matching the full-corpus oracle."""
    import shutil
    import tempfile
    import time

    hist = _staged_postings_history(spark, sf_dir)
    payload = _staged_doc_delivery_stream(spark, sf_dir)
    schema = spark.read.parquet(payload).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(payload)
    )
    scratch = tempfile.mkdtemp(prefix="spark_graft_stream_invidx_")
    ckpt, committed = f"{scratch}/ckpt", f"{scratch}/committed"

    def serve(mb: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        postings_frame(mb).write.mode("overwrite").parquet(
            f"{committed}/epoch_id={epoch_id}"
        )
        if epochs is not None:
            epochs.append((epoch_id, round(time.time() - t0, 3)))

    from dataengineerchallenge_spark.streaming.runner import drain_foreach_batch

    try:
        drain_foreach_batch(sdf, serve, ckpt, "postings stream", timeout_s=timeout_s)
        cols = ["term", "doc_id", "tf", "positions", "bucket"]
        merged = (
            spark.read.parquet(f"{hist}/postings")
            .select(*cols)
            .unionByName(spark.read.parquet(committed).select(*cols))
            .groupBy("bucket", "term", "doc_id")
            .agg(
                F.sum("tf").cast("long").alias("tf"),
                F.sort_array(F.flatten(F.collect_list("positions"))).alias(
                    "positions"
                ),
            )
            .localCheckpoint()  # eager: detach from the scratch dir
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return merged


@register("stream_inverted_index_serve", oracle=_PHRASE_ORACLE)
def stream_inverted_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phrase query served from the ONLINE-maintained postings
    (history store + streamed document deltas): must return exactly the
    full-corpus answer — online == append == rebuild, the same
    lifecycle contract the edge store and the MinHash band store meet.
    Hash-matches the identical from-first-principles oracle as the
    batch serves."""
    maintained = stream_postings_merge(spark, sf_dir)
    return _phrase_hits(maintained, _query_terms(spark, _PHRASE), _PHRASE)


_BM25_ORACLE_SHARED = """
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    stats AS (SELECT count(*)::DOUBLE AS n,
                     avg(len(string_split(text, ' ')))::DOUBLE AS avgdl FROM documents),
    dl AS (SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl FROM documents),
    tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok
           WHERE term IN ('vector', 'stream', 'hash') GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok
           WHERE term IN ('vector', 'stream', 'hash') GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                  * tf.tf * 2.2
                  / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                  * 1000000) AS BIGINT) AS term_micropoints
      FROM tf JOIN df USING (term) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
    SELECT doc_id, CAST(SUM(term_micropoints) AS BIGINT) AS bm25_micropoints
    FROM scored GROUP BY doc_id
    ORDER BY bm25_micropoints DESC, doc_id LIMIT 20
"""


@register("bm25_search_inverted_staged", oracle=_BM25_ORACLE_SHARED)
def bm25_search_inverted_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 SERVED ENTIRELY FROM THE STAGED INDEX — the
    inline `bm25_keyword_search` re-tokenizes the corpus per query;
    this reads postings for the 3 query terms (DPP + pushed term
    literal, same pruning as the phrase serve), derives df as the
    per-term postings rowcount, joins the store-resident doc-length
    table, and broadcasts the store's 1-row (N, avgdl) stats. Identical
    micropoint arithmetic and oracle as the scan path — at 100 TB the
    difference is reading |postings(query terms)| + |docs| length rows
    instead of tokenizing the corpus."""
    path = _staged_inverted_index(spark, sf_dir)
    terms = _CONJ_TERMS
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("term").isin(*terms)
    )
    hits = postings.join(
        F.broadcast(_query_terms(spark, terms)), ["bucket", "term"]
    ).select("term", "doc_id", F.col("tf").cast("double").alias("tf"))
    df = hits.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    dl = spark.read.parquet(f"{path}/doclen")
    stats = spark.read.parquet(f"{path}/stats")
    idf = F.log(F.lit(1) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + 1.2 * (
        F.lit(1) - 0.75 + 0.75 * F.col("dl") / F.col("avgdl")
    )
    scored = (
        hits.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * F.col("tf") * 2.2 / denom * 1_000_000, 0)
            .cast("bigint")
            .alias("term_micropoints"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_micropoints").alias("bm25_micropoints"))
        .orderBy(F.desc("bm25_micropoints"), F.asc("doc_id"))
        .limit(20)
    )


_PHRASE_RETRACT_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE doc_id % 10 != 0),
m AS (SELECT doc_id, unnest(range(1, len(ws))) AS i, ws FROM t)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches
FROM m WHERE ws[i] = '{_PHRASE[0]}' AND ws[i + 1] = '{_PHRASE[1]}'
GROUP BY doc_id
"""


@register("phrase_search_inverted_retracted", oracle=_PHRASE_RETRACT_ORACLE)
def phrase_search_inverted_retracted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOMBSTONE retraction on the inverted index — the per-doc-row
    half of the store-retraction story (VERDICT r16 #2's "which stores
    need tombstones"): postings are keyed by doc_id, so a takedown is
    an ANTI-JOIN against the tombstone list at serve time (here every
    doc_id % 10 == 0), not an algebraic un-fold like the edge store's
    negative delta — cheap (broadcast anti-join riding the same
    DPP-pruned bucket scan) but a real second mechanism, priced as
    such. Graded against the phrase oracle computed on the corpus
    WITHOUT the tombstoned docs, so a green row proves serve-time
    filtering ≡ rebuild-without-docs. A compaction pass would fold the
    tombstones into the store (drop the rows, rewrite the buckets) on
    the same content-addressed slot versioning the appends use."""
    path = _staged_inverted_index(spark, sf_dir)
    postings = spark.read.parquet(f"{path}/postings")
    tombstones = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 10 == 0)
    )
    live = postings.join(F.broadcast(tombstones), "doc_id", "left_anti")
    return _phrase_hits(live, _query_terms(spark, _PHRASE), _PHRASE)


_SLOP = 3

_PROXIMITY_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
m AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS i, ws FROM t),
aa AS (SELECT doc_id, i FROM m WHERE ws[i] = '{_PHRASE[0]}'),
bb AS (SELECT doc_id, i AS j FROM m WHERE ws[i] = '{_PHRASE[1]}'),
hit AS (
  SELECT DISTINCT bb.doc_id, bb.j
  FROM bb JOIN aa ON aa.doc_id = bb.doc_id
   AND bb.j - aa.i BETWEEN 1 AND {_SLOP}
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM hit GROUP BY doc_id
"""


@register("proximity_search_inverted_staged", oracle=_PROXIMITY_ORACLE)
def proximity_search_inverted_staged(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PROXIMITY (slop) query served from the staged postings store —
    the relaxation between exact phrase (slop 1, the adjacency rung)
    and bag-of-words AND (slop ∞, the conjunctive rung): count the
    occurrences of term B with term A at most {_SLOP} positions
    before it, per document. Same DPP-pruned two-bucket read and
    broadcast term frame as the phrase serve; the positional match is
    a higher-order array predicate (EXISTS over the A-positions per
    B-position) instead of the +1 intersect — positions already ride
    the postings, so slop costs no extra index state."""
    path = _staged_inverted_index(spark, sf_dir)
    postings = spark.read.parquet(f"{path}/postings")
    qt = _query_terms(spark, _PHRASE)
    hits = (
        postings.filter(F.col("term").isin(*_PHRASE))
        .join(F.broadcast(qt), ["bucket", "term"])
        .select("doc_id", "slot", "positions")
    )
    a = hits.filter(F.col("slot") == 0).select(
        "doc_id", F.col("positions").alias("pos_a")
    )
    b = hits.filter(F.col("slot") == 1).select(
        "doc_id", F.col("positions").alias("pos_b")
    )
    n = F.expr(
        f"size(filter(pos_b, y -> exists(pos_a,"
        f" x -> y - x >= 1 AND y - x <= {_SLOP})))"
    )
    return (
        a.join(b, "doc_id")
        .select("doc_id", n.cast("long").alias("n_matches"))
        .filter(F.col("n_matches") >= 1)
    )
