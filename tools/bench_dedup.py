"""Near-dup dedup scaling bench → BENCH_dedup.json.

The committed fixtures cap `documents` at ~20k rows; this bench
generates deterministic corpora with PLANTED near-duplicates at real
sizes and measures the N2 ladder's two production paths against each
other:

- **exact_s**: the exact shingle-Jaccard inverted-index join
  (`shingle_jaccard_pairs`, the oracle anchor) — lossless, cost driven
  by shingle-key fan-out;
- **lsh_s**: MinHash + banded LSH (`minhash_lsh_pairs`) — sub-quadratic
  candidate generation, recall-bounded;
- **lsh_recall**: fraction of the exact ≥ 0.5-Jaccard pairs the LSH
  path recovers (planted mutations sit around 0.55-0.9 Jaccard, so
  this exercises the threshold boundary, not just trivial twins);
- **planted_recall_{exact,lsh}**: fraction of the planted near-dup
  pairs each path surfaces — ground truth independent of either
  implementation.

Corpus: ``n_docs`` documents of ~60 words drawn hash-deterministically
from a 20k-word vocabulary (large vocab ⇒ realistic mostly-unique
shingles); every 10th document is a MUTATION of the previous one with
~10% of words replaced — the boilerplate/near-copy shape dedup exists
for.

Round 7 adds the INCREMENTAL rung (VERDICT r6 #4): for each corpus size
the last ``--incr-batch`` docs are treated as a new delivery; the base
corpus's banded-MinHash signature table is staged once, then
``incr_s`` measures sign-the-batch + join-against-staged-bands + verify
(pairs involving the batch), versus ``banded_full_s`` — the full-corpus
banded recompute. The claim under test: with a FIXED batch size, incr_s
stays near-flat as the corpus grows while the full recompute grows
linearly — append cost scales with the batch, not the corpus.

Usage:
    python tools/bench_dedup.py [--sizes 50000,200000,500000] [--iters 2]
        [--incr-batch 20000] [--driver-memory 8g] [--out BENCH_dedup.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from contextlib import contextmanager  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


@contextmanager
def _no_broadcast(spark):
    """Force the shuffle formulation (the naive baseline) regardless of
    frame-size estimates."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


DOC_WORDS = 60
VOCAB = 20_000
MUT_PCT = 10  # % of words replaced in a mutated copy: word overlap 0.9
# ⇒ shared-3-shingle fraction ≈ 0.9³ = 0.73 ⇒ planted Jaccard ≈ 0.57 on
# average — sitting just above the 0.5 threshold, so the bench exercises
# the decision boundary (per-pair variance pushes some planted pairs
# below it; both paths are scored against the same ground truth).


def _gen(spark, path: str, rows: int, dist: str = "uniform") -> None:
    """Deterministic corpus: doc i draws its word at each position from
    hash(i, pos) over the vocab; docs with i%10==9 reuse doc (i-1)'s
    draws but replace ~MUT_PCT% of positions (hash-chosen) with their
    own — a planted near-dup pair (i-1, i) of known expected Jaccard.
    Unrelated docs share only chance vocabulary.

    ``dist``: 'uniform' draws words uniformly (realistic LARGE-vocab
    shingles, mostly unique keys); 'zipf' draws log-uniformly (Zipf-1:
    p(w) ∝ 1/w — the natural-language shape), which concentrates ~7% of
    positions on the top word and creates HOT SHINGLES — the fan-out
    regime the stop-shingle cap and LSH exist for."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    # content seed: mutated docs draw from the PREVIOUS doc's id
    seed = F.when(F.pmod(F.col("id"), F.lit(10)) == 9, F.col("id") - 1).otherwise(F.col("id"))
    pos = F.sequence(F.lit(0), F.lit(DOC_WORDS - 1))
    is_mut = F.pmod(F.col("id"), F.lit(10)) == 9

    def word(seed_col, p):
        u = F.pmod(F.xxhash64(seed_col, p), F.lit(1_000_000)) / 1_000_000.0
        if dist == "zipf":
            idx = F.floor(F.pow(F.lit(float(VOCAB)), u)) - 1
        else:
            idx = F.floor(u * VOCAB)
        return F.concat(F.lit("w"), idx.cast("long"))

    words = F.transform(
        pos,
        lambda p: F.when(
            is_mut & (F.pmod(F.xxhash64(F.col("id"), p, F.lit(7)), F.lit(100)) < MUT_PCT),
            word(F.col("id"), p),  # replaced position: draw from OWN id
        ).otherwise(word(seed, p)),
    )
    df = spark.range(rows).select(
        F.col("id").alias("doc_id"),
        F.array_join(words, " ").alias("text"),
    )
    df.repartition(32).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))
    open(os.path.join(path, "_SUCCESS"), "w").close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,200000,500000")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--incr-batch", type=int, default=20_000)
    ap.add_argument(
        "--only-incr",
        action="store_true",
        help="re-run only the incremental rung, merging into an existing artifact",
    )
    ap.add_argument(
        "--only-bloom",
        action="store_true",
        help="re-run only the Bloom-prefilter rung, merging into an existing artifact",
    )
    ap.add_argument("--bloom-sizes", default="1000000,4000000")
    ap.add_argument("--bloom-batch", type=int, default=20_000)
    ap.add_argument(
        "--only-prefix",
        action="store_true",
        help="re-run only the AllPairs-prefix-vs-plain Zipf rung, merging",
    )
    ap.add_argument("--prefix-sizes", default="100000,200000")
    ap.add_argument(
        "--only-span",
        action="store_true",
        help="re-run only the span-dedup gram-key rung, merging",
    )
    ap.add_argument("--span-sizes", default="50000,200000")
    ap.add_argument("--driver-memory", default="8g")
    ap.add_argument("--out", default="BENCH_dedup.json")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",") if s]

    os.environ.setdefault(
        "PYSPARK_SUBMIT_ARGS", f"--driver-memory {args.driver_memory} pyspark-shell"
    )
    from dataengineerchallenge_spark.operators import dedup as D
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".benchdata"
    )
    out: dict = {
        "metric": "dedup_bench",
        "sizes": sizes,
        "iters": args.iters,
        "doc_words": DOC_WORDS,
        "vocab": VOCAB,
        "mut_pct": MUT_PCT,
        "results": {},
    }
    only_flags = (
        args.only_incr or args.only_bloom or args.only_prefix or args.only_span
    )
    if only_flags and os.path.exists(args.out):
        out["results"] = json.load(open(args.out)).get("results", {})
    for dist in ("uniform", "zipf") if not only_flags else ():
        for rows in sizes:
            d = os.path.join(root, f"dedup_{dist}_{rows}")
            _gen(spark, d, rows, dist=dist)
            docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
            planted = {(i - 1, i) for i in range(9, rows, 10)}

            paths = {
                "exact": lambda: D.shingle_jaccard_pairs(
                    docs, "doc_id", "text", n=3, threshold=0.5
                ),
                # stop-shingle cap: drop shingles hotter than 200 docs
                # from the JOIN (doc sizes stay unfiltered) — the
                # documented fan-out lever, recall-bounded
                "exact_cap200": lambda: D.shingle_jaccard_pairs(
                    docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=200
                ),
                "lsh": lambda: D.minhash_lsh_pairs(
                    docs, "doc_id", "text", n=3, max_jaccard_dist=0.5
                ),
            }

            def best(build):
                b, res = float("inf"), None
                for _ in range(args.iters):
                    t = time.time()
                    res = {(r["id_a"], r["id_b"]) for r in build().collect()}
                    b = min(b, time.time() - t)
                return round(b, 2), res

            res: dict = {}
            pair_sets: dict = {}
            for name, build in paths.items():
                secs, pairs = best(build)
                pair_sets[name] = pairs
                res[f"{name}_s"] = secs
                res[f"{name}_pairs"] = len(pairs)
                res[f"planted_recall_{name}"] = round(
                    len(pairs & planted) / len(planted), 4
                )
            exact = pair_sets["exact"]
            for name in ("exact_cap200", "lsh"):
                res[f"{name}_recall_vs_exact"] = round(
                    len(exact & pair_sets[name]) / max(len(exact), 1), 4
                )
            out["results"][f"{dist}_{rows}"] = res
            print(f"{dist} N={rows}: {json.dumps(res)}")

    # ---- incremental split: fixed batch, growing corpus (uniform dist) ----
    import shutil
    import tempfile

    for rows in sizes if not (args.only_bloom or args.only_prefix or args.only_span) else ():
        d = os.path.join(root, f"dedup_uniform_{rows}")
        _gen(spark, d, rows)  # idempotent; --only-incr skips the loop above
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        split = rows - args.incr_batch
        base = docs.filter(F.col("doc_id") < split)
        new = docs.filter(F.col("doc_id") >= split)

        stage_dir = tempfile.mkdtemp(prefix="spark_graft_bench_mh_")
        t = time.time()
        D.minhash_band_frame(base, "doc_id", "text", n=3).write.mode(
            "overwrite"
        ).parquet(stage_dir)
        base_sign_s = round(time.time() - t, 2)
        staged_bands = spark.read.parquet(stage_dir)

        # bucketed twin of the store for the over-threshold rung: the
        # batch at --incr-batch=20k is ~320k band rows ≈ 15 MB estimated
        # — PAST the 10 MB broadcast budget, so the scale-safe path is
        # the bucket-local shuffle join (VERDICT r7 What's-wrong #2)
        bkt_name = f"spark_graft_bench_bkt_mh_{rows}"
        spark.sql(f"DROP TABLE IF EXISTS {bkt_name}")
        t = time.time()
        (
            staged_bands.write.bucketBy(8, "band", "band_hash")
            .sortBy("band", "band_hash")
            .option("path", f"{stage_dir}_bkt")
            .mode("overwrite")
            .saveAsTable(bkt_name)
        )
        bkt_write_s = round(time.time() - t, 2)
        store_bkt = spark.table(bkt_name)

        def run_incr():
            nb = D.minhash_band_frame(new, "doc_id", "text", n=3)
            # no outer distinct: both branches are internally distinct and
            # provably disjoint (old-new vs new-new pairs)
            cand = D.band_collision_pairs(staged_bands, nb).unionByName(
                D.band_collision_pairs(nb)
            )
            return D.verify_jaccard(docs, "doc_id", "text", cand, n=3, threshold=0.5)

        def run_incr_shuffle():
            nb = D.minhash_band_frame(new, "doc_id", "text", n=3)
            cand = D.band_collision_pairs(store_bkt, nb, mode="shuffle").unionByName(
                D.band_collision_pairs(nb)
            )
            return D.verify_jaccard(docs, "doc_id", "text", cand, n=3, threshold=0.5)

        def run_full():
            bands = D.minhash_band_frame(docs, "doc_id", "text", n=3)
            return D.verify_jaccard(
                docs, "doc_id", "text", D.band_collision_pairs(bands), n=3, threshold=0.5
            )

        def best_pairs(build):
            b, res_pairs = float("inf"), None
            for _ in range(args.iters):
                t0 = time.time()
                res_pairs = {(r["id_a"], r["id_b"]) for r in build().collect()}
                b = min(b, time.time() - t0)
            return round(b, 2), res_pairs

        incr_s, incr_pairs = best_pairs(run_incr)
        incr_shuffle_s, incr_shuffle_pairs = best_pairs(run_incr_shuffle)
        full_s, full_pairs = best_pairs(run_full)
        full_new = {(a, b) for a, b in full_pairs if a >= split or b >= split}
        batch_band_rows = args.incr_batch * 16
        out["results"][f"incr_uniform_{rows}"] = res = {
            "corpus": rows,
            "batch": args.incr_batch,
            "batch_band_rows": batch_band_rows,
            "batch_over_broadcast_budget": batch_band_rows * D.BAND_ROW_EST_BYTES
            > D.BROADCAST_BATCH_MAX_BYTES,
            "base_sign_s": base_sign_s,
            "bkt_store_write_s": bkt_write_s,
            "incr_s": incr_s,
            "incr_shuffle_s": incr_shuffle_s,
            "banded_full_s": full_s,
            "incr_pairs": len(incr_pairs),
            "parity_with_full": incr_pairs == full_new,
            "parity_shuffle_vs_broadcast": incr_shuffle_pairs == incr_pairs,
        }
        spark.sql(f"DROP TABLE IF EXISTS {bkt_name}")
        shutil.rmtree(stage_dir, ignore_errors=True)
        shutil.rmtree(f"{stage_dir}_bkt", ignore_errors=True)
        print(f"incr N={rows}: {json.dumps(res)}")

    # ---- AllPairs prefix filter vs plain inverted index (Zipf) --------
    # The prefix plan's regime: hot-shingle fanout. On uniform corpora
    # its extra shuffles (df aggregate + per-doc window) cost more than
    # the candidate cut saves; on Zipfian text the plain self-join goes
    # superlinear and the prefix stays ahead (lossless — pair sets equal).
    if not (args.only_incr or args.only_bloom or args.only_span):
        for rows in [int(s) for s in args.prefix_sizes.split(",") if s]:
            d = os.path.join(root, f"dedup_zipf_{rows}")
            _gen(spark, d, rows, dist="zipf")
            zdocs = spark.read.parquet(os.path.join(d, "documents.parquet"))

            def best_n(build):
                b, n = float("inf"), None
                for _ in range(args.iters):
                    t0 = time.time()
                    pairs = {(r["id_a"], r["id_b"]) for r in build().collect()}
                    b = min(b, time.time() - t0)
                return round(b, 2), pairs

            ex_s, ex_pairs = best_n(
                lambda: D.shingle_jaccard_pairs(zdocs, "doc_id", "text", n=3, threshold=0.5)
            )
            pf_s, pf_pairs = best_n(
                lambda: D.shingle_jaccard_pairs_prefix(
                    zdocs, "doc_id", "text", n=3, threshold=0.5
                )
            )
            out["results"][f"prefix_zipf_{rows}"] = res = {
                "corpus": rows,
                "exact_s": ex_s,
                "exact_prefix_s": pf_s,
                "pairs": len(ex_pairs),
                "parity": ex_pairs == pf_pairs,
            }
            print(f"prefix zipf N={rows}: {json.dumps(res)}")

    # ---- Bloom membership prefilter: delivery vs corpus HISTORY -------
    # N1 at delivery scale (exact_dedup_bloom_prefilter's design space).
    # Three exact-identical-output paths per (corpus, dup-share) point:
    #   plain_smj_s    delivery LEFT ANTI corpus — the naive formulation;
    #                  corpus shuffled+sorted EVERY delivery (broadcast
    #                  disabled to keep the join honest at bench sizes)
    #   bcast_semi_s   confirmed = corpus SEMI broadcast(delivery keys);
    #                  new = delivery ANTI broadcast(confirmed) — corpus
    #                  scanned once map-side, never shuffled (the strong
    #                  no-sketch baseline)
    #   bloom_s        same shape, but the broadcast probe set is the
    #                  Bloom maybe set instead of the whole delivery —
    #                  dup_share + FPR of the batch, and the corpus pass
    #                  is skippable when it is empty
    # bloom_build_s is the once-per-corpus staged cost (word table).
    if not (args.only_incr or args.only_span):
        bloom_sizes = [int(s) for s in args.bloom_sizes.split(",") if s]
        m_bits, k = 1 << 24, 4  # m/n = 16.8 at 1M keys → FPR ≈ 0.24%
        nb = args.bloom_batch
        for rows in bloom_sizes:
            cdir = os.path.join(root, f"bloomcorpus_{rows}")
            if not os.path.exists(os.path.join(cdir, "_SUCCESS")):
                spark.range(rows).select(
                    F.sha2(F.concat(F.lit("corp"), F.col("id").cast("string")), 256).alias("s")
                ).write.mode("overwrite").parquet(cdir)
                open(os.path.join(cdir, "_SUCCESS"), "w").close()
            corpus = spark.read.parquet(cdir)

            t = time.time()
            wdir = os.path.join(root, f"bloomwords_{rows}")
            D.bloom_build(corpus, "s", m_bits=m_bits, k=k).write.mode(
                "overwrite"
            ).parquet(wdir)
            build_s = round(time.time() - t, 2)
            words = spark.read.parquet(wdir)

            for dup_share in (0.5, 0.01):
                n_dup = int(nb * dup_share)
                delivery = (
                    spark.range(n_dup)
                    .select(
                        F.sha2(
                            F.concat(F.lit("corp"), F.col("id").cast("string")), 256
                        ).alias("s")
                    )
                    .unionAll(
                        spark.range(nb - n_dup).select(
                            F.sha2(
                                F.concat(F.lit("new"), F.col("id").cast("string")), 256
                            ).alias("s")
                        )
                    )
                    .cache()
                )
                delivery.count()

                def run_plain_smj():
                    with _no_broadcast(spark):
                        return {
                            r["s"]
                            for r in delivery.join(corpus, "s", "left_anti").collect()
                        }

                def run_bcast_semi():
                    confirmed = corpus.join(
                        F.broadcast(delivery.select("s")), "s", "left_semi"
                    )
                    return {
                        r["s"]
                        for r in delivery.join(
                            F.broadcast(confirmed), "s", "left_anti"
                        ).collect()
                    }

                maybe_n = [0]

                def run_bloom():
                    flags = D.bloom_maybe_contains(
                        delivery, "s", words, m_bits=m_bits, k=k
                    )
                    maybe = flags.filter(F.col("maybe")).select("s").cache()
                    maybe_n[0] = maybe.count()
                    confirmed = corpus.join(F.broadcast(maybe), "s", "left_semi")
                    res = {
                        r["s"]
                        for r in delivery.join(
                            F.broadcast(confirmed), "s", "left_anti"
                        ).collect()
                    }
                    maybe.unpersist()
                    return res

                def best_set(fn):
                    b, res_set = float("inf"), None
                    for _ in range(args.iters):
                        t0 = time.time()
                        res_set = fn()
                        b = min(b, time.time() - t0)
                    return round(b, 2), res_set

                plain_s, plain = best_set(run_plain_smj)
                semi_s, semi = best_set(run_bcast_semi)
                bloom_s, bloom = best_set(run_bloom)
                fpr = (maybe_n[0] - n_dup) / max(nb - n_dup, 1)
                out["results"][f"bloom_{rows}_dup{int(dup_share*100)}"] = res = {
                    "corpus": rows,
                    "batch": nb,
                    "dup_share": dup_share,
                    "m_bits": m_bits,
                    "k": k,
                    "bloom_build_s": build_s,
                    "plain_smj_s": plain_s,
                    "bcast_semi_s": semi_s,
                    "bloom_s": bloom_s,
                    "n_maybe": maybe_n[0],
                    "fpr_observed": round(fpr, 6),
                    "parity": plain == semi == bloom and len(plain) == nb - n_dup,
                }
                delivery.unpersist()
                print(f"bloom N={rows} dup={dup_share}: {json.dumps(res)}")

    # ---- span dedup: gram-STRING vs gram-HASH shuffle keys (r14) ------
    # dup_span_doc_frame's two corpus-wide shuffles (gram doc-frequency
    # aggregate, candidate attach) key on the raw 5-word gram string in
    # the anchor plan and on xxhash64(gram) in the hash_grams plan
    # (VERDICT r13 #5). Measured per corpus size: REAL shuffle-write
    # bytes of each full run (delta of the UI status API's cumulative
    # stage counter — single-app process, nothing else runs), wall
    # time, and the analytic join-KEY byte totals (sum of gram string
    # lengths vs 8 bytes/row). Output parity is asserted via a
    # Spark-side checksum, so the rung doubles as an at-scale
    # correctness check of the lossless-superset argument.
    if not (args.only_incr or args.only_bloom or args.only_prefix):
        import urllib.request

        def _shuffle_write_bytes() -> int:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            stages = json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
            )
            return sum(s.get("shuffleWriteBytes", 0) for s in stages)

        def _span_checksum(frame):
            return tuple(
                frame.agg(
                    F.count(F.lit(1)),
                    F.sum("n_dup_grams"),
                    F.sum("covered_words"),
                    F.expr("bit_xor(xxhash64(doc_id, trimmed_text))"),
                ).collect()[0]
            )

        for rows in [int(s) for s in args.span_sizes.split(",") if s]:
            d = os.path.join(root, f"dedup_uniform_{rows}")
            _gen(spark, d, rows)
            sdocs = spark.read.parquet(os.path.join(d, "documents.parquet"))

            runs: dict = {}
            for key, hashed in (("string", False), ("hashed", True)):
                best_s, bytes_run, chk = float("inf"), None, None
                for it in range(args.iters):
                    b0 = _shuffle_write_bytes()
                    t0 = time.time()
                    chk = _span_checksum(
                        D.dup_span_doc_frame(
                            sdocs, "doc_id", "text", n=5, min_docs=2,
                            hash_grams=hashed,
                        )
                    )
                    secs = time.time() - t0
                    if secs < best_s:
                        best_s = secs
                        bytes_run = _shuffle_write_bytes() - b0
                    spark.catalog.clearCache()
                runs[key] = (round(best_s, 2), bytes_run, chk)
            # analytic join-key byte totals over the positional gram set
            words = F.split(F.col("text"), " ")
            k5 = F.size(words) - F.lit(4)
            grams = F.when(
                k5 > 0,
                F.transform(
                    F.sequence(F.lit(0), k5 - 1),
                    lambda i: F.concat_ws(" ", F.slice(words, i + 1, 5)),
                ),
            ).otherwise(F.array().cast("array<string>"))
            kb = sdocs.select(F.explode(grams).alias("g")).agg(
                F.count(F.lit(1)).alias("n"), F.sum(F.length("g")).alias("b")
            ).collect()[0]
            out["results"][f"span_uniform_{rows}"] = res = {
                "corpus": rows,
                "gram_rows": int(kb["n"]),
                "string_key_bytes": int(kb["b"]),
                "hash_key_bytes": 8 * int(kb["n"]),
                "key_byte_cut": round(kb["b"] / (8.0 * kb["n"]), 2),
                "string_s": runs["string"][0],
                "hashed_s": runs["hashed"][0],
                "string_shuffle_write_bytes": runs["string"][1],
                "hashed_shuffle_write_bytes": runs["hashed"][1],
                "shuffle_byte_cut": round(
                    runs["string"][1] / max(runs["hashed"][1], 1), 2
                ),
                "parity": runs["string"][2] == runs["hashed"][2],
            }
            print(f"span N={rows}: {json.dumps(res)}")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "results"}))


if __name__ == "__main__":
    main()
