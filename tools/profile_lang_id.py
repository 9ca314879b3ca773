"""Stage-level wall-time attribution for ``doc_lang_id`` (VERDICT r7 #5 /
r8 missing #4: the one bench row with unexplained round-over-round
drift, 1.1-1.2x, plans unchanged).

The query is four sequential costs; this tool times each boundary
separately (warm, best-of-``--iters``) so drift can be attributed to a
STAGE instead of hand-waved:

- **tok_s**: corpus scan + `split` + `explode` (the token stream both
  the trainer and the scorer consume);
- **train_s**: the (lang, word) count aggregate that IS the model,
  materialized exactly as the query does (lazy localCheckpoint);
- **score_s**: the log-likelihood score frame through the REGISTERED
  ``lang_id_scores`` body (as of r10 the tf-collapsed form: per-(doc,
  word) term frequencies → ×|langs| matched inner join → (doc, lang)
  aggregate − per-lang constant; see queries/text.py for the algebra);
- **argmax_s**: the per-doc row_number window on the |docs| x |langs|
  score frame;
- **full_s**: the registered query end-to-end (sanity: ~= the sum of
  the increments it contains).

Each stage is driven to a `count()` (no result materialization skew);
the deltas between consecutive stages are the per-stage attribution
written to the artifact. Run on a QUIET box — the whole point is
separating machine noise from plan cost.

Usage:
    python tools/profile_lang_id.py [--sf-dir /root/testdata/sf0.1]
        [--iters 3] [--out BENCH_langid.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="BENCH_langid.json")
    args = ap.parse_args()

    from dataengineerchallenge_spark.session import get_spark
    from dataengineerchallenge_spark.sources.tables import load_table, spread

    spark = get_spark("profile-lang-id")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf_dir, "documents")

    def best(build) -> float:
        b = float("inf")
        for _ in range(args.iters):
            t0 = time.time()
            build().count()
            b = min(b, time.time() - t0)
        return round(b, 3)

    def tok():
        return spread(docs).select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
        )

    def lw():
        return (
            tok()
            .groupBy(F.col("lang").alias("l"), "w")
            .agg(F.count("*").cast("double").alias("c"))
        )

    def scores(upto_window: bool):
        # the REGISTERED dataflow, not a mirror (r10: the score stage was
        # rewritten once already and a divergent copy here would profile
        # the wrong plan)
        from dataengineerchallenge_spark.queries.text import (
            lang_id_frame,
            lang_id_scores,
        )

        return lang_id_frame(docs) if upto_window else lang_id_scores(docs)

    # warm the scan cache once so every number below is a warm number
    docs.count()

    tok_s = best(tok)
    train_s = best(lw)
    score_s = best(lambda: scores(upto_window=False))
    full_s = best(lambda: scores(upto_window=True))

    out = {
        "metric": "lang_id_profile",
        "sf_dir": args.sf_dir,
        "iters": args.iters,
        "stages": {
            "tok_s": tok_s,
            "train_s": train_s,
            "score_s": score_s,
            "full_s": full_s,
            # increments: what each boundary ADDS over the previous one
            "train_over_tok_s": round(train_s - tok_s, 3),
            "score_over_train_s": round(score_s - train_s, 3),
            "argmax_over_score_s": round(full_s - score_s, 3),
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
