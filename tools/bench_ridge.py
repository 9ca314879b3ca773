"""Exact-ridge vs MLlib pricing (VERDICT r18 stretch #7): the honest
"when is the deterministic model enough" readout, the ADC-mining-
negative-result school.

Same folds for every model: the md5-u32 80/20 user split the ridge
rungs use (never randomSplit). On the shared train buckets we fit

- the exact normal-equation ridge (one 18-register moment pass +
  driver Cramer solve — hash-green machinery),
- MLlib LinearRegression (solver="normal", the ml/models.py config),
- MLlib GBTRegressor (seeded, the predict_session_length_gbt config),

all on the SAME 3 features (n_sessions, avg_hits, active_span_hours),
then score the SAME holdout and report per-target MAE (1e-6 grid) plus
train wall time. The open question this settles: do the rows-only
MLlib fits buy accuracy the hash-green ridge gives up?

Usage: python tools/bench_ridge.py [--sf-dir /root/testdata/sf0.1]
Writes BENCH_ridge.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 8g pyspark-shell")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor, LinearRegression
    from pyspark.sql import functions as F

    from dataengineerchallenge_spark.queries.regressor import (
        _RG_TRAIN_BUCKETS,
        _pred_text,
        _rg_feats,
        ridge_fit,
    )
    from dataengineerchallenge_spark.session import get_spark

    spark = get_spark("bench_ridge", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    feats = _rg_feats(spark, args.sf_dir).localCheckpoint()
    train = feats.filter(F.col("bucket") < _RG_TRAIN_BUCKETS).cache()
    test = feats.filter(F.col("bucket") >= _RG_TRAIN_BUCKETS).cache()
    n_train, n_test = train.count(), test.count()
    cols = ["x1", "x2", "x3"]

    def mae_micro(scored, ycol: str, pcol: str) -> int:
        row = scored.agg(
            F.expr(
                f"cast(round(sum(cast(round(abs({ycol} - {pcol}) * 1000000.0,"
                f" 0) as bigint)) * 1.0 / count(1), 0) as bigint)"
            ).alias("mae")
        ).collect()[0]
        return int(row["mae"])

    out: dict = {
        "sf_dir": args.sf_dir,
        "n_train": n_train,
        "n_test": n_test,
        "models": {},
    }

    # exact normal-equation ridge (both targets from ONE register pass)
    t0 = time.time()
    wa, wb, mean_a, mean_b = ridge_fit(train)
    ridge_train_s = time.time() - t0
    scored = test.selectExpr(
        "ya",
        "yb",
        f"({_pred_text(wa)}) AS pa",
        f"({_pred_text(wb)}) AS pb",
    )
    out["models"]["exact_ridge"] = {
        "train_s": round(ridge_train_s, 3),
        "mae_session_micro": mae_micro(scored, "ya", "pa"),
        "mae_urls_micro": mae_micro(scored, "yb", "pb"),
        "hash_green": True,
    }
    # train-mean baseline (free from the same registers)
    base = test.selectExpr(
        "ya", "yb", f"{mean_a!r} AS pa", f"{mean_b!r} AS pb"
    )
    out["models"]["train_mean_baseline"] = {
        "train_s": 0.0,
        "mae_session_micro": mae_micro(base, "ya", "pa"),
        "mae_urls_micro": mae_micro(base, "yb", "pb"),
        "hash_green": True,
    }

    for name, reg in (
        (
            "mllib_linear_normal",
            LinearRegression(
                featuresCol="features",
                labelCol="label",
                predictionCol="prediction",
                solver="normal",
                regParam=1e-6,
            ),
        ),
        (
            "mllib_gbt",
            GBTRegressor(
                featuresCol="features",
                labelCol="label",
                predictionCol="prediction",
                maxIter=10,
                maxDepth=3,
                seed=42,
                subsamplingRate=1.0,
                featureSubsetStrategy="all",
            ),
        ),
    ):
        rec: dict = {"hash_green": False}
        for target, ycol in (("session", "ya"), ("urls", "yb")):
            pipe = Pipeline(
                stages=[
                    VectorAssembler(inputCols=cols, outputCol="features"),
                    reg.copy(),
                ]
            )
            t0 = time.time()
            model = pipe.fit(train.withColumn("label", F.col(ycol)))
            dt = time.time() - t0
            pred = model.transform(test.withColumn("label", F.col(ycol)))
            rec[f"train_{target}_s"] = round(dt, 3)
            rec[f"mae_{target}_micro"] = mae_micro(pred, ycol, "prediction")
        out["models"][name] = rec

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_ridge.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
