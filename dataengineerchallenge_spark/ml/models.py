"""Seeded pyspark.ml regressors for the MLE goals (D6;
/root/reference/README.md:18-23).

Determinism: LinearRegression with ``solver="normal"`` is a closed-form
fit — identical coefficients on identical data, no RNG. Splits are
content-based (time cutoff for the load series, key-hash for users),
never ``randomSplit``, so train/test membership is reproducible too.

At 100 TB: the normal-equations solve is a single treeAggregate over the
feature vectors (one pass, no iteration); scoring is a map — both scale
linearly. GBT/IForest-class models would swap in behind the same
assembler without changing the feature plumbing.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fit_predict(
    train: DataFrame, test: DataFrame, feature_cols: list[str], label_col: str
) -> DataFrame:
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=feature_cols, outputCol="features"),
            LinearRegression(
                featuresCol="features", labelCol=label_col, predictionCol="prediction",
                solver="normal", regParam=1e-6,
            ),
        ]
    )
    return pipe.fit(train).transform(test)


def time_split(df: DataFrame, ts_col: str, frac: float = 0.8) -> tuple[DataFrame, DataFrame]:
    """Deterministic temporal split: train on the first ``frac`` of the
    timeline, evaluate on the rest — the only honest split for a
    forecasting task (a random split would leak the future)."""
    cutoff = df.agg(
        F.percentile_approx(ts_col, frac, 10000).alias("c")
    ).collect()[0]["c"]
    return df.filter(F.col(ts_col) <= cutoff), df.filter(F.col(ts_col) > cutoff)


def key_split(df: DataFrame, key_col: str, mod: int = 10, train_buckets: int = 8) -> tuple[DataFrame, DataFrame]:
    """Deterministic entity split: hash the key into ``mod`` buckets,
    train on the first ``train_buckets`` — reproducible, no RNG, and
    whole entities never straddle the split."""
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(mod))
    return df.filter(bucket < train_buckets), df.filter(bucket >= train_buckets)
