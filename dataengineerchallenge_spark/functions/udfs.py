"""Python UDF surface (SURVEY.md §2.10 D1-D5; /root/reference/README.md:40-41
allows custom functions "as long as you can explain it").

Discipline (the 100 TB rule): built-in ``pyspark.sql.functions`` first —
they run JVM-side inside whole-stage codegen. Python enters ONLY through
Arrow-vectorized shapes (pandas_udf / applyInPandas / mapInPandas /
UDTF), never row-at-a-time ``F.udf``. Each function below documents why
the escape hatch is (or is not) strictly necessary — some exist as the
vetted template for the cases that do need it (multi-feature fits in
ml/, payload decode in multimodal).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# NOTE: decorators use DataType instances, not DDL strings — a DDL string
# is parsed via the active SparkContext, which does not exist when a
# Python WORKER re-imports this module to deserialize the plain
# functions (fit_user_trend / enrich_batches) used by applyInPandas.


@pandas_udf(DoubleType())
def sigmoid_score(v: pd.Series) -> pd.Series:
    """D1 scalar pandas UDF: logistic score of a numeric column.

    A built-in equivalent exists (1/(1+exp(-x))) — this UDF is the pinned
    template for the Arrow scalar path (numpy kernels, e.g. scipy special
    functions, where no built-in exists). Arrow-batched: one numpy call
    per ~10k-row batch, no per-row Python. NULL inputs stay NULL (nullable
    Float64, like enrich_batches) — plain float64 would turn them into NaN
    and break parity with the SQL oracle's NULL propagation."""
    x = v.astype("float64")
    out = pd.Series(1.0 / (1.0 + np.exp(-(x - 5.0))), index=v.index).astype("Float64")
    return out.mask(v.isna(), pd.NA)


@pandas_udf(DoubleType())
def trimmed_mean_10(v: pd.Series) -> float:
    """D2 grouped-agg pandas UDF: 10% two-sided trimmed mean.

    No Spark built-in computes a count-trimmed mean (percentile_approx
    trims by value, not rank). Definition: sort, drop floor(n/10) rows
    from each end, average the rest — mirrored exactly by the DuckDB
    oracle's row_number formulation. NULLs are dropped before trimming
    (SQL aggregate semantics); an all-NULL group yields NULL, not NaN."""
    a = np.sort(v.dropna().to_numpy(dtype="float64"))
    if len(a) == 0:
        return None
    k = len(a) // 10
    kept = a[k : len(a) - k] if len(a) - 2 * k > 0 else a
    return float(kept.mean())


# D3 applyInPandas: per-group OLS fit. For the 1-feature case Spark's
# regr_slope/regr_intercept built-ins suffice (and the oracle uses
# DuckDB's); this grouped-map version is the template the ml/ module
# extends to multi-feature designs where no built-in aggregate exists.
TREND_SCHEMA = "user_id string, n bigint, slope_per_hour double, intercept double"


def fit_user_trend(pdf: pd.DataFrame) -> pd.DataFrame:
    x = pdf["ts_s"].to_numpy(dtype="float64")
    y = pdf["value"].to_numpy(dtype="float64")
    x = x - x.min()  # center: raw epoch seconds would destroy conditioning
    n = len(x)
    if n < 2 or np.ptp(x) == 0:
        slope, intercept = 0.0, float(y.mean())
    else:
        A = np.stack([x, np.ones_like(x)], axis=1)
        (slope, intercept), *_ = np.linalg.lstsq(A, y, rcond=None)
    return pd.DataFrame(
        {
            "user_id": [str(pdf["user_id"].iloc[0])],
            "n": [n],
            "slope_per_hour": [float(slope) * 3600.0],
            "intercept": [float(intercept)],
        }
    )


ENRICH_SCHEMA = "event_id string, dow int, value_bucket int, log1p_value double"


def enrich_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """D4 mapInPandas: iterator-of-Arrow-batches enrichment.

    Row-local derivations (day-of-week, bucketing, log1p) — all have
    built-ins; this is the vetted iterator shape for decode-heavy batch
    transforms (see operators/multimodal.py) where per-batch setup cost
    (codec init, model load) must amortize across the batch."""
    for pdf in batches:
        ts = pd.to_datetime(pdf["ts_s"], unit="s")
        v = pdf["value"].astype("float64")
        # nullable extension dtypes (Int32/Float64): NULL inputs stay NULL
        # through the Arrow round-trip instead of becoming garbage ints
        # (NaN // 2 cast to int32 is undefined) — matches the oracle's
        # NULL propagation on messy data
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].astype(str),
                "dow": (ts.dt.dayofweek + 1).astype("Int32"),  # 1=Mon, ISO
                "value_bucket": (v // 2).clip(upper=4).astype("Int32"),
                "log1p_value": pd.Series(np.log1p(v.to_numpy()), index=pdf.index).astype("Float64"),
            }
        )


# D3+ cogroup applyInPandas: per-key two-frame grouped map. The as-of
# match below reproduces operators/joins.as_of_join semantics (latest
# right row with ts <= left ts, inclusive) so the same SQL oracle checks
# both routes.
COGROUP_ASOF_SCHEMA = "event_id bigint, user_id bigint, gap_s bigint"


def asof_match_groups(purchases: pd.DataFrame, views: pd.DataFrame) -> pd.DataFrame:
    """Within one user's cogroup: for each purchase, the gap to the
    latest view at-or-before it (searchsorted on the sorted view
    timestamps — O(n log m) per group, no pairwise blowup). Purchases
    with no prior view keep a NULL gap."""
    if len(purchases) == 0:
        return pd.DataFrame(
            {"event_id": pd.array([], dtype="int64"),
             "user_id": pd.array([], dtype="int64"),
             "gap_s": pd.array([], dtype="Int64")}
        )
    p = purchases.sort_values("ts_s")
    pts = p["ts_s"].to_numpy(dtype="int64")
    vts = np.sort(views["ts_s"].to_numpy(dtype="int64")) if len(views) else np.array([], dtype="int64")
    idx = np.searchsorted(vts, pts, side="right") - 1
    gaps = pd.array(
        [int(t - vts[i]) if i >= 0 else None for t, i in zip(pts, idx)], dtype="Int64"
    )
    return pd.DataFrame(
        {"event_id": p["event_id"].to_numpy(), "user_id": p["user_id"].to_numpy(), "gap_s": gaps}
    )


def make_word_count_udtf():
    """D5 Python UDTF: text → one row per distinct word with its count.

    ``F.explode(F.split(...))`` + groupBy is the built-in (and faster)
    plan for exactly this; the UDTF form is the template for multi-row
    emitters with per-row custom state (stateful parsers, span
    extractors) that explode can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, n: bigint")
    class WordCounts:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None:
                return
            counts: dict[str, int] = {}
            for w in text.split(" "):
                counts[w] = counts.get(w, 0) + 1
            for w in sorted(counts):
                yield w, counts[w]

    return WordCounts


__all__ = [
    "sigmoid_score",
    "trimmed_mean_10",
    "TREND_SCHEMA",
    "fit_user_trend",
    "ENRICH_SCHEMA",
    "enrich_batches",
    "make_word_count_udtf",
]
