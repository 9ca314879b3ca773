"""AWS ELB access-log source (SURVEY.md §2.1 S1, §2.2 P1-P5).

The reference's declared input (/root/reference/README.md:44-45) is the
AWS Classic ELB access-log entry: one space-delimited line per HTTP
request, quoted "request" and "user_agent" fields, gzip files.

Spark-first parse: ONE ``from_csv`` per line (sep=' ', quote='"') — a
single vectorized JVM-side parse instead of 15 regexp_extract passes.
Malformed lines ("messy (ie real) data", README.md:61) surface through
PERMISSIVE mode + a corrupt-record column and are quarantined, never
dropped silently, and never kill the schema.

Scale notes (100 TB): gzip is unsplittable → each .log.gz file is one
scan task. ``spread=True`` round-robin-repartitions raw lines BEFORE the
parse so the expensive parse runs on all cores; the subsequent
sessionization window shuffles on client_ip anyway, so this adds exactly
one extra (cheap, line-level) shuffle in exchange for full parse
parallelism. With many input files (the AWS delivery format emits one
file per node per interval, so real datasets are many-file) the scan
itself already parallelizes and spread can stay off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 15 positional raw fields of the classic ELB entry format.
ELB_RAW_DDL = (
    "ts_raw STRING, elb STRING, client STRING, backend STRING, "
    "request_time DOUBLE, backend_time DOUBLE, response_time DOUBLE, "
    "elb_status INT, backend_status INT, received_bytes BIGINT, "
    "sent_bytes BIGINT, request STRING, user_agent STRING, "
    "ssl_cipher STRING, ssl_protocol STRING, _corrupt STRING"
)

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"


def read_elb_log(spark: SparkSession, path: str, spread: bool = False) -> DataFrame:
    """S1: raw line scan. ``spark.read.text`` decodes .gz transparently."""
    df = spark.read.text(path)
    if spread:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def parse_elb(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """P1-P5: typed parse of raw ELB lines.

    Returns every input line with typed columns plus:
      - ``is_valid``: line parsed fully enough to analyze
      - ``raw_line``: original text (quarantine / reprocessing side output)
    """
    opts = {
        "sep": " ",
        "quote": '"',
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt",
    }
    r = lines.select(
        F.col(value_col).alias("raw_line"),
        F.from_csv(F.col(value_col), ELB_RAW_DDL, opts).alias("r"),
    ).select("raw_line", "r.*")

    # F.get (not [i]): malformed lines yield short arrays, and under ANSI
    # mode an out-of-bounds [i] throws instead of returning null.
    split_req = F.split(F.col("request"), " ")
    dash_null = lambda c: F.when(F.col(c) == "-", None).otherwise(F.col(c))  # noqa: E731
    # ONE withColumns call instead of a 9-deep withColumn chain (r20):
    # classic PySpark analyzes eagerly per DataFrame op, so an op chain
    # over a growing plan pays quadratic JVM analysis — measured ~0.5 s
    # of pure build time for this parse alone. Columns that referenced
    # an earlier chain column (url_path, is_valid) inline the same
    # expression instead; the optimizer collapsed the chain to exactly
    # this single projection anyway, so the plan and values are
    # unchanged.
    ts_c = F.try_to_timestamp(F.col("ts_raw"), F.lit(TS_FMT))
    client_ip_c = F.get(F.split("client", ":"), 0)
    url_c = F.get(split_req, 1)
    return r.withColumns(
        {
            "ts": ts_c,
            "client_ip": client_ip_c,
            "client_port": F.get(F.split("client", ":"), 1).cast("int"),
            "backend_ip": F.get(F.split(dash_null("backend"), ":"), 0),
            "backend_port": F.get(F.split(dash_null("backend"), ":"), 1).cast(
                "int"
            ),
            "method": F.get(split_req, 0),
            "url": url_c,
            "protocol": F.get(split_req, 2),
            "url_path": F.parse_url(url_c, F.lit("PATH")),
            "is_valid": F.col("_corrupt").isNull()
            & ts_c.isNotNull()
            & client_ip_c.isNotNull()
            & url_c.isNotNull()
            & F.col("elb_status").isNotNull(),
        }
    ).drop("ts_raw", "client", "backend")


def valid_requests(parsed: DataFrame) -> DataFrame:
    """The analyzable stream; malformed lines go to ``quarantine``."""
    return parsed.filter(F.col("is_valid")).drop("is_valid", "_corrupt", "raw_line")


def quarantine(parsed: DataFrame) -> DataFrame:
    """Corrupt-row side output (P5): raw lines kept for reprocessing."""
    return parsed.filter(~F.col("is_valid")).select("raw_line")


def elb_sessions(
    spark: SparkSession, path: str, gap_s: int = 900, url_col: str = "url"
) -> DataFrame:
    """End-to-end: goals 1-4 pipeline on a real ELB log
    (scan → parse → quarantine split → sessionize → per-session stats)."""
    from dataengineerchallenge_spark.operators.sessionize import session_stats

    req = valid_requests(parse_elb(read_elb_log(spark, path)))
    return session_stats(
        req,
        key="client_ip",
        ts="ts",
        url=url_col,
        order_col=["client_port", url_col],
    )
