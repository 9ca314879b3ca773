"""ELB-log query family (M2): the reference's REAL input format
(/root/reference/README.md:44-45) end-to-end — scan → parse → quarantine
→ sessionize. Driver check is rows-only (the oracle views cover only the
fixture tables); exact parse semantics are pinned by tests/test_elb.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.elb import (
    elb_sessions,
    parse_elb,
    read_elb_log,
    valid_requests,
)

SAMPLE_LOG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "data",
    "elb_sample.log",
)


@register("elb_parse")
def elb_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4: typed parse of the checked-in sample log (valid rows)."""
    return valid_requests(parse_elb(read_elb_log(spark, SAMPLE_LOG))).select(
        "client_ip",
        "client_port",
        "method",
        "url",
        "url_path",
        "protocol",
        "elb_status",
        "backend_status",
        "sent_bytes",
        "user_agent",
    )


@register("elb_malformed_audit")
def elb_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: quarantine audit — every line lands in exactly one bucket."""
    parsed = parse_elb(read_elb_log(spark, SAMPLE_LOG))
    return parsed.groupBy("is_valid").agg(F.count(F.lit(1)).alias("n_lines"))


@register("elb_sessionize")
def elb_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goals 1-4 on the real log format: per-session stats by client IP."""
    return elb_sessions(spark, SAMPLE_LOG)
