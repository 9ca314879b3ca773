"""ELB-log query family (M2): the reference's REAL input format
(/root/reference/README.md:44-45) end-to-end — gzip scan → parse →
quarantine → sessionize — hash-checked against a DuckDB ``read_csv``
twin over the same checked-in synthetic log.

The log (tests/data/elb_synth.log.gz, ~1000 lines, 14 malformed) is
generated deterministically by tools/gen_elb_log.py; its malformed lines
are restricted to classes both engines classify identically (bad
timestamp / truncated / non-integer status). ``sf_dir`` is ignored by
design: ELB text logs are not part of the sf-scaled parquet fixtures —
this family pins the real input FORMAT, scale is covered by the events
queries. The tiny 52-line handwritten sample stays for pytest edge cases
(tests/test_elb.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.sessionize import ORACLE_SESSION_CTE
from dataengineerchallenge_spark.registry import register
from dataengineerchallenge_spark.sources.tables import local_frame
from dataengineerchallenge_spark.sources.elb import (
    elb_sessions,
    parse_elb,
    read_elb_log,
    valid_requests,
)

_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests",
    "data",
)
SAMPLE_LOG = os.path.join(_DATA_DIR, "elb_sample.log")
SYNTH_LOG = os.path.join(_DATA_DIR, "elb_synth.log.gz")

# DuckDB twin of sources/elb.py:parse_elb: all-varchar read (so malformed
# lines survive to be classified) + the same validity predicate.
_ORACLE_RAW = f"""
WITH raw AS (
  SELECT * FROM read_csv('{SYNTH_LOG}',
    delim=' ', quote='"', header=false, null_padding=true,
    all_varchar=true, auto_detect=false,
    columns={{{", ".join(f"'c{i}': 'VARCHAR'" for i in range(15))}}})
), typed AS (
  SELECT
    try_strptime(c0, '%Y-%m-%dT%H:%M:%S.%fZ') AS ts,
    split_part(c2, ':', 1) AS client_ip,
    try_cast(split_part(c2, ':', 2) AS INT) AS client_port,
    string_split(c11, ' ')[1] AS method,
    string_split(c11, ' ')[2] AS url,
    string_split(c11, ' ')[3] AS protocol,
    regexp_extract(string_split(c11, ' ')[2], '^[a-z]+://[^/]+(/[^?#]*)', 1) AS url_path,
    try_cast(c4 AS DOUBLE) AS request_time,
    try_cast(c5 AS DOUBLE) AS backend_time,
    try_cast(c6 AS DOUBLE) AS response_time,
    try_cast(c7 AS INT)  AS elb_status,
    try_cast(c8 AS INT)  AS backend_status,
    try_cast(c10 AS BIGINT) AS sent_bytes,
    c12 AS user_agent,
    COALESCE(try_strptime(c0, '%Y-%m-%dT%H:%M:%S.%fZ') IS NOT NULL
             AND c2 IS NOT NULL
             AND len(string_split(c11, ' ')) >= 2
             AND try_cast(c7 AS INT) IS NOT NULL, false) AS is_valid
  FROM raw
)
"""


@register(
    "elb_parse",
    oracle=_ORACLE_RAW
    + """
    SELECT client_ip, client_port, method, url, url_path, protocol,
           elb_status, backend_status, sent_bytes, user_agent
    FROM typed WHERE is_valid
    """,
)
def elb_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P4: typed parse of the synthetic gzip log (valid rows)."""
    return valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG))).select(
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


@register(
    "elb_malformed_audit",
    oracle=_ORACLE_RAW
    + """
    SELECT is_valid, CAST(count(*) AS BIGINT) AS n_lines
    FROM typed GROUP BY is_valid
    """,
)
def elb_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: quarantine audit — every line lands in exactly one bucket."""
    parsed = parse_elb(read_elb_log(spark, SYNTH_LOG))
    return parsed.groupBy("is_valid").agg(F.count(F.lit(1)).alias("n_lines"))


_SESSION_TAIL = ORACLE_SESSION_CTE.format(
    tbl="typed WHERE is_valid",
    key="client_ip",
    ts="ts",
    order="client_port",
    url="url",
    gap=900,
).replace("WITH hits AS", ", hits AS")


@register(
    "elb_sessionize",
    oracle=_ORACLE_RAW
    + _SESSION_TAIL
    + """
    SELECT skey AS client_ip, session_id, n_hits, duration_s,
           n_unique_urls, start_s, end_s
    FROM sessions
    """,
)
def elb_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goals 1-4 on the real log format: per-session stats by client IP,
    same sessionizer as the events family (gap > 900 s)."""
    return elb_sessions(spark, SYNTH_LOG)


@register(
    "elb_status_timeline",
    oracle=_ORACLE_RAW
    + """
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 60) * 60 AS minute_epoch_s,
           CAST(elb_status // 100 AS INT) AS status_class,
           CAST(count(*) AS BIGINT) AS n_requests,
           CAST(sum(sent_bytes) AS BIGINT) AS total_sent_bytes
    FROM typed WHERE is_valid
    GROUP BY 1, 2
    """,
)
def elb_status_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R:5 observation: per-minute request counts and bytes by status
    class (2xx/3xx/4xx/5xx) — the first chart any ELB operator draws.
    Pure map + one small-key aggregate."""
    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    return parsed.groupBy(
        ((F.unix_timestamp("ts") / 60).cast("long") * 60).alias("minute_epoch_s"),
        (F.col("elb_status") / 100).cast("int").alias("status_class"),
    ).agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.sum("sent_bytes").cast("long").alias("total_sent_bytes"),
    )


@register(
    "elb_top_paths",
    oracle=_ORACLE_RAW
    + """
    SELECT url_path, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(DISTINCT client_ip) AS BIGINT) AS n_ips
    FROM typed WHERE is_valid AND url_path IS NOT NULL
    GROUP BY url_path
    ORDER BY n_hits DESC, url_path
    LIMIT 10
    """,
)
def elb_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R:13-16 style observation: top-10 URL paths by hits with distinct
    visitor counts — TakeOrderedAndProject over a per-path aggregate,
    never a global sort."""
    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    return (
        parsed.filter(F.col("url_path").isNotNull())
        .groupBy("url_path")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.countDistinct("client_ip").cast("long").alias("n_ips"),
        )
        .orderBy(F.desc("n_hits"), F.asc("url_path"))
        .limit(10)
    )


@register(
    "elb_custom_source_parse",
    oracle=_ORACLE_RAW
    + """
    SELECT client_ip, client_port, method, url, url_path, protocol,
           elb_status, backend_status, sent_bytes, user_agent
    FROM typed WHERE is_valid
    """,
)
def elb_custom_source_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 via the Spark 4 Python DataSource API: the same typed parse as
    elb_parse, fed by the custom ``elblog`` source instead of
    spark.read.text — hash-equality against the read_csv oracle proves
    the custom ingest route is byte-identical to the built-in one."""
    from dataengineerchallenge_spark.sources.pyds import read_elb_log_pyds

    return valid_requests(parse_elb(read_elb_log_pyds(spark, SYNTH_LOG))).select(
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


@register(
    "elb_custom_source_stream_parse",
    oracle=_ORACLE_RAW
    + """
    SELECT client_ip, client_port, method, url, url_path, protocol,
           elb_status, backend_status, sent_bytes, user_agent
    FROM typed WHERE is_valid
    """,
)
def elb_custom_source_stream_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+S3 via the Spark 4 Python DataSource STREAM reader: the custom
    ``elblog`` source tailed as an unbounded stream (offset = files seen;
    each micro-batch ingests new drops), drained with availableNow into
    the same typed parse as elb_custom_source_parse. Hash-equality
    against the identical read_csv oracle proves batch read, custom
    batch source, and custom streaming source all deliver byte-identical
    rows."""
    from dataengineerchallenge_spark.sources.pyds import stream_elb_log_pyds
    from dataengineerchallenge_spark.streaming import run_to_batch

    lines = stream_elb_log_pyds(spark, SYNTH_LOG)
    parsed = valid_requests(parse_elb(lines)).select(
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
    return run_to_batch(parsed, "elb_pyds_stream", output_mode="append")


@register(
    "elb_user_agent_families",
    oracle=_ORACLE_RAW
    + """
    SELECT COALESCE(regexp_extract(user_agent, '^([A-Za-z][A-Za-z0-9_-]*)', 1),
                    '') AS ua_family,
           CAST(COUNT(*) AS BIGINT) AS n_requests,
           CAST(COUNT(DISTINCT client_ip) AS BIGINT) AS n_clients,
           CAST(SUM(sent_bytes) AS BIGINT) AS total_sent_bytes
    FROM typed WHERE is_valid
    GROUP BY 1
    """,
)
def elb_user_agent_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops observation on the real log format: traffic broken down by
    user-agent product family (leading product token of the UA string —
    the device/bot split an ELB operator actually pivots on). Per-row
    regexp on the parsed frame, one small aggregate."""
    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    return (
        parsed.withColumn(
            "ua_family",
            F.coalesce(
                F.regexp_extract("user_agent", "^([A-Za-z][A-Za-z0-9_-]*)", 1),
                F.lit(""),
            ),
        )
        .groupBy("ua_family")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.countDistinct("client_ip").alias("n_clients"),
            F.sum("sent_bytes").alias("total_sent_bytes"),
        )
    )


@register(
    "elb_bot_candidates",
    oracle=_ORACLE_RAW
    + """
    SELECT client_ip,
           CAST(COUNT(*) AS BIGINT) AS n_requests,
           CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS span_s,
           ROUND(COUNT(*) / GREATEST(CAST(floor(epoch(max(ts))) AS BIGINT)
                                     - CAST(floor(epoch(min(ts))) AS BIGINT), 1), 4)
             AS req_per_s,
           CAST(COUNT(DISTINCT url_path) AS BIGINT) AS n_paths
    FROM typed WHERE is_valid
    GROUP BY client_ip
    HAVING COUNT(*) / GREATEST(CAST(floor(epoch(max(ts))) AS BIGINT)
                               - CAST(floor(epoch(min(ts))) AS BIGINT), 1) > 0.1
        OR COUNT(DISTINCT url_path) >= 5
    """,
)
def elb_bot_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops/bot triage on the real log format: clients whose sustained
    request rate or path-sweep breadth looks automated (the classic
    follow-up to "most engaged users" — the top of that list is usually
    crawlers). Thresholds are illustrative; the operator is the per-key
    rate/breadth profile, one aggregate over the parsed scan. Epochs are
    floored to whole seconds on both engines before the rate division."""
    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    agg = parsed.groupBy("client_ip").agg(
        F.count(F.lit(1)).alias("n_requests"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("span_s"),
        F.countDistinct("url_path").alias("n_paths"),
    )
    rate = F.col("n_requests") / F.greatest(F.col("span_s"), F.lit(1))
    return agg.withColumn("req_per_s", F.round(rate, 4)).filter(
        (rate > 0.1) | (F.col("n_paths") >= 5)
    ).select("client_ip", "n_requests", "span_s", "req_per_s", "n_paths")


# GeoIP-style block table for elb_geo_traffic: (cidr, region) — the tiny
# deterministic stand-in for a MaxMind/RIR delegation dim. Prefix lengths
# deliberately overlap so the lookup MUST be longest-prefix-match, not
# first-match: 203.0.2.x is inside both the /21 anycast block and the
# /24 pop block and must resolve to the /24.
_GEO_BLOCKS = (
    ("203.0.0.0/21", "apac-anycast"),
    ("203.0.2.0/24", "sg-pop"),
    ("203.0.3.0/24", "in-pop"),
    ("203.0.4.0/23", "jp-pop"),
    ("198.51.100.0/24", "test-net-2"),
)


def _cidr_rows():
    """(region, prefix_len, ip_lo, ip_hi, octet1) rows from _GEO_BLOCKS —
    one Python source of truth inlined into BOTH the Spark dim frame and
    the DuckDB VALUES oracle."""
    rows = []
    for cidr, region in _GEO_BLOCKS:
        base, plen = cidr.split("/")
        plen = int(plen)
        a, b, c, d = (int(x) for x in base.split("."))
        lo = (a << 24) | (b << 16) | (c << 8) | d
        # mask host bits so a non-canonical base (203.0.2.5/24) can't
        # yield a range straddling block boundaries
        if plen < 32:
            lo &= ~((1 << (32 - plen)) - 1)
        hi = lo + (1 << (32 - plen)) - 1
        rows.append((region, plen, lo, hi, lo >> 24))
    return rows


@register(
    "elb_geo_traffic",
    oracle=_ORACLE_RAW
    + ", blocks(region, prefix_len, ip_lo, ip_hi) AS (VALUES "
    + ", ".join(f"('{r}', {p}, {lo}, {hi})" for r, p, lo, hi, _ in _cidr_rows())
    + """)
    , ips AS (
      SELECT DISTINCT client_ip,
             CAST(string_split(client_ip, '.')[1] AS BIGINT) * 16777216
           + CAST(string_split(client_ip, '.')[2] AS BIGINT) * 65536
           + CAST(string_split(client_ip, '.')[3] AS BIGINT) * 256
           + CAST(string_split(client_ip, '.')[4] AS BIGINT) AS ip_int
      FROM typed WHERE is_valid
    ), lpm AS (
      SELECT client_ip, region,
             row_number() OVER (PARTITION BY client_ip
                                ORDER BY prefix_len DESC, region) AS rn
      FROM ips JOIN blocks ON ip_int BETWEEN ip_lo AND ip_hi
    )
    SELECT COALESCE(l.region, 'unrouted') AS region,
           CAST(COUNT(*) AS BIGINT) AS n_requests,
           CAST(COUNT(DISTINCT t.client_ip) AS BIGINT) AS n_clients,
           CAST(SUM(t.sent_bytes) AS BIGINT) AS total_sent_bytes
    FROM typed t
    LEFT JOIN (SELECT client_ip, region FROM lpm WHERE rn = 1) l
      USING (client_ip)
    WHERE t.is_valid
    GROUP BY 1
    """,
)
def elb_geo_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geo enrichment of client IPs — the FIRST item on the survey's own
    "what additional data would sharpen this" list (OBSERVATIONS §6):
    traffic rolled up by the origin network block, resolved by
    longest-prefix-match against a CIDR dim (the GeoIP/RIR-delegation
    lookup shape every log pipeline runs).

    Spark-first LPM at scale (the general operator:
    ``operators.joins.lpm_join``, hypothesis-tested against a pure-
    Python LPM over random CIDR sets): (1) enrich the DISTINCT-IP
    frame, never the request stream — the expensive interval match runs
    once per IP, then rejoins as a plain equi-join; (2) the block dim
    is broadcast and exploded across each block's covered leading
    octets, so the interval join is a broadcast HASH join on the octet
    with a residual BETWEEN filter — no nested-loop over the full dim;
    (3) overlapping prefixes resolve by a per-IP window on prefix_len
    DESC — exactly the router's LPM rule, hash-checked against the
    identical DuckDB formulation."""
    from dataengineerchallenge_spark.operators.joins import lpm_join

    blocks = local_frame(
        spark,
        [r[:4] for r in _cidr_rows()],
        "region string, prefix_len int, ip_lo long, ip_hi long",
    )
    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    oct_ = lambda i: F.get(F.split("client_ip", "\\."), i).cast("long")  # noqa: E731
    ips = (
        parsed.select("client_ip")
        .distinct()
        .withColumn(
            "ip_int",
            oct_(0) * 16777216 + oct_(1) * 65536 + oct_(2) * 256 + oct_(3),
        )
    )
    lpm = lpm_join(ips, blocks).select("client_ip", "region")
    return (
        parsed.join(lpm, "client_ip", "left")
        .groupBy(F.coalesce("region", F.lit("unrouted")).alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.countDistinct("client_ip").cast("long").alias("n_clients"),
            F.sum("sent_bytes").cast("long").alias("total_sent_bytes"),
        )
    )


_PCTL_ORACLE = (
    _ORACLE_RAW
    + """
    , lat AS (
      SELECT url_path, backend_time,
             row_number() OVER (PARTITION BY url_path ORDER BY backend_time) AS rn,
             COUNT(*) OVER (PARTITION BY url_path) AS n
      FROM typed
      WHERE is_valid AND url_path IS NOT NULL AND backend_time >= 0
    )
    SELECT url_path,
           CAST(MAX(n) AS BIGINT) AS n_requests,
           MAX(CASE WHEN rn = (n * 50 + 99) // 100 THEN backend_time END) AS backend_p50_s,
           MAX(CASE WHEN rn = (n * 95 + 99) // 100 THEN backend_time END) AS backend_p95_s,
           MAX(CASE WHEN rn = (n * 99 + 99) // 100 THEN backend_time END) AS backend_p99_s,
           MAX(backend_time) AS backend_max_s
    FROM lat
    GROUP BY url_path
    """
)


@register("elb_backend_latency_percentiles", oracle=_PCTL_ORACLE)
def elb_backend_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity-planning observation the survey's closing question asks
    for (OBSERVATIONS §6: "backend latency percentiles per path"):
    nearest-rank p50/p95/p99 of the ELB entry's backend_processing_time
    per URL path. Nearest-rank (k = ceil(p*n), computed as the pure
    integer (n*P+99) DIV 100) returns an ACTUAL input datum — no
    interpolation, no float rounding — so the result hash-matches DuckDB
    bit-for-bit (interpolated quantile_cont vs F.percentile diverges on
    shortest-decimal-repr rounding ties; an earlier draft hit 154.545 ms
    rounding to .55 in Spark and .54 in DuckDB). The -1 sentinel ELB
    writes when the backend never answered is excluded (availability
    metric, not a latency sample). Rank selection is one window + one
    aggregate, both shuffling on url_path — bounded by path cardinality,
    not log size; at 100 TB the approx_percentile sketch
    (`value_percentiles_by_type`'s scale note) is the mergeable
    map-side form."""
    from pyspark.sql import Window

    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    lat = parsed.filter(
        F.col("url_path").isNotNull() & (F.col("backend_time") >= 0)
    ).select("url_path", "backend_time")
    part = Window.partitionBy("url_path")
    ranked = lat.withColumn(
        "rn", F.row_number().over(part.orderBy("backend_time"))
    ).withColumn("n", F.count(F.lit(1)).over(part))
    at = lambda p: F.max(  # noqa: E731
        F.when(
            F.col("rn") == ((F.col("n") * p + 99) / 100).cast("long"),
            F.col("backend_time"),
        )
    )
    return ranked.groupBy("url_path").agg(
        F.max("n").cast("long").alias("n_requests"),
        at(50).alias("backend_p50_s"),
        at(95).alias("backend_p95_s"),
        at(99).alias("backend_p99_s"),
        F.max("backend_time").alias("backend_max_s"),
    )


@register("elb_backend_latency_percentiles_approx", oracle=_PCTL_ORACLE)
def elb_backend_latency_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of `elb_backend_latency_percentiles`: Spark's
    `percentile_approx` (Greenwald-Khanna sketch) is MERGEABLE — each
    partition builds a bounded sketch and the shuffle moves sketches,
    not the per-group value lists the exact nearest-rank needs gathered.
    Same columns as the exact query so the two are diffable.

    HASH-CHECKED against the exact nearest-rank oracle (r13, clearing
    the driver's one `no_oracle` row): in the fixture regime every
    group's sample count (max 106) is far below the 10000 accuracy, so
    the Greenwald-Khanna summary never compresses — it holds every
    sample and query(p) returns EXACTLY the ceil(p·n)-rank datum the
    exact query selects, deterministically under any partition merge
    order (verified identical across runs and against all 300 groups).
    At production scale compression kicks in and the answer becomes
    genuinely approximate; the rank-distance ≤ 1 accuracy pin in
    tests/test_elb.py covers that contract."""
    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    ap = lambda p: F.percentile_approx("backend_time", p, 10000)  # noqa: E731
    return (
        parsed.filter(F.col("url_path").isNotNull() & (F.col("backend_time") >= 0))
        .groupBy("url_path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_requests"),
            ap(0.5).alias("backend_p50_s"),
            ap(0.95).alias("backend_p95_s"),
            ap(0.99).alias("backend_p99_s"),
            F.max("backend_time").alias("backend_max_s"),
        )
    )
