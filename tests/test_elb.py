"""ELB parser tests (SURVEY.md §2.2 P1-P5, §5.5): well-formed HTTP/HTTPS,
failed-backend sentinel rows, quoted user agents with spaces, malformed
lines, gzip transparency."""

from __future__ import annotations

import gzip
import shutil

import pytest
from pyspark.sql import functions as F

from dataengineerchallenge_spark.sources.elb import (
    elb_sessions,
    parse_elb,
    quarantine,
    read_elb_log,
    valid_requests,
)

SAMPLE = "/root/repo/tests/data/elb_sample.log"

GOOD_LINE = (
    '2015-07-22T09:00:28.019143Z marketpalce-shop 123.242.248.130:54635 '
    '10.0.6.158:80 0.000022 0.026109 0.00002 200 200 0 699 '
    '"GET https://paytm.com:443/shop/authresponse?code=f2405b05 HTTP/1.1" '
    '"Mozilla/5.0 (Windows NT 6.1; rv:21.0) Gecko/20100101 Firefox/21.0" '
    'ECDHE-RSA-AES128-SHA TLSv1.2'
)
FAILED_BACKEND = (
    '2015-07-22T09:00:30.000000Z marketpalce-shop 1.2.3.4:1000 - '
    '-1 -1 -1 504 0 0 0 "GET https://paytm.com:443/x HTTP/1.1" "-" - -'
)


@pytest.fixture()
def one_line(spark):
    def mk(line):
        return parse_elb(spark.createDataFrame([(line,)], ["value"]))

    return mk


def test_good_line_fields(one_line):
    r = one_line(GOOD_LINE).collect()[0]
    assert r.is_valid
    assert r.client_ip == "123.242.248.130" and r.client_port == 54635
    assert r.backend_ip == "10.0.6.158" and r.backend_port == 80
    assert r.method == "GET" and r.protocol == "HTTP/1.1"
    assert r.url == "https://paytm.com:443/shop/authresponse?code=f2405b05"
    assert r.url_path == "/shop/authresponse"
    assert r.request_time == pytest.approx(0.000022)
    assert r.elb_status == 200 and r.sent_bytes == 699
    assert "Windows NT 6.1" in r.user_agent  # quoted spaces preserved
    assert r.ssl_protocol == "TLSv1.2"
    assert r.ts.isoformat().startswith("2015-07-22T09:00:28.019143")


def test_failed_backend_sentinels(one_line):
    r = one_line(FAILED_BACKEND).collect()[0]
    assert r.is_valid  # -1/- rows are valid per the ELB format
    assert r.backend_ip is None and r.backend_port is None
    assert r.request_time == -1.0 and r.elb_status == 504


@pytest.mark.parametrize(
    "bad",
    [
        "this is not an elb line at all",
        '2015-07-22T09:garbage marketpalce-shop 1.2.3.4:555 - -1 -1 -1 504 0 0 0 "GET x HTTP/1.1" "-" - -',
        "2015-07-22T09:10:00.000001Z marketpalce-shop",
    ],
)
def test_malformed_quarantined(one_line, bad):
    r = one_line(bad).collect()[0]
    assert not r.is_valid


def test_sample_log_partition(spark):
    parsed = parse_elb(read_elb_log(spark, SAMPLE))
    total = parsed.count()
    n_valid = valid_requests(parsed).count()
    n_bad = quarantine(parsed).count()
    assert total == 52
    assert n_valid + n_bad == total  # every line in exactly one bucket
    assert n_bad == 4


def test_gzip_transparent(spark, tmp_path):
    gz = tmp_path / "elb.log.gz"
    with open(SAMPLE, "rb") as fin, gzip.open(gz, "wb") as fout:
        shutil.copyfileobj(fin, fout)
    plain = valid_requests(parse_elb(read_elb_log(spark, SAMPLE)))
    gzipped = valid_requests(parse_elb(read_elb_log(spark, str(gz), spread=True)))
    assert gzipped.count() == plain.count()
    assert sorted(r.url for r in gzipped.select("url").collect()) == sorted(
        r.url for r in plain.select("url").collect()
    )


def test_elb_sessions_end_to_end(spark):
    sess = elb_sessions(spark, SAMPLE)
    rows = sess.collect()
    assert len(rows) > 0
    got_hits = sum(r.n_hits for r in rows)
    assert got_hits == valid_requests(parse_elb(read_elb_log(spark, SAMPLE))).count()
    assert all(r.duration_s >= 0 for r in rows)
    assert all(r.n_unique_urls >= 1 for r in rows)


def test_pyds_source_matches_builtin_text_source(spark):
    """The custom Python DataSource ingest route must deliver exactly the
    lines spark.read.text delivers (same count, same set)."""
    from dataengineerchallenge_spark.sources.elb import read_elb_log
    from dataengineerchallenge_spark.sources.pyds import read_elb_log_pyds

    path = SYNTH_LOG if "SYNTH_LOG" in globals() else None
    if path is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "data", "elb_synth.log.gz")
    a = {r["value"] for r in read_elb_log(spark, path).collect()}
    b = {r["value"] for r in read_elb_log_pyds(spark, path).collect()}
    assert a == b and len(a) > 900


def test_pyds_source_partitions_per_file(spark, tmp_path):
    """One InputPartition per file: a directory of N files scans as N
    partitions (the parallelism story for per-interval log drops)."""
    import gzip

    for i in range(3):
        with gzip.open(tmp_path / f"drop{i}.log.gz", "wt") as f:
            f.write(f"line-{i}\n")
    from dataengineerchallenge_spark.sources.pyds import read_elb_log_pyds

    df = read_elb_log_pyds(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 3
    assert sorted(r["value"] for r in df.collect()) == ["line-0", "line-1", "line-2"]


def test_pyds_stream_offsets_resume_across_restarts(spark, tmp_path):
    """The custom elblog stream reader's offset (files seen) must persist
    through the checkpoint: a restarted query ingests ONLY files dropped
    since the previous run — the exactly-once contract for per-interval
    log drops."""
    import gzip
    import shutil

    from dataengineerchallenge_spark.queries.elb import SYNTH_LOG
    from dataengineerchallenge_spark.sources.elb import parse_elb
    from dataengineerchallenge_spark.sources.pyds import stream_elb_log_pyds
    from dataengineerchallenge_spark.streaming import run_to_batch

    drops = tmp_path / "drops"
    drops.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    with gzip.open(SYNTH_LOG, "rt", encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    (drops / "drop1.log").write_text("\n".join(lines[:100]) + "\n")

    def run():
        # memory sink can't recover a checkpoint; a real file sink can
        raw = stream_elb_log_pyds(spark, str(drops))
        q = (
            parse_elb(raw)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        return spark.read.parquet(sink).count()

    assert run() == 100
    # restart, same checkpoint, no new files: nothing new ingested
    assert run() == 100
    # drop a second file: exactly ITS lines append
    (drops / "drop2.log").write_text("\n".join(lines[100:150]) + "\n")
    assert run() == 150


def test_geo_lpm_prefers_most_specific_block(spark):
    """203.0.2.x sits inside BOTH the /21 anycast block and the /24
    sg-pop block — the router's rule (and ours) is longest prefix wins.
    Every routed region in the fixture must agree with a pure-Python
    re-derivation of the same LPM over the same block list."""
    from dataengineerchallenge_spark.queries.elb import (
        SYNTH_LOG,
        _cidr_rows,
        elb_geo_traffic,
    )
    from dataengineerchallenge_spark.sources.elb import (
        parse_elb,
        read_elb_log,
        valid_requests,
    )

    rows = {r["region"]: r for r in elb_geo_traffic(spark, "").collect()}
    assert "sg-pop" in rows and "apac-anycast" in rows  # the /24 beat the /21

    def lpm(ip: str) -> str:
        o = [int(x) for x in ip.split(".")]
        v = (o[0] << 24) | (o[1] << 16) | (o[2] << 8) | o[3]
        cover = [(p, r) for r, p, lo, hi, _ in _cidr_rows() if lo <= v <= hi]
        if not cover:
            return "unrouted"
        best_p = max(p for p, _ in cover)
        # equal-prefix ties resolve payload ASC, the operator's rule
        return min(r for p, r in cover if p == best_p)

    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    ips = [r["client_ip"] for r in parsed.select("client_ip").distinct().collect()]
    expect: dict = {}
    for ip in ips:
        expect[lpm(ip)] = expect.get(lpm(ip), 0) + 1
    got = {r["region"]: r["n_clients"] for r in rows.values()}
    assert got == expect
    assert sum(r["n_requests"] for r in rows.values()) == parsed.count()


def test_backend_latency_nearest_rank_selection(spark):
    """Nearest-rank percentiles return actual input data: every reported
    pXX is a member of its path's sample set, ranks follow the
    ceil(p*n) definition against a sorted Python re-derivation, and the
    -1 no-backend sentinel never leaks into a sample."""
    from dataengineerchallenge_spark.queries.elb import (
        SYNTH_LOG,
        elb_backend_latency_percentiles,
    )
    from dataengineerchallenge_spark.sources.elb import (
        parse_elb,
        read_elb_log,
        valid_requests,
    )

    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    samples: dict = {}
    for r in parsed.filter("url_path is not null and backend_time >= 0").select(
        "url_path", "backend_time"
    ).collect():
        samples.setdefault(r["url_path"], []).append(r["backend_time"])
    out = elb_backend_latency_percentiles(spark, "").collect()
    assert len(out) == len(samples)
    for row in out:
        vals = sorted(samples[row["url_path"]])
        n = len(vals)
        assert row["n_requests"] == n
        for p, col in ((50, "backend_p50_s"), (95, "backend_p95_s"), (99, "backend_p99_s")):
            k = (n * p + 99) // 100  # ceil(p*n) in integers
            assert row[col] == vals[k - 1], (row["url_path"], p)
        assert row["backend_max_s"] == vals[-1] and vals[0] >= 0


def test_backend_latency_approx_sketch_tracks_exact(spark):
    """The mergeable percentile_approx twin must return values from the
    sample set within rank distance 1 of the exact nearest-rank answer
    at the fixture's accuracy setting — the sketch trades exactness for
    map-side mergeability, not correctness."""
    from dataengineerchallenge_spark.queries.elb import (
        SYNTH_LOG,
        elb_backend_latency_percentiles_approx,
    )
    from dataengineerchallenge_spark.sources.elb import (
        parse_elb,
        read_elb_log,
        valid_requests,
    )

    parsed = valid_requests(parse_elb(read_elb_log(spark, SYNTH_LOG)))
    samples: dict = {}
    for r in parsed.filter("url_path is not null and backend_time >= 0").select(
        "url_path", "backend_time"
    ).collect():
        samples.setdefault(r["url_path"], []).append(r["backend_time"])
    out = elb_backend_latency_percentiles_approx(spark, "").collect()
    assert len(out) == len(samples)
    for row in out:
        vals = sorted(samples[row["url_path"]])
        n = len(vals)
        assert row["n_requests"] == n
        for p, col in ((50, "backend_p50_s"), (95, "backend_p95_s"), (99, "backend_p99_s")):
            got = row[col]
            assert got in vals, (row["url_path"], col)  # sketch returns a datum
            k_exact = (n * p + 99) // 100
            # duplicated values occupy a rank RANGE; the sketch is
            # within tolerance if any of those ranks is
            ranks = [i + 1 for i, v in enumerate(vals) if v == got]
            assert min(abs(k - k_exact) for k in ranks) <= 1, (
                row["url_path"], p, ranks, k_exact,
            )


def test_backend_latency_approx_gk_exact_regime_precondition(spark):
    """ADVICE r13: the approx query's hash-green row against the EXACT
    nearest-rank oracle rests on a Spark-internal invariant — the
    Greenwald-Khanna summary at accuracy 10000 never compresses while
    every group's sample count stays far below the accuracy, so query(p)
    IS the exact rank datum. This pin makes that coupling diagnosable:
    (a) the fixture must stay in the no-compression regime (max group
    count ≤ accuracy/10 — a fixture regrowth trips this first), and
    (b) in that regime the approx query must still EQUAL the exact query
    value-for-value (an engine upgrade changing GK internals trips this
    with a named culprit instead of an anonymous sweep hash-fail)."""
    from dataengineerchallenge_spark.queries.elb import (
        elb_backend_latency_percentiles,
        elb_backend_latency_percentiles_approx,
    )

    exact = {r["url_path"]: r for r in elb_backend_latency_percentiles(spark, "").collect()}
    approx = {r["url_path"]: r for r in elb_backend_latency_percentiles_approx(spark, "").collect()}
    assert exact.keys() == approx.keys()
    max_n = max(r["n_requests"] for r in exact.values())
    assert max_n * 10 <= 10000, (
        f"fixture left the GK no-compression regime (max group n={max_n}, "
        "accuracy=10000): the approx query's exact oracle no longer applies"
    )
    for path, er in exact.items():
        ar = approx[path]
        for col in ("n_requests", "backend_p50_s", "backend_p95_s",
                    "backend_p99_s", "backend_max_s"):
            assert ar[col] == er[col], (path, col, ar[col], er[col])
