"""Checkpoint → restart → resume parity for every stateful streaming
shape (VERDICT r4 next-round #7).

Each test feeds a file source in TWO (or three) separate availableNow
runs sharing one checkpoint — a full query restart between runs — with
the input split so that in-flight state (an open window, an open
session, a buffered join row, a seen-keys dedup set) MUST survive the
restart for the final output to be correct. State loss would show up as
a partial count, a split session, a missing join pair, or a duplicate
row; double-replay would show up as doubled counts. Emitted (append)
rows are final, so every emitted row is also checked against the batch
twin computed on the full input.

Base event time is 2024-01-01 10:00:00 UTC; offsets are seconds.
Watermark delay is the production default (30 min); a late "closer" row
in the final run advances the watermark far enough to flush everything
under test.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pyspark.sql.functions as F
import pytest

SCHEMA = "event_id string, ts timestamp, user_id string, event_type string"
BASE = datetime(2024, 1, 1, 10, 0, 0, tzinfo=timezone.utc)
BASE_S = int(BASE.timestamp())


def t(off_s: int) -> datetime:
    return datetime.fromtimestamp(BASE_S + off_s, timezone.utc)


def ev(eid: str, off_s: int, user: str = "u1", etype: str = "view"):
    return (eid, t(off_s), user, etype)


def _run_split(spark, tmp_path, build, batches, schema: str = SCHEMA):
    """Write each batch of rows as a new file and drive the streamed
    ``build(source)`` to a parquet sink with availableNow, restarting the
    query (same checkpoint) once per batch. Returns the accumulated sink
    rows."""
    indir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            os.path.join(indir, f"f{i}")
        )
        q = (
            build(spark.readStream.schema(schema).parquet(indir + "/*"))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    try:
        return spark.read.parquet(out).collect()
    except Exception:
        return []


def test_restart_tumbling_window_merges_split_minute(spark, tmp_path):
    """T1/T4: a 1-minute window receiving rows on both sides of a restart
    must emit ONE row with the merged count."""
    from dataengineerchallenge_spark.streaming.windows import per_minute_load_stream

    rows = _run_split(
        spark,
        tmp_path,
        per_minute_load_stream,
        [
            [ev("e1", 10), ev("e2", 130)],          # run 1: minute 0 open, minute 2 open
            [ev("e3", 40), ev("e4", 5400)],         # restart: +1 to minute 0, closer at 11:30
            [ev("e5", 11000)],                      # final flush run
        ],
    )
    got = {r["minute_epoch_s"]: r["n_requests"] for r in rows}
    assert len(got) == len(rows), "restart emitted a window twice"
    assert got[BASE_S] == 2, f"minute-0 count lost across restart: {got}"
    assert got[BASE_S + 120] == 1


def test_restart_sliding_window_matches_batch(spark, tmp_path):
    """T2: every emitted sliding window equals the batch twin on the full
    input — including the windows whose rows straddled the restart."""
    from dataengineerchallenge_spark.streaming.windows import sliding_load_stream

    batches = [
        [ev("e1", 10), ev("e2", 130)],
        [ev("e3", 40), ev("e4", 5400)],
        [ev("e5", 11000)],
    ]
    rows = _run_split(spark, tmp_path, sliding_load_stream, batches)
    got = {r["window_start_s"]: r["n_requests"] for r in rows}
    assert len(got) == len(rows), "restart emitted a window twice"
    allrows = [r for b in batches for r in b]
    batch = {
        r["window_start_s"]: r["n_requests"]
        for r in spark.createDataFrame(allrows, SCHEMA)
        .groupBy(F.window("ts", "5 minutes", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_requests"))
        .select(F.unix_timestamp("w.start").alias("window_start_s"), "n_requests")
        .collect()
    }
    assert got, "no sliding windows emitted"
    for ws, n in got.items():
        assert batch[ws] == n, f"window {ws}: emitted {n} != batch {batch[ws]}"
    # the window starting at base covers rows from both runs
    assert got.get(BASE_S) == 3


def test_restart_session_window_merges_split_session(spark, tmp_path):
    """T3: a session whose events straddle the restart must emit as ONE
    session with all hits; a post-gap event after restart must not
    reopen it."""
    from dataengineerchallenge_spark.streaming.sessionize import session_window_stream

    rows = _run_split(
        spark,
        tmp_path,
        session_window_stream,
        [
            [ev("e1", 0), ev("e2", 300, etype="click")],  # open session
            [ev("e3", 600), ev("e4", 5400)],              # continue + next session
            [ev("e5", 11000)],                            # flush
        ],
    )
    got = {(r["skey"], r["start_s"], r["end_s"]): (r["n_hits"], r["n_unique_urls"]) for r in rows}
    assert len(got) == len(rows), "restart emitted a session twice"
    merged = ("u1", BASE_S, BASE_S + 600 + 900)
    assert got.get(merged) == (3, 2), f"split session not merged: {got}"


def test_restart_stateful_sessionizer_merges_split_session(spark, tmp_path):
    """T5: the applyInPandasWithState sessionizer's explicit state must
    survive restart — the session spanning the restart emits once, with
    all three hits, when the post-gap event closes it."""
    from dataengineerchallenge_spark.streaming.sessionize import stateful_sessionize_stream

    rows = _run_split(
        spark,
        tmp_path,
        stateful_sessionize_stream,
        [
            [ev("e1", 0), ev("e2", 300)],
            [ev("e3", 600), ev("e4", 5400)],   # 5400-600 > 900 closes the open session
            [ev("e5", 11000)],                 # watermark flushes the 5400 session by timeout
        ],
    )
    got = {(r["skey"], r["session_start_s"], r["session_end_s"]): r["n_hits"] for r in rows}
    assert len(got) == len(rows), "restart emitted a session twice"
    assert got.get(("u1", BASE_S, BASE_S + 600)) == 3, f"split session not merged: {got}"
    assert got.get(("u1", BASE_S + 5400, BASE_S + 5400)) == 1


def test_restart_stream_stream_join_pairs_across_restart(spark, tmp_path):
    """Stream-stream interval join: a view buffered before the restart
    must still pair with a purchase arriving after it."""
    from dataengineerchallenge_spark.streaming.joins import (
        purchases_within_hour_of_view_stream,
    )

    rows = _run_split(
        spark,
        tmp_path,
        purchases_within_hour_of_view_stream,
        [
            [ev("v1", 0, etype="view")],
            [ev("p1", 1800, etype="purchase")],
            [ev("z1", 30000, etype="view")],
        ],
    )
    got = {(r["user_id"], r["view_id"], r["purchase_id"]): r["gap_s"] for r in rows}
    assert got == {("u1", "v1", "p1"): 1800}, f"buffered view lost across restart: {got}"


def test_restart_dedup_drops_redelivery_after_restart(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a re-delivery of a pre-restart
    event (within the watermark) must be dropped using recovered state."""

    def build(src):
        return (
            src.withWatermark("ts", "30 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id", F.unix_timestamp("ts").alias("ts_s"))
        )

    rows = _run_split(
        spark,
        tmp_path,
        build,
        [
            [ev("e1", 0)],
            [ev("e1", 0), ev("e2", 60)],  # e1 re-delivered after restart
            [ev("e3", 11000)],
        ],
    )
    got = sorted((r["event_id"], r["ts_s"]) for r in rows)
    assert got == [
        ("e1", BASE_S),
        ("e2", BASE_S + 60),
        ("e3", BASE_S + 11000),
    ], f"dedup state lost or duplicated across restart: {got}"


def test_restart_stream_static_join_window_merges(spark, tmp_path):
    """Stream-static join + tumbling agg: the per-minute weighted sum
    must merge contributions from both sides of the restart."""
    from dataengineerchallenge_spark.streaming.joins import weighted_minute_load_stream

    def build(src):
        weights = src.sparkSession.createDataFrame(
            [("view", 1.0), ("purchase", 10.0)], "event_type string, weight double"
        )
        return weighted_minute_load_stream(src, weights)

    rows = _run_split(
        spark,
        tmp_path,
        build,
        [
            [ev("e1", 10, etype="view")],
            [ev("e2", 40, etype="purchase"), ev("e3", 5400)],
            [ev("e4", 11000)],
        ],
    )
    got = {r["minute_epoch_s"]: (r["n_requests"], r["weighted_load"]) for r in rows}
    assert len(got) == len(rows), "restart emitted a window twice"
    assert got.get(BASE_S) == (2, 11.0), f"weighted window not merged: {got}"
