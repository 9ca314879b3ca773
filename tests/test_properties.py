"""Property-based invariants (SURVEY.md §5.4, hypothesis): the Spark
sessionizer must agree with an independent pure-Python reference on
arbitrary event sets, and dedup keep-first must hold under duplication."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from dataengineerchallenge_spark.operators.dedup import exact_dedup
from dataengineerchallenge_spark.operators.sessionize import session_stats, with_session_ids

GAP = 900

events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50_000)),
    min_size=1,
    max_size=60,
)


def _reference_sessions(rows):
    """Independent Python sessionizer: gap > GAP starts a new session."""
    by_user = defaultdict(list)
    for eid, (u, ts) in enumerate(rows):
        by_user[u].append((ts, eid))
    out = {}  # (user, session_id) -> list of ts
    for u, hits in by_user.items():
        hits.sort()
        sid = 0
        prev = None
        for ts, _eid in hits:
            if prev is None or ts - prev > GAP:
                sid += 1
            out.setdefault((u, sid), []).append(ts)
            prev = ts
    return out


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy)
def test_sessionizer_matches_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(i, u, ts) for i, (u, ts) in enumerate(rows)], "event_id int, user_id int, ts_s0 int"
    ).withColumn("ts", F.timestamp_seconds("ts_s0")).withColumn("url", F.lit("u"))
    ref = _reference_sessions(rows)

    sess = with_session_ids(df, key="user_id", ts="ts", order_col="event_id", gap_s=GAP)
    got = defaultdict(list)
    for r in sess.collect():
        got[(r["user_id"], r["session_id"])].append(r["ts_s"])
    assert {k: sorted(v) for k, v in got.items()} == {k: sorted(v) for k, v in ref.items()}

    stats = session_stats(df, key="user_id", ts="ts", url="url", order_col="event_id", gap_s=GAP)
    srows = stats.collect()
    # every hit in exactly one session
    assert sum(r["n_hits"] for r in srows) == len(rows)
    for r in srows:
        hits = ref[(r["user_id"], r["session_id"])]
        assert r["n_hits"] == len(hits)
        assert r["duration_s"] == max(hits) - min(hits)
        # intra-session gaps bounded, inter-session gap proven
        hs = sorted(hits)
        assert all(b - a <= GAP for a, b in zip(hs, hs[1:]))
        nxt = ref.get((r["user_id"], r["session_id"] + 1))
        if nxt:
            assert min(nxt) - max(hs) > GAP


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
    )
)
def test_exact_dedup_keeps_min_id_per_content(spark, rows):
    df = spark.createDataFrame(
        [(i, body) for i, (_salt, body) in enumerate(rows)], "id int, body string"
    )
    out = {r["body"]: r["id"] for r in exact_dedup(df, ["body"], "id").collect()}
    expect = {}
    for i, (_s, body) in enumerate(rows):
        expect.setdefault(body, i)
    assert out == expect
