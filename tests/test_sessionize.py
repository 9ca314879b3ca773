"""Sessionizer unit + property tests (SURVEY.md §5.3-5.4).

Edge cases: single-hit session, gap exactly == 900 s (stays in-session;
strictly-greater starts a new one), ties within one second.
Invariants: every hit in exactly one session; intra-session gaps <= gap;
inter-session gap > gap; sum of session hit counts == total hits.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dataengineerchallenge_spark.operators.sessionize import (
    session_stats,
    with_session_ids,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ev(uid, offset_s, eid, etype="view"):
    return Row(
        event_id=eid,
        ts=T0 + dt.timedelta(seconds=offset_s),
        user_id=uid,
        event_type=etype,
    )


@pytest.fixture()
def micro(spark):
    rows = [
        # user 1: hits at 0, 10, 910 (gap 900 == boundary -> SAME session),
        # then 1811 (gap 901 -> NEW session)
        ev(1, 0, 0),
        ev(1, 10, 1, "click"),
        ev(1, 910, 2),
        ev(1, 1811, 3, "purchase"),
        # user 2: single hit
        ev(2, 5, 4),
        # user 3: two hits same second (tie -> ordered by event_id)
        ev(3, 7, 6, "b"),
        ev(3, 7, 5, "a"),
    ]
    return spark.createDataFrame(rows)


def test_session_boundaries(micro):
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in with_session_ids(micro).collect()
    }
    assert got[(1, 0)] == got[(1, 1)] == got[(1, 2)] == 1  # 900 s stays
    assert got[(1, 3)] == 2  # 901 s starts new
    assert got[(2, 4)] == 1
    assert got[(3, 5)] == got[(3, 6)] == 1


def test_session_stats(micro):
    stats = {
        (r.user_id, r.session_id): r for r in session_stats(micro).collect()
    }
    s11 = stats[(1, 1)]
    assert s11.n_hits == 3 and s11.duration_s == 910 and s11.n_unique_urls == 2
    s12 = stats[(1, 2)]
    assert s12.n_hits == 1 and s12.duration_s == 0
    assert stats[(2, 1)].n_hits == 1
    assert stats[(3, 1)].n_hits == 2


def test_invariants_on_fixture(spark):
    from dataengineerchallenge_spark.sources import load_table

    ev_df = load_table(spark, "/root/testdata/sf0.001", "events")
    sess = with_session_ids(ev_df).cache()
    total = ev_df.count()
    # every hit in exactly one session
    assert sess.count() == total
    assert sess.filter(F.col("session_id").isNull()).count() == 0
    # hit-count conservation
    per = sess.groupBy("user_id", "session_id").count()
    assert per.agg(F.sum("count")).collect()[0][0] == total
    # intra-session consecutive gap <= 900; inter-session gap > 900
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    gaps = sess.withColumn("gap", F.col("ts_s") - F.lag("ts_s").over(w)).withColumn(
        "same", F.col("session_id") == F.lag("session_id").over(w)
    )
    assert gaps.filter(F.col("same") & (F.col("gap") > 900)).count() == 0
    assert gaps.filter(~F.col("same") & (F.col("gap") <= 900)).count() == 0
    sess.unpersist()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "session_id" in df.columns


def test_incremental_merge_edge_cases(spark):
    """merge_session_state on crafted rows: exact-gap continuation (900 s
    stays in-session), >gap new session, key only in old, key only in new,
    and URL-set union across the merge boundary."""
    import datetime as dt

    from dataengineerchallenge_spark.operators.sessionize import (
        merge_session_state,
        session_state,
    )

    def ev(eid, uid, s, url):
        return (eid, uid, dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
                + dt.timedelta(seconds=s), url)

    cols = ["event_id", "user_id", "ts", "event_type"]
    old = spark.createDataFrame(
        [ev(1, "cont", 0, "a"), ev(2, "cont", 10, "b"),   # open session ends t=10
         ev(3, "newsess", 0, "a"),                         # open session ends t=0
         ev(4, "oldonly", 0, "a"), ev(5, "oldonly", 2000, "b")],  # 2 sessions
        cols,
    )
    new = spark.createDataFrame(
        [ev(6, "cont", 910, "b"), ev(7, "cont", 915, "c"),  # 910-10=900 → SAME session
         ev(8, "newsess", 901, "z"),                        # 901-0=901 → NEW session
         ev(9, "newonly", 100, "x")],
        cols,
    )
    got = {
        (r["user_id"], r["session_id"]): (r["n_hits"], sorted(r["url_set"]), r["start_s"], r["end_s"])
        for r in merge_session_state(session_state(old), new).collect()
    }
    base = 1704067200  # 2024-01-01 epoch
    assert got[("cont", 1)] == (4, ["a", "b", "c"], base, base + 915)
    assert got[("newsess", 1)] == (1, ["a"], base, base)
    assert got[("newsess", 2)] == (1, ["z"], base + 901, base + 901)
    assert got[("oldonly", 1)] == (1, ["a"], base, base)
    assert got[("oldonly", 2)] == (1, ["b"], base + 2000, base + 2000)
    assert got[("newonly", 1)] == (1, ["x"], base + 100, base + 100)
    assert len(got) == 6


# --- two-phase skew-safe sessionizer -----------------------------------

def _canon(rows):
    return sorted(
        (r["user_id"], r["session_id"], r["n_hits"], r["duration_s"],
         r["n_unique_urls"], r["start_s"], r["end_s"])
        for r in rows
    )


def test_skew_safe_equals_plain_on_fixture(spark):
    from dataengineerchallenge_spark.operators.sessionize import (
        session_stats,
        session_stats_skew_safe,
    )
    from dataengineerchallenge_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert _canon(session_stats_skew_safe(ev).collect()) == _canon(
        session_stats(ev).collect()
    )


def test_skew_safe_stitches_sessions_spanning_many_slices(spark):
    """A session alive across 5 tiny slices must fold back into ONE
    global session via the chained boundary merge; an over-gap pause in
    the same slice grid must still split."""
    from dataengineerchallenge_spark.operators.sessionize import (
        session_stats,
        session_stats_skew_safe,
    )

    base = 1_700_000_000
    # hits every 400s: gap 400 <= 900 keeps one session across slice
    # boundaries (slice_s=1000); then a 2000s pause starts session 2
    hits = [base + i * 400 for i in range(12)]
    hits += [hits[-1] + 2000, hits[-1] + 2300]
    rows = [(i, t, 7, f"u{i % 3}") for i, t in enumerate(hits)]
    df = spark.createDataFrame(rows, "event_id long, ts_l long, user_id long, event_type string")
    from pyspark.sql import functions as F

    df = df.withColumn("ts", F.timestamp_seconds("ts_l")).drop("ts_l")
    got = session_stats_skew_safe(df, key="user_id", slice_s=1000)
    want = session_stats(df, key="user_id")
    assert _canon(got.collect()) == _canon(want.collect())
    # the single-key frame really did span multiple slices
    n_slices = df.select((F.unix_timestamp("ts") / 1000).cast("long")).distinct().count()
    assert n_slices >= 5


def test_session_transition_matrix_closed_form(spark, tmp_path):
    """Hand-built journeys: transitions counted within sessions only
    (the gap cut restarts the chain), rows normalize to 1e6."""
    import datetime as dt
    import os

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1, session 1: view -> view -> purchase
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + m, 1, "view", 0.0, "{}"),
        (3, t0 + 2 * m, 1, "purchase", 0.0, "{}"),
        # 20-minute gap: NEW session; the purchase->view pair must NOT count
        (4, t0 + 22 * m, 1, "view", 0.0, "{}"),
        (5, t0 + 23 * m, 1, "error", 0.0, "{}"),
        # user 2: view -> purchase
        (6, t0, 2, "view", 0.0, "{}"),
        (7, t0 + m, 2, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf = os.path.join(str(tmp_path), "trans")
    df.write.mode("overwrite").parquet(os.path.join(sf, "events.parquet"))
    from dataengineerchallenge_spark.queries.sessions import (
        session_transition_matrix,
    )

    got = {
        (r["from_type"], r["to_type"]): r
        for r in session_transition_matrix(spark, sf).collect()
    }
    # from view: view->view x1, view->purchase x2, view->error x1
    assert got[("view", "view")]["n_transitions"] == 1
    assert got[("view", "purchase")]["n_transitions"] == 2
    assert got[("view", "error")]["n_transitions"] == 1
    assert got[("view", "view")]["from_total"] == 4
    assert got[("view", "purchase")]["p_micropoints"] == 500000
    # the cross-session purchase->view pair is absent
    assert ("purchase", "view") not in got
    # rows normalize: per from_type the micropoints sum to ~1e6
    from collections import defaultdict

    sums = defaultdict(int)
    for (f, _), r in got.items():
        sums[f] += r["p_micropoints"]
    for f, s_ in sums.items():
        assert abs(s_ - 1_000_000) <= 2, (f, s_)
