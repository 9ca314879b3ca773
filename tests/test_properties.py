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


@settings(max_examples=6, deadline=None)
@given(
    lines=st.lists(
        st.one_of(
            # structurally valid-ish lines with random fields
            st.tuples(st.integers(0, 86_399), st.integers(0, 9), st.integers(200, 599)).map(
                lambda t: (
                    f"2015-07-22T{t[0]//3600:02d}:{t[0]%3600//60:02d}:{t[0]%60:02d}.000000Z "
                    f"elb1 10.0.0.{t[1]}:1234 10.1.0.1:80 0.01 0.02 0.01 {t[2]} {t[2]} 10 20 "
                    '"GET https://x.com:443/p HTTP/1.1" "UA" - -'
                )
            ),
            # arbitrary junk (fuzz)
            st.text(
                alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n\r"),
                max_size=120,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_elb_parser_total_and_never_crashes(spark, lines):
    """P5 robustness: EVERY input line lands in exactly one bucket
    (valid or quarantined) no matter how malformed — the parser never
    drops or throws ("messy (ie real) data", reference README.md:61)."""
    from dataengineerchallenge_spark.sources.elb import parse_elb, quarantine, valid_requests

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    parsed = parse_elb(df)
    n_valid = valid_requests(parsed).count()
    n_bad = quarantine(parsed).count()
    assert n_valid + n_bad == len(lines)
    # structurally valid lines must parse with a timestamp and client ip
    ok = valid_requests(parsed)
    assert ok.filter(ok.ts.isNull() | ok.client_ip.isNull()).count() == 0


@settings(max_examples=6, deadline=None)
@given(
    lefts=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=1, max_size=25),
    rights=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=0, max_size=25),
)
def test_as_of_join_matches_python_reference(spark, lefts, rights):
    """J7: for every left row, the attached payload is the right row with
    the LARGEST ts <= left.ts on the same key (ties → largest rid), or
    NULL when no such row exists."""
    from dataengineerchallenge_spark.operators.joins import as_of_join

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lefts)], "lid int, k int, ts_s int"
    )
    rdf = spark.createDataFrame(
        [(i, k, ts, f"p{i}") for i, (k, ts) in enumerate(rights)],
        "rid int, k int, ts_s int, pay string",
    )
    out = as_of_join(ldf, rdf, on=["k"], payload=["pay"], tie_break=["rid"])
    got = {r["lid"]: r["pay_asof"] for r in out.collect()}

    expect = {}
    for i, (k, ts) in enumerate(lefts):
        best = None  # (ts, rid)
        for j, (rk, rts) in enumerate(rights):
            if rk == k and rts <= ts and (best is None or (rts, j) > best):
                best = (rts, j)
        expect[i] = f"p{best[1]}" if best else None
    assert got == expect


def test_as_of_join_schema_has_no_injected_tie_columns(spark):
    """Right-only tie_break columns must not leak into the output."""
    from dataengineerchallenge_spark.operators.joins import as_of_join

    ldf = spark.createDataFrame([(1, 1, 10)], "lid int, k int, ts_s int")
    rdf = spark.createDataFrame([(7, 1, 5, "p")], "rid int, k int, ts_s int, pay string")
    out = as_of_join(ldf, rdf, on=["k"], payload=["pay"], tie_break=["rid"])
    assert "rid" not in out.columns
    assert out.collect()[0]["pay_asof"] == "p"


@given(events_strategy, st.integers(0, 50_000))
@settings(max_examples=12, deadline=None)
def test_incremental_merge_equals_full_recompute(spark, rows, split_ts):
    """For ANY event set and ANY time split point, folding the post-split
    batch into pre-split session state must reproduce full-recompute
    sessionization exactly (time-partitioned ingestion precondition holds
    by construction of the split)."""
    import datetime as dt

    from dataengineerchallenge_spark.operators.sessionize import (
        merge_session_state,
        session_state,
    )

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    data = [
        (eid, str(u), base + dt.timedelta(seconds=ts), f"url{eid % 3}")
        for eid, (u, ts) in enumerate(rows)
    ]
    cols = ["event_id", "user_id", "ts", "event_type"]
    df = spark.createDataFrame(data, cols)
    full = {
        (r["user_id"], r["session_id"]): (r["n_hits"], r["start_s"], r["end_s"], r["n_unique_urls"])
        for r in session_stats(df).collect()
    }
    cut = base + dt.timedelta(seconds=split_ts)
    old = df.filter(F.col("ts") < cut)
    new = df.filter(F.col("ts") >= cut)
    if old.isEmpty():
        merged_df = session_state(new)
    else:
        merged_df = merge_session_state(session_state(old), new)
    merged = {
        (r["user_id"], r["session_id"]): (
            r["n_hits"], r["start_s"], r["end_s"], len(set(r["url_set"]))
        )
        for r in merged_df.collect()
    }
    assert merged == full


@settings(max_examples=8, deadline=None)
@given(rows=events_strategy, slice_s=st.sampled_from([300, 1000, 86_400]))
def test_skew_safe_sessionizer_equals_plain_on_random_events(spark, rows, slice_s):
    """Two-phase day-sliced sessionization must equal the single-pass
    sessionizer for ANY event set and ANY slice width — including slices
    far smaller than the gap (every session spans many slices) and
    events landing exactly on slice/gap boundaries."""
    from dataengineerchallenge_spark.operators.sessionize import (
        session_stats,
        session_stats_skew_safe,
    )

    df = (
        spark.createDataFrame(
            [(i, u, ts) for i, (u, ts) in enumerate(rows)],
            "event_id int, user_id int, ts_s0 int",
        )
        .withColumn("ts", F.timestamp_seconds("ts_s0"))
        .withColumn("url", (F.col("event_id") % 3).cast("string"))
    )
    kw = dict(key="user_id", ts="ts", url="url", order_col="event_id", gap_s=GAP)

    def canon(frame):
        return sorted(
            (r["user_id"], r["session_id"], r["n_hits"], r["duration_s"],
             r["n_unique_urls"], r["start_s"], r["end_s"])
            for r in frame.collect()
        )

    assert canon(session_stats_skew_safe(df, slice_s=slice_s, **kw)) == canon(
        session_stats(df, **kw)
    )


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(st.integers(0, 5000), min_size=1, max_size=40),
    ivs=st.lists(
        st.tuples(st.integers(0, 5000), st.integers(0, 600)), min_size=1, max_size=25
    ),
    bin_s=st.sampled_from([1, 60, 250, 7000]),
)
def test_binned_interval_join_equals_naive_on_random_inputs(spark, pts, ivs, bin_s):
    """The bin decomposition must return exactly the naive theta-join
    pair set for any points/intervals/bin width — including bins larger
    than the whole domain and degenerate zero-length intervals."""
    from dataengineerchallenge_spark.operators.joins import binned_interval_join

    p = spark.createDataFrame([(i, t) for i, t in enumerate(pts)], "pid int, ts long")
    iv = spark.createDataFrame(
        [(j, s, s + w) for j, (s, w) in enumerate(ivs)], "iid int, s long, e long"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in binned_interval_join(p, iv, "ts", "s", "e", bin_s=bin_s).collect()
    )
    naive = sorted(
        (i, j)
        for i, t in enumerate(pts)
        for j, (s, w) in enumerate(ivs)
        if s <= t <= s + w
    )
    assert got == naive


@settings(max_examples=8, deadline=None)
@given(
    pts=st.lists(st.integers(0, 5000), min_size=1, max_size=30),
    ivs=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**40), 2**40)),
            st.one_of(st.none(), st.integers(-(2**40), 2**40)),
        ),
        min_size=1,
        max_size=20,
    ),
)
def test_binned_interval_join_quarantines_corrupt_intervals(spark, pts, ivs):
    """Messy-data guard (VERDICT r4 #1): NULL bounds, reversed intervals,
    and absurdly wide spans (epoch-0 starts, year-30000 ends) must be
    quarantined with a reason — never exploded into bins, never a task
    kill — while every sane interval still joins exactly like the naive
    theta-join."""
    from dataengineerchallenge_spark.operators.joins import binned_interval_join

    BIN, MAXB = 60, 64
    p = spark.createDataFrame([(i, t) for i, t in enumerate(pts)], "pid int, ts long")
    iv = spark.createDataFrame(
        [(j, s, e) for j, (s, e) in enumerate(ivs)], "iid int, s long, e long"
    )
    joined, quar = binned_interval_join(
        p, iv, "ts", "s", "e", bin_s=BIN, max_span_bins=MAXB, with_quarantine=True
    )

    def reason(s, e):
        if s is None or e is None:
            return "null_bound"
        if s > e:
            return "reversed"
        if (e // BIN) - (s // BIN) + 1 > MAXB:
            return "over_max_span"
        return None

    expect_quar = sorted(
        (j, reason(s, e)) for j, (s, e) in enumerate(ivs) if reason(s, e)
    )
    got_quar = sorted((r["iid"], r["reject_reason"]) for r in quar.collect())
    assert got_quar == expect_quar

    got = sorted((r["pid"], r["iid"]) for r in joined.collect())
    naive = sorted(
        (i, j)
        for i, t in enumerate(pts)
        for j, (s, e) in enumerate(ivs)
        if reason(s, e) is None and s <= t <= s + (e - s)
    )
    assert got == naive


def test_binned_interval_join_fails_loud_on_wide_span_without_quarantine(spark):
    """ADVICE r5: a legitimately wide interval must never vanish
    silently. Without a quarantine channel the over-span row raises at
    execution time (with remediation guidance); with the channel it is
    returned as over_max_span. Corrupt rows (null/reversed) keep the
    silent-quarantine semantics either way."""
    import pytest

    from dataengineerchallenge_spark.operators.joins import binned_interval_join

    p = spark.createDataFrame([(1, 100)], "pid int, ts long")
    wide = spark.createDataFrame([(9, 0, 10**9)], "iid int, s long, e long")
    with pytest.raises(Exception, match="max_span_bins"):
        binned_interval_join(p, wide, "ts", "s", "e", bin_s=60).count()
    joined, quar = binned_interval_join(
        p, wide, "ts", "s", "e", bin_s=60, with_quarantine=True
    )
    assert [r["reject_reason"] for r in quar.collect()] == ["over_max_span"]
    # corrupt rows still drop silently without the channel
    corrupt = spark.createDataFrame(
        [(1, None, 50), (2, 200, 100)], "iid int, s long, e long"
    )
    assert binned_interval_join(p, corrupt, "ts", "s", "e", bin_s=60).count() == 0


@settings(max_examples=8, deadline=None)
@given(
    ips=st.lists(st.integers(0, 2**32 - 1), min_size=1, max_size=30, unique=True),
    cidrs=st.lists(
        st.tuples(st.integers(0, 2**32 - 1), st.integers(0, 32)),
        min_size=1,
        max_size=15,
    ),
)
def test_lpm_join_matches_python_reference(spark, ips, cidrs):
    """lpm_join must return the longest covering prefix's payload for
    ANY key/block sets — including blocks wider than /8 (exploded
    across covered octets), /0 catch-alls, /32 host routes, exact-tie
    prefixes, and keys with no covering block (NULL payload on left
    join)."""
    from dataengineerchallenge_spark.operators.joins import lpm_join

    blocks = []
    for i, (base, plen) in enumerate(cidrs):
        lo = base & ~((1 << (32 - plen)) - 1) if plen < 32 else base
        hi = lo + (1 << (32 - plen)) - 1
        blocks.append((f"b{i:03d}", plen, lo, hi))

    def ref(v):
        cover = [(p, name) for name, p, lo, hi in blocks if lo <= v <= hi]
        if not cover:
            return None
        best_p = max(p for p, _ in cover)
        # exact-tie prefixes resolve by payload ASC, the operator's
        # deterministic tie-break
        return min(name for p, name in cover if p == best_p)

    kdf = spark.createDataFrame([(v,) for v in ips], "ip_int long")
    bdf = spark.createDataFrame(
        blocks, "region string, prefix_len int, ip_lo long, ip_hi long"
    )
    got = {
        r["ip_int"]: r["region"]
        for r in lpm_join(kdf, bdf).select("ip_int", "region").collect()
    }
    assert got == {v: ref(v) for v in ips}


def test_lpm_join_how_passthrough(spark):
    """how='inner' must drop uncovered keys (the left default keeps them
    with NULL payload), and an invalid how must fail loud — not silently
    degrade to a left join (round-11 review fix)."""
    from dataengineerchallenge_spark.operators.joins import lpm_join

    kdf = spark.createDataFrame([(10,), (999,)], "ip_int long")
    bdf = spark.createDataFrame(
        [("a", 24, 0, 255)], "region string, prefix_len int, ip_lo long, ip_hi long"
    )
    left = {r["ip_int"]: r["region"] for r in lpm_join(kdf, bdf).collect()}
    assert left == {10: "a", 999: None}
    inner = {r["ip_int"]: r["region"] for r in lpm_join(kdf, bdf, how="inner").collect()}
    assert inner == {10: "a"}
    import pytest as _pytest

    with _pytest.raises(Exception):
        lpm_join(kdf, bdf, how="bogus").collect()


def test_lpm_join_modes_agree_and_auto_flips_on_dim_size(spark):
    """naive (BNLJ) and keyed (octet-exploded hash) formulations must
    return identical rows — mode is a physical choice, never a semantic
    one — and auto must pick naive under the budget, keyed above it
    (BENCH_lpm.json's measured crossover)."""
    from dataengineerchallenge_spark.operators.joins import lpm_join

    kdf = spark.createDataFrame(
        [(v,) for v in (0, 10, 255, 256, 1 << 24, (203 << 24) | 513, 2**32 - 1)],
        "ip_int long",
    )
    bdf = spark.createDataFrame(
        [
            ("wide", 6, 0, (1 << 26) - 1),          # wider than /8: octet explode
            ("v24", 24, 203 << 24 | 512, 203 << 24 | 767),
            ("all", 0, 0, 2**32 - 1),
        ],
        "region string, prefix_len int, ip_lo long, ip_hi long",
    )
    res = {}
    for mode in ("keyed", "naive"):
        res[mode] = sorted(
            tuple(r) for r in lpm_join(kdf, bdf, mode=mode).collect()
        )
    assert res["keyed"] == res["naive"] and len(res["keyed"]) == 7

    # auto: tiny dim → BNLJ plan; over budget → hash join on the octet
    tiny = lpm_join(kdf, bdf, mode="auto")
    assert "BroadcastNestedLoopJoin" in tiny._jdf.queryExecution().executedPlan().toString()
    forced = lpm_join(kdf, bdf, mode="auto", naive_budget_rows=2)
    assert "BroadcastNestedLoopJoin" not in forced._jdf.queryExecution().executedPlan().toString()
