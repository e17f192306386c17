"""As-of join and sessionization semantics on hand-built frames."""

import datetime as dt

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators.temporal import (
    asof_join,
    sessionize,
)


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p1"),
            (1, _ts(20), "p2"),
            (2, _ts(5), "p3"),   # no prior right row
            (3, _ts(30), "p4"),  # equal-ts right row (inclusive)
        ],
        "user bigint, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), 100),
            (1, _ts(15), 200),
            (1, _ts(25), 300),  # after p2 - never attached
            (2, _ts(6), 400),   # after p3 - not attached
            (3, _ts(30), 500),  # ts == left ts - attached (inclusive)
        ],
        "user bigint, ts timestamp, rid int",
    )
    out = {
        r["tag"]: r["rid_asof"]
        for r in asof_join(
            left, right, key="user", left_ts="ts", right_ts="ts",
            payload=["rid"],
        ).collect()
    }
    assert out == {"p1": 100, "p2": 200, "p3": None, "p4": 500}


def test_asof_join_single_shuffle_no_smj(spark):
    left = spark.range(100).select(
        (F.col("id") % 10).alias("user"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = spark.range(50).select(
        (F.col("id") % 10).alias("user"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.col("id").alias("rid"),
    )
    out = asof_join(
        left, right, key="user", left_ts="ts", right_ts="ts",
        payload=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the whole operator is union + ONE window sort - no join node at all
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert out.count() == 100


def test_sessionize_gap_semantics(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0)),
            (1, _ts(10)),        # same session (gap 10 min < 30)
            (1, _ts(50)),        # new session (gap 40 min)
            (1, _ts(50, 30)),    # same session
            (2, _ts(0)),         # separate user
        ],
        "user bigint, ts timestamp",
    )
    out = sessionize(ev, key="user", ts="ts", gap_seconds=1800)
    got = {
        (r["user"], r["ts"].minute, r["ts"].second): r["session_idx"]
        for r in out.collect()
    }
    assert got == {
        (1, 0, 0): 0,
        (1, 10, 0): 0,
        (1, 50, 0): 1,
        (1, 50, 30): 1,
        (2, 0, 0): 0,
    }


def test_sessionize_boundary_exact(spark):
    """gap == gap_seconds does NOT start a new session (strict >)."""
    ev = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(30))],  # exactly 1800s apart
        "user bigint, ts timestamp",
    )
    out = sessionize(ev, key="user", ts="ts", gap_seconds=1800)
    assert {r["session_idx"] for r in out.collect()} == {0}


def test_asof_join_null_payload_not_mixed(spark):
    """A genuinely-NULL payload field in the matched right row must stay
    NULL - per-column carry-forward would resurrect an older row's value
    and emit a right row that never existed (ADVICE r2)."""
    left = spark.createDataFrame(
        [(1, _ts(10), "x")], "user bigint, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 1, None),  # older row: a=1, b=NULL
            (1, _ts(7), None, 2),  # matched row: a=NULL, b=2
        ],
        "user bigint, ts timestamp, a int, b int",
    )
    row = asof_join(
        left, right, key="user", left_ts="ts", right_ts="ts",
        payload=["a", "b"],
    ).collect()[0]
    assert row["a_asof"] is None and row["b_asof"] == 2


def test_sessionize_ntz_dst_safe(spark):
    """TIMESTAMP_NTZ gaps must be wall-clock gaps even when the session
    zone observes DST: 01:30 -> 03:30 straddles the Europe/Stockholm
    spring-forward (02:00 -> 03:00), and a session-zone TIMESTAMP cast
    would report a 1-hour gap instead of the true 2 hours."""
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Stockholm")
    try:
        ev = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 3, 31, 1, 30)),
                (1, dt.datetime(2024, 3, 31, 3, 30)),
            ],
            "user bigint, ts timestamp_ntz",
        )
        # true wall-clock gap 7200s: > 5400 must SPLIT the session (the
        # zone-shifted arithmetic would see 3600 and merge it)
        out = sessionize(ev, key="user", ts="ts", gap_seconds=5400)
        assert sorted(
            r["session_idx"] for r in out.collect()
        ) == [0, 1]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_funnel_counts_ordering_semantics(spark):
    from datetime import datetime

    from riksdagen_sentences_spark.operators.temporal import funnel_counts

    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # u1 completes the full funnel in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2 clicks BEFORE viewing -> stops at step 1
        (2, t(2), "view"), (2, t(1), "click"),
        # u3 views+clicks, purchase is simultaneous with click ->
        # strict inequality keeps it out of step 3
        (3, t(1), "view"), (3, t(2), "click"), (3, t(2), "purchase"),
        # u4 never views; their click/purchase count for nothing
        (4, t(1), "click"), (4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )
    got = funnel_counts(df, ["view", "click", "purchase"]).collect()[0]
    assert (got["step_1"], got["step_2"], got["step_3"]) == (3, 2, 1)


def test_cohort_retention_week_buckets(spark):
    from datetime import datetime

    from riksdagen_sentences_spark.operators.temporal import (
        _WEEK_US,
        cohort_retention,
    )

    # 2024-01-01 is a Monday; epoch weeks are Thursday-anchored, but the
    # operator only promises exact integer micros // week
    base = datetime(2024, 1, 1)
    day = lambda d, u: (u, datetime(2024, 1, 1 + d))  # noqa: E731
    rows = [
        day(0, 1), day(1, 1), day(14, 1),   # u1: wk0 x2, wk+2
        day(0, 2),                            # u2: wk0 only
        day(7, 3), day(14, 3),                # u3: starts a week later
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    import calendar

    wk0 = (
        int(calendar.timegm(base.timetuple())) * 1_000_000 // _WEEK_US
    )
    assert got == {
        (wk0, 0): 2,        # u1, u2 in their cohort week
        (wk0, 2): 1,        # u1 back two weeks later
        (wk0 + 1, 0): 1,    # u3's cohort
        (wk0 + 1, 1): 1,    # u3 back one week later
    }


def test_range_join_buckets_matches_naive_theta(spark):
    """Bucketed band join == the naive theta join on an adversarial
    timeline: pairs exactly on the bucket boundary, exactly at the
    window edge (inclusive), at zero gap (excluded), and across hot and
    singleton keys."""
    from datetime import datetime, timedelta

    from riksdagen_sentences_spark.operators.temporal import (
        range_join_buckets,
    )

    base = datetime(2024, 1, 1)
    # hot key 1: a burst around each hour boundary; key 2: sparse
    rows = []
    i = 0
    for off_s in [0, 1, 1799, 1800, 3599, 3600, 3601, 7200, 7201, 10800]:
        rows.append((i, 1, base + timedelta(seconds=off_s))); i += 1
    rows += [(i, 2, base + timedelta(seconds=5))]; i += 1
    rows += [(i + 1, 2, base + timedelta(seconds=3605))]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp"
    )
    left = ev.select(
        "user_id", F.col("event_id").alias("lid"), F.col("ts").alias("lts")
    )
    right = ev.select(
        "user_id", F.col("event_id").alias("rid"), F.col("ts").alias("rts")
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join_buckets(
            left, right, "user_id", "lts", "rts", 0, 3600
        ).collect()
    )
    naive = sorted(
        (a[0], b[0])
        for a in rows
        for b in rows
        if a[1] == b[1]
        and b[2] > a[2]
        and (b[2] - a[2]).total_seconds() <= 3600
    )
    assert got == naive and len(got) > 0
    # plan: equi hash/sort-merge join, never a nested-loop cross product
    plan = range_join_buckets(
        left, right, "user_id", "lts", "rts", 0, 3600
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
