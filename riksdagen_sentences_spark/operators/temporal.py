"""Temporal operators Spark lacks as built-ins: as-of join and
gap-based sessionization.

Engine extensions beyond the reference (its MariaDB corpus has no
temporal queries); both are standard large-pipeline primitives and both
are implemented as COMPOSITIONS of built-in DataFrame ops - one shuffle
on the key, window functions, no UDFs, no range-join blowup:

- ``asof_join``: the naive formulation (theta-join on ``l.ts >= r.ts``
  + max-per-pair) explodes quadratically per key at scale.  The linear
  shape is union-the-two-sides + one window pass: sort each key's
  timeline once, carry the most recent right-side payload forward with
  ``last(..., ignorenulls=True)``, keep left rows.  O(n log n) per key,
  a single hash-partition shuffle - survives 100x data.
- ``sessionize``: gap-based session ids via lag + running sum - the
  standard two-window formulation, also one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """LEFT as-of join: attach to every left row the most recent right
    row of the same ``key`` with ``right_ts <= left_ts`` (inclusive).
    Left rows with no prior right row keep NULL payload (left-join
    semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    ``payload``: right columns to attach, emitted as ``<col><suffix>``.
    Ties on (key, ts) between right rows are broken by the LAST row in
    (ts, side) order - supply collision-free timestamps for exact oracle
    parity (ASOF tie order is engine-undefined everywhere).

    The whole right payload is carried forward as ONE struct (the struct
    wrapper is non-null for every right row even when its fields are
    NULL), so every output row's payload columns come from the SAME
    right row - per-column ``last(..., ignorenulls)`` would resurrect
    older rows' values for genuinely-NULL fields and emit a right row
    that never existed.
    """
    rpay = F.struct(*[F.col(c).alias(c) for c in payload])
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    lu = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        left_struct.alias("__left"),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(
                f"{c}: {right.schema[c].dataType.simpleString()}"
                for c in payload
            )
            + ">"
        )
        .alias("__rpay"),
    )
    ru = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lu.schema["__left"].dataType).alias("__left"),
        rpay.alias("__rpay"),
    )
    u = lu.unionByName(ru)
    # right rows (side 0) sort BEFORE left rows at equal ts -> inclusive
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "__side",
        "__left",
        F.last("__rpay", ignorenulls=True).over(w).alias("__rpay"),
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col("__left.*"),
        *[F.col(f"__rpay.{c}").alias(f"{c}{suffix}") for c in payload],
    )


def ntz_micros(c: F.Column) -> F.Column:
    """Exact integer microseconds since epoch of a (possibly NTZ)
    timestamp, zone-free - NOT via cast('timestamp') + unix_micros,
    whose session-zone shift does NOT cancel in differences when the
    zone observes DST (two wall-clock times straddling a transition get
    different offsets).  unix_date/hour/minute/date_part('SECOND') on
    TIMESTAMP_NTZ are zone-free, and date_part SECOND is a DECIMAL
    carrying the full microsecond fraction, so this equals DuckDB's
    epoch_us(naive) exactly (a double-seconds variant could flip
    comparisons at sub-microsecond rounding)."""
    ntz = c.cast("timestamp_ntz")
    return (
        F.unix_date(ntz.cast("date")).cast("bigint")
        * F.lit(86_400_000_000)
        + F.hour(ntz).cast("bigint") * F.lit(3_600_000_000)
        + F.minute(ntz).cast("bigint") * F.lit(60_000_000)
        + (F.date_part(F.lit("SECOND"), ntz) * 1_000_000).cast("bigint")
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds ``gap_seconds``.  Adds ``session_idx``
    (0-based per key, in time order).  One shuffle on the key; both
    windows reuse the same partitioning."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (
            ntz_micros(F.col(ts)) - ntz_micros(prev_ts)
            > int(gap_seconds) * 1_000_000
        ),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """1-row (step_1, step_2, ...): how many users completed each
    ordered funnel prefix - a user counts for step k if their earliest
    qualifying step-k event is STRICTLY after their earliest qualifying
    step-(k-1) event.

    Each stage is one filtered groupBy(user) + an equi-join on user with
    the previous stage's (user, ts) frame - per-user state never leaves
    its shuffle partition, and the stage frames shrink monotonically, so
    the whole funnel is len(steps) hash-partitioned passes over ever
    smaller data.  No windows over the full event log, no theta joins."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    prev: DataFrame | None = None
    counts = []
    for i, step in enumerate(steps):
        cur = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if prev is not None:
            cur = (
                cur.join(prev.select("u", F.col("t").alias("t_prev")), "u")
                .filter(F.col("t") > F.col("t_prev"))
                .select("u", "t")
            )
        prev = cur.groupBy("u").agg(F.min("t").alias("t"))
        counts.append(
            prev.agg(F.count("*").alias(f"step_{i + 1}"))
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


_WEEK_US = 604_800_000_000  # microseconds per week


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_week, week_offset, n_users): users active ``week_offset``
    weeks after their cohort week (the epoch-week of their first event).
    Weeks are exact integer epoch arithmetic (``unix_micros div
    week``) so the bucketing is engine-portable - no calendar/timezone
    semantics to disagree on.

    Two hash aggregates (first event per user; distinct user-week) and
    one equi-join on user: the cohort dimension never touches the event
    log a second time."""
    # zone-free exact micros, then floor division.  Column `/` divides
    # through double, so subtract the remainder first: the numerator
    # becomes an exact multiple of the divisor and IEEE division of two
    # exactly-representable longs (< 2^53) with an exactly-representable
    # integer quotient is error-free.
    us = ntz_micros(F.col(ts_col))
    wk = (
        (us - F.pmod(us, F.lit(_WEEK_US))) / F.lit(_WEEK_US)
    ).cast("long")
    ev = events.select(
        F.col(user_col).alias("u"), wk.alias("wk")
    )
    first = ev.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    return (
        ev.dropDuplicates(["u", "wk"])
        .join(first, "u")
        .select(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
            "u",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Bucketed band (range) join
# ---------------------------------------------------------------------------

def _idiv(c: F.Column, d: int) -> F.Column:
    """Exact floor division of a non-negative BIGINT column.  Column
    ``/`` divides through double, so subtract the remainder first: the
    numerator becomes an exact multiple of ``d`` and IEEE division of
    two exactly-representable longs (< 2^53) with an integer quotient
    is error-free."""
    return ((c - F.pmod(c, F.lit(d))) / F.lit(d)).cast("long")


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lo_s: int,
    hi_s: int,
) -> DataFrame:
    """Band join: pairs of same-``key`` rows with
    ``right_ts in (left_ts + lo_s, left_ts + hi_s]`` (seconds, half-open
    low end - "strictly after, within the window").

    The naive formulation is a theta join (``r.ts > l.ts AND r.ts <=
    l.ts + w``): Spark plans it as a per-key cross product (BNLJ or
    SMJ on key + filter), quadratic in the rows of a hot key.  Here
    time is cut into fixed buckets exactly one window wide: a right row
    falls in ONE bucket, a left row's admissible interval overlaps
    EXACTLY TWO consecutive buckets, so exploding the left side twice
    and equi-joining on ``(key, bucket)`` finds every pair exactly once
    (the right row's single bucket is one of the two candidates) and
    the hash join stays linear in true output size.  This is the
    standard binned interval-join shape (Flink's interval join, DuckDB
    ASOF machinery); Spark has no built-in, so it's composed from
    explode + equi-join - no UDFs, one shuffle per side.

    ``left`` and ``right`` must have disjoint column names apart from
    ``key``; all columns of both sides are emitted.
    """
    if hi_s <= lo_s:
        raise ValueError("empty band: need hi_s > lo_s")
    w_us = (hi_s - lo_s) * 1_000_000
    lo_us = lo_s * 1_000_000
    hi_us = hi_s * 1_000_000
    lus = ntz_micros(F.col(left_ts))
    rus = ntz_micros(F.col(right_ts))
    b0 = _idiv(lus + F.lit(lo_us), w_us)
    lx = left.withColumn(
        "__bucket", F.explode(F.array(b0, b0 + F.lit(1)))
    ).withColumn("__lus", lus)
    rx = right.withColumn("__bucket", _idiv(rus, w_us)).withColumn(
        "__rus", rus
    )
    out = lx.join(rx, [key, "__bucket"]).filter(
        (F.col("__rus") > F.col("__lus") + F.lit(lo_us))
        & (F.col("__rus") <= F.col("__lus") + F.lit(hi_us))
    )
    keep = [key] + [c for c in left.columns if c != key] + [
        c for c in right.columns if c != key
    ]
    return out.select(*keep)


def max_concurrent(
    intervals: DataFrame,
    start_us: str,
    end_us: str,
    partition_cols: list[str],
) -> DataFrame:
    """(partition_cols..., max_concurrent) — the sweep-line maximum of
    simultaneously-open half-open intervals [start_us, end_us) per
    partition: peak concurrent sessions, peak open connections, peak
    in-flight requests.

    Classic +1/−1 sweep: every interval emits (+1 at start, −1 at end),
    the running sum ordered by (time, delta) is the concurrency curve,
    its max is the answer.  Ordering delta BEFORE time ties means an
    interval ending exactly where another starts never counts as
    overlap (half-open semantics).  The max of the running sum is
    invariant under reordering of EQUAL (time, delta) keys — equal
    deltas at one instant are consecutive adds — so the result is
    engine-deterministic with no further tie-break.

    Scale: the ordered scan runs per partition; the caller's partition
    columns (e.g. tenant, day-bucket) bound the window's task size —
    an empty ``partition_cols`` would be the one-task global sort
    anti-pattern, so it is rejected.  For a global curve over
    unbounded time, bucket by day and carry prefix offsets across
    buckets (the packing.prefix_sum composition)."""
    if not partition_cols:
        raise ValueError(
            "max_concurrent requires partition columns; a global "
            "sweep would serialize into one task - bucket time first"
        )
    starts = intervals.select(
        *partition_cols,
        F.col(start_us).alias("__t"),
        F.lit(1).alias("__d"),
    )
    ends = intervals.select(
        *partition_cols,
        F.col(end_us).alias("__t"),
        F.lit(-1).alias("__d"),
    )
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col("__t").asc(), F.col("__d").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        starts.unionByName(ends)
        .select(*partition_cols, F.sum("__d").over(w).alias("__run"))
        .groupBy(*partition_cols)
        .agg(F.max("__run").cast("bigint").alias("max_concurrent"))
    )
