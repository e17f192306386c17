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
    # exact integer microseconds (a double-seconds diff can flip the
    # comparison at sub-microsecond rounding; DuckDB twin: epoch_us).
    # Computed arithmetically from the NTZ field values - NOT via
    # cast('timestamp') + unix_micros, whose session-zone shift does NOT
    # cancel in the difference when the zone observes DST (two
    # wall-clock times straddling a transition get different offsets,
    # shifting the gap by the transition amount).  unix_date/hour/
    # minute/date_part('SECOND') on TIMESTAMP_NTZ are zone-free, and
    # date_part SECOND is a DECIMAL carrying the full microsecond
    # fraction, so this equals DuckDB's epoch_us(naive) exactly.
    def _us(c: F.Column) -> F.Column:
        ntz = c.cast("timestamp_ntz")
        return (
            F.unix_date(ntz.cast("date")).cast("bigint")
            * F.lit(86_400_000_000)
            + F.hour(ntz).cast("bigint") * F.lit(3_600_000_000)
            + F.minute(ntz).cast("bigint") * F.lit(60_000_000)
            + (F.date_part(F.lit("SECOND"), ntz) * 1_000_000).cast(
                "bigint"
            )
        )

    is_new = F.when(
        prev_ts.isNull()
        | (
            _us(F.col(ts)) - _us(prev_ts)
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
