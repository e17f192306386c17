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
    """
    rp = {c: f"__r_{c}" for c in payload}
    left_struct = F.struct(*[F.col(c) for c in left.columns])
    lu = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        left_struct.alias("__left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(n)
            for c, n in rp.items()
        ],
    )
    ru = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lu.schema["__left"].dataType).alias("__left"),
        *[F.col(c).alias(n) for c, n in rp.items()],
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
        *[
            F.last(n, ignorenulls=True).over(w).alias(n)
            for n in rp.values()
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col("__left.*"),
        *[F.col(n).alias(f"{c}{suffix}") for c, n in rp.items()],
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
    # unix_micros requires TIMESTAMP (not NTZ); the cast's zone shift
    # cancels in the difference.
    def _us(c: F.Column) -> F.Column:
        return F.unix_micros(c.cast("timestamp"))

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
