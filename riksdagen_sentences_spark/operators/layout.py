"""Z-order (Morton curve) data layout: interleave the bits of two
integer dimensions so that range-bucketing the single z-value bounds
BOTH dimensions per bucket - the standard multi-dimensional
data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER, DB2 MDC).

Why it matters at 100 TB: parquet min/max pruning only skips files
whose sort column is selective.  Sorting by time leaves user_id
unbounded in every file, so a user-filtered query scans everything.
Sorting by interleaved (user, time) bits gives every file a bounded
rectangle in BOTH dimensions: either predicate prunes.

Everything here is exact integer bit algebra (shift/and/or as a sum of
disjoint bit terms), identical in Spark and DuckDB - the layout
decision itself is oracle-checkable, which is the point of the
``zorder_extents`` query: it pins that z-range buckets produce small
rectangles where time-range buckets do not.

``write_zordered`` is the production write path: repartitionByRange on
the z-value + sortWithinPartitions, so parquet row groups inherit the
rectangle bounds.  The reference has no layout surface (MariaDB
chooses physical layout via btree indexes, SURVEY §2.3); this is the
columnar-era equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit b of x lands at position 2b, bit b of y at 2b+1.
    Disjoint bit positions make the OR a plain sum - exact BIGINT."""
    xl = x.cast("long")
    yl = y.cast("long")
    terms = []
    for b in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xl, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        terms.append(
            F.shiftleft(
                F.shiftright(yl, b).bitwiseAND(F.lit(1)), 2 * b + 1
            )
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB twin of ``zvalue`` - same bit terms, same sum."""
    terms = []
    for b in range(bits):
        terms.append(f"(((CAST({x} AS BIGINT) >> {b}) & 1) << {2 * b})")
        terms.append(
            f"(((CAST({y} AS BIGINT) >> {b}) & 1) << {2 * b + 1})"
        )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 32,
    bits: int = 10,
) -> None:
    """Write ``df`` z-ordered on (x_col, y_col): range-partition by the
    Morton value, sort within partitions, drop the helper column.  Each
    output file then covers a bounded rectangle in both dimensions."""
    z = df.withColumn("__z", zvalue(F.col(x_col), F.col(y_col), bits))
    (
        z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def bucket_extents(
    df: DataFrame,
    x_col: str,
    y_col: str,
    order_col: Column,
    tiebreak_col: str,
    n_buckets: int = 16,
) -> DataFrame:
    """(bucket, n_rows, x_min, x_max, y_min, y_max): equal-count range
    buckets of ``order_col`` (integer-rank assignment - deterministic,
    no sampling) and the per-bucket extent rectangle.  This is the
    skipping-effectiveness PROBE: a good layout yields narrow
    rectangles in BOTH dimensions.  The global row_number window is a
    single-task diagnostic shape - fine for a 16-bucket audit, never
    the production bucketer (that is write_zordered's sampled
    repartitionByRange, which needs no total order)."""
    from pyspark.sql import Window

    w = Window.orderBy(order_col, F.col(tiebreak_col))
    total = df.count()
    ranked = df.withColumn("__rn", F.row_number().over(w))
    return (
        ranked.withColumn(
            "__bucket",
            F.expr(f"((__rn - 1) * {n_buckets}) div {total}"),
        )
        .groupBy(F.col("__bucket").alias("bucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )
