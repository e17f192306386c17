"""Ordinary least squares by distributed normal equations.

A 100 TB engine fits simple regressions the way 1970s statistics did,
not the way a driver-side library does: the sufficient statistics
(n, Sx, Sy, Sxx, Sxy, Syy) are ONE map-side-combinable hash aggregate
- each executor folds its partition into six numbers, the shuffle
moves six numbers per group - and the closed-form solve is scalar
column arithmetic on the aggregate row.  No iteration, no collect, no
MLlib; grouped regressions (one fit per key) cost exactly one
aggregate too.

Engine-portable arithmetic: inputs are cast to DECIMAL before
summation (exact, associative - immune to FP accumulation order across
partitionings and engines), each sum is cast to DOUBLE once, and the
slope/intercept/r2 formulas are evaluated in a FIXED parenthesization
mirrored verbatim by the SQL oracle; results are rounded to 4 dp with
the repo-standard floor(x*1e4 + 0.5)/1e4 (HALF-UP, identical in both
engines - Spark's round() is banker's on some paths).

The reference computes no regressions; this is part of the analytics
extension suite (SURVEY §2.6 aggregates, extended).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"


def _r4(c: Column) -> Column:
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def ols_sufficient_stats(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., n, sx, sy, sxx, sxy, syy) - exact DECIMAL sums cast
    to DOUBLE once.  One hash aggregate, partial-aggregated map-side."""
    x = F.col(x_col).cast(_DEC)
    y = F.col(y_col).cast(_DEC)
    g = df.groupBy(*(group_cols or []))
    return g.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y).cast("double").alias("syy"),
    )


def ols_fit(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """(group..., n_rows, slope, intercept, r2): the least-squares line
    y = intercept + slope * x per group, with the coefficient of
    determination.  Rounded to 4 dp; groups with zero x-variance get
    NULL slope/r2 (division by zero -> NULL in both engines)."""
    s = ols_sufficient_stats(df, y_col, x_col, group_cols)
    det = s["n"] * s["sxx"] - s["sx"] * s["sx"]
    cov = s["n"] * s["sxy"] - s["sx"] * s["sy"]
    vary = s["n"] * s["syy"] - s["sy"] * s["sy"]
    slope = cov / F.when(det != 0, det)
    intercept = (s["sy"] - slope * s["sx"]) / s["n"]
    r2 = (cov * cov) / F.when(det * vary != 0, det * vary)
    keep = [F.col(c) for c in (group_cols or [])]
    return s.select(
        *keep,
        F.col("n").cast("long").alias("n_rows"),
        _r4(slope).alias("slope"),
        _r4(intercept).alias("intercept"),
        _r4(r2).alias("r2"),
    )


def ols_fit_sql(
    table_expr: str,
    y_col: str,
    x_col: str,
    group_cols: list[str] | None = None,
) -> str:
    """The DuckDB twin of ols_fit: identical casts, identical
    parenthesization, identical rounding."""
    gcols = group_cols or []
    gsel = "".join(f"{c}, " for c in gcols)
    gby = f"GROUP BY {', '.join(gcols)}" if gcols else ""

    def dec(c: str) -> str:
        return f"CAST({c} AS DECIMAL(18,2))"

    stats = (
        f"SELECT {gsel}CAST(COUNT(*) AS DOUBLE) AS n, "
        f"CAST(SUM({dec(x_col)}) AS DOUBLE) AS sx, "
        f"CAST(SUM({dec(y_col)}) AS DOUBLE) AS sy, "
        f"CAST(SUM({dec(x_col)} * {dec(x_col)}) AS DOUBLE) AS sxx, "
        f"CAST(SUM({dec(x_col)} * {dec(y_col)}) AS DOUBLE) AS sxy, "
        f"CAST(SUM({dec(y_col)} * {dec(y_col)}) AS DOUBLE) AS syy "
        f"FROM {table_expr} {gby}"
    )
    r4 = "floor(({v}) * 10000.0 + 0.5) / 10000.0"
    slope = "((n * sxy - sx * sy) / (CASE WHEN (n * sxx - sx * sx) <> 0 THEN n * sxx - sx * sx END))"
    intercept = f"((sy - {slope} * sx) / n)"
    r2 = (
        "(((n * sxy - sx * sy) * (n * sxy - sx * sy)) / "
        "(CASE WHEN ((n * sxx - sx * sx) * (n * syy - sy * sy)) <> 0 "
        "THEN ((n * sxx - sx * sx) * (n * syy - sy * sy)) END))"
    )
    return (
        f"SELECT {gsel}CAST(n AS BIGINT) AS n_rows, "
        f"{r4.format(v=slope)} AS slope, "
        f"{r4.format(v=intercept)} AS intercept, "
        f"{r4.format(v=r2)} AS r2 FROM ({stats})"
    )
