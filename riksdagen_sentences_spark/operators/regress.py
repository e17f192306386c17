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


def pairwise_correlations(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_x, col_y, corr): Pearson correlation for every unordered
    column pair, from ONE map-side-combinable aggregate (n + one exact
    DECIMAL sum per column + one per pair) unpivoted to long format.
    sqrt is IEEE-correctly-rounded in both engines, so the fixed
    parenthesization stays engine-portable; rounded to 4 dp."""
    aggs = [F.count("*").cast("double").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).cast(_DEC)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum(F.col(c).cast(_DEC) * F.col(c).cast(_DEC))
            .cast("double")
            .alias(f"s_{c}_{c}")
        )
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.sum(F.col(a).cast(_DEC) * F.col(b).cast(_DEC))
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
    s = df.agg(*aggs)

    def _corr(a: str, b: str) -> Column:
        n = F.col("n")
        cov = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        return _r4(cov / F.sqrt(va * vb))

    rows = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            _corr(a, b).alias("corr"),
        )
        for i, a in enumerate(cols)
        for b in cols[i + 1:]
    ]
    return (
        s.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.*")
        .orderBy("col_x", "col_y")
    )


def pairwise_correlations_sql(table_expr: str, cols: list[str]) -> str:
    """DuckDB twin of pairwise_correlations - same sums, same
    parenthesization, same rounding."""

    def dec(c: str) -> str:
        return f"CAST({c} AS DECIMAL(18,2))"

    sels = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in cols:
        sels.append(f"CAST(SUM({dec(c)}) AS DOUBLE) AS s_{c}")
        sels.append(f"CAST(SUM({dec(c)} * {dec(c)}) AS DOUBLE) AS s_{c}_{c}")
    pairs = [
        (a, b) for i, a in enumerate(cols) for b in cols[i + 1:]
    ]
    for a, b in pairs:
        sels.append(f"CAST(SUM({dec(a)} * {dec(b)}) AS DOUBLE) AS s_{a}_{b}")
    stats = f"SELECT {', '.join(sels)} FROM {table_expr}"
    outs = []
    for a, b in pairs:
        corr = (
            f"((n * s_{a}_{b} - s_{a} * s_{b}) / "
            f"sqrt((n * s_{a}_{a} - s_{a} * s_{a}) * "
            f"(n * s_{b}_{b} - s_{b} * s_{b})))"
        )
        outs.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
            f"floor(({corr}) * 10000.0 + 0.5) / 10000.0 AS corr "
            f"FROM stats"
        )
    return (
        f"WITH stats AS ({stats}) "
        + " UNION ALL ".join(outs)
        + " ORDER BY col_x, col_y"
    )
