"""Declarative data-quality expectations over a DataFrame - the
contract-checking stage every large ingest pipeline runs before
publishing a table (Great-Expectations-style, re-expressed as Spark
column algebra).

Engine extension beyond the reference: the reference enforces its
invariants row-at-a-time through pydantic validators and DB UNIQUE
constraints (/root/reference/models/sentence.py pydantic models;
UNIQUE(text,document,language) in the schema); at 100 TB validation
must instead be a HANDFUL OF SCANS whose output is a per-rule violation
count, not a per-row exception.

Shape: every column rule folds into ONE shared single-pass aggregate
(conditional sums - no per-rule scan); set rules (uniqueness,
referential integrity) each cost their natural aggregation/join.  All
results union into one tiny (rule, n_rows, n_violations, passed) frame.
No UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> tuple[str, Column]:
    return f"not_null({col})", F.col(col).isNull()


def expect_positive(col: str) -> tuple[str, Column]:
    return f"positive({col})", ~(F.col(col) > 0)


def expect_in_set(col: str, allowed: list[str]) -> tuple[str, Column]:
    name = f"in_set({col})"
    return name, ~F.col(col).isin(allowed) | F.col(col).isNull()


def expect_between(col: str, lo: float, hi: float) -> tuple[str, Column]:
    name = f"between({col},{lo},{hi})"
    return name, ~F.col(col).between(lo, hi) | F.col(col).isNull()


def check_rules(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> DataFrame:
    """All row-local rules in ONE aggregate pass: each rule contributes
    a conditional sum over its violation predicate."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    row = df.agg(*aggs)
    out = None
    for i, (name, _) in enumerate(rules):
        part = row.select(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__v{i}").cast("bigint").alias("n_violations"),
        )
        out = part if out is None else out.unionByName(part)
    return out


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Duplicate-key accounting: violations = rows beyond the first of
    each key (count - distinct count).  COUNT(DISTINCT) ignores NULLs
    (both engines), so every NULL-keyed row also counts as a violation
    - a key that cannot be checked is not unique."""
    name = f"unique({','.join(cols)})"
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
        ).cast("bigint").alias("n_violations"),
    ).select(F.lit(name).alias("rule"), "n_rows", "n_violations")


def check_references(
    df: DataFrame, col: str, dim: DataFrame, dim_col: str
) -> DataFrame:
    """Referential integrity as a left-anti join count - the orphan
    rows, not an exception per orphan."""
    name = f"references({col})"
    orphans = df.select(F.col(col)).join(
        dim.select(F.col(dim_col).alias(col)), col, "left_anti"
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .crossJoin(total)
        .select(F.lit(name).alias("rule"), "n_rows", "n_violations")
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "n_rows", "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
