"""Data profiling: per-column quality statistics in one distributed pass.

A 100 TB ingest needs cheap answers to "which columns are null / how
wide are the domains" before any pipeline runs over it.  The reference
has no analog (its MariaDB schema is hand-curated); this is standard
warehouse tooling re-expressed Spark-first:

- ONE ``agg`` computes every column's null count and exact distinct
  count in a single job (multiple count_distincts expand the input rows
  per aggregate - the classic grouping-sets expansion - which is the
  accepted cost of exact profiling; swap in approx_count_distinct for
  the sketch-based variant at extreme widths).
- The 1-row result is unpivoted driver-free with ``stack`` into one row
  per column, so the output composes with joins/filters like any other
  table.

All counts are integers - bit-identical across engines, no rounding.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct) for each requested
    column; n_distinct counts non-null distinct values (COUNT(DISTINCT)
    semantics in both Spark and ANSI SQL)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.isnull(F.col(c)).cast("bigint")).alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
    row = df.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`" for c in cols
    )
    stacked = row.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {pairs}) AS "
            "(column_name, n_nulls, n_distinct)"
        ),
    )
    return stacked.select("column_name", "n_rows", "n_nulls", "n_distinct")


def key_skew(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """1-row skew profile of a join/partition key — the diagnostic to
    run BEFORE shuffling 100 TB on it (decides whether the key needs
    salting, AQE skew-join, or a broadcast of the hot rows):

    - ``n_rows`` / ``n_keys`` / ``max_key_rows``: exact integers;
    - ``top1_share`` / ``top{top_n}_share``: fraction of all rows held
      by the hottest key(s) — a top-1 share near 1/parallelism means
      one task drags the whole shuffle;
    - ``skew_factor``: max key size over the mean key size (1.0 =
      perfectly uniform).

    Plan shape: ONE map-side-combined groupBy builds the per-key count
    table; everything after runs on that aggregate — two tiny reductions
    and a TakeOrdered top-N (no global sort).  Ratio determinism: each
    ratio is a single IEEE division of exact integers, identical across
    engines; ties at the top-N boundary have equal counts, so the top-N
    SUM is order-invariant."""
    from .cache import track

    # track() so release_intermediates() can free the per-key count
    # blocks after long bench/parity sweeps (same discipline as the
    # other persisting operators)
    counts = track(df.groupBy(key).agg(F.count("*").alias("c")).persist())
    totals = counts.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_key_rows"),
    )
    top = (
        counts.orderBy(F.col("c").desc())
        .limit(top_n)
        .agg(F.sum("c").cast("bigint").alias("__top_rows"))
    )
    r4 = lambda c: F.floor(c * 10000.0 + F.lit(0.5)) / 10000.0  # noqa: E731
    return totals.crossJoin(top).select(
        F.lit(key).alias("key_col"),
        "n_rows",
        "n_keys",
        "max_key_rows",
        r4(F.col("max_key_rows") / F.col("n_rows")).alias("top1_share"),
        r4(F.col("__top_rows") / F.col("n_rows")).alias(
            f"top{top_n}_share"
        ),
        r4(
            F.col("max_key_rows")
            / (F.col("n_rows") / F.col("n_keys"))
        ).alias("skew_factor"),
    )


def key_skew_sql(source: str, key: str, top_n: int = 10) -> str:
    """DuckDB twin of :func:`key_skew` over ``source``."""
    return (
        f"WITH kc AS (SELECT {key} AS k, COUNT(*) AS c FROM {source} "
        f"GROUP BY {key}), "
        "kt AS (SELECT CAST(SUM(c) AS BIGINT) AS n_rows, "
        "CAST(COUNT(*) AS BIGINT) AS n_keys, "
        "CAST(MAX(c) AS BIGINT) AS max_key_rows FROM kc), "
        f"tp AS (SELECT CAST(SUM(c) AS BIGINT) AS top_rows FROM "
        f"(SELECT c FROM kc ORDER BY c DESC LIMIT {top_n})) "
        f"SELECT '{key}' AS key_col, n_rows, n_keys, max_key_rows, "
        "floor(max_key_rows / n_rows * 10000.0 + 0.5) / 10000.0 "
        "AS top1_share, "
        "floor(top_rows / n_rows * 10000.0 + 0.5) / 10000.0 "
        f"AS top{top_n}_share, "
        "floor(max_key_rows / (n_rows / n_keys) * 10000.0 + 0.5) "
        "/ 10000.0 AS skew_factor "
        "FROM kt CROSS JOIN tp"
    )
