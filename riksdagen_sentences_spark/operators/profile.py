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
