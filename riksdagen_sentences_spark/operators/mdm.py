"""Master-data survivorship: fold conflicting per-source records into
one golden record per entity, field by field, by "most recent non-null
wins".

KG construction ingests the same entity from several systems (the
reference's get-or-insert keeps FIRST-seen attributes forever,
/root/reference/models/entity.py:36-48 - no conflict resolution at
all); production MDM picks each field from the freshest source that
actually has it.

Engine-portable trick: arg-max-by-recency is encoded as a plain MAX
over ``lpad(recency) || ':' || value`` strings - NULL values drop out
of MAX natively, the zero-padded recency prefix makes lexicographic
order == numeric recency order, and MAX is associative/commutative, so
the whole survivorship pass is ONE map-side-combinable hash aggregate
per entity key - no windows, no per-field joins, one shuffle at 100 TB.
Ties are impossible when (key, recency) is unique (assert upstream);
with duplicate recencies the lexicographically larger value wins -
deterministic either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PAD = 9  # recency digits; prefix length = _PAD + 1 (the ':')


def _encoded(recency_col: str, c: str) -> Column:
    return F.when(
        F.col(c).isNotNull(),
        F.concat(
            F.lpad(F.col(recency_col).cast("string"), _PAD, "0"),
            F.lit(":"),
            F.col(c),
        ),
    )


def golden_records(
    df: DataFrame,
    key_col: str,
    recency_col: str,
    value_cols: list[str],
) -> DataFrame:
    """(key, <value_cols...>): per key, each value column resolved to
    its most recent non-null occurrence.  Value columns must be
    strings (pre-cast numerics to DECIMAL-backed strings so the
    round-trip is exact)."""
    aggs = []
    for c in value_cols:
        m = F.max(_encoded(recency_col, c))
        aggs.append(
            m.substr(F.lit(_PAD + 2), F.length(m) - (_PAD + 1)).alias(c)
        )
    return df.groupBy(F.col(key_col)).agg(*aggs)


def golden_records_sql(
    table_expr: str,
    key_col: str,
    recency_col: str,
    value_cols: list[str],
) -> str:
    """DuckDB twin: same encoding, same MAX, same strip."""
    sels = [key_col]
    for c in value_cols:
        enc = (
            f"CASE WHEN {c} IS NOT NULL THEN "
            f"lpad(CAST({recency_col} AS VARCHAR), {_PAD}, '0') "
            f"|| ':' || {c} END"
        )
        sels.append(f"substr(MAX({enc}), {_PAD + 2}) AS {c}")
    return (
        f"SELECT {', '.join(sels)} FROM {table_expr} GROUP BY {key_col}"
    )
