"""Skew-aware deduplication / canonicalization operators.

The reference enforces uniqueness with MariaDB UNIQUE constraints +
existence probes before every insert (/root/reference/models/crud/
read.py:233-318, insert.py:79-196) - one network round-trip per row.  At
100 TB the equivalent is a distributed group-by, and natural-language keys
are Zipf-distributed ("och", "att", one hot document...), so a single
groupBy on the key would put the hot key's entire partition on one task.

``salted_dedup`` is the explicit two-phase pattern the north rule asks
for: phase 1 groups on (key, salt) so a hot key is split across
``salt_buckets`` tasks and partially aggregated map-side; phase 2 groups
the (at most ``salt_buckets``) survivors per key.  AQE's skew handling
covers joins but NOT aggregations, which is why this is hand-built.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_dedup(
    df: DataFrame,
    keys: list[str],
    order_col: str | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """Exactly-one-row-per-key dedup in two salted phases.

    All non-key columns are reduced with ``min_by(struct, order_col)``
    when ``order_col`` is given (keep the first occurrence, matching the
    reference's insert-on-first-sight semantics), else with ``min`` of the
    row struct (deterministic, order-independent).
    """
    others = [c for c in df.columns if c not in keys]
    if not others:
        # key-only dedup is map-side combinable already (partial hash agg
        # collapses the hot key within each task) - no salting needed
        return df.dropDuplicates(keys)
    # Per-column MIN instead of min_by(struct(...)): struct-typed agg
    # buffers force SortAggregate (3 sorts in the plan); primitive MINs
    # keep both phases in HashAggregate with map-side partials.  This is
    # correct because in every pipeline use the non-key columns are
    # functionally dependent on the key (identical within a group), so
    # any per-column reduction yields the group's single value; MIN of
    # the order column is the first-occurrence index the reference's
    # insert-on-first-sight semantics needs.
    del order_col  # kept in the signature for call-site documentation
    aggs = [F.min(c).alias(c) for c in others]
    salted = df.withColumn(
        SALT_COL, F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, SALT_COL).agg(*aggs)
    phase2 = phase1.groupBy(*keys).agg(*aggs)
    return phase2.select(*keys, *others)


def exact_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Plain dropDuplicates for non-skewed keys (partial agg map-side)."""
    return df.dropDuplicates(keys)
