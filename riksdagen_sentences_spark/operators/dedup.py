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
    payload = F.struct(*[F.col(c) for c in others]).alias("__payload")
    if order_col is not None:
        agg1 = F.min_by(payload, F.col(order_col)).alias("__payload")
        # carry the order column through so phase 2 can re-reduce
        salted = df.withColumn(
            SALT_COL, F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
        )
        phase1 = salted.groupBy(*keys, SALT_COL).agg(
            agg1, F.min(order_col).alias("__ord")
        )
        phase2 = phase1.groupBy(*keys).agg(
            F.min_by("__payload", "__ord").alias("__payload")
        )
    else:
        salted = df.withColumn(
            SALT_COL, F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
        )
        phase1 = salted.groupBy(*keys, SALT_COL).agg(
            F.min(payload).alias("__payload")
        )
        phase2 = phase1.groupBy(*keys).agg(
            F.min("__payload").alias("__payload")
        )
    return phase2.select(
        *keys, *[F.col(f"__payload.{c}").alias(c) for c in others]
    )


def exact_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Plain dropDuplicates for non-skewed keys (partial agg map-side)."""
    return df.dropDuplicates(keys)
