"""Sequence packing for training-data preparation: assign documents to
fixed-token-budget bins in a deterministic order.

The core primitive is a DISTRIBUTED prefix sum.  The naive Spark
formulation - ``F.sum(tokens).over(Window.orderBy(id))`` with no
partitionBy - collapses the whole table into ONE task (Spark must see
the total order), which is the classic 100 TB scale-killer hiding in a
one-liner.  Instead:

1. range-repartition by the order key (each partition owns a contiguous
   key range, `repartitionByRange`),
2. per-partition prefix sums with a window PARTITIONED by
   ``spark_partition_id()`` (parallel, no global sort),
3. per-partition totals (one tiny agg, #partitions rows) cumulated on
   the driver - bounded metadata, not data - and joined back as a
   broadcast offset.

Bin assignment is contiguous-with-overflow: bin = floor(exclusive
prefix / capacity), so a document straddling a boundary lands in the
bin where its first token falls and may overfill it by < 1 document -
the standard streaming-packing tradeoff (no bin-level shuffle, fully
deterministic).  DuckDB oracle: the same arithmetic over
``SUM(...) OVER (ORDER BY ...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """df + ``prefix`` (inclusive prefix sum of value_col in order_col
    order) without a single-partition global window."""
    part = df.repartitionByRange(n_partitions, F.col(order_col)).select(
        "*", F.spark_partition_id().alias("__pid")
    )
    local = part.withColumn(
        "__local",
        F.sum(value_col).over(
            Window.partitionBy("__pid").orderBy(order_col)
        ),
    )
    # one row per partition: bounded driver metadata (not a data
    # collect); offsets[p] = sum of all values in partitions < p
    totals = {
        r["__pid"]: r["__t"]
        for r in part.groupBy("__pid")
        .agg(F.sum(value_col).alias("__t"))
        .collect()
    }
    running, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    if offsets:
        pairs = [x for pid, off in offsets.items() for x in (pid, off)]
        omap = F.create_map(*[F.lit(x) for x in pairs])
        off_col = F.coalesce(omap[F.col("__pid")], F.lit(0))
    else:
        off_col = F.lit(0)
    return local.withColumn(
        "prefix", (F.col("__local") + off_col).cast("bigint")
    ).drop("__pid", "__local")


def pack_into_bins(
    docs_with_tokens: DataFrame,
    capacity: int,
    token_col: str = "tokens",
    order_col: str = "doc_id",
    n_partitions: int = 32,
) -> DataFrame:
    """(… , prefix, bin): contiguous greedy packing of documents into
    ``capacity``-token bins in ``order_col`` order."""
    ps = prefix_sum(docs_with_tokens, token_col, order_col, n_partitions)
    return ps.withColumn(
        "bin",
        F.floor(
            (F.col("prefix") - F.col(token_col)) / F.lit(capacity)
        ).cast("bigint"),
    )
