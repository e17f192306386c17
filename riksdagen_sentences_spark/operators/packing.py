"""Sequence packing for training-data preparation: assign documents to
fixed-token-budget bins in a deterministic order.

The core primitive is a DISTRIBUTED prefix sum.  The naive Spark
formulation - ``F.sum(tokens).over(Window.orderBy(id))`` with no
partitionBy - collapses the whole table into ONE task (Spark must see
the total order), which is the classic 100 TB scale-killer hiding in a
one-liner.  Instead:

1. project down to ``(order_col, value_col)`` BEFORE any shuffle (the
   parquet scan is column-pruned; full rows/text never ride the range
   exchange),
2. range-repartition by the order key (each partition owns a contiguous
   key range, `repartitionByRange`), stamp ``spark_partition_id()`` and
   ``localCheckpoint(eager=True)`` the result: the shuffle + partition
   assignment is MATERIALIZED exactly once.  This is load-bearing for
   correctness, not just I/O: ``RangePartitioner`` samples its range
   boundaries with an RDD-id-derived seed, so re-evaluating the plan
   (one job for the offsets, another for the result) can assign rows to
   DIFFERENT partitions once the sampler actually samples at scale -
   offsets built for one partitioning would silently corrupt prefixes
   near boundaries.  The eager checkpoint pins one partitioning for
   both downstream jobs and makes the post-shuffle input read-once,
3. per-partition prefix sums with a window PARTITIONED by the stamped
   ``__pid`` (parallel, no global sort),
4. per-partition totals (one tiny agg over the checkpointed blocks,
   #partitions rows) cumulated on the driver - bounded metadata, not
   data - and applied as a broadcast map offset.

Bin assignment is contiguous-with-overflow: bin = floor(exclusive
prefix / capacity), so a document straddling a boundary lands in the
bin where its first token falls and may overfill it by < 1 document -
the standard streaming-packing tradeoff (no bin-level shuffle, fully
deterministic).  DuckDB oracle: the same arithmetic over
``SUM(...) OVER (ORDER BY ...)``.

The checkpoint blocks are narrow (two columns + a pid int) and live for
the session unless released; callers that loop over many corpora can
free them via ``cache.release_intermediates`` semantics (the blocks
hang off the LogicalRDD leaf, see operators/cache.py).
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
    """``(order_col, value_col, prefix)`` - inclusive prefix sum of
    value_col in order_col order - without a single-partition global
    window and with the input scanned ONCE after the range shuffle.

    ``order_col`` must be unique (a total order is what a prefix sum
    is defined over; ties would make both the window frame and any
    join-back on the key ambiguous).
    """
    narrow = (
        df.select(order_col, value_col)
        .repartitionByRange(n_partitions, F.col(order_col))
        .select("*", F.spark_partition_id().alias("__pid"))
        .localCheckpoint(eager=True)
    )
    local = narrow.withColumn(
        "__local",
        F.sum(value_col).over(
            Window.partitionBy("__pid").orderBy(order_col)
        ),
    )
    # one row per partition: bounded driver metadata (not a data
    # collect); offsets[p] = sum of all values in partitions < p.
    # Reads the checkpointed blocks - no second pass over the input,
    # and __pid here is by construction the same assignment the window
    # job sees.
    totals = {
        r["__pid"]: r["__t"]
        for r in narrow.groupBy("__pid")
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
    ).select(order_col, value_col, "prefix")


def sequence_windows(
    docs_with_tokens: DataFrame,
    max_len: int,
    stride: int | None = None,
    token_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per fixed-length training window over each document's
    token sequence: (id_col, win_id, start_tok, win_len) - the
    long-document splitting step of sequence preparation (a 200k-token
    document becomes ~49 overlapping 4096-token windows, not one
    truncated row).

    ``stride`` defaults to ``max_len`` (non-overlapping); a smaller
    stride overlaps windows (the usual LM training trick so no span
    loses its left context).  Window starts are 0, stride, 2*stride, …
    < tokens; the final window truncates to the remaining tokens.
    Pure per-row column algebra (sequence + explode) - zero shuffle,
    embarrassingly parallel at any corpus size.
    """
    if stride is None:
        stride = max_len
    if stride <= 0 or max_len <= 0:
        raise ValueError("max_len and stride must be positive")
    tokens = F.col(token_col)
    starts = F.when(
        tokens > 0,
        F.sequence(F.lit(0), (tokens - 1).cast("int"), F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    return docs_with_tokens.select(
        id_col,
        token_col,
        F.explode(starts).alias("start_tok"),
    ).select(
        id_col,
        (F.col("start_tok") / stride).cast("bigint").alias("win_id"),
        F.col("start_tok").cast("bigint"),
        F.least(F.lit(max_len), tokens - F.col("start_tok"))
        .cast("bigint")
        .alias("win_len"),
    )


def pack_into_bins(
    docs_with_tokens: DataFrame,
    capacity: int,
    token_col: str = "tokens",
    order_col: str = "doc_id",
    n_partitions: int = 32,
) -> DataFrame:
    """(… , prefix, bin): contiguous greedy packing of documents into
    ``capacity``-token bins in ``order_col`` order.

    Only ``(order_col, token_col)`` goes through the prefix-sum range
    shuffle; when the input carries more columns (e.g. full document
    text in a curation job) they are re-attached by an equi-join on the
    unique order key AFTER the narrow arithmetic - the wide rows are
    shuffled once by the join instead of riding the range exchange,
    the window and the checkpoint."""
    ps = prefix_sum(docs_with_tokens, token_col, order_col, n_partitions)
    bins = ps.withColumn(
        "bin",
        F.floor(
            (F.col("prefix") - F.col(token_col)) / F.lit(capacity)
        ).cast("bigint"),
    )
    if set(docs_with_tokens.columns) <= {order_col, token_col}:
        return bins
    return docs_with_tokens.join(
        bins.select(order_col, "prefix", "bin"), order_col
    )
