"""Registry for persisted INTERMEDIATE DataFrames (shingle tables, band
tables, CC label frontiers...).

Several operators persist deterministic intermediates because both sides
of a self-join must hit the cache instead of racing to recompute the
lineage (neardup.py, graph.py).  The operator returns a LAZY result that
still references the persisted parent, so the operator itself can never
know when it is safe to unpersist - only the caller does, after
materializing the result.  Persisting is correct without cleanup (blocks
are evicted LRU and recomputation is deterministic), but a long driver
run of many queries accumulates dead cached blocks; callers that
materialize many operator results in sequence (bench.py, tools/parity.py,
the driver correctness gate) should call :func:`release_intermediates`
between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted intermediate for later release."""
    _TRACKED.append(df)
    return df


def spread_input(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread the input across the cluster when it arrives in fewer
    splits than there are cores.  Explode -> partial-aggregate (and
    explode -> project) chains parallelize per INPUT partition, so a
    small corpus read as one parquet split would run its whole kernel
    chain serially in one task.  At production scale the source has far
    more splits than cores and this is a NO-OP (no shuffle is added) -
    the guard only fires in the small-file regime where the shuffle it
    adds is trivially cheap.

    Pass a high-cardinality ``key_cols`` (a unique id) whenever one
    exists: hash repartitioning is a plain exchange, while keyless
    ``repartition(n)`` is ROUND-ROBIN, which since Spark 3 locally
    sorts every partition for deterministic retries - on wide rows
    (full document text) that sort more than doubles the exchange cost
    (measured 45 s -> 21 s on the sf0.1 serving build)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if key_cols:
            return df.repartition(target, *[F.col(c) for c in key_cols])
        return df.repartition(target)
    return df


def release_intermediates() -> int:
    """Unpersist every tracked intermediate.  Safe to call at any time -
    a not-yet-materialized result that still references a released
    parent recomputes it deterministically (slower, never wrong).
    Returns the number of frames released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            continue  # session already stopped - nothing to release
        # DataFrame.unpersist() is a no-op for localCheckpoint'ed frames:
        # their blocks are registered on the checkpoint RDD inside the
        # LogicalRDD leaf, not in the cache manager.  Release that RDD
        # directly.  NOTE: a checkpoint truncated the lineage, so a
        # LATER reference to this frame fails instead of recomputing -
        # which is exactly why only finished intermediates are tracked;
        # callers re-running a query get a fresh operator invocation,
        # never the released frame.
        try:
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:
            pass  # plain persist()-ed frame (no LogicalRDD leaf) or py4j
    return n
