"""Skew-aware deduplication / canonicalization operators.

The reference enforces uniqueness with MariaDB UNIQUE constraints +
existence probes before every insert (/root/reference/models/crud/
read.py:233-318, insert.py:79-196) - one network round-trip per row.  At
100 TB the equivalent is a distributed group-by, and natural-language keys
are Zipf-distributed ("och", "att", one hot document...), so a single
groupBy on the key would put the hot key's entire partition on one task.

``salted_dedup`` keeps the two-phase *semantics* the north rule asks
for, but the first phase is Spark's own map-side partial HashAggregate:
each map task collapses its local copies of every key (including the
hot one) to a single partial row before the exchange, so the reduce
side of the ONE shuffle receives at most #map-tasks rows per key -
narrow fixed-size rows, never the hot key's raw copies.  That is
exactly what an explicit (key, salt)->key double aggregation buys,
minus its second full shuffle: an explicit salt whose value is constant
within a map task (partition-id-derived) adds a second exchange without
reducing what any single task holds (measured 1.59 s -> 0.87 s on the
100k-doc sentence dedup by dropping it).  AQE's skew handling covers
joins but NOT aggregations; for aggregations the partial-agg combine IS
the skew defense.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_dedup(
    df: DataFrame,
    keys: list[str],
    salt_buckets: int = 64,
    check_dependence: bool = False,
) -> DataFrame:
    """Exactly-one-row-per-key dedup: map-side partial aggregation
    (phase 1, inside each task - the skew defense) + one hash
    aggregation after a single exchange (phase 2).  ``salt_buckets`` is
    retained for API compatibility; the explicit salt column it used to
    size added a second exchange without changing what any task holds
    (see module docstring) and is no longer materialized.

    CONTRACT: every non-key column is reduced with an INDEPENDENT ``MIN``.
    Callers must ensure each non-key column is either (a) functionally
    dependent on the key (identical within every group - then MIN is the
    group's single value), or (b) a column where per-group MIN is itself
    the wanted semantics (e.g. ``sent_idx`` -> first-occurrence index).
    Columns violating both would yield a row mixing values from different
    input rows; ``check_dependence=True`` (debug/tests only - it runs an
    extra aggregation over ``df``) raises if any group has >1 distinct
    value in any non-key column.

    Per-column MIN instead of ``min_by(struct(...))``: struct-typed agg
    buffers force SortAggregate (3 sorts in the plan); primitive MINs
    keep both phases in HashAggregate with map-side partials.  Known
    deviation recorded in ``semantics.py``: the canonical rawtoken
    ``score`` is min-over-occurrences, not the reference's
    first-insert score (insert order is undefined in a distributed
    engine; MIN is the deterministic, order-independent choice).
    """
    others = [c for c in df.columns if c not in keys]
    if not others:
        # key-only dedup is map-side combinable already (partial hash agg
        # collapses the hot key within each task) - no salting needed
        return df.dropDuplicates(keys)
    if check_dependence:
        # countDistinct over a null-tagged STRUCT, not the bare column:
        # countDistinct skips NULL inputs, so a group holding {NULL, 'x'}
        # would report 1 distinct value and slip past the guard even
        # though per-column MIN silently resolves it to 'x'.  A struct is
        # never NULL even when its field is, so NULL counts as its own
        # distinct value.
        bad = (
            df.groupBy(*keys)
            .agg(
                *[
                    F.countDistinct(F.struct(F.col(c))).alias(c)
                    for c in others
                ]
            )
            .filter(
                F.greatest(*[F.col(c) for c in others]) > 1
                if len(others) > 1
                else F.col(others[0]) > 1
            )
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                "salted_dedup: a non-key column has >1 distinct value "
                f"within a key group (keys={keys}); per-column MIN would "
                "mix values from different rows"
            )
    aggs = [F.min(c).alias(c) for c in others]
    # one groupBy = map-side partial agg (collapses every task's local
    # copies, hot keys included) + one exchange of <= #tasks narrow
    # partial rows per key + final agg.  MIN is associative, so the
    # result is bit-identical to any salted regrouping of the same MINs.
    return df.groupBy(*keys).agg(*aggs).select(*keys, *others)


def exact_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Plain dropDuplicates for non-skewed keys (partial agg map-side)."""
    return df.dropDuplicates(keys)
