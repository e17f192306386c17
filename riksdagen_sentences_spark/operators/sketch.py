"""Mergeable sketches as deterministic column algebra: HyperLogLog
cardinality and Count-Min heavy-hitter estimation.

At 100 TB, exact COUNT(DISTINCT) and exact per-token frequency tables
are shuffle-bound; sketches turn both into one map-side-combinable
aggregation whose state is constant-size (256 registers / a 4x64
counter grid).  Spark's built-in approx_count_distinct is the
production default - THESE implementations exist because they are
hash-deterministic (md5-based, no RNG, no JVM-version dependence), so
the DuckDB oracle reproduces the estimate EXACTLY, putting the sketch
math itself - not just a tolerance band - under the correctness gate.

Determinism over FP association: the HLL denominator sum_j 2^(-M_j) is
computed as the INTEGER sum_j 2^(53 - M_j) (every term a power of two
<= 2^53, at most m=256 terms, so it fits BIGINT exactly) and the final
estimate is ONE double division of two exact numbers - bit-identical
regardless of aggregation order or engine.  Count-Min is all-integer.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8                      # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_HASH_BITS = 60             # 15 md5 hex digits, exact in BIGINT
HLL_W_BITS = HLL_HASH_BITS - HLL_P
# alpha_m * m^2 * 2^53 - the full numerator as ONE double literal, so
# both engines do a single division K / S (see module docstring)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_K = HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)

CM_DEPTH = 4                   # hash rows
CM_WIDTH = 64                  # counters per row


def _fold60(col: Column, salt: str = "") -> Column:
    """First 15 hex digits of md5(salt || value) as exact BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10
    ).cast("bigint")


def hll_register_maxima(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(register, max_rho) over the key set - the mergeable HLL state.

    register = low 8 bits of the 60-bit fold; rho = leading-zero count
    of the remaining 52 bits + 1 (computed as 53 - bitlength, which
    both engines express as length(bin(w)) - no FP log2 near
    power-of-two boundaries).
    """
    h = _fold60(F.col(key_col))
    reg = (h % HLL_M).alias("register")
    # integer shift, NOT (h - h%m)/m: the double round-trip loses
    # exactness above 2^53 and the 60-bit fold exceeds that
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        keys.select(reg, rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(maxima: DataFrame) -> DataFrame:
    """One row (estimate, registers_used) from the register maxima.

    Raw estimate = K / S with S = V * 2^53 + sum(2^(53 - max_rho))
    (V = empty registers, each contributing 2^-0); the standard
    small-range correction switches to linear counting m * ln(m / V)
    when raw <= 2.5 m and V > 0.
    """
    # F.shiftleft's numBits parameter only takes a Python int; the SQL
    # function accepts a column shift, so go through expr()
    s_present = F.sum(F.expr("shiftleft(1L, 53 - max_rho)"))
    agg = maxima.agg(
        s_present.alias("s_present"),
        F.count("*").alias("used"),
    )
    v = F.lit(HLL_M) - F.col("used")
    s = F.col("s_present") + v * F.lit(1 << 53).cast("bigint")
    raw = F.lit(HLL_K) / s.cast("double")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        (F.floor(est * 100.0 + F.lit(0.5)) / 100.0).alias("estimate"),
        F.col("used").alias("registers_used"),
    )


def cm_sketch(items: DataFrame, item_col: str = "item") -> DataFrame:
    """(row, bucket, c) counter grid - the mergeable Count-Min state.

    One union of CM_DEPTH bucket projections + one map-side-combined
    count; the grid is CM_DEPTH x CM_WIDTH rows total, broadcastable
    anywhere.
    """
    parts = [
        items.select(
            F.lit(r).alias("row"),
            (_fold60(F.col(item_col), f"cm{r}:") % CM_WIDTH).alias("bucket"),
        )
        for r in range(CM_DEPTH)
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.groupBy("row", "bucket").agg(F.count("*").alias("c"))


def cm_query(sketch: DataFrame, probes: DataFrame,
             probe_col: str = "item") -> DataFrame:
    """(item, cm_estimate) - min over the CM_DEPTH counters each probe
    hashes to.  Probes with an untouched counter estimate 0 via the
    left join's coalesce (the sketch stores no zero cells)."""
    keyed = probes.select(
        F.col(probe_col).alias("item"),
        *[
            (_fold60(F.col(probe_col), f"cm{r}:") % CM_WIDTH).alias(f"b{r}")
            for r in range(CM_DEPTH)
        ],
    )
    out = keyed
    for r in range(CM_DEPTH):
        sk = sketch.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("c").alias(f"c{r}")
        )
        out = out.join(F.broadcast(sk), f"b{r}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"c{r}"), F.lit(0)) for r in range(CM_DEPTH)]
    )
    return out.select("item", est.alias("cm_estimate"))


def hll_register_maxima_grouped(
    keys: DataFrame, group_col: str, key_col: str = "key"
) -> DataFrame:
    """(group, register, max_rho) - per-group mergeable HLL state: the
    same fold/rho arithmetic as :func:`hll_register_maxima` keyed by an
    extra group column.  This is the GROUP BY form of the sketch - the
    shape that replaces COUNT(DISTINCT x) GROUP BY g at 100 TB, where
    the exact version shuffles every (g, x) pair and this shuffles at
    most 256 rows per group."""
    h = _fold60(F.col(key_col))
    reg = (h % HLL_M).alias("register")
    w = F.shiftright(h, HLL_P)
    rho = F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        keys.select(F.col(group_col).alias("grp"), reg, rho.alias("rho"))
        .groupBy("grp", "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate_grouped(maxima: DataFrame) -> DataFrame:
    """(grp, estimate, registers_used) from per-group register maxima -
    the same exact-integer denominator and single double division as
    :func:`hll_estimate`, per group."""
    s_present = F.sum(F.expr("shiftleft(1L, 53 - max_rho)"))
    agg = maxima.groupBy("grp").agg(
        s_present.alias("s_present"),
        F.count("*").alias("used"),
    )
    v = F.lit(HLL_M) - F.col("used")
    s = F.col("s_present") + v * F.lit(1 << 53).cast("bigint")
    raw = F.lit(HLL_K) / s.cast("double")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(
        "grp",
        (F.floor(est * 100.0 + F.lit(0.5)) / 100.0).alias("estimate"),
        F.col("used").alias("registers_used"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: the runtime-filter / semi-join-pruning sketch.  Spark's
# own injected runtime bloom (spark.sql.optimizer.runtimeFilter.*) is
# the production default; this explicit one is deterministic (md5, no
# JVM hash seed) so the DuckDB oracle reproduces the EXACT bit set -
# false positives included - putting the filter math itself under the
# correctness gate.  The bit set is stored sparsely as distinct
# (r, pos) coordinates: at most BLOOM_K rows per member, broadcastable,
# and mergeable by simple union.
# ---------------------------------------------------------------------------

BLOOM_M = 1024                 # bit positions per hash row
BLOOM_K = 3                    # independent hash functions


def bloom_bits(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """(r, pos) - the distinct set-bit coordinates of the Bloom filter
    over the member key set (r = hash index 0..BLOOM_K-1)."""
    parts = [
        keys.select(
            F.lit(r).alias("r"),
            (_fold60(F.col(key_col), f"bloom{r}:") % BLOOM_M).alias("pos"),
        )
        for r in range(BLOOM_K)
    ]
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return un.dropDuplicates(["r", "pos"])


def bloom_probe(
    probes: DataFrame, bits: DataFrame, probe_col: str = "key"
) -> DataFrame:
    """(key, hits) - how many of the probe's BLOOM_K positions are set;
    a key passes the filter iff hits == BLOOM_K.  Guarantees no false
    negatives (every member's positions are set by construction); false
    positives are the sketch's price and are DETERMINISTIC here.

    The probe side NEVER shuffles - the entire point of a bloom
    semi-join at scale: each hash row of the sparse bit table (<= 1024
    rows) broadcasts to a left join keyed on that row's position
    column, and ``hits`` is the sum of the per-row match flags.  Each
    (r, pos) is distinct so the joins are 1:1 - output rows map 1:1
    with input probe rows (duplicate probe keys are the caller's to
    dedup; the whole path stays exchange-free)."""
    out = probes.select(F.col(probe_col).alias("key"))
    for r in range(BLOOM_K):
        br = bits.filter(F.col("r") == r).select(
            F.col("pos").alias(f"__p{r}"), F.lit(1).alias(f"__m{r}")
        )
        out = out.withColumn(
            f"__p{r}", _fold60(F.col("key"), f"bloom{r}:") % BLOOM_M
        ).join(F.broadcast(br), f"__p{r}", "left")
    hits = sum(
        F.coalesce(F.col(f"__m{r}"), F.lit(0)) for r in range(BLOOM_K)
    )
    return out.select("key", hits.alias("hits"))


def _self_check() -> None:  # pragma: no cover - documentation invariant
    assert HLL_K == 0.7213 / (1.0 + 1.079 / 256) * 256 * 256 * 2.0**53
    assert math.isfinite(HLL_K)


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch
# ---------------------------------------------------------------------------

HIST_BINS = 1024


def histogram_bins(
    values: DataFrame,
    value_col: str = "v",
    bins: int = HIST_BINS,
    vmax_df: DataFrame | None = None,
) -> DataFrame:
    """Mergeable quantile sketch: equi-width histogram over
    ``[0, max(v)]``.  One agg for the range, one map-side-combinable
    agg for the bins - constant state (``bins`` counters), merge = per-
    bin sum, so partial histograms from any partitioning (or any
    micro-batch split; see the streaming replay query) fold to the
    identical grid.  Quantile answers carry the one-sided equi-width
    guarantee 0 <= est - exact <= max(v)/bins.

    All bin math is shared double IEEE ops (``v * bins / vmax``,
    ``floor``), so the DuckDB oracle reproduces the grid exactly.
    Requires v >= 0.
    """
    vmax = (
        vmax_df
        if vmax_df is not None
        else values.agg(F.max(value_col).alias("__vmax"))
    )
    b = F.least(
        F.floor(F.col(value_col) * F.lit(float(bins)) / F.col("__vmax"))
        .cast("long"),
        F.lit(bins - 1),
    )
    return (
        values.crossJoin(F.broadcast(vmax))
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    vmax_df: DataFrame,
    quantiles: tuple[tuple[str, int, int], ...] = (
        ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100),
    ),
    bins: int = HIST_BINS,
) -> DataFrame:
    """Quantile readout from a (possibly merged) histogram: the upper
    edge of the first bin whose cumulative count reaches
    ``ceil(q * n)``.  The cumulative window runs over at most ``bins``
    rows - constant work after the aggregation, never a data-sized
    global sort.  Targets are exact integer arithmetic
    (``floor((n*num + den - 1)/den)`` of < 2^53 doubles)."""
    from pyspark.sql.window import Window

    qf = hist.sparkSession.createDataFrame(
        list(quantiles), "qname string, num int, den int"
    )
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy(F.col("bin").asc()))
    ).crossJoin(hist.agg(F.sum("cnt").alias("__n")))
    hit = cum.crossJoin(F.broadcast(qf)).filter(
        F.col("cum")
        >= F.floor(
            (F.col("__n") * F.col("num") + F.col("den") - F.lit(1))
            / F.col("den")
        )
    )
    est_bin = hit.groupBy("qname").agg(F.min("bin").alias("qbin"))
    return est_bin.crossJoin(F.broadcast(vmax_df)).select(
        "qname",
        (
            (F.col("qbin") + F.lit(1))
            * F.col("__vmax")
            / F.lit(float(bins))
        ).alias("est_raw"),
    )


def histogram_quantiles_grouped(
    values: DataFrame,
    group_col: str,
    value_col: str = "v",
    quantiles: tuple[tuple[str, int, int], ...] = (
        ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100),
    ),
    bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group quantile estimates from per-group equi-width grids
    (each group gets its own frozen [0, max] range - groups are
    independent sketches, so this is the GROUP BY form of
    :func:`histogram_bins` + :func:`histogram_quantiles`).

    Two grouped aggregates (range, bins) + one cumulative window whose
    partitions are <= ``bins`` rows each; the group-cardinality range
    frame broadcasts back onto the values - never a per-group global
    sort of the data."""
    from pyspark.sql.window import Window

    gmax = values.groupBy(group_col).agg(
        F.max(value_col).alias("__vmax")
    )
    b = F.least(
        F.floor(F.col(value_col) * F.lit(float(bins)) / F.col("__vmax"))
        .cast("long"),
        F.lit(bins - 1),
    )
    hist = (
        values.join(F.broadcast(gmax), group_col)
        .select(group_col, b.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wg = Window.partitionBy(group_col).orderBy(F.col("bin").asc())
    cum = hist.withColumn("cum", F.sum("cnt").over(wg)).join(
        hist.groupBy(group_col).agg(F.sum("cnt").alias("__n")), group_col
    )
    qf = values.sparkSession.createDataFrame(
        list(quantiles), "qname string, num int, den int"
    )
    hit = cum.crossJoin(F.broadcast(qf)).filter(
        F.col("cum")
        >= F.floor(
            (F.col("__n") * F.col("num") + F.col("den") - F.lit(1))
            / F.col("den")
        )
    )
    est_bin = hit.groupBy(group_col, "qname").agg(
        F.min("bin").alias("qbin")
    )
    return est_bin.join(F.broadcast(gmax), group_col).select(
        group_col, "qname",
        (
            (F.col("qbin") + F.lit(1))
            * F.col("__vmax")
            / F.lit(float(bins))
        ).alias("est_raw"),
    )
