"""Deterministic sketches: HLL accuracy + mergeability, Count-Min
one-sided error (operators/sketch.py)."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators import sketch as SK


def test_hll_estimate_within_theoretical_error(spark):
    keys = spark.range(5000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    row = SK.hll_estimate(SK.hll_register_maxima(keys)).first()
    # sigma = 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
    assert abs(row.estimate / 5000.0 - 1.0) < 0.2
    assert 0 < row.registers_used <= SK.HLL_M


def test_hll_register_maxima_merge(spark):
    a = spark.range(0, 2000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    b = spark.range(1500, 4000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    merged = (
        SK.hll_register_maxima(a)
        .unionByName(SK.hll_register_maxima(b))
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    direct = SK.hll_register_maxima(a.unionByName(b))
    # sketch state merges losslessly: max of maxima == maxima of union
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    # and therefore the merged ESTIMATE equals the direct estimate
    assert (
        SK.hll_estimate(merged).first().estimate
        == SK.hll_estimate(direct).first().estimate
    )


def test_cm_estimate_never_undercounts(spark):
    items = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1,
        "item string",
    )
    sk = SK.cm_sketch(items)
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("never",)], "item string"
    )
    got = {r.item: r.cm_estimate for r in SK.cm_query(sk, probes).collect()}
    true = {"a": 10, "b": 3, "c": 1, "never": 0}
    for k, t in true.items():
        assert got[k] >= t  # Count-Min error is strictly one-sided
    # 3 distinct items in a 4x64 grid: collisions are impossible to
    # plant deterministically, but total inflation is bounded by the
    # grid mass
    assert got["a"] <= 14 and got["never"] <= 14


def test_histogram_sketch_mergeable_and_bounded(spark):
    """The histogram grid from the full data equals the per-bin sum of
    the grids of any split (mergeability = what makes it a sketch), and
    every quantile estimate obeys 0 <= est - exact <= vmax/bins."""
    vals = [(i, float(((i * 37) % 1000) + 1) / 7.0) for i in range(2000)]
    df = spark.createDataFrame(vals, "event_id bigint, v double")
    vmax = df.agg(F.max("v").alias("__vmax"))
    full = {
        r["bin"]: r["cnt"]
        for r in SK.histogram_bins(df, "v", vmax_df=vmax).collect()
    }
    merged: dict[int, int] = {}
    for half in (df.filter("event_id % 2 = 0"), df.filter("event_id % 2 = 1")):
        # each partial is binned against the SAME frozen range
        for r in SK.histogram_bins(half, "v", vmax_df=vmax).collect():
            merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == full

    hist = SK.histogram_bins(df, "v", vmax_df=vmax)
    est = {
        r["qname"]: r["est_raw"]
        for r in SK.histogram_quantiles(hist, vmax).collect()
    }
    svals = sorted(v for _, v in vals)
    n, vm = len(svals), max(svals)
    import math

    for qname, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        exact = svals[math.ceil(n * num / den) - 1]
        assert -1e-9 <= est[qname] - exact <= vm / SK.HIST_BINS + 1e-9
