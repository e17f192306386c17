"""Z-order layout (operators/layout.py): Morton-value correctness and
the data-skipping property of the written files."""

from pyspark.sql import functions as F


def _morton(x: int, y: int, bits: int = 10) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_reference_interleave(spark):
    from riksdagen_sentences_spark.operators.layout import zvalue

    pts = [(x, y) for x in (0, 1, 5, 513, 1023) for y in (0, 2, 7, 1023)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z"))
    for r in got.collect():
        assert r.z == _morton(r.x, r.y), (r.x, r.y)


def test_zvalue_orders_locally(spark):
    """Points in the same small square sort adjacently: the z range of
    a 2x2 square never straddles the z of a far-away point."""
    from riksdagen_sentences_spark.operators.layout import zvalue

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (512, 512)], "x long, y long"
    )
    zs = sorted(
        r.z
        for r in df.select(zvalue(F.col("x"), F.col("y")).alias("z"))
        .collect()
    )
    assert zs[:4] == [0, 1, 2, 3] and zs[4] >= 2 ** 18


def test_write_zordered_bounds_both_dims(spark, tmp_path):
    """Every z-ordered output file covers a small rectangle in BOTH
    dimensions (the skipping property); a time-sorted layout leaves x
    unbounded in every file."""
    from riksdagen_sentences_spark.operators.layout import write_zordered

    n = 4096
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 37 % 1024).alias("x"),
        (F.col("id") % 1024).alias("y"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, "x", "y", path, n_files=16)
    back = spark.read.parquet(path).withColumn(
        "f", F.input_file_name()
    )
    ext = back.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("xw"),
        (F.max("y") - F.min("y")).alias("yw"),
        F.count("*").alias("cnt"),
    )
    rows = ext.collect()
    assert sum(r.cnt for r in rows) == n
    # average rectangle width well under the full 0..1023 range in
    # BOTH dims (a 16-file z-layout of a 1024^2 grid bounds each file
    # to roughly a quarter-width strip or better)
    avg_xw = sum(r.xw for r in rows) / len(rows)
    avg_yw = sum(r.yw for r in rows) / len(rows)
    assert avg_xw < 600 and avg_yw < 600, (avg_xw, avg_yw)


def test_bucket_extents_time_layout_leaves_x_wide(spark):
    from riksdagen_sentences_spark.operators.layout import (
        bucket_extents,
        zvalue,
    )

    n = 2048
    df = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.col("id").alias("us"),
        (F.col("id") * 37 % 1024).alias("x"),
        ((F.col("id") / 64).cast("long") % 1024).alias("y"),
    )
    bz = bucket_extents(
        df.withColumn("z", zvalue(F.col("x"), F.col("y"))),
        "x",
        "y",
        F.col("z"),
        "event_id",
    ).collect()
    bt = bucket_extents(df, "x", "y", F.col("us"), "event_id").collect()
    avg_x_z = sum(r.x_max - r.x_min for r in bz) / len(bz)
    avg_x_t = sum(r.x_max - r.x_min for r in bt) / len(bt)
    assert avg_x_z < avg_x_t, (avg_x_z, avg_x_t)
