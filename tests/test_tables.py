"""ParquetCatalog (Iceberg-shaped table abstraction) tests."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.sources.tables import ParquetCatalog


def test_append_and_snapshots(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "cat"))
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).alias("p")
    )
    cat.append("t", df, partition_by=["p"])
    cat.append("t", df, partition_by=["p"])
    assert cat.read("t").count() == 20
    snaps = cat.snapshots("t").collect()
    assert len(snaps) == 2
    assert all(s["operation"] == "append" for s in snaps)
    assert cat.total_bytes("t") > 0


def test_overwrite_partitions_is_idempotent(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "cat2"))
    full = spark.range(20).select(
        F.col("id"), (F.col("id") % 4).alias("p")
    )
    cat.overwrite("t", full, partition_by=["p"])
    # rewrite only partition p=1 with doubled values
    part1 = full.filter(F.col("p") == 1).withColumn(
        "id", F.col("id") * 100
    )
    cat.overwrite_partitions("t", part1, partition_by=["p"])
    got = cat.read("t")
    assert got.count() == 20  # other partitions untouched
    assert got.filter(F.col("p") == 1).agg(F.min("id")).first()[0] >= 100
    assert got.filter(F.col("p") == 0).agg(F.max("id")).first()[0] < 100
    # re-running the same partition overwrite changes nothing
    cat.overwrite_partitions("t", part1, partition_by=["p"])
    assert cat.read("t").count() == 20
