"""Bucketed co-located joins: the write-once-shuffle, join-many-times
primitive.  Two tables bucketed on the same key with the same bucket
count must join with ZERO Exchange nodes."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.sources.tables import ParquetCatalog


def test_bucketed_join_no_exchange(spark, tmp_path):
    cat = ParquetCatalog(spark, str(tmp_path / "lake"))
    tokens = spark.range(5000).select(
        F.concat(F.lit("tok"), F.col("id") % 500).alias("rawtoken_id"),
        (F.col("id") % 17).alias("score"),
    )
    edges = spark.range(20000).select(
        F.concat(F.lit("tok"), F.col("id") % 500).alias("rawtoken_id"),
        F.concat(F.lit("sent"), F.col("id")).alias("sentence_id"),
    )
    cat.write_bucketed(
        "btokens", tokens, bucket_by=["rawtoken_id"], n_buckets=8,
        sort_by=["rawtoken_id"],
    )
    cat.write_bucketed(
        "bedges", edges, bucket_by=["rawtoken_id"], n_buckets=8,
        sort_by=["rawtoken_id"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cat.read_table("bedges").join(
            cat.read_table("btokens"), "rawtoken_id"
        )
        j.count()  # force the final (adaptive) plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan[:2000]
        # a raw-parquet read of the same files loses the bucket spec
        raw = spark.read.parquet(str(tmp_path / "lake" / "bedges")).join(
            spark.read.parquet(str(tmp_path / "lake" / "btokens")),
            "rawtoken_id",
        )
        raw.count()
        raw_plan = raw._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in raw_plan  # the shuffle bucketing avoids
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS btokens")
        spark.sql("DROP TABLE IF EXISTS bedges")
