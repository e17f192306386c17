"""Batch landing-zone ingest - the engine-core equivalent of the
reference's network sources (S4: Folketinget OData JSON,
/root/reference/models/providers/folketinget_files.py:18-57; S5: PDF
fetch + pdfminer text extraction + md5(url) file naming + skip-if-
downloaded, models/providers/folketinget_file.py:24-127).

Network I/O and PDF decoding are NOT part of a query engine - the Spark
design is: an external fetcher lands raw payloads + a metadata JSONL into
an object-store prefix, and these functions turn a landing prefix into
the north-rule ``files`` table.  The fetch/extract steps are stubbed
behind NotImplementedError exactly where requests/pdfminer calls would
go; everything Spark-side (schemas, dedup-by-url-hash, idempotent skip)
is real.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# metadata JSONL schema (reference save_metadata,
# folketinget_file.py:52-75)
LANDING_META_SCHEMA = (
    "url string, url_md5 string, external_id string, mime string, "
    "fetched_at string, bytes bigint"
)


def fetch_batch(urls: list[str]) -> None:
    """S4/S5 network fetch - intentionally unimplemented in-engine."""
    raise NotImplementedError(
        "network ingest is external to the engine; land payloads + "
        "metadata JSONL into a prefix and use landing_to_files()"
    )


def url_key_col(url) -> F.Column:
    """md5(url) payload naming (reference folketinget_file.py:77-84)."""
    return F.md5(url)


def landing_to_files(
    spark: SparkSession,
    meta_path: str,
    text_path: str,
    repo: str,
    commit: str,
    lang: str = "da",
) -> DataFrame:
    """Join the landing metadata JSONL with extracted-text files into the
    north-rule ``files`` shape, deduplicating by md5(url) (the
    reference's skip-if-downloaded check, folketinget_file.py:96-104,
    becomes an idempotent dropDuplicates)."""
    meta = spark.read.schema(LANDING_META_SCHEMA).json(meta_path)
    texts = spark.read.text(text_path).withColumn(
        "url_md5",
        F.regexp_extract(F.input_file_name(), r"([0-9a-f]{32})\.txt", 1),
    )
    joined = meta.dropDuplicates(["url_md5"]).join(
        texts.groupBy("url_md5").agg(
            F.concat_ws("\n", F.collect_list("value")).alias("content")
        ),
        "url_md5",
    )
    return joined.select(
        F.lit(repo).alias("repo"),
        F.concat(F.col("url_md5"), F.lit(".txt")).alias("path"),
        F.lit(commit).alias("commit"),
        F.lit(lang).alias("lang"),
        F.col("content"),
    )
