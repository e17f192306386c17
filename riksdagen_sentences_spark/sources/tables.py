"""Format-agnostic table abstraction (Iceberg-shaped, parquet-backed).

The sandbox has no Iceberg runtime jar, so the catalog is parquet
directories with Iceberg-like semantics: ``append``, idempotent
``overwrite_partitions`` (dynamic partition overwrite), snapshot-style
metadata (a JSON manifest per write with row counts and timestamps) and
a ``files``/``snapshots`` metadata view (the lake analog of the
reference's information_schema size query,
/root/reference/sql/get_total_size_of_database.sql:1-5).

On a real cluster, swap ``_write``/``_read`` for
``df.writeTo(catalog.table)`` / ``spark.table`` - every call site goes
through this class, which is the point.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )

    # -- data ---------------------------------------------------------

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def append(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))
        self._snapshot(table, "append", df)

    def overwrite(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(table))
        self._snapshot(table, "overwrite", df)

    def overwrite_partitions(
        self, table: str, df: DataFrame, partition_by: list[str]
    ) -> None:
        """Iceberg-style dynamic overwrite: only the partitions present
        in ``df`` are replaced - the idempotent re-run primitive."""
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(self._path(table))
        )
        self._snapshot(table, "overwrite_partitions", df)

    def write_bucketed(
        self,
        table: str,
        df: DataFrame,
        bucket_by: list[str],
        n_buckets: int,
        sort_by: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> None:
        """Bucketed external table (Iceberg bucket-transform analog).

        Bucket metadata must live in the session catalog, so this goes
        through ``saveAsTable`` (with the data files still under the
        catalog root).  Two tables bucketed on the same keys with the
        same bucket count join WITHOUT any Exchange - the shuffle is
        paid once at write time and amortized over every subsequent
        join, which is the decisive co-location primitive at 100 TB
        (the occursIn edge table joining rawtokens, say).  ``sort_by``
        additionally skips the join-side Sort.  ``partition_by`` layers
        Hive-style partitioning ABOVE the buckets (e.g. sentences
        partitioned by lang, bucketed by sentence_id: a language filter
        prunes whole directories while id-joins stay co-located)."""
        w = (
            df.write.mode("overwrite")
            .format("parquet")
            .option("path", self._path(table))
        )
        if partition_by:
            w = w.partitionBy(*partition_by)
        w = w.bucketBy(n_buckets, *bucket_by)
        if sort_by:
            w = w.sortBy(*sort_by)
        w.saveAsTable(table)
        self._snapshot(table, "write_bucketed", df)

    def read_table(self, table: str) -> DataFrame:
        """Catalog read - REQUIRED for bucketed tables (a raw parquet
        read of the same files would drop the bucket spec and
        re-shuffle on join)."""
        return self.spark.table(table)

    # -- metadata (".snapshots" / ".files" analogs) --------------------

    def _meta_dir(self, table: str) -> str:
        d = os.path.join(self._path(table), "_snapshots")
        os.makedirs(d, exist_ok=True)
        return d

    def _snapshot(self, table: str, operation: str, df: DataFrame) -> None:
        snap = {
            "snapshot_id": uuid.uuid4().hex,
            "operation": operation,
            "committed_at": time.time(),
            "schema": df.schema.simpleString(),
        }
        path = os.path.join(
            self._meta_dir(table), f"{int(snap['committed_at'] * 1000)}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, path)

    def snapshots(self, table: str) -> DataFrame:
        d = self._meta_dir(table)
        rows = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                with open(os.path.join(d, fn)) as f:
                    rows.append(json.load(f))
        return self.spark.createDataFrame(
            rows,
            "snapshot_id string, operation string, committed_at double, "
            "schema string",
        )

    def files(self, table: str) -> DataFrame:
        """Per-file metadata (the DESCRIBE DETAIL / information_schema
        analog: reference sql/get_total_size_of_database.sql)."""
        root = self._path(table)
        rows = []
        for dirpath, _dirs, fns in os.walk(root):
            rel = os.path.relpath(dirpath, root)
            if "_snapshots" in rel.split(os.sep):
                continue
            for fn in fns:
                if fn.endswith(".parquet"):
                    full = os.path.join(dirpath, fn)
                    rows.append(
                        (
                            os.path.relpath(full, root),
                            os.path.getsize(full),
                        )
                    )
        return self.spark.createDataFrame(
            rows or [("", 0)], "file string, bytes long"
        ).filter(F.col("file") != "")

    def total_bytes(self, table: str) -> int:
        agg = self.files(table).agg(F.sum("bytes").alias("b")).first()
        return int(agg["b"] or 0)
