"""SparkSession factory with scale-appropriate defaults.

Tuned for the sandbox (local[N], single JVM) but every setting is the one
we would ship to a 1000-executor cluster: AQE on (runtime re-plan +
skew-join splitting), Arrow enabled for the pandas-UDF kernels with a
bounded batch size (the Arrow analog of the reference's 100k-char chunk
bound, models/document.py:28), and shuffle partitions sized to the
parallelism level instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _export_package_to_workers() -> None:
    """Make this package importable by Python workers regardless of the
    driver's cwd - the local-mode equivalent of ``spark-submit
    --py-files`` (workers inherit PYTHONPATH, not driver sys.path)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )


def get_spark(
    parallelism: int | None = None,
    app_name: str = "riksdagen-sentences-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    p = parallelism or DEFAULT_CPUS
    _export_package_to_workers()
    builder = (
        SparkSession.builder.master(f"local[{p}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or p))
        # Pin the session zone: temporal operators and their DuckDB
        # oracles must agree on wall-clock arithmetic regardless of the
        # host's zone (a DST-observing zone would shift TIMESTAMP casts
        # of TIMESTAMP_NTZ values by the transition offset).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Joins (guide-standard cluster settings, not local-mode tuning):
        # let the planner pick shuffled-hash over sort-merge when a side
        # fits its per-partition build budget (skips two sorts), and let
        # AQE flip a sort-merge to broadcast/shuffled-hash at runtime
        # from MEASURED sizes - estimates after filters/aggregates are
        # routinely wrong, runtime sizes are not.  64m broadcast is well
        # inside any executor budget; both knobs are env-overridable for
        # clusters with tighter memory.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_AQE_BC", "64m"),
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP", "64m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
