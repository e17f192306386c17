"""Per-partition checkpoint ledger + lineage metrics.

The reference resumes at document granularity via the ``processed`` flag
(/root/reference/models/crud/create.py:76, models/document.py:45-50,
models/crud/update.py:10-18) - one UPDATE per document.  The distributed
equivalent (north rule: "resumable from per-partition checkpoints with
lineage and row-count metrics written alongside each snapshot"):

- work is partitioned by a deterministic key (``repo`` for the files
  table; a hash bucket of ``document_id`` otherwise),
- each completed partition is recorded in a LEDGER (one JSON file per
  partition under ``<out>/_ledger/`` - the write is atomic at file
  granularity, so a crash can only lose whole partitions, never corrupt),
- output parquet is written with dynamic partition overwrite, so
  re-running a partition is idempotent,
- a LINEAGE manifest row per partition records input row count, output
  row counts per table, the input fingerprint (xor of content sha256s -
  order-independent), and wall time.

Resume = anti-join the input's partition keys against the ledger.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LEDGER_DIR = "_ledger"


def partition_key_col(document_id, buckets: int = 16):
    """Deterministic bucket from the document id (stable across runs and
    retries - never monotonically_increasing_id)."""
    return F.pmod(F.xxhash64(document_id), F.lit(buckets)).cast("int")


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, LEDGER_DIR)


def completed_partitions(spark: SparkSession, out_dir: str) -> set[str]:
    path = _ledger_path(out_dir)
    if not os.path.isdir(path):
        return set()
    done = set()
    for fn in os.listdir(path):
        if fn.endswith(".json"):
            with open(os.path.join(path, fn)) as f:
                entry = json.load(f)
            done.add(str(entry["partition"]))
    return done


def record_partition(
    out_dir: str, partition: str, metrics: dict
) -> None:
    """Atomically record a completed partition (tmp + rename)."""
    path = _ledger_path(out_dir)
    os.makedirs(path, exist_ok=True)
    final = os.path.join(path, f"part-{partition}.json")
    tmp = final + ".tmp"
    entry = {"partition": str(partition), "completed_at": time.time(), **metrics}
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)


def lineage_fingerprint(df: DataFrame, content_col: str = "content") -> str:
    """Order-independent input fingerprint: xor-fold of per-row
    sha256(content) prefixes.  Preserves the per-row content sha256
    invariant (BASELINE.json input_hint) at partition granularity."""
    folded = df.select(
        F.conv(F.substring(F.sha2(F.col(content_col), 256), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    ).agg(F.expr("conv(cast(bit_xor(h) as string), 10, 16)").alias("fp"))
    return folded.first()["fp"]
