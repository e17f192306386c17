"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the correctness corpus defined in
``riksdagen_sentences_spark.plans.corpus`` (Spark implementations and
generated DuckDB oracle twins share the constants in ``semantics.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
# make the package importable by Spark Python workers too
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = _REPO + (os.pathsep + _pp if _pp else "")


def _ensure_workers(spark: SparkSession) -> None:
    """Make the package importable by Python workers even when the
    driver built its SparkSession before importing this module (the
    PYTHONPATH export above only helps workers spawned after import).
    addPyFile distributes a zip of the package to already-running
    executors - the local equivalent of spark-submit --py-files."""
    import hashlib
    import zipfile

    # name the zip by a content hash of the package sources so an edited
    # package always re-ships to executors (a fixed name would keep
    # serving a stale zip across edit-rerun cycles: silent driver/executor
    # divergence)
    pkg = os.path.join(_REPO, "riksdagen_sentences_spark")
    srcs = []
    for root, _dirs, fns in os.walk(pkg):
        for fn in sorted(fns):
            if fn.endswith(".py"):
                srcs.append(os.path.join(root, fn))
    digest = hashlib.sha256()
    for full in sorted(srcs):
        digest.update(full.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zpath = f"/tmp/riksdagen_sentences_spark_pkg_{digest.hexdigest()[:16]}.zip"
    if not os.path.exists(zpath):
        tmp = zpath + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for full in srcs:
                z.write(full, os.path.relpath(full, _REPO))
        os.replace(tmp, zpath)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already registered in this context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full six-predicate triple graph on sf0.001 documents."""
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.plans import pipeline as P

    _ensure_workers(spark)
    docs = P.docs_from_documents(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    return (
        P.triples(spark, docs)
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
        .orderBy("pred")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from riksdagen_sentences_spark.plans import corpus

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in corpus.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from riksdagen_sentences_spark.plans import corpus

    return dict(corpus.ORACLES)
