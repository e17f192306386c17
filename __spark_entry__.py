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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full six-predicate triple graph on sf0.001 documents."""
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.plans import pipeline as P

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

    return dict(corpus.QUERIES)


def oracle_sql() -> dict[str, str]:
    from riksdagen_sentences_spark.plans import corpus

    return dict(corpus.ORACLES)
