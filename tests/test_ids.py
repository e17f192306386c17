"""Deterministic-id tests: the three implementations (Python, Spark
Column, DuckDB SQL) must agree byte-for-byte."""

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from riksdagen_sentences_spark.ids import uuid5_col, uuid5_py, uuid5_sql

UUID_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
)

CASES = [
    ("sentence", "Och att det som.", "doc-1", "sv"),
    ("rawtoken", "och", "CCONJ", "sv"),
    ("normtoken", "och"),
    ("entity", "riksdagen", "ORG"),
    ("document", "repo_hot", "dir0/file1.txt", "abc123"),
    ("x", "", ""),  # empty parts
    ("unicode", "åäö–é", "中文"),
]


def test_uuid5_py_shape_and_determinism():
    for parts in CASES:
        u1, u2 = uuid5_py(*parts), uuid5_py(*parts)
        assert u1 == u2
        assert UUID_RE.match(u1), u1
    # distinct inputs -> distinct ids
    ids = {uuid5_py(*p) for p in CASES}
    assert len(ids) == len(CASES)


def test_uuid5_py_separator_prevents_concat_collisions():
    assert uuid5_py("ab", "c") != uuid5_py("a", "bc")


def test_uuid5_col_matches_python(spark):
    for parts in CASES:
        got = (
            spark.range(1)
            .select(uuid5_col(*[F.lit(p) for p in parts]).alias("u"))
            .first()["u"]
        )
        assert got == uuid5_py(*parts), parts


def test_uuid5_sql_matches_python():
    for parts in CASES:
        exprs = [f"'{p}'" for p in parts]
        got = duckdb.sql(f"SELECT {uuid5_sql(*exprs)} AS u").fetchone()[0]
        assert got == uuid5_py(*parts), parts


def test_uuid5_null_handling_explicit(spark):
    """NULL parts are encoded as a 0x00 sentinel on ALL THREE sides -
    uuid5(a, NULL, b) != uuid5(a, b), and Spark == Python == DuckDB."""
    import duckdb
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.ids import uuid5_col, uuid5_py, uuid5_sql

    assert uuid5_py("a", None, "b") != uuid5_py("a", "b")
    df = spark.createDataFrame(
        [("a", None, "b")], "x string, y string, z string"
    )
    got = df.select(uuid5_col("x", "y", "z").alias("u")).first()["u"]
    assert got == uuid5_py("a", None, "b")
    sql = uuid5_sql("'a'", "NULL", "'b'")
    assert duckdb.sql(f"SELECT {sql} AS u").fetchone()[0] == got
