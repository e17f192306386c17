"""Sweep-line peak concurrency (operators/temporal.max_concurrent)."""

import pytest

from riksdagen_sentences_spark.operators.temporal import max_concurrent


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k string, s bigint, e bigint")
    out = max_concurrent(df, "s", "e", ["k"]).collect()
    return {r.k: r.max_concurrent for r in out}


def test_nested_and_disjoint(spark):
    rows = [
        # three nested intervals -> peak 3
        ("a", 0, 100), ("a", 10, 90), ("a", 20, 30),
        # disjoint -> peak 1
        ("b", 0, 10), ("b", 20, 30),
    ]
    assert _run(spark, rows) == {"a": 3, "b": 1}


def test_half_open_boundary_no_overlap(spark):
    # one ends exactly where the next starts: NOT concurrent
    assert _run(spark, [("k", 0, 10), ("k", 10, 20)]) == {"k": 1}
    # strictly overlapping by one microsecond IS concurrent
    assert _run(spark, [("k", 0, 11), ("k", 10, 20)]) == {"k": 2}


def test_simultaneous_starts(spark):
    assert _run(spark, [("k", 5, 10), ("k", 5, 10), ("k", 5, 10)]) == {
        "k": 3
    }


def test_global_sweep_rejected(spark):
    df = spark.createDataFrame([("k", 0, 1)], "k string, s bigint, e bigint")
    with pytest.raises(ValueError, match="partition"):
        max_concurrent(df, "s", "e", [])
