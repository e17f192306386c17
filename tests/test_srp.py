"""Signed random projection (operators/linalg.signed_projection):
determinism, map-only plan, and the JL cosine-preservation property."""

import math

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators.linalg import (
    signed_projection,
    srp_signs,
)


def test_signs_deterministic_and_pm1():
    a = srp_signs("srp-v1", 16, 64)
    b = srp_signs("srp-v1", 16, 64)
    assert a == b
    assert {v for row in a for v in row} == {1.0, -1.0}
    # a different seed gives a different matrix
    assert srp_signs("other", 16, 64) != a
    # roughly balanced (md5 bytes are uniform): not all-same
    flat = [v for row in a for v in row]
    assert 0.3 < sum(1 for v in flat if v > 0) / len(flat) < 0.7


def test_projection_values_exact(spark):
    signs = [[1.0, -1.0, 1.0], [-1.0, -1.0, 1.0]]
    df = spark.createDataFrame(
        [(1, [2.0, 3.0, 5.0])], "vec_id int, embedding array<double>"
    )
    (r,) = signed_projection(df, signs).collect()
    s = 1.0 / math.sqrt(2)
    assert r.proj[0] == (2.0 - 3.0 + 5.0) * s
    assert r.proj[1] == (-2.0 - 3.0 + 5.0) * s


def test_map_only_plan(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 8)], "vec_id int, embedding array<double>"
    )
    plan = (
        signed_projection(df, srp_signs("s", 4, 8))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_cosine_roughly_preserved(spark):
    # 64-dim deterministic vectors; JL with 32 output dims should keep
    # pairwise cosines within a loose tolerance (property, not exact)
    import hashlib

    def vec(k):
        return [
            (int(hashlib.md5(f"{k}:{j}".encode()).hexdigest()[:4], 16)
             / 32768.0) - 1.0
            for j in range(64)
        ]

    rows = [(i, vec(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    proj = {
        r.vec_id: r.proj
        for r in signed_projection(
            df, srp_signs("srp-v1", 32, 64)
        ).collect()
    }

    def cos(x, y):
        d = sum(a * b for a, b in zip(x, y))
        return d / (
            math.sqrt(sum(a * a for a in x))
            * math.sqrt(sum(b * b for b in y))
        )

    errs = [
        abs(cos(rows[i][1], rows[j][1]) - cos(proj[i], proj[j]))
        for i in range(6)
        for j in range(i + 1, 6)
    ]
    assert max(errs) < 0.45 and sum(errs) / len(errs) < 0.2
