"""OLS normal equations (operators/regress.py) vs closed-form ground
truth."""

import math


def test_ols_exact_line(spark):
    """Points exactly on y = 2x + 3 -> slope 2, intercept 3, r2 1."""
    from riksdagen_sentences_spark.operators.regress import ols_fit

    df = spark.createDataFrame(
        [(float(x), 2.0 * x + 3.0) for x in range(1, 11)],
        "x double, y double",
    )
    row = ols_fit(df, "y", "x").collect()[0]
    assert row.n_rows == 10
    assert row.slope == 2.0
    assert row.intercept == 3.0
    assert row.r2 == 1.0


def test_ols_matches_numpy_formula(spark):
    from riksdagen_sentences_spark.operators.regress import ols_fit

    pts = [(1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8), (5.0, 10.3)]
    df = spark.createDataFrame(pts, "x double, y double")
    row = ols_fit(df, "y", "x").collect()[0]
    n = len(pts)
    sx = sum(p[0] for p in pts)
    sy = sum(p[1] for p in pts)
    sxx = sum(p[0] * p[0] for p in pts)
    sxy = sum(p[0] * p[1] for p in pts)
    syy = sum(p[1] * p[1] for p in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert math.isclose(row.slope, slope, abs_tol=1e-4)
    assert math.isclose(row.intercept, intercept, abs_tol=1e-4)
    assert math.isclose(row.r2, r2, abs_tol=1e-4)


def test_ols_zero_variance_gives_null(spark):
    from riksdagen_sentences_spark.operators.regress import ols_fit

    df = spark.createDataFrame(
        [(2.0, 1.0), (2.0, 5.0), (2.0, 9.0)], "x double, y double"
    )
    row = ols_fit(df, "y", "x").collect()[0]
    assert row.slope is None and row.r2 is None


def test_ols_grouped_one_fit_per_key(spark):
    from riksdagen_sentences_spark.operators.regress import ols_fit

    rows = [("a", float(x), 5.0 * x) for x in range(1, 6)] + [
        ("b", float(x), -1.0 * x + 10.0) for x in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in ols_fit(df, "y", "x", ["g"]).collect()}
    assert got["a"].slope == 5.0 and got["a"].intercept == 0.0
    assert got["b"].slope == -1.0 and got["b"].intercept == 10.0
