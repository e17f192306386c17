from pyspark.sql import functions as F  # noqa: F401

from riksdagen_sentences_spark.operators import expectations as DQ


def test_expectations_count_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O"),
            (2, -5.0, "O"),        # positive violation
            (3, None, "F"),        # positive (null) is NOT a violation
            (4, 3.0, "X"),         # in_set violation
            (4, 2.0, None),        # in_set (null) violation + dup key
            (None, 1.0, "P"),      # not_null violation
        ],
        "k bigint, v double, s string",
    )
    parts = [
        DQ.check_rules(
            df,
            [
                DQ.expect_not_null("k"),
                DQ.expect_positive("v"),
                DQ.expect_in_set("s", ["O", "F", "P"]),
            ],
        ),
        DQ.check_unique(df, ["k"]),
    ]
    got = {
        r["rule"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in DQ.quality_report(parts).collect()
    }
    assert got["not_null(k)"] == (6, 1, False)
    # NOT (NULL > 0) is NULL -> not counted: SQL three-valued logic, the
    # not-null rule owns nulls
    assert got["positive(v)"] == (6, 1, False)
    assert got["in_set(s)"] == (6, 2, False)
    # count - distinct count; COUNT(DISTINCT) ignores NULLs on both
    # engines, so the NULL key counts as a violation alongside the dup
    assert got["unique(k)"] == (6, 2, False)


def test_check_references_counts_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk bigint")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = DQ.check_references(fact, "fk", dim, "pk").collect()[0]
    assert (row["n_rows"], row["n_violations"]) == (4, 2)
