"""Join-key skew profiler (operators/profile.key_skew)."""

from riksdagen_sentences_spark.operators.profile import key_skew


def test_skew_profile_exact_values(spark):
    # key "hot" holds 6 of 10 rows; 4 other keys hold 1 each
    rows = [("hot",)] * 6 + [(f"k{i}",) for i in range(4)]
    df = spark.createDataFrame(rows, "user_id string")
    (r,) = key_skew(df, "user_id", top_n=2).collect()
    assert (r.n_rows, r.n_keys, r.max_key_rows) == (10, 5, 6)
    assert r.top1_share == 0.6
    assert r.top2_share == 0.7  # hot(6) + any singleton(1)
    # mean key size = 2, max = 6 -> skew 3.0
    assert r.skew_factor == 3.0
    assert r.key_col == "user_id"


def test_uniform_key_is_skew_one(spark):
    df = spark.createDataFrame(
        [(f"k{i % 4}",) for i in range(8)], "user_id string"
    )
    (r,) = key_skew(df, "user_id").collect()
    assert r.skew_factor == 1.0 and r.max_key_rows == 2


def test_single_aggregate_no_global_sort(spark):
    df = spark.createDataFrame([("a",), ("b",)], "user_id string")
    plan = (
        key_skew(df, "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-N must be TakeOrdered, never a full Sort+Exchange(range)
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
