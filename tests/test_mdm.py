"""MDM survivorship (operators/mdm.py) and KG negative sampling
invariants."""

from pyspark.sql import functions as F


def test_golden_records_freshest_non_null_wins(spark):
    from riksdagen_sentences_spark.operators.mdm import golden_records

    rows = [
        # key, recency, name, city
        ("k1", 3, None, "uppsala"),
        ("k1", 2, "Anna", None),
        ("k1", 1, "anna (legacy)", "stockholm"),
        ("k2", 2, "Bo", "lund"),
        ("k2", 1, "bo", "malmo"),
    ]
    df = spark.createDataFrame(
        rows, "k string, recency int, name string, city string"
    )
    got = {
        r.k: (r.name, r.city)
        for r in golden_records(df, "k", "recency", ["name", "city"])
        .collect()
    }
    # k1: name from recency 2 (3 is null), city from recency 3
    assert got["k1"] == ("Anna", "uppsala")
    assert got["k2"] == ("Bo", "lund")


def test_golden_records_all_null_field_stays_null(spark):
    from riksdagen_sentences_spark.operators.mdm import golden_records

    df = spark.createDataFrame(
        [("k", 2, None), ("k", 1, None)],
        "k string, recency int, v string",
    )
    assert golden_records(df, "k", "recency", ["v"]).collect()[0].v is None


def test_golden_records_recency_prefix_is_numeric_order(spark):
    """Recency 10 must beat recency 9 (lexicographic would fail
    without the zero-pad)."""
    from riksdagen_sentences_spark.operators.mdm import golden_records

    df = spark.createDataFrame(
        [("k", 9, "old"), ("k", 10, "new")],
        "k string, recency int, v string",
    )
    assert golden_records(df, "k", "recency", ["v"]).collect()[0].v == "new"


def test_negative_samples_never_true_edges(spark):
    """Every kept negative is absent from the true edge set, and the
    raw candidate count is exactly 2x the true edges."""
    from riksdagen_sentences_spark.plans import corpus

    row = corpus.QUERIES["kg_negative_sample_stats"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.n_raw == 2 * row.n_true
    assert 0 < row.n_kept <= row.n_raw
