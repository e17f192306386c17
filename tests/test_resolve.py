"""Entity resolution (operators/resolve.py): blocking completeness,
transitive clustering, canonical determinism."""

import pytest
from pyspark.sql import functions as F


def _names(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "name string")


def test_similarity_edges_complete_at_distance_1(spark):
    from riksdagen_sentences_spark.operators.resolve import similarity_edges

    rows = ["spark", "sparks", "park", "stock", "merge", "merges"]
    got = {
        (r.subj, r.obj)
        for r in similarity_edges(_names(spark, rows)).collect()
    }
    # brute-force ground truth
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(rows), 2)
        if lev(a, b) <= 1
    }
    assert got == want
    assert ("park", "spark") in got and ("spark", "sparks") in got
    # dist-2 pair NOT bridged directly
    assert ("park", "sparks") not in got


def test_resolve_names_transitive_chain(spark):
    from riksdagen_sentences_spark.operators.resolve import resolve_names

    # park ~ spark ~ sparks: one component even though lev(park,
    # sparks) = 2; "stock" is a singleton and must resolve to itself.
    rows = ["spark", "sparks", "park", "stock"]
    res = {
        r.name: r.canonical
        for r in resolve_names(_names(spark, rows)).collect()
    }
    assert res == {
        "spark": "park",
        "sparks": "park",
        "park": "park",
        "stock": "stock",
    }


def test_resolve_names_dedups_input(spark):
    from riksdagen_sentences_spark.operators.resolve import resolve_names

    res = resolve_names(_names(spark, ["anna", "anna", "annas"]))
    assert res.count() == 2
    assert res.filter(F.col("canonical") != "anna").count() == 0


def test_resolution_groups_match_oracle_shape(spark):
    """The registered query's Spark side produces one row per
    canonical with members sorted and pipe-joined."""
    from riksdagen_sentences_spark.plans import corpus

    out = corpus.QUERIES["entity_resolution_groups"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(out) > 0
    for row in out:
        members = row.members.split("|")
        assert members == sorted(members)
        assert row.n_members == len(members)
        assert row.canonical == min(members)
