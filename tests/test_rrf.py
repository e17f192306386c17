"""Reciprocal Rank Fusion (operators/ranking.rrf_fuse)."""

import pytest

from riksdagen_sentences_spark.operators.ranking import rrf_fuse


def _rank(spark, pairs):
    return spark.createDataFrame(pairs, "doc string, rnk int")


def test_rrf_scores_exact(spark):
    a = _rank(spark, [("d1", 1), ("d2", 2)])
    b = _rank(spark, [("d2", 1), ("d3", 2)])
    out = {r.doc: r for r in rrf_fuse([a, b], k=60).collect()}
    assert out["d1"].rrf == 1.0 / 61
    assert out["d2"].rrf == 1.0 / 62 + 1.0 / 61
    assert out["d3"].rrf == 1.0 / 62
    assert (out["d1"].n_lists, out["d2"].n_lists) == (1, 2)


def test_consensus_beats_top_plus_deep(spark):
    # d2 is #2 in both lists; d1 is #1 in one but #10 in the other:
    # 2/(k+2) > 1/(k+1) + 1/(k+10) for k = 60, so consensus wins
    a = _rank(spark, [("d1", 1), ("d2", 2)])
    b = _rank(spark, [("d2", 2), ("d1", 10)])
    out = {r.doc: r.rrf for r in rrf_fuse([a, b], k=60).collect()}
    assert out["d2"] > out["d1"]
    assert out["d2"] == 2.0 / 62
    assert out["d1"] == 1.0 / 61 + 1.0 / 70


def test_empty_rankings_rejected(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_single_aggregate_plan(spark):
    a = _rank(spark, [("d1", 1)])
    b = _rank(spark, [("d1", 2)])
    plan = (
        rrf_fuse([a, b])._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # union + groupBy only
