"""Keyword-in-context concordance (pipeline.mention_contexts)."""

import pytest

from riksdagen_sentences_spark.plans import pipeline as P


def _sent(spark, rows):
    return spark.createDataFrame(rows, "sentence_id string, cleaned string")


def _gaz(spark, terms):
    return spark.createDataFrame(terms, "term string, ner_label string")


def test_context_windows_and_positions(spark):
    sent = _sent(spark, [("s1", "the quick brown fox jumps over")])
    gaz = _gaz(spark, [("brown fox", "ANIMAL")])
    (r,) = P.mention_contexts(sent, gaz, window=2).collect()
    assert (r.label, r.ner_label, r.pos) == ("brown fox", "ANIMAL", 3)
    assert r.left_ctx == "the quick"
    assert r.right_ctx == "jumps over"


def test_edge_positions_truncate(spark):
    sent = _sent(spark, [("s1", "alpha beta gamma")])
    gaz = _gaz(spark, [("alpha", "X"), ("gamma", "X")])
    out = {r.label: r for r in P.mention_contexts(sent, gaz).collect()}
    assert out["alpha"].left_ctx == "" and out["alpha"].right_ctx == (
        "beta gamma"
    )
    assert out["gamma"].right_ctx == "" and out["gamma"].left_ctx == (
        "alpha beta"
    )


def test_every_occurrence_emitted(spark):
    sent = _sent(spark, [("s1", "x a x b x")])
    gaz = _gaz(spark, [("x", "T")])
    poss = sorted(
        r.pos for r in P.mention_contexts(sent, gaz).collect()
    )
    assert poss == [1, 3, 5]


def test_space_runs_do_not_bridge(spark):
    # double space: 'brown  fox' must NOT match the phrase 'brown fox'
    sent = _sent(spark, [("s1", "the brown  fox ran")])
    gaz = _gaz(spark, [("brown fox", "ANIMAL")])
    assert P.mention_contexts(sent, gaz).count() == 0


def test_under_width_raises(spark):
    sent = _sent(spark, [("s1", "a b c")])
    gaz = _gaz(spark, [("b c", "X")])
    with pytest.raises(ValueError, match="below the gazetteer"):
        P.mention_contexts(sent, gaz, max_term_words=1)
