"""Naive Bayes classifier: hand-computed model values, probe
predictions, OOV behavior (operators/classify.py)."""

import math

from riksdagen_sentences_spark.operators.classify import (
    NB_PROBES,
    NB_SEED,
    nb_predict,
    nb_train,
)


def test_nb_train_hand_computed(spark):
    labeled = spark.createDataFrame(
        [("a", "x x y"), ("b", "y z")], "label string, text string"
    )
    model = {(r.label, r.token): r for r in nb_train(labeled).collect()}
    # vocab = {x, y, z} (V=3); class a has 3 tokens, b has 2
    assert len(model) == 6  # fully crossed classes x vocab
    assert math.isclose(
        model[("a", "x")].log_lik, math.log((2 + 1) / (3 + 3))
    )
    # smoothed floor for a token the class never saw
    assert math.isclose(
        model[("a", "z")].log_lik, math.log((0 + 1) / (3 + 3))
    )
    assert math.isclose(
        model[("b", "y")].log_lik, math.log((1 + 1) / (2 + 3))
    )
    assert math.isclose(model[("a", "x")].log_prior, math.log(0.5))


def test_nb_probes_classify_to_their_class(spark):
    labeled = spark.createDataFrame(
        list(NB_SEED), "label string, text string"
    )
    probes = spark.createDataFrame(
        list(NB_PROBES), "doc_id string, text string"
    )
    got = {
        r.doc_id: r.pred_label
        for r in nb_predict(probes, nb_train(labeled)).collect()
    }
    assert got == {
        "probe_systems": "systems",
        "probe_generic": "generic",
    }


def test_nb_oov_doc_scores_on_priors(spark):
    labeled = spark.createDataFrame(
        [("a", "x y"), ("a", "x"), ("b", "z")], "label string, text string"
    )
    docs = spark.createDataFrame(
        [("d1", "qqq www")], "doc_id string, text string"
    )
    rows = nb_predict(docs, nb_train(labeled)).collect()
    assert len(rows) == 1
    # no in-vocab evidence -> majority prior wins (2/3 'a')
    assert rows[0].pred_label == "a"
    assert math.isclose(rows[0].score, math.log(2 / 3))
