"""Winnowing (operators/winnow.py): the published guarantee and the
selection-rule edge cases."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        list(rows.items()), "doc_id string, text string"
    )


def test_match_guarantee_shared_fingerprint(spark):
    """Any common substring of length >= w + k - 1 (= 12) must yield at
    least one shared fingerprint hash - the paper's core property."""
    from riksdagen_sentences_spark.operators.winnow import (
        winnow_fingerprints,
    )

    common = "the quick brown fox jumps"
    docs = _docs(
        spark,
        {
            "a": "zzzz " + common + " aaaa bbbb cccc",
            "b": "qqqqqqqqqqqq " + common + " rrrr",
        },
    )
    fp = winnow_fingerprints(docs).select("doc_id", "hash").collect()
    a = {r.hash for r in fp if r.doc_id == "a"}
    b = {r.hash for r in fp if r.doc_id == "b"}
    assert a & b, "common substring produced no shared fingerprint"


def test_short_doc_gets_global_min(spark):
    """Fewer than w k-grams -> exactly one fingerprint (the global
    minimum over one whole-document window)."""
    from riksdagen_sentences_spark.operators.winnow import (
        kgram_hashes,
        winnow_fingerprints,
    )

    docs = _docs(spark, {"s": "abcdefgh"})  # 4 k-grams < w=8
    n_grams = kgram_hashes(docs).count()
    assert n_grams == 4
    fp = winnow_fingerprints(docs).collect()
    assert len(fp) == 1
    grams = kgram_hashes(docs).collect()
    assert fp[0].hash == min(g.hash for g in grams)


def test_doc_shorter_than_k_drops_out(spark):
    from riksdagen_sentences_spark.operators.winnow import (
        winnow_fingerprints,
    )

    docs = _docs(spark, {"t": "abc"})
    assert winnow_fingerprints(docs).count() == 0


def test_fingerprints_are_subset_of_kgram_hashes(spark):
    from riksdagen_sentences_spark.operators.winnow import (
        kgram_hashes,
        winnow_fingerprints,
    )

    docs = _docs(spark, {"d": "sentence tokenizer splits on spaces"})
    fp = winnow_fingerprints(docs)
    grams = kgram_hashes(docs)
    missing = fp.join(
        grams, ["doc_id", "hash", "pos"], "left_anti"
    ).count()
    assert missing == 0
    # density: roughly one fingerprint per window, far fewer than grams
    assert 0 < fp.count() < grams.count()


def test_shared_pairs_df_cap_drops_boilerplate(spark):
    """A hash present in every document (df > cap) must not produce
    pairs when the cap is below the corpus size."""
    from riksdagen_sentences_spark.operators.winnow import (
        shared_fingerprint_pairs,
        winnow_fingerprints,
    )

    docs = _docs(
        spark,
        {str(i): "identical boilerplate text here" for i in range(4)},
    )
    fp = winnow_fingerprints(docs)
    assert shared_fingerprint_pairs(fp, df_cap=3).count() == 0
    assert shared_fingerprint_pairs(fp, df_cap=4).count() == 6
