"""Spark Column expressions must agree exactly with the Python kernels on
an adversarial string sample (the two implementations are generated from
the same semantics.py constants - this test catches drift)."""

import pytest
from pyspark.sql import functions as F

from riksdagen_sentences_spark.functions import columns as C
from riksdagen_sentences_spark.kernels import (
    clean_sentence,
    clean_token,
    clean_toc,
    clean_word_count,
    detect_language,
    normalize_token,
    pos_tag,
    split_sentences,
)

SAMPLES = [
    "Och att det som en av den med om inte har till ett.",
    "Ett (två) tre-fyra 5:e 2024 pris4u, ja!",
    "the cat sat on the mat and it was good",
    "Innehåll ......... 4\nRiktigt innehåll.\nKap .... 9",
    "a–b c/d e\tf",
    "¶¤¥ $100 a|b",
    "",
    "   ",
    "EnDa",
    "Hej du. Vad gör du? Inget!  Mer.",
    "Version 1.2 är klar. Bra.",
    "vänta... ja",
    "ÅÄÖ åäö Üü é",
]

TOKENS = [
    "och", "Och", "The", "...", "–", "$", "a|b", "2024", "pris4u",
    "ab:c,d.e(f)g-h/i–j", " 5:e ", "Hej!", "riksdagen", "", ":",
]


@pytest.fixture(scope="module")
def sample_df(spark):
    return spark.createDataFrame([(s,) for s in SAMPLES], "s string")


@pytest.fixture(scope="module")
def token_df(spark):
    return spark.createDataFrame([(t,) for t in TOKENS], "t string")


def test_clean_sentence_col(sample_df):
    rows = sample_df.select(
        "s", C.clean_sentence_col(F.col("s")).alias("c")
    ).collect()
    for r in rows:
        assert r["c"] == clean_sentence(r["s"]), repr(r["s"])


def test_clean_word_count_col(sample_df):
    rows = sample_df.select(
        "s",
        C.clean_word_count_col(C.clean_sentence_col(F.col("s"))).alias("n"),
    ).collect()
    for r in rows:
        assert r["n"] == clean_word_count(r["s"]), repr(r["s"])


def test_clean_toc_col(sample_df):
    rows = sample_df.select(
        "s", C.clean_toc_col(F.col("s")).alias("c")
    ).collect()
    for r in rows:
        assert r["c"] == clean_toc(r["s"]), repr(r["s"])


def test_split_sentences_col(sample_df):
    rows = sample_df.select(
        "s", C.split_sentences_col(F.col("s")).alias("a")
    ).collect()
    for r in rows:
        assert list(r["a"]) == split_sentences(r["s"]), repr(r["s"])


def test_langid_cols(sample_df):
    lang, score = C.langid_cols(C.clean_sentence_col(F.col("s")))
    rows = sample_df.select(
        "s", lang.alias("lang"), score.alias("score")
    ).collect()
    for r in rows:
        exp_lang, exp_score = detect_language(clean_sentence(r["s"]))
        assert (r["lang"], r["score"]) == (exp_lang, exp_score), repr(r["s"])


def test_token_cols(token_df):
    rows = token_df.select(
        "t",
        C.clean_token_col(F.col("t")).alias("c"),
        C.normalize_token_col(F.col("t")).alias("n"),
        C.pos_tag_col(F.col("t")).alias("p"),
    ).collect()
    for r in rows:
        assert r["c"] == clean_token(r["t"]), repr(r["t"])
        assert r["n"] == normalize_token(r["t"]), repr(r["t"])
        assert r["p"] == pos_tag(r["t"]), repr(r["t"])
