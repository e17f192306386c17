"""Property-based three-way parity: for randomized text over the
supported alphabet, the Python kernels, the Spark Column expressions and
the generated DuckDB oracle SQL must agree exactly.

Alphabet: printable ASCII + ASCII whitespace + Latin-1 letters used by
the accepted languages + the special chars the rules name.  (Exotic
unicode case-mapping like 'İ' is explicitly out of the supported domain;
whitespace/digit semantics are pinned to ASCII everywhere - see
kernels/text.py.)
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

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
from riksdagen_sentences_spark.plans import corpus as CP

ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\r\x0b\x0c"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    "åäöÅÄÖüÜéÉ–¶¤¥€"
    "och att det som the and of to den med"
)

texts = st.text(alphabet=ALPHABET, min_size=0, max_size=120)
tokens = st.text(alphabet=ALPHABET.replace(" ", "").replace("\t", "")
                 .replace("\n", "").replace("\r", "")
                 .replace("\x0b", "").replace("\x0c", ""),
                 min_size=0, max_size=24)

_SETTINGS = settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _sql_str(s: str) -> str:
    # DuckDB standard strings don't process backslash escapes - only
    # quotes need doubling
    return "'" + s.replace("'", "''") + "'"


@given(texts)
@_SETTINGS
def test_clean_sentence_kernel_vs_duckdb(s):
    got = duckdb.sql(
        f"SELECT {CP.sql_clean_sentence(_sql_str(s))} AS c"
    ).fetchone()[0]
    assert got == clean_sentence(s), repr(s)


@given(texts)
@_SETTINGS
def test_word_count_kernel_vs_duckdb(s):
    cleaned = CP.sql_clean_sentence(_sql_str(s))
    got = duckdb.sql(
        f"SELECT {CP.sql_word_count(cleaned)} AS n"
    ).fetchone()[0]
    assert got == clean_word_count(s), repr(s)


@given(texts)
@_SETTINGS
def test_langid_kernel_vs_duckdb(s):
    cleaned = clean_sentence(s)
    lang_sql, score_sql = CP.sql_langid_select(_sql_str(cleaned))
    got = duckdb.sql(f"SELECT {lang_sql} AS l, {score_sql} AS sc").fetchone()
    assert (got[0], got[1]) == detect_language(cleaned), repr(s)


@given(tokens)
@_SETTINGS
def test_token_rules_kernel_vs_duckdb(t):
    q = (
        f"SELECT {CP.sql_clean_token(_sql_str(t))} AS c, "
        f"{CP.sql_pos_tag(_sql_str(t))} AS p, "
        f"lower(trim({_sql_str(t)}, {CP.TRIM_CHARS})) AS n"
    )
    got = duckdb.sql(q).fetchone()
    assert got[0] == clean_token(t), repr(t)
    assert got[1] == pos_tag(t), repr(t)
    assert got[2] == normalize_token(t), repr(t)


@given(texts)
@_SETTINGS
def test_sentenize_kernel_vs_duckdb(s):
    # the oracle's toc-clean -> mark -> split -> trim -> drop-empty chain
    lit = _sql_str(s)
    q = f"""
    SELECT list_filter(
      list_transform(
        string_split(
          regexp_replace(
            array_to_string(
              list_filter(string_split({lit}, chr(10)),
                          x -> NOT contains(x, '....')),
              chr(10)),
            '([.!?])[\\t\\n\\f\\r\\x0B ]+', '\\1' || chr(1), 'g'),
          chr(1)),
        p -> trim(p, {CP.TRIM_CHARS})),
      p -> p <> '') AS parts
    """
    got = duckdb.sql(q).fetchone()[0]
    from riksdagen_sentences_spark.kernels import clean_toc, split_sentences

    assert list(got) == split_sentences(clean_toc(s)), repr(s)


# ---- Spark column parity on a hypothesis-generated batch (one Spark
# job for the whole batch - per-example Spark jobs would be too slow) ---


@pytest.fixture(scope="module")
def strings_batch():
    out = []

    @given(texts)
    @settings(max_examples=200, deadline=None)
    def collect(s):
        out.append(s)

    collect()
    return sorted(set(out))


def test_columns_match_kernels_on_random_batch(spark, strings_batch):
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.functions import columns as C

    df = spark.createDataFrame([(s,) for s in strings_batch], "s string")
    lang, score = C.langid_cols(C.clean_sentence_col(F.col("s")))
    rows = df.select(
        "s",
        C.clean_sentence_col(F.col("s")).alias("cleaned"),
        C.clean_token_col(F.col("s")).alias("ctok"),
        C.normalize_token_col(F.col("s")).alias("norm"),
        C.pos_tag_col(F.col("s")).alias("pos"),
        C.split_sentences_col(F.col("s")).alias("sents"),
        lang.alias("lang"),
        score.alias("score"),
    ).collect()
    for r in rows:
        s = r["s"]
        assert r["cleaned"] == clean_sentence(s), repr(s)
        assert r["ctok"] == clean_token(s), repr(s)
        assert r["norm"] == normalize_token(s), repr(s)
        assert r["pos"] == pos_tag(s), repr(s)
        assert list(r["sents"]) == split_sentences(s), repr(s)
        assert (r["lang"], r["score"]) == detect_language(
            clean_sentence(s)
        ), repr(s)
