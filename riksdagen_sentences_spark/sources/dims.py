"""Dimension tables as small broadcast-able DataFrames.

The reference seeds its dimension tables from YAML at DDL time
(/root/reference/models/crud/create.py:18-29, config/*.yml); here each dim
is a tiny DataFrame built from the constants in ``semantics.py`` and
always joined with ``F.broadcast`` - never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import semantics as S


def languages(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(S.LANGUAGES), "iso_code string, name_en string, qid string"
    )


def lexical_categories(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(S.LEXICAL_CATEGORIES.items()), "postag string, qid string"
    )


def ner_labels(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(S.NER_LABELS.items()), "label string, description string"
    )


def lexeme_dictionary(spark: SparkSession) -> DataFrame:
    """Synthetic Wikidata-lexeme dictionary; the reference only has the
    schema (models/crud/create.py:149-155) - the write path is
    unimplemented (models/crud/insert.py:183-196)."""
    return spark.createDataFrame(
        list(S.LEXEME_DICTIONARY),
        "lexeme_id string, form string, lang string, category_qid string",
    )


def synthetic_lexeme_dictionary(
    spark: SparkSession, n: int = 100_000, seed: int = 42
) -> DataFrame:
    """Production-sized synthetic lexeme dictionary (~100k entries, the
    scale Wikidata's Swedish lexeme set actually has) for broadcast-join
    budget tests: the 15-entry demo dict never exercises the broadcast
    size the north star worries about.

    Distributed generation (spark.range + column exprs, no driver loop);
    includes the 15 demo entries verbatim so oracle-twinned matches stay
    identical, then pads with deterministic synthetic forms that cannot
    collide with real tokens ('zlex' prefix).  ~100k rows x ~40 B is a
    few MB broadcast - well inside a 1000-executor budget."""
    demo = lexeme_dictionary(spark)
    langs = list(S.ACCEPTED_LANGUAGES)
    lang_arr = F.array(*[F.lit(x) for x in langs])
    # forms are digit-free (digits would be rejected by the token accept
    # filter): map the id's decimal digits to letters a-j
    synth = spark.range(n - len(S.LEXEME_DICTIONARY)).select(
        F.concat(F.lit("L9"), F.col("id")).alias("lexeme_id"),
        F.concat(
            F.lit("zlex"),
            F.translate(
                F.col("id").cast("string"), "0123456789", "abcdefghij"
            ),
        ).alias("form"),
        F.element_at(
            lang_arr, (F.col("id") % len(langs) + 1).cast("int")
        ).alias("lang"),
        F.lit("Q1084").alias("category_qid"),
    )
    return demo.unionByName(synth)
