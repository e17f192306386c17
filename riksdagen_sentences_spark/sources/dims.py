"""Dimension tables as small broadcast-able DataFrames.

The reference seeds its dimension tables from YAML at DDL time
(/root/reference/models/crud/create.py:18-29, config/*.yml); here each dim
is a tiny DataFrame built from the constants in ``semantics.py`` and
always joined with ``F.broadcast`` - never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
