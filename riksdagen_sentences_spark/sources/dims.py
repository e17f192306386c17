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


def _literal_dim(
    spark: SparkSession, rows: list[tuple], names: list[str]
) -> DataFrame:
    """Tiny all-string dim as a pure-JVM literal frame
    (range(1) + inline of literal structs).  createDataFrame would
    build a Python-RDD-backed plan whose broadcast build pays a
    Python-runner stage on EVERY consuming query (the lexeme dict sits
    on the broadcast path of every triples build)."""
    return spark.range(1).select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        *[
                            F.lit(v).cast("string").alias(n)
                            for v, n in zip(row, names)
                        ]
                    )
                    for row in rows
                ]
            )
        )
    )


def languages(spark: SparkSession) -> DataFrame:
    return _literal_dim(
        spark, list(S.LANGUAGES), ["iso_code", "name_en", "qid"]
    )


def lexical_categories(spark: SparkSession) -> DataFrame:
    return _literal_dim(
        spark, list(S.LEXICAL_CATEGORIES.items()), ["postag", "qid"]
    )


def ner_labels(spark: SparkSession) -> DataFrame:
    return _literal_dim(
        spark, list(S.NER_LABELS.items()), ["label", "description"]
    )


def lexeme_dictionary(spark: SparkSession) -> DataFrame:
    """Synthetic Wikidata-lexeme dictionary; the reference only has the
    schema (models/crud/create.py:149-155) - the write path is
    unimplemented (models/crud/insert.py:183-196)."""
    return _literal_dim(
        spark,
        list(S.LEXEME_DICTIONARY),
        ["lexeme_id", "form", "lang", "category_qid"],
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


def gazetteer(spark: SparkSession) -> DataFrame:
    """The demo NER gazetteer (semantics.GAZETTEER) as a broadcast dim:
    (term, ner_label), term lowercase."""
    return _literal_dim(spark, list(S.GAZETTEER), ["term", "ner_label"])


def synthetic_gazetteer(
    spark: SparkSession, n: int = 100_000, seed: int = 42
) -> DataFrame:
    """Production-sized gazetteer (~100k terms, the scale of the north
    star's broadcast Wikidata lexeme dictionary) for the join-shaped NER
    path (pipeline.mention_rows_join): the 10-term demo dict never
    exercises the dictionary-size axis.

    Distributed generation (spark.range, no driver loop); includes the
    demo terms verbatim so matches stay oracle-identical, then pads with
    deterministic synthetic terms that CANNOT collide with corpus tokens
    ('zner' prefix, digit-free) - half single-word, half two-word, so
    the multi-word n-gram join path is exercised at full width.  ~100k
    rows x ~30 B is single-digit MB broadcast."""
    demo = gazetteer(spark)
    labels = sorted(S.NER_LABELS)
    label_arr = F.array(*[F.lit(x) for x in labels])
    word = F.concat(
        F.lit("zner"),
        F.translate(F.col("id").cast("string"), "0123456789", "abcdefghij"),
    )
    synth = spark.range(n - len(S.GAZETTEER)).select(
        F.when(
            F.col("id") % 2 == 0, word
        ).otherwise(F.concat(word, F.lit(" "), word)).alias("term"),
        F.element_at(
            label_arr, (F.col("id") % len(labels) + 1).cast("int")
        ).alias("ner_label"),
    )
    return demo.unionByName(synth)
