"""SQL-view interface over the materialized graph: the reference's
analytical corpus (/root/reference/sql/*.sql) runs as near-verbatim
Spark SQL once the views are registered.

The reference's normalized tables are reconstructed as views over the
graph (link tables from the triples frame, dims from semantics.py), so
queries written against the MariaDB schema port with only table-name
changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import semantics as S
from ..sources import dims


def register_graph_views(
    spark: SparkSession,
    sentences: DataFrame,
    rawtokens: DataFrame,
    normtokens: DataFrame,
    entities: DataFrame,
    triples: DataFrame,
) -> None:
    """Register the reference-schema views:
    sentence, rawtoken, normtoken, entity, language,
    lexical_category, ner_label, sentence_entity_linking,
    rawtoken_sentence_linking, rawtoken_normtoken_linking,
    rawtoken_lexeme_form_linking.
    """
    sentences.createOrReplaceTempView("sentence")
    rawtokens.createOrReplaceTempView("rawtoken")
    normtokens.createOrReplaceTempView("normtoken")
    entities.createOrReplaceTempView("entity")
    dims.languages(spark).createOrReplaceTempView("language")
    dims.lexical_categories(spark).createOrReplaceTempView(
        "lexical_category"
    )
    dims.ner_labels(spark).createOrReplaceTempView("ner_label")
    dims.lexeme_dictionary(spark).createOrReplaceTempView("lexeme_form")

    def link(pred: str, subj: str, obj: str, name: str) -> None:
        triples.filter(F.col("pred") == pred).select(
            F.col("subj").alias(subj), F.col("obj").alias(obj)
        ).createOrReplaceTempView(name)

    link(S.PRED_MENTIONS, "sentence", "entity", "sentence_entity_linking")
    link(S.PRED_OCCURS_IN, "rawtoken", "sentence",
         "rawtoken_sentence_linking")
    link(S.PRED_NORMALIZES_TO, "rawtoken", "normtoken",
         "rawtoken_normtoken_linking")
    link(S.PRED_LINKS_TO, "rawtoken", "lexeme_form",
         "rawtoken_lexeme_form_linking")


# The reference's count_sv_sentences.sql:1-4, ported with only the
# iso-code join replaced by the inline lang column:
SQL_COUNT_SENTENCES_BY_LANG = """
SELECT COUNT(*) AS n
FROM sentence s
JOIN language l ON s.lang = l.iso_code
WHERE l.iso_code = '{iso}'
"""

# all_swedish_sentences_with_entities.sql:1-9 ported:
SQL_SENTENCES_WITH_ENTITIES = """
SELECT s.sentence_id, s.text, e.label, nl.description
FROM sentence s
JOIN sentence_entity_linking sel ON sel.sentence = s.sentence_id
JOIN entity e ON e.entity_id = sel.entity
JOIN ner_label nl ON nl.label = e.ner_label
WHERE s.lang = '{iso}'
ORDER BY s.sentence_id
"""

# count_sv_rawtoken_links_by_category.sql:1-8 ported:
SQL_LINK_COUNTS_BY_CATEGORY = """
SELECT lc.qid, rt.postag, COUNT(*) AS n
FROM rawtoken_sentence_linking l
JOIN rawtoken rt ON rt.rawtoken_id = l.rawtoken
JOIN lexical_category lc ON lc.postag = rt.postag
GROUP BY lc.qid, rt.postag
ORDER BY n DESC, rt.postag
"""
