"""Driver correctness corpus: Spark queries + generated DuckDB oracles.

Re-expression of the reference's 28-file analytical SQL corpus
(/root/reference/sql/*.sql) plus the pipeline tables themselves, over the
driver testdata (TESTDATA.md).  Every oracle SQL string is GENERATED from
the same ``semantics.py`` constants the Spark implementation uses, so the
two sides cannot drift independently.

Column names are aliased identically on both sides (driver hashes values
after sorting columns by name).  Doubles are always produced by the same
floor-based rounding on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import semantics as S
from ..functions import columns as C
from ..ids import uuid5_sql
from . import pipeline as P

# ---------------------------------------------------------------------------
# DuckDB SQL fragment generators (one per semantics rule)
# ---------------------------------------------------------------------------

TRIM_CHARS = "' ' || chr(9) || chr(10) || chr(13)"


def sql_clean_sentence(expr: str) -> str:
    """kernels.text.clean_sentence in DuckDB."""
    stripped = f"regexp_replace({expr}, '[!-/:-@\\[-`{{-~–]', '', 'g')"
    words = (
        f"list_filter(string_split_regex({stripped}, '\\s+'), "
        f"w -> w <> '' AND NOT regexp_matches(w, '[0-9]'))"
    )
    return f"array_to_string({words}, ' ')"


def sql_word_count(cleaned: str) -> str:
    return (
        f"CASE WHEN {cleaned} = '' THEN 0 "
        f"ELSE len(string_split({cleaned}, ' ')) END"
    )


def sql_round_score(expr: str) -> str:
    return f"(floor(({expr}) * 100.0 + 0.5) / 100.0)"


def sql_langid_hits(cleaned: str) -> dict[str, str]:
    out = {}
    for lang, stop in S.LANGID_STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in stop)
        out[lang] = (
            f"len(list_filter(string_split(lower({cleaned}), ' '), "
            f"w -> w IN ({lst})))"
        )
    return out


def sql_langid_select(cleaned: str) -> tuple[str, str]:
    """Return (lang_expr, score_expr) matching kernels.langid."""
    hits = sql_langid_hits(cleaned)
    total = " + ".join(hits.values())
    mx = "greatest(" + ", ".join(hits.values()) + ")"
    lang = f"CASE WHEN {cleaned} = '' OR ({total}) = 0 THEN '{S.UND_LANG}' "
    for lg in S.LANGID_ORDER:
        lang += f"WHEN {hits[lg]} = {mx} THEN '{lg}' "
    lang += f"ELSE '{S.UND_LANG}' END"
    score = (
        f"CASE WHEN {cleaned} = '' OR ({total}) = 0 THEN 0.0 "
        f"ELSE {sql_round_score(f'CAST({mx} AS DOUBLE) / ({total})')} END"
    )
    return lang, score


def sql_clean_token(raw: str) -> str:
    return (
        f"regexp_replace(trim(regexp_replace({raw}, '[\\r:,.()\\-/–]', '', "
        f"'g')), '[0-9]', '', 'g')"
    )


def sql_pos_tag(raw: str) -> str:
    closed = " ".join(
        f"WHEN '{w}' THEN '{t}'" for w, t in S.CLOSED_CLASS.items()
    )
    return (
        f"CASE WHEN trim({raw}) = '' THEN 'SPACE' "
        f"WHEN regexp_matches(trim({raw}), '[¶¤¥~$€|]') THEN 'SYM' "
        f"WHEN regexp_matches(trim({raw}), '^[!-/:-@\\[-`{{-~–]+$') "
        f"THEN 'PUNCT' "
        f"WHEN regexp_matches(trim({raw}), '[0-9]') THEN 'NUM' "
        f"ELSE (CASE lower(trim({raw})) {closed} ELSE 'NOUN' END) END"
    )


def sql_accepted_token(raw: str, pos: str, lang: str) -> str:
    tags = ", ".join(f"'{t}'" for t in S.UNACCEPTED_POSTAGS)
    langs = ", ".join(f"'{l}'" for l in S.ACCEPTED_LANGUAGES)
    return (
        f"({sql_clean_token(raw)} <> '' AND {pos} NOT IN ({tags}) "
        f"AND NOT regexp_matches({raw}, '[0-9]') "
        f"AND NOT regexp_matches({raw}, '[¶¤¥~$€|]') "
        f"AND {lang} IN ({langs}))"
    )


ACCEPT_LANGS_SQL = ", ".join(f"'{l}'" for l in S.ACCEPTED_LANGUAGES)


def sentence_ctes(doc_table: str = "documents") -> str:
    """CTE chain documents -> sent_base (mirrors pipeline.sentence_base)
    -> sentences (mirrors pipeline.sentences)."""
    cleaned = sql_clean_sentence("text")
    wc = sql_word_count("cleaned")
    lang, score = sql_langid_select("cleaned")
    sid = uuid5_sql("'sentence'", "text", "document_id", "lang")
    return f"""
__docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS document_id, text AS content
  FROM {doc_table}
),
__toc AS (
  SELECT document_id,
         array_to_string(
           list_filter(string_split(content, chr(10)),
                       x -> NOT contains(x, '....')),
           chr(10)) AS t
  FROM __docs
),
__marked AS (
  SELECT document_id,
         string_split(
           regexp_replace(t, '([.!?])\\s+', '\\1' || chr(1), 'g'),
           chr(1)) AS arr
  FROM __marked_src
),
__exploded AS (
  SELECT document_id,
         unnest(arr) AS part,
         unnest(range(0, len(arr))) AS sent_idx
  FROM __marked
),
__sent_raw AS (
  SELECT document_id, sent_idx,
         trim(part, {TRIM_CHARS}) AS text
  FROM __exploded
),
__sent_clean AS (
  SELECT document_id, sent_idx, text, {cleaned} AS cleaned
  FROM __sent_raw WHERE text <> ''
),
__sent_wc AS (
  SELECT *, {wc} AS word_count FROM __sent_clean
),
sent_base AS (
  SELECT document_id, sent_idx, text, cleaned, word_count,
         {lang} AS lang, {score} AS score
  FROM __sent_wc WHERE word_count >= 2
),
__sent_accepted AS (
  SELECT * FROM sent_base
  WHERE word_count > {S.MIN_CLEAN_WORDS_EXCLUSIVE}
    AND lang IN ({ACCEPT_LANGS_SQL})
    AND score >= {S.MIN_LANG_SCORE}
),
sentences AS (
  SELECT {sid} AS sentence_id, document_id, text,
         MIN(cleaned) AS cleaned, lang,
         MIN(score) AS score, MIN(word_count) AS word_count,
         MIN(sent_idx) AS sent_idx
  FROM __sent_accepted
  GROUP BY text, document_id, lang
)""".replace("__marked_src", "__toc")


def token_ctes() -> str:
    """CTE chain sent_base -> token_base (mirrors pipeline.token_base)."""
    pos = sql_pos_tag("raw")
    acc = sql_accepted_token("raw", "pos", "lang")
    sent_acc = (
        f"(word_count > {S.MIN_CLEAN_WORDS_EXCLUSIVE} "
        f"AND lang IN ({ACCEPT_LANGS_SQL}) AND score >= {S.MIN_LANG_SCORE})"
    )
    return f""",
__tok_exploded AS (
  SELECT document_id, sent_idx, text, lang, score, word_count,
         unnest(string_split_regex(text, '\\s+')) AS raw,
         unnest(range(0, len(string_split_regex(text, '\\s+')))) AS tok_idx
  FROM sent_base
),
__tok1 AS (
  SELECT * FROM __tok_exploded WHERE raw <> ''
),
token_base AS (
  SELECT *,
         {sql_clean_token('raw')} AS cleaned_tok,
         lower(trim(raw)) AS norm,
         {pos} AS pos
  FROM __tok1
),
token_flags AS (
  SELECT *, {acc} AS tok_accepted, {sent_acc} AS sent_accepted
  FROM token_base
)"""


def gazetteer_values() -> str:
    rows = ", ".join(f"('{l}', '{n}')" for l, n in S.GAZETTEER)
    return f"(VALUES {rows}) AS g(label, ner_label)"


def lexeme_values() -> str:
    rows = ", ".join(
        f"('{i}', '{f}', '{l}', '{q}')" for i, f, l, q in S.LEXEME_DICTIONARY
    )
    return f"(VALUES {rows}) AS lex(lexeme_id, form, lang, category_qid)"


# ---------------------------------------------------------------------------
# Spark-side helpers
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.docs_from_documents(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.sentence_base(_docs(spark, sf_dir))


def _sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.sentences(_base(spark, sf_dir))


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.token_base(_base(spark, sf_dir))


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# The corpus
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, fn, oracle: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


# -- pipeline tables --------------------------------------------------------

_register(
    "sentences",
    lambda spark, sf: _sentences(spark, sf).select(
        "sentence_id", "document_id", "text", "cleaned", "lang", "score",
        "word_count", "sent_idx",
    ),
    f"WITH {sentence_ctes()} SELECT sentence_id, document_id, text, "
    "cleaned, lang, score, word_count, sent_idx FROM sentences",
)

_register(
    "sentence_count_by_lang",
    lambda spark, sf: _sentences(spark, sf)
    .groupBy("lang")
    .agg(F.count("*").alias("sentence_count")),
    f"WITH {sentence_ctes()} SELECT lang, COUNT(*) AS sentence_count "
    "FROM sentences GROUP BY lang",
)

_register(
    "rawtokens",
    lambda spark, sf: P.rawtokens(_tokens(spark, sf)),
    f"WITH {sentence_ctes()}{token_ctes()} "
    f"SELECT {uuid5_sql(chr(39) + 'rawtoken' + chr(39), 'text', 'pos', 'lang')} "
    "AS rawtoken_id, text, pos AS postag, lang, MIN(score) AS score "
    "FROM (SELECT raw AS text, pos, lang, score FROM token_flags "
    "WHERE tok_accepted) GROUP BY text, pos, lang",
)

_register(
    "normtokens",
    lambda spark, sf: P.normtokens(_tokens(spark, sf)),
    f"WITH {sentence_ctes()}{token_ctes()} "
    f"SELECT {uuid5_sql(chr(39) + 'normtoken' + chr(39), 'text')} AS "
    "normtoken_id, text FROM (SELECT DISTINCT norm AS text FROM "
    "token_flags WHERE tok_accepted)",
)

_register(
    "entities",
    lambda spark, sf: P.entities(_sentences(spark, sf)),
    f"WITH {sentence_ctes()} "
    f"SELECT {uuid5_sql(chr(39) + 'entity' + chr(39), 'label', 'ner_label')} "
    "AS entity_id, label, ner_label FROM (SELECT DISTINCT g.label, "
    f"g.ner_label FROM sentences s, {gazetteer_values()} "
    "WHERE contains(' ' || lower(s.cleaned) || ' ', ' ' || g.label || ' '))",
)

_register(
    "mention_edges",
    lambda spark, sf: P.mention_edges(_sentences(spark, sf)),
    f"WITH {sentence_ctes()} "
    "SELECT subj, pred, "
    f"{uuid5_sql(chr(39) + 'entity' + chr(39), 'label', 'ner_label')} AS obj "
    f"FROM (SELECT DISTINCT s.sentence_id AS subj, "
    f"'{S.PRED_MENTIONS}' AS pred, g.label, g.ner_label "
    f"FROM sentences s, {gazetteer_values()} "
    "WHERE contains(' ' || lower(s.cleaned) || ' ', ' ' || g.label || ' '))",
)

_SID_FROM_TOK = uuid5_sql(
    chr(39) + "sentence" + chr(39), "text", "document_id", "lang"
)
_RID_FROM_TOK = uuid5_sql(chr(39) + "rawtoken" + chr(39), "raw", "pos", "lang")
_RID_FROM_TOK_Q = uuid5_sql(
    chr(39) + "rawtoken" + chr(39), "t.raw", "t.pos", "t.lang"
)

_register(
    "occursin_edges",
    lambda spark, sf: P.occurs_in_edges(_tokens(spark, sf)),
    f"WITH {sentence_ctes()}{token_ctes()} "
    f"SELECT DISTINCT {_RID_FROM_TOK} AS subj, '{S.PRED_OCCURS_IN}' AS pred, "
    f"{_SID_FROM_TOK} AS obj FROM token_flags "
    "WHERE tok_accepted AND sent_accepted",
)

_register(
    "normalizesto_edges",
    lambda spark, sf: P.normalizes_to_edges(_tokens(spark, sf)),
    f"WITH {sentence_ctes()}{token_ctes()} "
    f"SELECT DISTINCT {_RID_FROM_TOK} AS subj, "
    f"'{S.PRED_NORMALIZES_TO}' AS pred, "
    f"{uuid5_sql(chr(39) + 'normtoken' + chr(39), 'norm')} AS obj "
    "FROM token_flags WHERE tok_accepted",
)

_register(
    "partof_edges",
    lambda spark, sf: P.part_of_edges(_sentences(spark, sf)),
    f"WITH {sentence_ctes()} SELECT sentence_id AS subj, "
    f"'{S.PRED_PART_OF}' AS pred, document_id AS obj FROM sentences",
)

_register(
    "hastext_edges",
    lambda spark, sf: P.has_text_edges(_sentences(spark, sf)),
    f"WITH {sentence_ctes()} SELECT sentence_id AS subj, "
    f"'{S.PRED_HAS_TEXT}' AS pred, cleaned AS obj FROM sentences",
)

_register(
    "linksto_edges",
    lambda spark, sf: P.links_to_edges(_tokens(spark, sf), spark),
    f"WITH {sentence_ctes()}{token_ctes()} "
    f"SELECT DISTINCT {_RID_FROM_TOK_Q} AS subj, '{S.PRED_LINKS_TO}' AS pred, "
    f"lex.lexeme_id AS obj FROM token_flags t, {lexeme_values()} "
    "WHERE t.tok_accepted AND t.norm = lex.form AND t.lang = lex.lang",
)

_register(
    "triples_by_pred",
    lambda spark, sf: P.triples(spark, _docs(spark, sf))
    .groupBy("pred")
    .agg(F.count("*").alias("n")),
    f"WITH {sentence_ctes()}{token_ctes()} "
    "SELECT pred, COUNT(*) AS n FROM ("
    f"SELECT sentence_id AS subj, '{S.PRED_PART_OF}' AS pred, "
    "document_id AS obj FROM sentences "
    f"UNION ALL SELECT sentence_id, '{S.PRED_HAS_TEXT}', cleaned "
    "FROM sentences "
    f"UNION ALL SELECT DISTINCT {_RID_FROM_TOK}, '{S.PRED_OCCURS_IN}', "
    f"{_SID_FROM_TOK} FROM token_flags WHERE tok_accepted AND sent_accepted "
    f"UNION ALL SELECT DISTINCT {_RID_FROM_TOK}, '{S.PRED_NORMALIZES_TO}', "
    f"{uuid5_sql(chr(39) + 'normtoken' + chr(39), 'norm')} "
    "FROM token_flags WHERE tok_accepted "
    "UNION ALL SELECT subj, pred, "
    f"{uuid5_sql(chr(39) + 'entity' + chr(39), 'label', 'ner_label')} "
    f"FROM (SELECT DISTINCT s.sentence_id AS subj, '{S.PRED_MENTIONS}' AS "
    f"pred, g.label, g.ner_label FROM sentences s, {gazetteer_values()} "
    "WHERE contains(' ' || lower(s.cleaned) || ' ', ' ' || g.label || ' ')) "
    f"UNION ALL SELECT DISTINCT {_RID_FROM_TOK_Q}, '{S.PRED_LINKS_TO}', "
    f"lex.lexeme_id FROM token_flags t, {lexeme_values()} "
    "WHERE t.tok_accepted AND t.norm = lex.form AND t.lang = lex.lang"
    ") GROUP BY pred",
)
