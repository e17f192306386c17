"""Spark Column builders for all cleaning/filter/tagging rules.

Everything here is a pure ``pyspark.sql.Column`` expression - JVM-side,
inside whole-stage codegen, no Python in the hot path.  Each builder's
semantics are identical (by shared constants in ``semantics.py``) to the
Python kernels in ``kernels/`` and to the DuckDB SQL generated in
``plans/corpus.py``.

Reference parity notes are on the corresponding kernels.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import semantics as S

# ASCII-whitespace edge trim - the Column twin of kernels.text.ascii_strip
# (F.trim strips only 0x20 spaces; Python .strip() strips unicode; Java
# regex \s is the exact middle ground all three implementations share)
_EDGE_WS_RE = r"^\s+|\s+$"


def ascii_trim_col(c: Column) -> Column:
    return F.regexp_replace(c, _EDGE_WS_RE, "")


def _nonempty_nondigit(w: Column) -> Column:
    return (w != "") & ~w.rlike(S.DIGIT_RE)


def clean_sentence_col(text: Column) -> Column:
    """kernels.text.clean_sentence (reference models/sentence.py:71-97)."""
    stripped = F.regexp_replace(text, S.SENTENCE_STRIP_RE, "")
    words = F.filter(F.split(stripped, S.WS_SPLIT_RE), _nonempty_nondigit)
    return F.array_join(words, " ")


def clean_word_count_col(cleaned: Column) -> Column:
    """Word count of an already-cleaned sentence (single-space joined)."""
    return F.when(cleaned == "", F.lit(0)).otherwise(
        F.size(F.split(cleaned, " "))
    )


def clean_toc_col(text: Column) -> Column:
    """kernels.text.clean_toc (reference models/document.py:153-170)."""
    lines = F.filter(
        F.split(text, "\n"), lambda l: ~l.contains(S.TOC_MARKER)
    )
    return F.array_join(lines, "\n")


def split_sentences_col(text: Column) -> Column:
    """kernels.sentenize.split_sentences as an array<string> column
    (punkt-style boundary rule; no chunking - chunking only matters for
    >100k-char documents and lives in the pandas UDF path)."""
    marked = F.regexp_replace(text, S.SENT_BOUNDARY_RE, "$1" + S.SENT_SENTINEL)
    parts = F.transform(
        F.split(marked, S.SENT_SENTINEL), lambda p: ascii_trim_col(p)
    )
    return F.filter(parts, lambda p: p != "")


def clean_token_col(raw: Column) -> Column:
    """kernels.text.clean_token (reference models/token.py:100-118)."""
    return F.regexp_replace(
        ascii_trim_col(F.regexp_replace(raw, S.TOKEN_STRIP_RE, "")),
        S.DIGIT_RE,
        "",
    )


def normalize_token_col(raw: Column) -> Column:
    """kernels.text.normalize_token (reference models/token.py:74-77)."""
    return F.lower(ascii_trim_col(raw))


def pos_tag_col(raw: Column) -> Column:
    """kernels.pos.pos_tag as a CASE chain (first match wins)."""
    t = ascii_trim_col(raw)
    closed = F.create_map(
        *[F.lit(x) for kv in S.CLOSED_CLASS.items() for x in kv]
    )
    return (
        F.when(t == "", F.lit("SPACE"))
        .when(t.rlike(S.UNACCEPTED_CHARS_RE), F.lit("SYM"))
        .when(t.rlike(r"^[!-/:-@\[-`{-~–]+$"), F.lit("PUNCT"))
        .when(t.rlike(S.DIGIT_RE), F.lit("NUM"))
        .otherwise(F.coalesce(closed[F.lower(t)], F.lit("NOUN")))
    )


def is_accepted_token_col(raw: Column, pos: Column, lang: Column) -> Column:
    """kernels.text.is_accepted_token (reference models/token.py:80-98)."""
    return (
        (clean_token_col(raw) != "")
        & ~pos.isin(*S.UNACCEPTED_POSTAGS)
        & ~raw.rlike(S.DIGIT_RE)
        & ~raw.rlike(S.UNACCEPTED_CHARS_RE)
        & lang.isin(*S.ACCEPTED_LANGUAGES)
    )


def round_score_col(x: Column) -> Column:
    """floor(x*100+0.5)/100 - see kernels.langid.round_score."""
    return F.floor(x * 100.0 + F.lit(0.5)) / 100.0


def langid_cols(cleaned: Column) -> tuple[Column, Column]:
    """Stop-word-hit language detection as pure column expressions
    (JVM path; semantics identical to kernels.langid.detect_language:
    detected = argmax hit count, score = max_hits / total_hits).

    Returns (detected_lang, rounded_score).
    """
    lowered = F.lower(cleaned)
    words = F.split(lowered, " ")

    def _hit_counter(stop: tuple[str, ...]):
        return lambda w: w.isin(*stop)

    hits = {
        lang: F.size(F.filter(words, _hit_counter(stop)))
        for lang, stop in S.LANGID_STOPWORDS.items()
    }
    mx = F.greatest(*hits.values())
    total = sum(list(hits.values())[1:], start=list(hits.values())[0])

    # char-trigram fallback (kernels.langid / semantics.LANGID_TRIGRAMS)
    def _tri_count(tri: str):
        return (
            (F.length(lowered) - F.length(F.replace(lowered, F.lit(tri))))
            / 3
        ).cast("int")

    tri_hits = {
        lang: sum(
            [_tri_count(t) for t in tris[1:]], start=_tri_count(tris[0])
        )
        for lang, tris in S.LANGID_TRIGRAMS.items()
    }
    tri_mx = F.greatest(*tri_hits.values())
    tri_total = sum(
        list(tri_hits.values())[1:], start=list(tri_hits.values())[0]
    )

    detected = F.when(cleaned == "", F.lit(S.UND_LANG))
    for lang in S.LANGID_ORDER:
        detected = detected.when(
            (total > 0) & (hits[lang] == mx), F.lit(lang)
        )
    for lang in S.LANGID_ORDER:
        detected = detected.when(
            (total <= 0) & (tri_total > 0) & (tri_hits[lang] == tri_mx),
            F.lit(lang),
        )
    score = (
        F.when(cleaned == "", F.lit(0.0))
        .when(
            total > 0,
            round_score_col(mx.cast("double") / total.cast("double")),
        )
        .when(
            tri_total > 0,
            round_score_col(
                tri_mx.cast("double") / tri_total.cast("double")
            ),
        )
        .otherwise(F.lit(0.0))
    )
    return detected.otherwise(F.lit(S.UND_LANG)), score


def is_suitable_sentence_col(word_count: Column) -> Column:
    """> 5 clean words (reference models/sentence.py:63-69)."""
    return word_count > S.MIN_CLEAN_WORDS_EXCLUSIVE


def sentence_accept_col(
    word_count: Column, lang: Column, score: Column
) -> Column:
    """Full sentence-insert gate (reference models/sentence.py:130-140):
    suitable AND accepted language AND score >= 0.4."""
    return (
        is_suitable_sentence_col(word_count)
        & lang.isin(*S.ACCEPTED_LANGUAGES)
        & (score >= S.MIN_LANG_SCORE)
    )
