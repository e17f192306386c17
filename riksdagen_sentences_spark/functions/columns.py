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
# regex \s is the exact middle ground all three implementations share).
# Implemented with btrim over the LITERAL Java-\s character set - the
# same edge removal as regexp_replace('^\s+|\s+$') without a regex
# engine in the per-token hot path (Java \s is exactly [ \t\n\x0B\f\r]).
_JAVA_WS = " \t\n\x0b\f\r"

# Explicit character lists for the semantics.py character-class regexes:
# translate() (a per-char table lookup) replaces regexp_replace/rlike on
# plain classes bit-identically at a fraction of the per-row cost
# (measured ~10x on the 921k-token sf0.1 token chain).  The class
# definitions in semantics.py remain the spec (and the DuckDB oracle
# side); tests pin the equivalence.
_DIGITS = "0123456789"
# SENTENCE_STRIP_RE = [!-/:-@\[-`{-~–]: four ASCII ranges + en dash
_SENT_STRIP_CHARS = (
    "".join(
        chr(c)
        for lo, hi in ((0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60), (0x7B, 0x7E))
        for c in range(lo, hi + 1)
    )
    + "–"
)
# TOKEN_STRIP_RE = [\r:,.()\-/–]
_TOKEN_STRIP_CHARS = "\r:,.()-/–"
# UNACCEPTED_CHARS_RE = [¶¤¥~$€|]
_UNACCEPTED_CHARS = "".join(S.UNACCEPTED_CHARS)


def _strip_chars(c: Column, chars: str) -> Column:
    return F.translate(c, chars, "")


def _contains_any(c: Column, chars: str) -> Column:
    """rlike('[chars]') twin: true iff any char of ``chars`` occurs."""
    return F.translate(c, chars, "") != c


def ascii_trim_col(c: Column) -> Column:
    return F.btrim(c, F.lit(_JAVA_WS))


def _nonempty_nondigit(w: Column) -> Column:
    return (w != "") & ~_contains_any(w, _DIGITS)


def clean_sentence_col(text: Column) -> Column:
    """kernels.text.clean_sentence (reference models/sentence.py:71-97)."""
    stripped = _strip_chars(text, _SENT_STRIP_CHARS)
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
    return _strip_chars(
        ascii_trim_col(_strip_chars(raw, _TOKEN_STRIP_CHARS)), _DIGITS
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
        .when(_contains_any(t, _UNACCEPTED_CHARS), F.lit("SYM"))
        # ^[punct]+$ == non-empty and nothing but class chars left
        .when(
            (t != "") & (_strip_chars(t, _SENT_STRIP_CHARS) == ""),
            F.lit("PUNCT"),
        )
        .when(_contains_any(t, _DIGITS), F.lit("NUM"))
        .otherwise(F.coalesce(closed[F.lower(t)], F.lit("NOUN")))
    )


def is_accepted_token_col(raw: Column, pos: Column, lang: Column) -> Column:
    """kernels.text.is_accepted_token (reference models/token.py:80-98)."""
    return (
        (clean_token_col(raw) != "")
        & ~pos.isin(*S.UNACCEPTED_POSTAGS)
        & ~_contains_any(raw, _DIGITS)
        & ~_contains_any(raw, _UNACCEPTED_CHARS)
        & lang.isin(*S.ACCEPTED_LANGUAGES)
    )


def round_score_col(x: Column) -> Column:
    """floor(x*100+0.5)/100 - see kernels.langid.round_score."""
    return F.floor(x * 100.0 + F.lit(0.5)) / 100.0


def langid_struct_col(cleaned: Column) -> Column:
    """Stop-word-hit language detection as ONE pure column expression
    returning struct<lang:string, score:double> (JVM path; semantics
    identical to kernels.langid.detect_language: detected = argmax hit
    count with LANGID_ORDER tiebreak, score = max_hits / total_hits,
    char-trigram fallback when no stop word hits).

    Plan-shape note (the reason for the nested-lambda construction):
    referencing a shared subexpression (lowered text, split words, the
    per-language hit counts) from multiple column expressions makes
    CollapseProject INLINE it per reference, and higher-order functions
    are interpreted and never subexpression-eliminated - the naive
    formulation re-evaluated the lower/split/clean trees ~40x per row.
    Binding each shared value as a HOF LAMBDA VARIABLE
    (transform(array(x), v -> ...)) evaluates it exactly once; inner
    references are O(1) variable lookups.  Measured ~5x faster
    materialization of the language columns at 100k docs.
    """
    order = list(S.LANGID_ORDER)
    und = F.lit(S.UND_LANG)

    def isum(arr: Column) -> Column:
        return F.aggregate(arr, F.lit(0), lambda a, x: a + x)

    def argmax_struct(arr_bound: Column) -> Column:
        """struct<lang,score> by argmax over a BOUND count array (lambda
        variable - O(1) references), LANGID_ORDER tie-break; caller
        guards arr's total > 0 except for the trigram fallback, which
        re-checks it (no hits at all -> und/0.0)."""
        cnt = {
            lg: F.element_at(arr_bound, i + 1)
            for i, lg in enumerate(order)
        }
        mx = F.array_max(arr_bound)
        total = isum(arr_bound)
        detected = F.when(F.lit(False), und)
        for lg in order:
            detected = detected.when(
                (total > 0) & (cnt[lg] == mx), F.lit(lg)
            )
        score = F.when(
            total > 0,
            round_score_col(mx.cast("double") / total.cast("double")),
        ).otherwise(F.lit(0.0))
        return F.struct(
            detected.otherwise(und).alias("lang"), score.alias("score")
        )

    def with_lowered(lowered: Column) -> Column:
        def tri_count(tri: str) -> Column:
            return (
                (
                    F.length(lowered)
                    - F.length(F.replace(lowered, F.lit(tri)))
                )
                / 3
            ).cast("int")

        def with_words(words: Column) -> Column:
            def _hit_counter(stop: tuple[str, ...]):
                return lambda w: w.isin(*stop)

            hits_arr = F.array(
                *[
                    F.size(
                        F.filter(
                            words, _hit_counter(S.LANGID_STOPWORDS[lg])
                        )
                    )
                    for lg in order
                ]
            )

            def with_hits(h: Column) -> Column:
                # the ~20 per-language replace() trigram scans live in
                # the OTHERWISE branch of a CASE, which Spark evaluates
                # lazily per row: rows with any stop-word hit (the vast
                # majority) never pay for the fallback (the old
                # zip_with(hits, tris, decide) construction built the
                # trigram array eagerly for every row)
                tri_arr = F.array(
                    *[
                        sum(
                            [
                                tri_count(t)
                                for t in S.LANGID_TRIGRAMS[lg][1:]
                            ],
                            start=tri_count(S.LANGID_TRIGRAMS[lg][0]),
                        )
                        for lg in order
                    ]
                )
                tri_struct = F.element_at(
                    F.transform(F.array(tri_arr), argmax_struct), 1
                )
                return F.when(
                    isum(h) > 0, argmax_struct(h)
                ).otherwise(tri_struct)

            return F.element_at(
                F.transform(F.array(hits_arr), with_hits), 1
            )

        return F.element_at(
            F.transform(F.array(F.split(lowered, " ")), with_words), 1
        )

    def build(c: Column) -> Column:
        return F.when(
            c == "",
            F.struct(und.alias("lang"), F.lit(0.0).alias("score")),
        ).otherwise(
            F.element_at(F.transform(F.array(F.lower(c)), with_lowered), 1)
        )

    return F.element_at(F.transform(F.array(cleaned), build), 1)


def langid_cols(cleaned: Column) -> tuple[Column, Column]:
    """(detected_lang, rounded_score) - field views of
    :func:`langid_struct_col`.  Extracting two fields inlines the struct
    tree twice (any non-materialized reference does); still ~20x fewer
    redundant subtree evaluations than the pre-round-2 formulation."""
    s = langid_struct_col(cleaned)
    return s.getField("lang"), s.getField("score")


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


def mentions_col(
    cleaned: Column,
    gazetteer: tuple[tuple[str, str], ...] | None = None,
) -> Column:
    """JVM twin of kernels/ner.extract_entities: whole-word,
    case-insensitive gazetteer match inside the CLEANED sentence
    (reference models/entities.py:21-27) as an array<struct<label,
    ner_label>> in gazetteer order - one `contains` per term, all
    whole-stage codegen, no Python.  Used on the default path
    (pipeline.mention_rows); the pandas UDF remains as the kernel twin
    for parity pinning.

    ``gazetteer`` defaults to the demo dict (semantics.GAZETTEER); a
    custom (term, ner_label) sequence compiles its own contains chain.
    This shape is term-count-BOUND (one codegen'd predicate per term) -
    production dictionaries dispatch to the join-shaped matcher via
    pipeline.mention_rows(gazetteer=...)."""
    terms = S.GAZETTEER if gazetteer is None else gazetteer
    padded = F.concat(F.lit(" "), F.lower(cleaned), F.lit(" "))
    entries = [
        F.when(
            padded.contains(f" {label.lower()} "),
            F.struct(
                F.lit(label.lower()).alias("label"),
                F.lit(ner_label).alias("ner_label"),
            ),
        )
        for label, ner_label in terms
    ]
    return F.filter(F.array(*entries), lambda x: x.isNotNull())
