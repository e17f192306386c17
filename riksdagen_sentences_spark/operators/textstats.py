"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID, document fingerprinting.

All pure JVM column expressions (whole-stage codegen) over the
``documents`` table; DuckDB oracle twins are generated in plans/corpus.py
from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import semantics as S
from ..functions import columns as C

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
# (identical meaning in Java regex and RE2)
BPE_RE = r"[A-Za-zÀ-ÖØ-öø-ÿ]+|[0-9]+|[^A-Za-zÀ-ÖØ-öø-ÿ0-9\s]"
PUNCT_COUNT_RE = r"[!-/:-@\[-`{-~]"
# quality score weights (engine-defined, deterministic)
STOPWORDS_ALL = tuple(
    sorted({w for ws in S.LANGID_STOPWORDS.values() for w in ws})
)


def ws_token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    words = F.filter(F.split(text, S.WS_SPLIT_RE), lambda w: w != "")
    return F.size(words)


def bpe_token_count_col(text: Column) -> Column:
    """BPE-ish regex token count (letter runs / digit runs / symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_RE), 0))


# PUNCT_COUNT_RE's literal character list (four ASCII ranges): counting
# matches of a single-char class == length drop after translate-removal,
# which skips the regex engine AND the per-row match-array allocation
_PUNCT_CHARS = "".join(
    chr(c)
    for lo, hi in ((0x21, 0x2F), (0x3A, 0x40), (0x5B, 0x60), (0x7B, 0x7E))
    for c in range(lo, hi + 1)
)


def punct_ratio_col(text: Column) -> Column:
    """#punctuation chars / #chars, floor-rounded to 4 dp."""
    n = F.length(text)
    p = n - F.length(F.translate(text, _PUNCT_CHARS, ""))
    raw = F.when(n == 0, F.lit(0.0)).otherwise(
        p.cast("double") / n.cast("double")
    )
    return F.floor(raw * 10000.0 + F.lit(0.5)) / 10000.0


def stopword_ratio_col(text: Column) -> Column:
    """#stopword tokens / #tokens (any language), floor-rounded 4 dp."""
    words = F.filter(
        F.split(F.lower(text), S.WS_SPLIT_RE), lambda w: w != ""
    )
    n = F.size(words)
    hits = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS_ALL)))
    raw = F.when(n == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / n.cast("double")
    )
    return F.floor(raw * 10000.0 + F.lit(0.5)) / 10000.0


def quality_score_col(text: Column) -> Column:
    """Composite quality in [0,1]: rewards length (saturating at 100
    tokens), penalizes punctuation soup; floor-rounded to 4 dp.
    Engine-defined heuristic (the reference's only quality gates are the
    >5-words and langdetect-score filters, models/sentence.py:63-69,
    107-109 - this generalizes them for training-data curation)."""
    n_tok = ws_token_count_col(text).cast("double")
    len_component = F.least(n_tok / 100.0, F.lit(1.0))
    punct_penalty = punct_ratio_col(text) * 2.0
    raw = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), len_component - punct_penalty)
    )
    return F.floor(raw * 10000.0 + F.lit(0.5)) / 10000.0


def normalized_text_col(text: Column) -> Column:
    """Fingerprint normalization: lower-case + collapse all whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), S.WS_SPLIT_RE, " "))


def fingerprint_col(text: Column) -> Column:
    """Content fingerprint = sha256 of normalized text."""
    return F.sha2(normalized_text_col(text), 256)


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats frame: token counts, ratios, quality,
    fingerprint, detected language."""
    from .cache import spread_input

    text = F.col(text_col)
    # spread a few-split source (per-row stat expressions are
    # pre-shuffle work); inline(array(struct)) = Generate barrier: the
    # langid tree evaluates once per row instead of once per
    # referenced field (same trick as pipeline.sentence_base)
    with_ls = spread_input(docs, "doc_id").select(
        F.col("doc_id"),
        ws_token_count_col(text).alias("ws_tokens"),
        bpe_token_count_col(text).alias("bpe_tokens"),
        punct_ratio_col(text).alias("punct_ratio"),
        stopword_ratio_col(text).alias("stopword_ratio"),
        quality_score_col(text).alias("quality"),
        fingerprint_col(text).alias("fingerprint"),
        F.inline(
            F.array(C.langid_struct_col(C.clean_sentence_col(text)))
        ),
    )
    return with_ls.select(
        "doc_id",
        "ws_tokens",
        "bpe_tokens",
        "punct_ratio",
        "stopword_ratio",
        "quality",
        "fingerprint",
        F.col("lang").alias("detected_lang"),
        F.col("score").alias("lang_score"),
    )
