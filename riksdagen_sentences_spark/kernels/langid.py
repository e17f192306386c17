"""Deterministic language identification kernel.

Replaces fasttext (/root/reference/models/sentence.py:193-209) with a
stop-word scorer over the cleaned, lower-cased sentence: for each
candidate language, count words found in that language's stop-word list;
the detected language is the argmax hit count (ties break by the fixed
order of ``semantics.LANGID_ORDER``) and the score is the CONFIDENCE
``max_hits / total_hits_across_all_languages`` - 1.0 for unambiguous
text, lower when stop words are shared between languages, 0.0 when no
stop word matches (-> 'und').  This mirrors the shape of fasttext's
softmax confidence, which the reference gates at >= 0.4
(models/sentence.py:107-109).  The score is rounded to 2 decimals like
the reference (models/sentence.py:206).

Deterministic + tiny on purpose: the identical arithmetic is generated as
DuckDB SQL by ``plans/corpus.py`` so the driver oracle reproduces it.
"""

from __future__ import annotations

import math

from .. import semantics as S

_STOPSETS = {lang: frozenset(words) for lang, words in S.LANGID_STOPWORDS.items()}


def round_score(x: float) -> float:
    """floor(x*100+0.5)/100 - identical semantics in Python, Spark and
    DuckDB (Python's built-in round() is banker's rounding and would
    diverge from the SQL engines on exact halves like 0.125)."""
    return math.floor(x * 100.0 + 0.5) / 100.0


def detect_language(cleaned_sentence: str) -> tuple[str, float]:
    """Return (iso_code, score) for a CLEANED sentence; ('und', 0.0) when
    empty; falls back to char-trigram
    scoring (semantics.LANGID_TRIGRAMS) when no stop word matches, and
    to ('und', 0.0) when neither signal fires."""
    from .text import ascii_words

    lowered = cleaned_sentence.lower()
    words = ascii_words(lowered)
    if not words:
        return (S.UND_LANG, 0.0)
    best_lang = S.UND_LANG
    best_hits = 0
    total_hits = 0
    for lang in S.LANGID_ORDER:
        stopset = _STOPSETS[lang]
        hits = sum(1 for w in words if w in stopset)
        total_hits += hits
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if total_hits > 0:
        return (best_lang, round_score(best_hits / total_hits))
    # char-trigram fallback (semantics.LANGID_TRIGRAMS)
    best_lang = S.UND_LANG
    best_hits = 0
    total_hits = 0
    for lang in S.LANGID_ORDER:
        hits = sum(
            (len(lowered) - len(lowered.replace(tri, ""))) // 3
            for tri in S.LANGID_TRIGRAMS[lang]
        )
        total_hits += hits
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if total_hits == 0:
        return (S.UND_LANG, 0.0)
    return (best_lang, round_score(best_hits / total_hits))
