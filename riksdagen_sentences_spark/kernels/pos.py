"""Heuristic POS tagger kernel (deterministic rule chain).

Replaces spaCy ``token.pos_`` (/root/reference/models/token.py:67-68).
Rules evaluated in order, first match wins (see semantics.py for the
table); the same chain is generated as a SQL CASE expression for the
DuckDB oracle by ``plans/corpus.py``.
"""

from __future__ import annotations

import re

from .. import semantics as S

_DIGIT = re.compile(S.DIGIT_RE, re.ASCII)
_UNACCEPTED = re.compile(S.UNACCEPTED_CHARS_RE)
_PUNCT_SET = set(S.PUNCT_CHARS) | {S.EN_DASH}


def pos_tag(raw_token: str) -> str:
    from .text import ascii_strip

    t = ascii_strip(raw_token)
    if not t:
        return "SPACE"
    if _UNACCEPTED.search(t):
        return "SYM"
    if all(c in _PUNCT_SET for c in t):
        return "PUNCT"
    if _DIGIT.search(t):
        return "NUM"
    return S.CLOSED_CLASS.get(t.lower(), "NOUN")
