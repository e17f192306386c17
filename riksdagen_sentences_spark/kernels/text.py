"""Pure-Python text kernels (no Spark imports).

These are the batch bodies of the Arrow-batched pandas UDFs in
``functions/udfs.py`` and the reference-semantics oracle used by the P/R
harness in tests.  Each function is pinned to the reference behavior it
reproduces (file:line in /root/reference).

Scalar functions are deliberately kept pure so pytest can exercise them
without a SparkSession; the pandas wrappers in udfs.py apply them per
Arrow batch (one Python call per batch, never per row crossing the
JVM<->Python boundary).
"""

from __future__ import annotations

import re

from .. import semantics as S

# re.ASCII everywhere: Python's \s and \d are unicode-aware by default,
# but Java regex (Spark) and RE2 (DuckDB) default to ASCII classes - the
# three implementations must agree on exotic whitespace/digits.
_SENT_STRIP = re.compile(S.SENTENCE_STRIP_RE, re.ASCII)
_TOKEN_STRIP = re.compile(S.TOKEN_STRIP_RE, re.ASCII)
_DIGIT = re.compile(S.DIGIT_RE, re.ASCII)
_UNACCEPTED = re.compile(S.UNACCEPTED_CHARS_RE)
_WS = re.compile(S.WS_SPLIT_RE, re.ASCII)
_EDGE_WS = re.compile(r"^\s+|\s+$", re.ASCII)
_PUNCT_SET = set(S.PUNCT_CHARS) | {S.EN_DASH}


def ascii_strip(s: str) -> str:
    r"""strip() limited to ASCII whitespace [ \t\n\x0b\f\r] - the
    exact set Java regex \s and F.trim-equivalent expressions see."""
    return _EDGE_WS.sub("", s)


def ascii_words(s: str) -> list[str]:
    """split on ASCII whitespace, dropping empties (str.split() twin)."""
    return [w for w in _WS.split(s) if w]


def clean_sentence(text: str) -> str:
    """Sentence cleaning per reference models/sentence.py:71-97.

    Strip punctuation + en-dash, then drop words containing digits.
    """
    stripped = _SENT_STRIP.sub("", text)
    words = [w for w in ascii_words(stripped) if not _DIGIT.search(w)]
    return " ".join(words)


def clean_word_count(text: str) -> int:
    """Reference models/sentence.py:99-101."""
    return len(clean_sentence(text).split())


def is_suitable_sentence(text: str) -> bool:
    """> 5 clean words (reference models/sentence.py:63-69)."""
    return clean_word_count(text) > S.MIN_CLEAN_WORDS_EXCLUSIVE


def clean_toc(chunk: str) -> str:
    """Drop lines containing '....' (reference models/document.py:153-170)."""
    return "\n".join(
        line for line in chunk.split("\n") if S.TOC_MARKER not in line
    )


def clean_token(raw: str) -> str:
    """Token cleaning per reference models/token.py:100-118."""
    return _DIGIT.sub("", ascii_strip(_TOKEN_STRIP.sub("", raw)))


def normalize_token(raw: str) -> str:
    """strip().lower(); punctuation kept (reference models/token.py:74-77)."""
    return ascii_strip(raw).lower()


def is_accepted_token(raw: str, pos: str, sentence_lang: str) -> bool:
    """Accept filter per reference models/token.py:80-98."""
    if not clean_token(raw):
        return False
    if pos in S.UNACCEPTED_POSTAGS:
        return False
    if _DIGIT.search(raw):
        return False
    if _UNACCEPTED.search(raw):
        return False
    return sentence_lang in S.ACCEPTED_LANGUAGES


def tokenize(sentence: str) -> list[str]:
    """Whitespace word tokenizer (engine replacement for spaCy tokens,
    reference models/sentence.py:172-181)."""
    return ascii_words(sentence)


_TAG_RE = re.compile(r"<[^>]+>")


def html_to_text(html: str) -> str:
    """HTML -> text (engine replacement for BeautifulSoup ``get_text``
    with separator=' ', reference models/document.py:115-121): drop tags,
    join fragments with single spaces, decode the few common entities."""
    text = _TAG_RE.sub(" ", html)
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " "),
    ):
        text = text.replace(ent, ch)
    return text
