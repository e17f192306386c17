"""Sentence boundary detection kernel (punkt-style, deterministic).

Replaces the reference's spaCy ``senter`` path
(/root/reference/models/document.py:86-200): chunk the document into
<=100k-char chunks backtracking to the previous '.', TOC-clean each chunk,
then split on ``[.!?]`` + whitespace.  Pure Python, batch-applied inside a
pandas UDF (functions/udfs.py) - never per-row across the JVM boundary.
"""

from __future__ import annotations

import re

from .. import semantics as S
from .text import clean_toc

_BOUNDARY = re.compile(S.SENT_BOUNDARY_RE, re.ASCII)


def chunk_text(text: str, chunk_size: int = S.CHUNK_SIZE) -> list[str]:
    """Chunking per reference models/document.py:86-113: cut at chunk_size,
    backtrack to the previous '.', hard-cut if none found."""
    n = len(text)
    if n <= chunk_size:
        return [text]
    chunks: list[str] = []
    start = 0
    while start < n:
        end = start + chunk_size
        if end < n:
            while end > start and text[end] != ".":
                end -= 1
        if end == start:
            end = start + chunk_size
        chunks.append(text[start:end])
        start = end + 1 if end + 1 < n else n
    return chunks


def split_sentences(chunk: str) -> list[str]:
    """Punkt-style boundary split: rewrite ``[.!?]\\s+`` boundaries to a
    sentinel, split, strip, drop empties.  The terminating punctuation
    char stays attached to its sentence."""
    from .text import ascii_strip

    marked = _BOUNDARY.sub(r"\1" + S.SENT_SENTINEL, chunk)
    return [
        s
        for s in (ascii_strip(p) for p in marked.split(S.SENT_SENTINEL))
        if s
    ]


def sentenize_document(text: str) -> list[str]:
    """Full document -> sentence list: chunk -> TOC-clean -> boundary split
    (reference order: models/document.py:172-200)."""
    out: list[str] = []
    for chunk in chunk_text(text):
        out.extend(split_sentences(clean_toc(chunk)))
    return out
