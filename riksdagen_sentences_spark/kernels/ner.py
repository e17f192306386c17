"""Gazetteer NER kernel (deterministic dictionary matcher).

Replaces spaCy ``doc.ents`` (/root/reference/models/entities.py:21-27)
with whole-word, case-insensitive matching of a broadcast gazetteer inside
the CLEANED sentence (single-space separated, punctuation-free), so a term
match is exactly ``' term ' in ' ' + cleaned.lower() + ' '``.  Each
(label, ner_label) pair is emitted at most once per sentence (set
semantics, reference models/entity.py:14-18 + models/entities.py:14).
"""

from __future__ import annotations

from .. import semantics as S


def extract_entities(
    cleaned_sentence: str,
    gazetteer: tuple[tuple[str, str], ...] = S.GAZETTEER,
) -> list[tuple[str, str]]:
    """Return unique (label, ner_label) pairs found in the sentence, in
    gazetteer order (deterministic)."""
    padded = " " + cleaned_sentence.lower() + " "
    return [
        (label, ner_label)
        for label, ner_label in gazetteer
        if f" {label} " in padded
    ]
