"""Pure-Python batch kernels (no Spark imports) - the bodies of the
Arrow-batched pandas UDFs and the reference-semantics test oracle."""

from .langid import detect_language, round_score
from .ner import extract_entities
from .pos import pos_tag
from .sentenize import chunk_text, sentenize_document, split_sentences
from .text import (
    clean_sentence,
    clean_toc,
    clean_token,
    clean_word_count,
    html_to_text,
    is_accepted_token,
    is_suitable_sentence,
    normalize_token,
    tokenize,
)

__all__ = [
    "detect_language", "round_score", "extract_entities", "pos_tag", "chunk_text",
    "sentenize_document", "split_sentences", "clean_sentence", "clean_toc",
    "clean_token", "clean_word_count", "html_to_text", "is_accepted_token",
    "is_suitable_sentence", "normalize_token", "tokenize",
]
