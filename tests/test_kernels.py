"""Pure-kernel unit tests, each pinned to the reference rule it mirrors
(file:line in /root/reference)."""

from riksdagen_sentences_spark.kernels import (
    chunk_text,
    clean_sentence,
    clean_toc,
    clean_token,
    clean_word_count,
    detect_language,
    extract_entities,
    html_to_text,
    is_accepted_token,
    is_suitable_sentence,
    normalize_token,
    pos_tag,
    sentenize_document,
    split_sentences,
)


# --- sentence cleaning (models/sentence.py:71-97) -------------------------
def test_clean_sentence_strips_punct_and_digit_words():
    assert (
        clean_sentence("Ett (två) tre-fyra 5:e 2024 pris4u, ja!")
        == "Ett två trefyra ja"
    )


def test_clean_sentence_en_dash_and_slash():
    assert clean_sentence("a–b c/d") == "ab cd"


def test_clean_sentence_tabs_and_whitespace():
    assert clean_sentence("a\tb   c\nd") == "a b c d"


def test_clean_word_count_empty():
    assert clean_word_count("12 34! (56)") == 0


def test_is_suitable_sentence_needs_more_than_5_words():
    assert not is_suitable_sentence("ett två tre fyra fem")
    assert is_suitable_sentence("ett två tre fyra fem sex")
    # reference skeleton test: 'Bedömare 1' is not suitable
    # (/root/reference/tests/test_riksdagen_analyzer.py:14-16)
    assert not is_suitable_sentence("Bedömare 1")


# --- TOC cleaning (models/document.py:153-170) -----------------------------
def test_clean_toc_drops_leader_lines():
    text = "Innehåll ......... 4\nRiktigt innehåll här.\nKap 2 .... 9"
    assert clean_toc(text) == "Riktigt innehåll här."


def test_clean_toc_keeps_three_dots():
    assert clean_toc("vänta... ja") == "vänta... ja"


# --- sentenize (punkt-style; replaces models/document.py:138-146) ---------
def test_split_sentences_basic():
    assert split_sentences("Hej du. Vad gör du? Inget!") == [
        "Hej du.",
        "Vad gör du?",
        "Inget!",
    ]


def test_split_sentences_no_boundary_inside_abbrev_number():
    # a dot NOT followed by whitespace is not a boundary
    assert split_sentences("Version 1.2 är klar. Bra.") == [
        "Version 1.2 är klar.",
        "Bra.",
    ]


def test_chunk_text_backtracks_to_full_stop():
    text = ("a" * 50 + ". ") * 10  # 520 chars
    chunks = chunk_text(text, chunk_size=100)
    assert all(len(c) <= 100 for c in chunks)
    # reference semantics (models/document.py:86-113): the cut lands just
    # BEFORE a full stop (slice [start:end]) and start=end+1 skips the
    # dot, so the boundary dot itself is consumed - no letters are lost.
    assert "".join(chunks).count("a") == 500


def test_chunk_text_hard_cut_without_full_stop():
    text = "b" * 250
    chunks = chunk_text(text, chunk_size=100)
    assert chunks == ["b" * 100, "b" * 100, "b" * 48]
    # reference semantics (models/document.py:86-113): start jumps to
    # end+1, so one char is consumed at each hard cut - pinned here.


def test_sentenize_document_end_to_end():
    doc = "Innehåll .... 2\nHej du. Vad gör du?"
    assert sentenize_document(doc) == ["Hej du.", "Vad gör du?"]


# --- token rules (models/token.py) -----------------------------------------
def test_clean_token():
    assert clean_token("ab:c,d.e(f)g-h/i–j") == "abcdefghij"
    assert clean_token(" 5:e ") == "e"
    assert clean_token("2024") == ""


def test_normalize_token_keeps_punct():
    assert normalize_token(" Hej! ") == "hej!"


def test_pos_tag_rules():
    assert pos_tag("") == "SPACE"
    assert pos_tag("...") == "PUNCT"
    assert pos_tag("–") == "PUNCT"
    assert pos_tag("$") == "SYM"
    assert pos_tag("a|b") == "SYM"
    assert pos_tag("2024") == "NUM"
    assert pos_tag("pris4u") == "NUM"
    assert pos_tag("och") == "CCONJ"
    assert pos_tag("Och") == "CCONJ"
    assert pos_tag("The") == "DET"
    assert pos_tag("riksdagen") == "NOUN"


def test_is_accepted_token():
    assert is_accepted_token("och", "CCONJ", "sv")
    assert not is_accepted_token("och", "CCONJ", "xx")  # bad language
    assert not is_accepted_token("...", "PUNCT", "sv")  # postag
    assert not is_accepted_token("a1b", "NOUN", "sv")  # numeric char
    assert not is_accepted_token("a€b", "NOUN", "sv")  # unaccepted char
    assert not is_accepted_token(":", "NOUN", "sv")  # empty after clean


# --- langid (replaces models/sentence.py:193-209) --------------------------
def test_detect_language_swedish():
    lang, score = detect_language("och att det som en av den med om inte")
    assert lang == "sv"
    assert score >= 0.4


def test_detect_language_english_unambiguous():
    lang, score = detect_language("the cat sat on the mat and it was good")
    assert lang == "en"
    assert score == 1.0


def test_detect_language_empty_and_unknown():
    assert detect_language("") == ("und", 0.0)
    assert detect_language("zzz qqq xxx") == ("und", 0.0)


def test_detect_language_tie_break_order():
    # 'den med' hits sv and nb equally -> first in LANGID_ORDER (sv) wins
    lang, _ = detect_language("den med")
    assert lang == "sv"


# --- NER gazetteer (replaces models/entities.py:21-27) ---------------------
def test_extract_entities_whole_word_and_dedup():
    ents = extract_entities("riksdagen beslutar om riksdagen i stockholm")
    assert ents == [("riksdagen", "ORG"), ("stockholm", "GPE")]
    assert extract_entities("riksdagens hus") == []  # no partial match


def test_extract_entities_multiword():
    assert ("hash join", "PRODUCT") in extract_entities("a hash join b")


# --- html (replaces models/document.py:115-121) -----------------------------
def test_html_to_text():
    assert html_to_text("<p>Hej &amp; hå</p>").split() == ["Hej", "&", "hå"]
