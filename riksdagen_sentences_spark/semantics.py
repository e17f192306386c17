"""Single source of truth for the engine's text-processing semantics.

Every rule here is pinned to the reference implementation
(dpriskorn/riksdagen_sentences, read-only at /root/reference) by file:line,
and is deliberately expressed so that THREE independent implementations can
be generated from the same constants:

1. pure-Python vectorized kernels (``kernels/``) used inside Arrow-batched
   pandas UDFs,
2. Spark ``Column`` expressions (``functions/columns.py``) that stay inside
   whole-stage codegen (JVM-side, no Python),
3. DuckDB oracle SQL snippets (``oracle`` helpers below) used by the driver
   correctness gate.

Keeping the constants in one module is what guarantees Spark <-> oracle
parity by construction.

Deliberate engine-defined deviations from the reference (documented, all
strictly deterministic):

- digits are ASCII ``[0-9]`` (the reference uses ``str.isdigit()`` /
  ``str.isnumeric()``, which accept unicode digits; our corpora are ASCII
  so the rules coincide, and ``[0-9]`` is expressible identically in Java
  regex, RE2 (DuckDB) and Python ``re``),
- sentence boundary detection is punkt-style regex (``[.!?]`` + whitespace)
  instead of spaCy ``senter`` (reference models/document.py:138-146) - the
  north rule requires a vectorized batch kernel, not a 250 MB model,
- language identification is a deterministic stop-word-ratio scorer instead
  of fasttext (reference models/sentence.py:193-209),
- UUIDs are deterministic UUIDv5-style identifiers derived from sha256
  (see ``ids.py``), replacing the reference's random ``uuid.uuid4()``
  (models/sentence.py:189-191) per BASELINE.json north rule,
- the canonical rawtoken ``score`` is the MIN over all occurrences of the
  (text, lexical_category, language) key, not the reference's
  first-insert score (models/crud/insert.py:90-97): "first insert" is
  undefined under distributed/retryable execution, and MIN is the
  deterministic order-independent reduction (operators/dedup.py contract;
  the DuckDB oracle uses the identical MIN).
"""

from __future__ import annotations

import string

# ---------------------------------------------------------------------------
# Sentence-level cleaning (reference models/sentence.py:71-97)
# ---------------------------------------------------------------------------
# The reference removes "\t:()-/" and the en-dash, then strips every char in
# string.punctuation, then drops words containing digits.  string.punctuation
# is four contiguous ASCII runs; the extra chars the reference removes first
# are all inside those runs except the en-dash (U+2013).  The \t -> ' '
# replacement is a no-op because the final re-split is on whitespace.
PUNCT_CHARS = string.punctuation  # !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~
EN_DASH = "–"
# identical meaning in Java regex, RE2 and Python re:
SENTENCE_STRIP_RE = r"[!-/:-@\[-`{-~–]"
DIGIT_RE = r"[0-9]"
WS_SPLIT_RE = r"\s+"

# Suitability: strictly more than 5 clean words (models/sentence.py:63-69)
MIN_CLEAN_WORDS_EXCLUSIVE = 5
# Language-detection score gate (models/sentence.py:107-109)
MIN_LANG_SCORE = 0.4
# Accepted languages (reference config.py:5)
ACCEPTED_LANGUAGES = ("sv", "en", "nb", "de", "fr")

# ---------------------------------------------------------------------------
# Sentence boundary detection (engine-defined punkt-style rule; replaces
# spaCy senter, reference models/document.py:138-146,172-200)
# ---------------------------------------------------------------------------
# A sentence ends at . ! or ? followed by >=1 whitespace char.  We rewrite
# the boundary to a sentinel, split on the sentinel, strip, drop empties.
SENT_BOUNDARY_RE = r"([.!?])\s+"
SENT_SENTINEL = "\x01"

# Chunking (reference models/document.py:28,86-113): 100_000-char chunks,
# backtracking to the previous '.' so sentences are not cut.
CHUNK_SIZE = 100_000

# TOC cleaning (reference models/document.py:153-170): drop any line that
# contains four-or-more consecutive dots ('....').
TOC_MARKER = "...."

# ---------------------------------------------------------------------------
# Token-level rules (reference models/token.py)
# ---------------------------------------------------------------------------
# cleaned_token (models/token.py:100-118): remove \r : , . ( ) - en-dash /
# then strip, then remove all digit runs.  All the removed chars except \r
# and the en-dash are single ASCII chars; expressed as one char class.
TOKEN_STRIP_RE = r"[\r:,.()\-/–]"
# is_accepted_token (models/token.py:80-98)
UNACCEPTED_POSTAGS = ("SPACE", "PUNCT", "SYM", "X")
UNACCEPTED_CHARS = ("¶", "¤", "¥", "~", "$", "€", "|")
UNACCEPTED_CHARS_RE = r"[¶¤¥~$€|]"

# normalized_token (models/token.py:74-77): strip().lower() - punctuation
# intentionally kept.

# ---------------------------------------------------------------------------
# Deterministic language identification (engine-defined; replaces fasttext,
# reference models/sentence.py:193-209 + config.py:5-7)
# ---------------------------------------------------------------------------
# hits(lang) = #words-in-stopword-set over the CLEANED lower-cased
# sentence; detected = argmax hits (ties broken by LANGID_ORDER);
# score = round(max_hits / total_hits_across_langs, 2) - a fasttext-like
# confidence in [0,1].  No hits / empty -> ("und", 0.0).
# Word lists are small on purpose: the scorer must be cheaply expressible
# as generated SQL for the DuckDB oracle.
LANGID_STOPWORDS: dict[str, tuple[str, ...]] = {
    "sv": ("och", "att", "det", "som", "en", "av", "den", "med", "om",
           "inte", "har", "till", "ett", "han", "var", "jag", "vi"),
    "en": ("the", "and", "of", "to", "in", "that", "it", "is", "was",
           "for", "on", "with", "he", "as", "be", "at", "by"),
    "nb": ("og", "i", "det", "som", "til", "en", "av", "den", "med",
           "ikke", "har", "de", "et", "han", "var", "jeg", "vi"),
    "de": ("der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "ist", "nicht", "ein", "eine", "als"),
    "fr": ("le", "de", "la", "et", "les", "des", "en", "un", "du",
           "une", "que", "est", "dans", "qui", "pour", "pas", "au"),
}
LANGID_ORDER = tuple(LANGID_STOPWORDS)  # deterministic tie-break order
UND_LANG = "und"
SCORE_DECIMALS = 2

# Char-trigram fallback (the north star's "stop-word/char-ngram
# scoring"): when NO stop word matches, count non-overlapping trigram
# occurrences in the lower-cased cleaned sentence; detected = argmax
# hits (LANGID_ORDER tie-break), score = max/total as above.  Counting
# is (len(s) - len(replace(s, tri, ''))) / 3 - identical in Python,
# Spark and DuckDB.
LANGID_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "sv": ("sjä", "stä", "ång", "öra"),
    "en": ("the", "ing", "ion", "igh"),
    "nb": ("jeg", "ikk", "øye", "kje"),
    "de": ("sch", "ich", "ein", "ung"),
    "fr": ("eau", "oix", "eur", "çai"),
}

# ---------------------------------------------------------------------------
# Heuristic POS tagging (engine-defined; replaces spaCy pos_,
# reference models/token.py:67-68).  Evaluated in order; first match wins.
# ---------------------------------------------------------------------------
# 1. empty raw token (post-strip)                      -> SPACE
# 2. contains any UNACCEPTED_CHARS (currency/symbols)  -> SYM
# 3. every char in PUNCT_CHARS or en-dash              -> PUNCT
# 4. contains a digit                                  -> NUM
# 5. lower(token) in CLOSED_CLASS                      -> that tag
# 6. otherwise                                         -> NOUN
CLOSED_CLASS: dict[str, str] = {
    # Swedish
    "och": "CCONJ", "att": "SCONJ", "som": "SCONJ", "men": "CCONJ",
    "det": "PRON", "den": "PRON", "han": "PRON", "hon": "PRON",
    "jag": "PRON", "vi": "PRON", "de": "PRON",
    "en": "DET", "ett": "DET",
    "av": "ADP", "med": "ADP", "om": "ADP", "till": "ADP", "i": "ADP",
    "på": "ADP", "för": "ADP",
    "inte": "PART", "har": "AUX", "var": "AUX", "är": "AUX",
    # English
    "the": "DET", "a": "DET", "an": "DET",
    "and": "CCONJ", "or": "CCONJ", "but": "CCONJ", "that": "SCONJ",
    "of": "ADP", "to": "ADP", "in": "ADP", "on": "ADP", "with": "ADP",
    "at": "ADP", "by": "ADP", "from": "ADP",
    "it": "PRON", "he": "PRON", "she": "PRON", "they": "PRON", "we": "PRON",
    "is": "AUX", "was": "AUX", "be": "AUX", "are": "AUX",
}

# UPOS -> Wikidata QID (reference config/lexical_categories.yml:4-19)
LEXICAL_CATEGORIES: dict[str, str] = {
    "ADJ": "Q34698", "ADP": "Q4833830", "ADV": "Q380057", "AUX": "Q24905",
    "CCONJ": "Q36484", "DET": "Q576271", "INTJ": "Q83034", "NOUN": "Q1084",
    "NUM": "Q63116", "PART": "Q184943", "PRON": "Q36224", "PROPN": "Q147276",
    "SCONJ": "Q36484", "VERB": "Q24905", "X": "Q1084",
}

# ---------------------------------------------------------------------------
# Gazetteer NER (engine-defined; replaces spaCy doc.ents,
# reference models/entities.py:21-27).  Whole-word, case-insensitive match
# of the term inside the CLEANED sentence.  One (label, ner_label) pair is
# emitted at most once per sentence (reference models/entity.py:14-18).
# ---------------------------------------------------------------------------
GAZETTEER: tuple[tuple[str, str], ...] = (
    # corpus-vocabulary terms (driver testdata uses query-engine lorem)
    ("spark", "ORG"), ("window", "PRODUCT"), ("stream", "PRODUCT"),
    ("hash join", "PRODUCT"), ("merge", "EVENT"),
    # Swedish fixture terms
    ("sverige", "GPE"), ("riksdagen", "ORG"), ("stockholm", "GPE"),
    ("europa", "LOC"), ("anna", "PERSON"),
)

# NER labels dim (reference config/named_entity_recognition_labels.yml)
NER_LABELS: dict[str, str] = {
    "PERSON": "People, including fictional",
    "ORG": "Companies, agencies, institutions",
    "GPE": "Countries, cities, states",
    "LOC": "Non-GPE locations",
    "PRODUCT": "Objects, vehicles, foods, etc.",
    "EVENT": "Named hurricanes, battles, wars, sports events",
}

# ---------------------------------------------------------------------------
# Wikidata-lexeme dictionary (engine-defined synthetic dim; the reference
# schema exists but its write path is unimplemented -
# models/crud/insert.py:183-196).  linksTo when normalized token == form
# and sentence language == lang.
# ---------------------------------------------------------------------------
LEXEME_DICTIONARY: tuple[tuple[str, str, str, str], ...] = (
    # (lexeme_id, form, lang, category_qid)
    ("L1", "och", "sv", "Q36484"),
    ("L2", "att", "sv", "Q36484"),
    ("L3", "riksdagen", "sv", "Q1084"),
    ("L4", "tal", "sv", "Q1084"),
    ("L5", "land", "sv", "Q1084"),
    ("L6", "the", "en", "Q576271"),
    ("L7", "scan", "en", "Q1084"),
    ("L8", "join", "en", "Q1084"),
    ("L9", "window", "en", "Q1084"),
    ("L10", "sort", "en", "Q1084"),
    ("L11", "table", "en", "Q1084"),
    ("L12", "stream", "en", "Q1084"),
    ("L13", "hash", "en", "Q1084"),
    ("L14", "merge", "en", "Q1084"),
    ("L15", "spark", "en", "Q1084"),
)

# Languages dim (reference config/languages.yml subset)
LANGUAGES: tuple[tuple[str, str, str], ...] = (
    # (iso_code, name_en, qid)
    ("sv", "Swedish", "Q9027"),
    ("en", "English", "Q1860"),
    ("nb", "Norwegian Bokmal", "Q25167"),
    ("de", "German", "Q188"),
    ("fr", "French", "Q150"),
    ("da", "Danish", "Q9035"),
    ("es", "Spanish", "Q1321"),
    ("zh", "Chinese", "Q7850"),
    ("und", "Undetermined", "Q22282914"),
)

# ---------------------------------------------------------------------------
# Planted mixed-language fixture documents.
#
# The driver testdata (TESTDATA.md) is monolingual English lorem, so
# every language-dimension query (sv counts, the cross-language Q2
# self-join, the rawtoken<->sentence language-mismatch repair - reference
# sql/count_language_id_mismatches.sql:1-8 and
# sql/delete_language_mismatches_between_rawtoken_and_sentence.sql:1-11)
# would otherwise pass vacuously on zero rows.  These deterministic docs
# are appended to the document source on BOTH the Spark side
# (plans/corpus._docs) and the DuckDB oracle side (corpus.sentence_ctes),
# so every downstream count moves consistently and the language
# dimension carries real evidence:
#
# - sv_planted_0/1: pure-Swedish sentences (sv-exclusive stop words ->
#   lang='sv', score near 1.0) mentioning ONLY the gazetteer entities
#   {sverige, riksdagen} - a mention-graph component disjoint from the
#   English corpus terms.
# - sv_planted_2: mentions ONLY {stockholm, europa} - a second disjoint
#   component of a different size.
# - sv_planted_3: mentions ONLY {anna} - a third, smallest component.
# - mixed_planted_0: one accepted sv sentence + one accepted en sentence
#   in the SAME document (fires the cross-language pair self-join); its
#   en sentence is the target of the planted legacy mismatch edge in the
#   repair queries.  Neither sentence mentions any gazetteer entity, so
#   the component structure above is unaffected.
#
# Word-choice constraints (why these exact words): "och att om inte till
# ett jag" appear ONLY in the sv stop-word list (no overlap with
# nb/de/fr), pushing the sv score up; filler words (menar/ser/bor/kvar/
# idag/nu/hem/kommer) are in NO stop-word list; nothing contains digits,
# '....' (TOC rule) or a corpus gazetteer term (spark/window/stream/
# hash join/merge).
# ---------------------------------------------------------------------------
PLANTED_LANG_DOCS: tuple[tuple[str, str], ...] = (
    ("sv_planted_0",
     "Och att om inte till ett jag menar riksdagen och sverige. "
     "Att och om inte till ett jag ser sverige och riksdagen nu."),
    ("sv_planted_1",
     "Om och att inte till ett jag har riksdagen och sverige kvar. "
     "Och att om inte till ett jag det den han var vi har."),
    ("sv_planted_2",
     "Och att om inte till ett jag bor stockholm och europa nu. "
     "Att om och inte till ett jag ser europa och stockholm idag."),
    ("sv_planted_3",
     "Och att om inte till ett jag anna kommer hem idag nu."),
    ("mixed_planted_0",
     "Och att om inte till ett jag den det har som var vi. "
     "The and of to in that it was for on with he as be foo."),
)

# The planted legacy language-mismatch edge (reference repair scenario,
# sql/delete_language_mismatches_between_rawtoken_and_sentence.sql): the
# engine's invariant makes organic mismatches impossible (token language
# IS the sentence language), so the repair queries run over the real
# occursIn edge set UNION one simulated pre-repair dirty edge linking
# this sv rawtoken to the en sentence of this document.
LEGACY_MISMATCH_RAWTOKEN = ("riksdagen", "sv")
LEGACY_MISMATCH_DOC = "mixed_planted_0"

# Triple predicates (the reference's link tables, create.py:106-155)
PRED_PART_OF = "partOf"
PRED_HAS_TEXT = "hasText"
PRED_OCCURS_IN = "occursIn"
PRED_NORMALIZES_TO = "normalizesTo"
PRED_MENTIONS = "mentions"
PRED_LINKS_TO = "linksTo"
