"""riksdagen_sentences_spark - a brand-new PySpark-native KG-construction
engine with the capabilities of dpriskorn/riksdagen_sentences.

See SURVEY.md for the blueprint and semantics.py for the single source of
truth on every text-processing rule.
"""

__version__ = "0.1.0"
