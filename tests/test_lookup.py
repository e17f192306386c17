"""Lookup API semantics tests (A1-A4)."""

import pytest

from riksdagen_sentences_spark.plans import lookup as L
from riksdagen_sentences_spark.plans import pipeline as P
from riksdagen_sentences_spark.sources.synth import files_table


def test_is_compound_token():
    assert L.is_compound_token("ett land")
    assert not L.is_compound_token("land")


def test_compound_token_without_syntactic_head():
    assert L.compound_token_without_syntactic_head("ett land", "land") == "ett"


def test_validate_lookup_params():
    L.validate_lookup_params("och", "Q36484", "sv")
    with pytest.raises(ValueError, match="iso"):
        L.validate_lookup_params("och", "Q36484", "zz")
    with pytest.raises(ValueError, match="lexical_category"):
        L.validate_lookup_params("och", "Q999", "sv")
    with pytest.raises(ValueError, match="non-empty"):
        L.validate_lookup_params("", "Q36484", "sv")


def test_lookup_simple_and_count(spark):
    docs = P.docs_from_files(files_table(spark, n_rows=150, seed=42))
    page = L.lookup_sentences(spark, docs, "och", "Q36484", "sv", limit=5)
    rows = page.collect()
    assert 0 < len(rows) <= 5
    # ordered by length then id
    lens = [r["n_chars"] for r in rows]
    assert lens == sorted(lens)
    for r in rows:
        assert " och " in f" {r['text'].lower()} "
        assert r["lang"] == "sv"
    total = L.lookup_count(spark, docs, "och", "Q36484", "sv").first()["total"]
    assert total >= len(rows)


def test_lookup_compound(spark):
    docs = P.docs_from_files(files_table(spark, n_rows=150, seed=42))
    page = L.lookup_sentences(spark, docs, "och att", "Q1084", "sv", limit=5)
    for r in page.collect():
        assert "och att" in r["text"].lower()
