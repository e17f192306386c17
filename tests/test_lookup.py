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


def test_normalize_lookup_body_evolvable_defaults():
    """Reference models/api/__init__.py:160-240: missing fields are
    replaced by default stubs in the echoed document; data and errors
    coexist; read-only information field always present."""
    from riksdagen_sentences_spark.plans.lookup import (
        DEFAULT_FIELDS,
        normalize_lookup_body,
    )

    # fully-formed simple-token request -> no errors, params extracted
    body = {
        "data": {
            "token": {"type": "text", "name": "token", "value": "och"},
            "lexical_category_qid": {"type": "text", "value": "Q36484"},
            "iso_language_code": {"type": "text", "value": "sv"},
        }
    }
    params, data, errors = normalize_lookup_body(body)
    assert errors == []
    assert params == {
        "token": "och",
        "lexical_category_qid": "Q36484",
        "iso_language_code": "sv",
    }
    assert data["information"]["read-only"] is True

    # empty data object is falsy -> treated as missing, exactly like the
    # reference's `if body.get("data"):` truthiness check
    params, data, errors = normalize_lookup_body({"data": {}})
    assert errors == ["data object is missing"]

    # present-but-valueless fields -> defaulted stubs + empty-token error
    params, data, errors = normalize_lookup_body(
        {"data": {"token": {"value": ""}}}
    )
    assert params["token"] == ""
    assert data["token"] == DEFAULT_FIELDS["token"]
    assert "Token cannot be empty." in errors

    # simple token missing its category -> field-specific error AND the
    # defaulted stub echoed back
    params, data, errors = normalize_lookup_body(
        {"data": {"token": {"value": "och"},
                  "iso_language_code": {"value": "sv"}}}
    )
    assert any("lexical_category_qid" in e for e in errors)
    assert data["lexical_category_qid"]["value"] == ""

    # compound token (has a space) needs only token + iso code
    params, data, errors = normalize_lookup_body(
        {"data": {"token": {"value": "table scan"},
                  "iso_language_code": {"value": "en"}}}
    )
    assert errors == []

    # missing data object entirely
    params, data, errors = normalize_lookup_body({})
    assert errors == ["data object is missing"]
    assert set(data) == set(DEFAULT_FIELDS)


def test_lookup_from_catalog_matches_pipeline(spark, tmp_path):
    """The materialized serving path (VERDICT r2 #6): same rows as the
    pipeline-derived lookup, but the plan reads the at-rest tables with
    a partition-pruned sentences scan (compound path) and a
    zero-shuffle-Exchange bucketed semi-join (simple path).  Reference
    analog: models/crud/read.py:122-165 serves from the store."""
    from riksdagen_sentences_spark.plans import pipeline as P
    from riksdagen_sentences_spark.plans.lookup import (
        SERVE_SENTENCES,
        lookup_from_catalog,
        lookup_sentences,
        materialize_serving_tables,
    )
    from riksdagen_sentences_spark.sources.tables import ParquetCatalog

    docs = P.docs_from_documents(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    )
    cat = ParquetCatalog(spark, str(tmp_path / "serve_lake"))
    pfx = "tlkp_"
    materialize_serving_tables(spark, docs, cat, n_buckets=4, prefix=pfx)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # simple-token path: rows equal to the pipeline-derived lookup
        served = lookup_from_catalog(
            spark, cat, "scan", "Q1084", "en", limit=20, offset=5,
            prefix=pfx,
        )
        derived = lookup_sentences(
            spark, docs, "scan", "Q1084", "en", limit=20, offset=5
        )
        assert [tuple(r) for r in served.collect()] == [
            tuple(r) for r in derived.collect()
        ]
        # zero shuffle Exchange in the simple-token serving plan: the
        # edges->sentences semi-join rides the co-located buckets (the
        # only allowed Exchange is the broadcast of the tiny id probe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        served2 = lookup_from_catalog(
            spark, cat, "scan", "Q1084", "en", prefix=pfx
        )
        served2.collect()
        plan = served2._jdf.queryExecution().executedPlan().toString()
        import re

        shuffles = re.findall(r"Exchange (\w+)", plan)
        assert all("hashpartitioning" not in s for s in shuffles), plan[:3000]

        # compound-token path: the sentences scan is partition-pruned to
        # the one requested language directory
        compound = lookup_from_catalog(
            spark, cat, "table scan", "Q1084", "en", prefix=pfx
        )
        compound.collect()
        cplan = compound._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in cplan
        assert "lang" in cplan.split("PartitionFilters")[1][:200]
        cderived = lookup_sentences(
            spark, docs, "table scan", "Q1084", "en"
        )
        assert [tuple(r) for r in compound.collect()] == [
            tuple(r) for r in cderived.collect()
        ]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (pfx + SERVE_SENTENCES, pfx + "serve_occursin",
                  pfx + "serve_rawtokens"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
