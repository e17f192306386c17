"""SQL-view interface tests: the reference's sql/ corpus shape runs as
near-verbatim Spark SQL over the registered graph views."""

from riksdagen_sentences_spark.plans import materialize as M
from riksdagen_sentences_spark.plans import pipeline as P
from riksdagen_sentences_spark.plans import views as V
from riksdagen_sentences_spark.sources.synth import files_table


def test_reference_sql_runs_verbatim(spark):
    docs = P.docs_from_files(files_table(spark, n_rows=200, seed=42))
    tables = M.build_all_tables(spark, docs)
    V.register_graph_views(
        spark,
        tables["sentences"],
        tables["rawtokens"],
        tables["normtokens"],
        tables["entities"],
        tables["triples"],
    )
    n_sv = spark.sql(
        V.SQL_COUNT_SENTENCES_BY_LANG.format(iso="sv")
    ).first()["n"]
    assert n_sv > 0
    assert n_sv == tables["sentences"].filter("lang = 'sv'").count()

    ents = spark.sql(
        V.SQL_SENTENCES_WITH_ENTITIES.format(iso="sv")
    ).collect()
    assert len(ents) > 0
    assert all(r["description"] for r in ents)

    cats = spark.sql(V.SQL_LINK_COUNTS_BY_CATEGORY).collect()
    assert len(cats) > 0
    assert all(r["qid"].startswith("Q") for r in cats)


def test_evidence_docs_counts_match_registry():
    """COVERAGE.md / STATUS.md advertise the query-corpus size; derive
    the number from corpus.QUERIES so the docs can't drift (VERDICT r4
    item #7 - hand-edited counts went stale twice)."""
    import os

    from riksdagen_sentences_spark.plans import corpus

    n = len(corpus.QUERIES)
    n_oracled = sum(1 for q in corpus.QUERIES if corpus.ORACLES.get(q))
    marker = f"{n} registered / {n_oracled} oracled"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for doc in ("COVERAGE.md", "STATUS.md"):
        text = open(os.path.join(repo, doc)).read()
        assert marker in text, (
            f"{doc} is out of sync with corpus.QUERIES: expected the "
            f"literal marker {marker!r}"
        )
