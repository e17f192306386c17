"""Content-addressed graph construction (pipeline.triples_dedup).

The dedup-aware build must be ROW-SET IDENTICAL to the naive
``triples(docs_from_files(files))`` on any files table - duplication
across commits, across repos, no duplication at all, and through both
NER dispatch paths (contains chain and the >200-term broadcast join,
where the expansion key rides an opaque struct sentence_id).  The
reference has no cross-document dedup at all (it dedups PDF *downloads*
by md5 naming, models/providers/folketinget_file.py:37-55); the
content-addressed compute is this repo's scale path for the 10^12-file
north rule, so equality with the naive plan is the correctness pin.
"""

import pytest
from pyspark.sql import functions as F

from riksdagen_sentences_spark.plans import pipeline as P
from riksdagen_sentences_spark.sources import dims
from riksdagen_sentences_spark.sources.synth import files_table


@pytest.fixture(scope="module")
def dup_files(spark):
    """300 base files + a full copy at another commit + a partial copy
    in another repo: contents appear 1x, 2x and 3x."""
    f1 = files_table(spark, n_rows=300, seed=42)
    f2 = f1.withColumn("commit", F.concat(F.lit("dup0-"), F.col("commit")))
    f3 = (
        f1.limit(120)
        .withColumn("repo", F.concat(F.lit("fork/"), F.col("repo")))
        .withColumn("commit", F.concat(F.lit("dup1-"), F.col("commit")))
    )
    return f1.unionByName(f2).unionByName(f3).cache()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dedup_equals_naive_on_duplicated_corpus(spark, dup_files):
    naive = _rows(P.triples(spark, P.docs_from_files(dup_files)))
    dedup = _rows(P.triples_dedup(spark, dup_files))
    assert len(naive) > 0
    assert dedup == naive


def test_dedup_equals_naive_without_duplication(spark):
    files = files_table(spark, n_rows=120, seed=7).cache()
    naive = _rows(P.triples(spark, P.docs_from_files(files)))
    dedup = _rows(P.triples_dedup(spark, files))
    assert dedup == naive


def test_dedup_with_join_dispatched_gazetteer(spark, dup_files):
    """The struct expansion key must survive mention_rows' >200-term
    join path (explode + broadcast join on the n-gram)."""
    gaz = dims.synthetic_gazetteer(spark, n=1000)
    naive = _rows(
        P.triples(spark, P.docs_from_files(dup_files), gazetteer=gaz)
        .filter(F.col("pred") == "mentions")
    )
    dedup = _rows(
        P.triples_dedup(spark, dup_files, gazetteer=gaz).filter(
            F.col("pred") == "mentions"
        )
    )
    assert dedup == naive


def test_dedup_empty_input(spark):
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, "
        "content string"
    )
    assert P.triples_dedup(spark, empty).count() == 0


def test_content_only_edges_not_multiplied(spark, dup_files):
    """normalizesTo/linksTo are global sets: tripling the corpus via
    duplication must not change them."""
    base = files_table(spark, n_rows=300, seed=42)
    one = _rows(
        P.triples_dedup(spark, base).filter(
            F.col("pred").isin("normalizesTo", "linksTo")
        )
    )
    three = _rows(
        P.triples_dedup(spark, dup_files).filter(
            F.col("pred").isin("normalizesTo", "linksTo")
        )
    )
    assert one == three
