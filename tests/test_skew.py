"""Skew stress: Zipfian keys + one hot repo (the north rule's motivating
case).  Verifies the salted two-phase dedup is (a) correct under extreme
hot keys, (b) actually splits the hot key across salt buckets in phase 1,
and (c) the pipeline survives a hot repo holding ~30% of all rows with
100x content."""

import pytest
from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators.dedup import salted_dedup
from riksdagen_sentences_spark.plans import pipeline as P
from riksdagen_sentences_spark.sources.synth import HOT_REPO, files_table


def test_salted_dedup_correct_under_hot_key(spark):
    # 50k rows of one hot key + 1k distinct cold keys
    hot = spark.range(50000).select(
        F.lit("och").alias("text"),
        F.lit("CCONJ").alias("pos"),
        F.lit("sv").alias("lang"),
        (F.col("id") % 7 + 1).cast("double").alias("score"),
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("w"), F.col("id")).alias("text"),
        F.lit("NOUN").alias("pos"),
        F.lit("sv").alias("lang"),
        F.lit(0.9).alias("score"),
    )
    df = hot.unionByName(cold).repartition(16)
    out = salted_dedup(df, keys=["text", "pos", "lang"], salt_buckets=8)
    rows = {r["text"]: r["score"] for r in out.collect()}
    assert len(rows) == 1001
    assert rows["och"] == 1.0  # min over the hot key's 7 score values
    assert rows["w0"] == 0.9


def test_salted_phase1_splits_hot_key(spark):
    """Phase 1 must output multiple rows for the hot key (one per salt
    bucket it appeared in) - that is the skew defusal."""
    hot = spark.range(4000).select(
        F.lit("och").alias("k"), F.lit(1.0).alias("v")
    ).repartition(16)
    salted = hot.withColumn(
        "__salt", F.pmod(F.spark_partition_id(), F.lit(8))
    )
    phase1 = salted.groupBy("k", "__salt").agg(F.min("v").alias("v"))
    n = phase1.count()
    assert 1 < n <= 8  # hot key split across buckets, bounded by salts


def test_pipeline_with_extreme_hot_repo(spark):
    files = files_table(spark, n_rows=400, seed=11, hot_fraction=0.5)
    # amplify: hot repo's docs get 100x content
    amplified = files.withColumn(
        "content",
        F.when(
            F.col("repo") == HOT_REPO,
            F.concat_ws(" ", *[F.col("content")] * 100),
        ).otherwise(F.col("content")),
    )
    docs = P.docs_from_files(amplified)
    t = P.triples(spark, docs, cache=True)
    counts = {r["pred"]: r["count"] for r in t.groupBy("pred").count().collect()}
    assert counts.get("partOf", 0) > 0
    assert counts.get("occursIn", 0) > 0
    # dedup invariant: partOf edges == distinct sentences
    sents = P.sentences(P.sentence_base(docs))
    assert counts["partOf"] == sents.count()


def test_html_ingestion_path(spark):
    files = spark.createDataFrame(
        [
            ("r", "a.html", "c1", "sv",
             "<html><body><p>Och att det som en av den med stora beslut."
             "</p><p>Det har inte varit ett svar till han och jag.</p>"
             "</body></html>"),
            ("r", "b.txt", "c2", "sv",
             "Och att det som en av den med andra beslut."),
        ],
        "repo string, path string, commit string, lang string, content string",
    )
    docs = P.docs_from_files(files, strip_html=True)
    texts = [
        r["text"]
        for r in P.sentences(P.sentence_base(docs)).collect()
    ]
    assert any("stora beslut" in t for t in texts)
    assert all("<" not in t for t in texts)
    assert any("andra beslut" in t for t in texts)


def test_salted_dedup_check_dependence_raises(spark):
    """check_dependence must catch a non-key column with >1 distinct
    value per key (the contract-violation footgun)."""
    df = spark.createDataFrame(
        [("k", 1.0), ("k", 2.0)], "text string, payload double"
    )
    with pytest.raises(ValueError, match="distinct value"):
        salted_dedup(
            df, keys=["text"], salt_buckets=4, check_dependence=True
        )
    # the same frame without the check reduces with MIN (documented)
    out = salted_dedup(df, keys=["text"], salt_buckets=4).collect()
    assert out[0]["payload"] == 1.0


def test_links_to_broadcast_holds_at_100k_dict(spark):
    """The 15-entry demo dict never exercises the broadcast budget; the
    ~100k-entry production-sized dict must (a) still plan as a broadcast
    hash join (no shuffle of the token side), (b) keep every demo-dict
    match, and (c) find planted synthetic-form matches."""
    from riksdagen_sentences_spark.sources import dims

    files = files_table(spark, n_rows=300, seed=7)
    toks = P.token_base(P.sentence_base(P.docs_from_files(files)))
    big = dims.synthetic_lexeme_dictionary(spark, n=100_000)
    assert big.count() == 100_000
    edges_big = P.links_to_edges(toks, spark, lexemes=big)
    plan = edges_big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    big_set = {(r["subj"], r["obj"]) for r in edges_big.collect()}
    demo_set = {
        (r["subj"], r["obj"])
        for r in P.links_to_edges(toks, spark).collect()
    }
    assert demo_set <= big_set  # demo entries are a verbatim subset
    # synthetic-form match: id 20 -> form 'zlexca', lang 'sv' (20 % 5
    # = 0).  Feed token rows directly so the check pins the JOIN, not
    # the language detector.
    direct = spark.createDataFrame(
        [
            ("zlexca", "NOUN", "sv", "zlexca", True),
            ("missing", "NOUN", "sv", "missing", True),
        ],
        "raw string, pos string, lang string, norm string, "
        "tok_accepted boolean",
    )
    hits = P.links_to_edges(direct, spark, lexemes=big).collect()
    assert [r["obj"] for r in hits] == ["L920"]


def test_check_dependence_null_sensitive(spark):
    """A key group holding {NULL, 'x'} genuinely disagrees - the guard
    must catch it even though countDistinct on the bare column would
    report 1 (ADVICE r2)."""
    import pytest

    from riksdagen_sentences_spark.operators.dedup import salted_dedup

    df = spark.createDataFrame(
        [("k", None), ("k", "x")], "key string, val string"
    )
    with pytest.raises(ValueError, match="distinct value"):
        salted_dedup(df, ["key"], check_dependence=True)
