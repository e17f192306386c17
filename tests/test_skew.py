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


def test_decontamination_balanced_under_hot_shingle(spark):
    """Planted skew for the curation suite: one source holds 50% of all
    docs and ONE benchmark shingle recurs at high multiplicity across
    them.  The corpus-side shingle explode feeds a BROADCAST semi-join,
    so there must be NO exchange keyed on the (skewed) shingle - the
    corpus keeps its input partitioning and task row-counts stay
    balanced regardless of shingle multiplicity."""
    from riksdagen_sentences_spark.operators import curation as CU

    hot_phrase = " ".join(f"hot{i}" for i in range(CU.DECONTAM_K))
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit("hotsrc"))
        .otherwise(F.concat(F.lit("src"), F.col("id") % 7))
        .alias("source"),
        F.when(
            F.col("id") % 2 == 0,
            # hot source: every doc contains the SAME benchmark shingle
            F.concat_ws(
                " ",
                F.lit(hot_phrase),
                F.concat(F.lit("tail"), F.col("id")),
                F.lit(hot_phrase),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}x"), F.col("id"))
                    for j in range(CU.DECONTAM_K + 2)
                ],
            )
        )
        .alias("text"),
    ).repartition(16)
    bench = spark.createDataFrame([(0, hot_phrase)], "doc_id long, text string")
    bad = CU.contaminated_doc_ids(docs, bench)
    # all 1000 hot-source docs flagged, none of the cold ones
    assert bad.count() == 1000
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the CORPUS side must never shuffle by the skewed shingle: a
    # corpus-side repartition would show up as a SortMergeJoin or a
    # second shingle exchange.  Exactly ONE shingle exchange is
    # expected - the MB-scale benchmark dedup feeding BroadcastExchange.
    assert "SortMergeJoin" not in plan
    shingle_exchanges = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "shingle" in line
    ]
    assert len(shingle_exchanges) == 1
    assert "BroadcastExchange" in plan
    # direct balance evidence: the exploded corpus shingles keep the
    # input partitioning, so the hot shingle cannot concentrate a task
    doc_sh = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(CU._grams_col(F.col("text"), CU.DECONTAM_K))
        ).alias("shingle"),
    )
    sizes = [
        r["n"]
        for r in doc_sh.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes))
    # survivor side: the anti-join stays broadcast too
    surv_plan = (
        CU.decontaminate(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert surv_plan.count("BroadcastHashJoin") >= 2  # semi + anti


def test_packing_range_shuffle_balanced_under_token_skew(spark):
    """Sequence packing range-partitions on the UNIQUE order key, so a
    hot source with 1000x token mass cannot concentrate rows: partition
    row-counts stay balanced and the prefix sums remain exact."""
    from riksdagen_sentences_spark.operators import packing as PK

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(10_000))
        .otherwise(F.lit(10))
        .cast("bigint")
        .alias("tokens"),
    ).repartition(16)
    ps = PK.prefix_sum(docs, "tokens", "doc_id", n_partitions=8)
    # correctness under skewed values
    got = {r["doc_id"]: r["prefix"] for r in ps.collect()}
    run = 0
    for i in range(4000):
        run += 10_000 if i % 2 == 0 else 10
        assert got[i] == run
    # row balance of the actual range partitioning (same op the
    # operator runs): max/mean task rows bounded
    sizes = [
        r["n"]
        for r in docs.repartitionByRange(8, F.col("doc_id"))
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) <= 2.0 * (sum(sizes) / len(sizes))


def test_dedup_expansion_correct_under_hot_content(spark):
    """Planted skew for the content-addressed build: ONE content (think
    a license file / empty __init__) is shared by 50% of all files, so
    the expansion join's mapping side concentrates on a single
    content_sha.  Correctness must hold exactly (dedup == naive row
    set), and the runtime mitigation for the scale case - AQE skew-join
    splitting the hot mapping partition while duplicating the skeleton
    side - must be armed in the session."""
    base = files_table(spark, n_rows=40, seed=42)
    hot_text = base.orderBy("repo", "path", "commit").first()["content"]
    hot = spark.range(40).select(
        F.lit("hotrepo").alias("repo"),
        F.concat(F.lit("dup/"), F.col("id"), F.lit(".txt")).alias("path"),
        F.lit("c0").alias("commit"),
        F.lit("text").alias("lang"),
        F.lit(hot_text).alias("content"),
    )
    files = base.unionByName(hot).repartition(16)
    naive = P.triples(spark, P.docs_from_files(files))
    dedup = P.triples_dedup(spark, files)
    assert sorted(map(tuple, dedup.collect())) == sorted(
        map(tuple, naive.collect())
    )
    # the designed mitigation at scale: hot mapping partitions are
    # split at runtime (sha keys are uniform EXCEPT mass-shared
    # contents, where the output rows are genuinely that many)
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_prefix_jaccard_hot_shingle_excluded_from_prefixes(spark):
    """A boilerplate shingle shared by EVERY document is the skew bomb
    for a similarity self-join: joined naively it alone contributes
    n_docs^2 candidate pairs.  Under the rare-first (df ASC) global
    order the prefix filter puts the hottest shingle in almost no
    prefix, so the candidate join never sees it."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from riksdagen_sentences_spark.operators.neardup import (
        _doc_shingles,
        prefix_jaccard_pairs,
    )

    n_docs, t_num, t_den = 60, 1, 2
    rows = [
        (
            i,
            " ".join(f"u{i}w{j}" for j in range(8)) + " common phrase here",
        )
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    # replicate the operator's prefix construction and pin the skew
    # defense: the df=n_docs boilerplate shingle sits in ZERO prefixes
    toks = _doc_shingles(docs, "text").select(
        F.col("doc_id").alias("doc"), F.col("shingle").alias("term")
    )
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    sizes = toks.groupBy("doc").agg(F.count("*").alias("sz"))
    w = Window.partitionBy("doc").orderBy(F.col("df").asc(),
                                          F.col("term").asc())
    ranked = (
        toks.join(dfreq, "term")
        .withColumn("r", F.row_number().over(w))
        .join(sizes, "doc")
    )
    alpha = F.floor(
        (F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den)
    )
    pref = ranked.filter(F.col("r") <= F.col("sz") - alpha + 1)
    hot_in_prefix = pref.filter(
        F.col("term") == "common phrase here"
    ).count()
    assert hot_in_prefix == 0
    # and the full operator agrees with the (empty) truth: no pair of
    # these documents reaches J >= 1/2 on one shared shingle
    assert prefix_jaccard_pairs(docs, t_num=t_num, t_den=t_den).count() == 0
