"""Curation operators: repetition signals, decontamination, stratified
sampling (operators/curation.py)."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators import curation as CU


def test_repetition_stats_flags_duplicated_ngrams_and_lines(spark):
    docs = spark.createDataFrame(
        [
            # "a b c" appears twice among 4 3-grams -> dup ratio 0.25
            (1, "a b c d a b c"),
            (2, "all words unique here now"),          # ratio 0
            (3, "x\ny\nx\n  \nz"),                     # dup line 1/4
            (4, "ab"),                                 # < k words
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in CU.repetition_stats(docs).collect()}
    assert got[1]["total_ngrams"] == 5
    assert got[1]["dup_ngram_ratio"] == 0.2  # 1 dup occurrence of 5
    assert got[2]["dup_ngram_ratio"] == 0.0
    assert got[3]["total_lines"] == 4 and got[3]["dup_line_ratio"] == 0.25
    assert got[4]["total_ngrams"] == 0 and got[4]["dup_ngram_ratio"] == 0.0


def test_decontaminate_catches_partial_overlap(spark):
    phrase = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, f"prefix words then {phrase} and a tail"),  # contaminated
            (2, "totally unrelated content with no overlap at all"),
            (3, phrase),  # benchmark doc itself
        ],
        "doc_id bigint, text string",
    )
    bench = docs.filter(F.col("doc_id") == 3)
    bad = {
        r["doc_id"] for r in CU.contaminated_doc_ids(docs, bench).collect()
    }
    assert bad == {1, 3}  # partial overlap caught, not just identity
    kept = {r["doc_id"] for r in CU.decontaminate(docs, bench).collect()}
    assert kept == {2}


def test_stratified_sample_deterministic_and_weighted(spark):
    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
    )
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.0}
    a = sorted(map(tuple, CU.stratified_sample(docs, weights).collect()))
    b = sorted(map(tuple, CU.stratified_sample(docs, weights).collect()))
    assert a == b  # reproducible, not rand()-dependent
    by_src = {}
    for _, src in a:
        by_src[src] = by_src.get(src, 0) + 1
    assert by_src.get("src0") == 1000          # weight 1.0 keeps all
    assert 400 <= by_src.get("src1", 0) <= 600  # ~0.5 of 1000
    assert "src2" not in by_src                # explicit 0
    assert "src3" not in by_src                # absent -> dropped


def test_distributed_prefix_sum_matches_sequential(spark):
    """Two-phase range-partitioned prefix sum == the sequential answer,
    across partition boundaries, and with no single-partition global
    window in the plan."""
    import random

    from riksdagen_sentences_spark.operators import packing as PK

    rng = random.Random(13)
    rows = [(i, rng.randint(1, 500)) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens bigint")
    got = {
        r["doc_id"]: r["prefix"]
        for r in PK.prefix_sum(df, "tokens", "doc_id", n_partitions=7)
        .collect()
    }
    run, exp = 0, {}
    for i, t in rows:
        run += t
        exp[i] = run
    assert got == exp
    # the plan's windows are all partitioned by __pid - a global
    # orderBy-only window (the single-task scale-killer) never appears
    plan = (
        PK.prefix_sum(df, "tokens", "doc_id", n_partitions=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for line in plan.splitlines():
        if "Window " in line or "Window[" in line:
            assert "partitionBy" not in line or "__pid" in line


def test_pack_into_bins_contiguous_with_overflow(spark):
    from riksdagen_sentences_spark.operators import packing as PK

    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 10), (5, 100)],
        "doc_id bigint, tokens bigint",
    )
    got = {
        r["doc_id"]: r["bin"]
        for r in PK.pack_into_bins(df, 100, n_partitions=3).collect()
    }
    # prefixes: 60,120,180,190,290 -> exclusive starts 0,60,120,180,190
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_prefix_sum_materializes_range_shuffle_once(spark):
    """The range-partitioned narrow frame is localCheckpoint'ed eagerly:
    the returned plan reads the checkpointed RDD (Scan ExistingRDD) and
    contains NO rangepartitioning exchange - so the offsets job and the
    result job consume the SAME materialized partition assignment
    (RangePartitioner re-sampling between jobs can otherwise move rows
    across partitions at scale) and the input is scanned exactly once
    after the shuffle."""
    from riksdagen_sentences_spark.operators import packing as PK

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("tokens")
    )
    plan = (
        PK.prefix_sum(df, "tokens", "doc_id", n_partitions=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ExistingRDD" in plan            # checkpointed blocks
    assert "rangepartitioning" not in plan  # shuffle already paid

    # full rows must not ride the range shuffle: pack_into_bins over a
    # wide frame re-attaches payload by join AFTER the narrow prefix
    wide = df.withColumn("text", F.repeat(F.lit("x"), 50))
    packed = PK.pack_into_bins(wide, 100, n_partitions=5)
    assert set(packed.columns) == {"doc_id", "tokens", "text", "prefix", "bin"}
    got = {r["doc_id"]: r["prefix"] for r in packed.collect()}
    run = 0
    for i in range(200):
        run += i % 7 + 1
        assert got[i] == run


def test_curation_chain_neardup_runs_over_survivors(spark):
    """A surviving document must NOT be dropped as the near-dup of a
    keeper that an earlier gate already removed - that would eliminate
    every copy of the content.  doc 1 (the lower-id keeper) fails the
    repetition gate; doc 2 is its near-dup and must survive the chain."""
    from riksdagen_sentences_spark.plans.curate import curation_stages

    base = " ".join(f"alpha{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, base + " spam" * 30, "src0"),   # near-dup of 2, repetitive
            (2, base, "src0"),                   # clean copy
            (3, " ".join(f"beta{i}" for i in range(40)), "src0"),
        ],
        "doc_id bigint, text string, source string",
    )
    st = curation_stages(docs, min_quality=0.3, max_dup_ngram_ratio=0.3,
                         neardup_threshold=0.5)
    gate = {r["doc_id"] for r in st["quality_rep"].collect()}
    assert gate == {2, 3}                       # 1 killed by repetition
    survivors = {r["doc_id"] for r in st["neardup"].collect()}
    assert 2 in survivors                        # keeper 1 is gone, so
    assert survivors == {2, 3}                   # 2 must NOT be dropped

    # control: with doc 1 passing the gate, near-dup removal DOES drop
    # the higher id of the verified pair
    docs2 = spark.createDataFrame(
        [(1, base, "src0"), (2, base + " omega extra", "src0"),
         (3, " ".join(f"beta{i}" for i in range(40)), "src0")],
        "doc_id bigint, text string, source string",
    )
    st2 = curation_stages(docs2, min_quality=0.3, max_dup_ngram_ratio=0.3,
                          neardup_threshold=0.5)
    assert {r["doc_id"] for r in st2["neardup"].collect()} == {1, 3}


def test_sequence_windows_cover_every_token_exactly_once_nonoverlap(spark):
    import pytest

    from riksdagen_sentences_spark.operators import packing as PK

    docs = spark.createDataFrame(
        [(1, 100), (2, 64), (3, 1), (4, 0), (5, 129)],
        "doc_id bigint, tokens bigint",
    )
    rows = PK.sequence_windows(docs, max_len=64).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc                       # zero tokens, no rows
    assert [(r["start_tok"], r["win_len"]) for r in
            sorted(by_doc[1], key=lambda r: r["win_id"])] == [
        (0, 64), (64, 36)]                       # truncated tail
    assert [(r["start_tok"], r["win_len"]) for r in by_doc[2]] == [(0, 64)]
    assert [(r["start_tok"], r["win_len"]) for r in by_doc[3]] == [(0, 1)]
    assert len(by_doc[5]) == 3                   # 129 -> 64+64+1
    # non-overlapping stride: window lengths sum to the token count
    assert sum(r["win_len"] for r in by_doc[5]) == 129

    # overlapping stride: every token index is covered at least once
    over = PK.sequence_windows(docs, max_len=64, stride=48).collect()
    cov = set()
    for r in over:
        if r["doc_id"] == 1:
            cov |= set(range(r["start_tok"], r["start_tok"] + r["win_len"]))
    assert cov == set(range(100))

    with pytest.raises(ValueError, match="positive"):
        PK.sequence_windows(docs, max_len=0)


def test_redact_pii_classes_and_order(spark):
    from riksdagen_sentences_spark.operators.curation import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-mail.co.uk now"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +46701234567 today"),
            (4, "mixed u@d.io at 8.8.8.8 or +1234567890"),
            (5, "clean text, no pii at all"),
            (6, "not an ip 1234.5.6.7890 and no mail at@x"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    assert rows[1]["redacted_text"] == "mail <EMAIL> now"
    assert (rows[1]["n_emails"], rows[1]["n_ips"], rows[1]["n_phones"]) == (1, 0, 0)
    assert rows[2]["redacted_text"] == "server <IP> and <IP> up"
    assert rows[2]["n_ips"] == 2
    assert rows[3]["redacted_text"] == "call <PHONE> today"
    assert rows[4]["redacted_text"] == "mixed <EMAIL> at <IP> or <PHONE>"
    assert rows[5]["redacted_text"] == rows[5]["text"]
    # \b guards: digit runs that are not IPs, strings without a TLD
    assert rows[6]["n_ips"] == 0 and rows[6]["n_emails"] == 0


def test_dedup_paragraphs_keep_first_and_reassemble(spark):
    from riksdagen_sentences_spark.operators.curation import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nbeta"),
            (2, "gamma\nShared   FOOTER\ndelta"),  # same key, normalized
            (3, "shared footer"),                   # nothing survives
            (4, "alpha\nalpha\nepsilon"),           # in-doc repeat + cross-doc
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    assert rows[1]["text_dedup"] == "alpha\nshared footer\nbeta"
    assert (rows[1]["n_paras"], rows[1]["n_kept"]) == (3, 3)
    # doc 2 loses the footer (doc 1 owns it) but keeps order
    assert rows[2]["text_dedup"] == "gamma\ndelta"
    # doc 3 loses everything -> empty text, kept row
    assert rows[3]["text_dedup"] == "" and rows[3]["n_kept"] == 0
    # 'alpha' belongs to doc 1; the in-doc repeat dies too
    assert rows[4]["text_dedup"] == "epsilon"
    assert (rows[4]["n_paras"], rows[4]["n_kept"]) == (3, 1)


def test_leakage_safe_split_components_never_straddle(spark):
    from riksdagen_sentences_spark.operators.curation import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # path graph 1~3~2 (no 1~2 pair) plus an isolated pair 5~6
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    asg = {r.doc_id: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(asg) == 7
    # transitive family {1,2,3} rides component 1 into ONE side
    assert asg[1].component == asg[2].component == asg[3].component == 1
    assert asg[1].split == asg[2].split == asg[3].split
    assert asg[5].component == asg[6].component == 5
    assert asg[5].split == asg[6].split
    # unpaired docs are their own component
    assert asg[4].component == 4 and asg[7].component == 7
    # deterministic across runs
    again = {r.doc_id: r.split for r in
             leakage_safe_split(docs, pairs).collect()}
    assert again == {k: v.split for k, v in asg.items()}


def test_dup_ngram_ratio_agg_matches_column_form(spark):
    """The codegen explode+aggregate repetition ratio must be
    bit-identical to the per-row array formulation (same integer
    counts, same 4dp floor) - including short docs (< k words, absent
    from the aggregate, ratio 0.0 via the caller's coalesce)."""
    import pyspark.sql.functions as F

    from riksdagen_sentences_spark.operators.curation import (
        dup_ngram_ratio_agg,
        dup_ngram_ratio_col,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),          # heavy repetition
            (2, "one two three four five six"),  # none
            (3, "x y"),                          # < k words
            (4, ""),                             # empty
            (5, "r r r r r r r r"),              # single-word run
        ],
        "doc_id long, text string",
    )
    col_form = {
        r.doc_id: r.v
        for r in docs.select(
            "doc_id", dup_ngram_ratio_col(F.col("text")).alias("v")
        ).collect()
    }
    agg = {
        r.doc_id: r.dup_ngram_ratio
        for r in dup_ngram_ratio_agg(docs).collect()
    }
    for d, v in col_form.items():
        assert agg.get(d, 0.0) == v, d


def test_dup_span_coverage_island_merge(spark):
    """Overlapping duplicated 8-grams merge into ONE maximal island
    (a 10-token shared passage = 3 overlapping grams = 10 removed
    tokens, not 24); disjoint passages stay separate islands."""
    from riksdagen_sentences_spark.operators.curation import (
        dup_span_coverage,
    )

    s = " ".join(f"s{i}" for i in range(10))      # shared 10-token run
    a = " ".join(f"a{i}" for i in range(8))       # shared 8-token run
    b = " ".join(f"b{i}" for i in range(8))       # shared 8-token run
    docs = spark.createDataFrame(
        [
            (1, f"{s} u1 u2"),
            (2, f"v1 v2 {s}"),
            (3, f"{a} x1 {b}"),
            (4, f"{b} y1 y2 {a}"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc"]: (r["n_islands"], r["removed_tokens"])
        for r in dup_span_coverage(docs).collect()
    }
    assert got == {1: (1, 10), 2: (1, 10), 3: (2, 16), 4: (2, 16)}


def test_temperature_quotas_sum_to_budget_and_flatten(spark):
    """Quotas sum EXACTLY to the budget (largest-remainder rounding),
    and alpha=0.5 upweights the rare source vs proportional share."""
    from riksdagen_sentences_spark.operators.curation import (
        temperature_quotas,
    )

    docs = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)],
        "doc_id bigint, source string",
    )
    got = {r["source"]: r["quota"]
           for r in temperature_quotas(docs, budget=50).collect()}
    assert sum(got.values()) == 50
    # proportional would give small 5/50; sqrt-temperature gives
    # 50*sqrt(100)/(sqrt(900)+sqrt(100)) = 12.5 -> 12 or 13
    assert got["small"] in (12, 13)


def test_doc_novelty_first_owner_semantics(spark):
    from riksdagen_sentences_spark.operators.curation import doc_novelty

    base = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, base),                      # 4 shingles, all first here
            (2, base + " eta theta"),       # shares 4, adds 2 novel
            (3, "unrelated words entirely fresh content"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in doc_novelty(docs).collect()}
    assert out[1].novelty_r == 1.0 and out[1].n_shingles == 4
    assert out[2].n_shingles == 6 and out[2].n_novel == 2
    assert out[2].novelty_r == round(2 / 6, 4)
    assert out[3].novelty_r == 1.0


def test_weighted_sample_keys_follow_weights(spark):
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.operators.curation import (
        weighted_sample_key_col,
    )

    # two strata: ids 0..199 weight 100, ids 200..399 weight 1.
    # E-S keys u^(1/w): heavy items dominate any top-k overwhelmingly.
    rows = [(i, 100 if i < 200 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "id bigint, w int")
    keyed = df.select(
        "id", weighted_sample_key_col(F.col("id"), F.col("w")).alias("k")
    )
    top = [r.id for r in keyed.orderBy(F.col("k").desc()).limit(50).collect()]
    heavy = sum(1 for i in top if i < 200)
    assert heavy >= 45  # weight-100 items dominate
    # determinism: same seed, same keys
    again = [
        r.id for r in keyed.orderBy(F.col("k").desc()).limit(50).collect()
    ]
    assert top == again
    # different salt -> different sample
    other = df.select(
        "id",
        weighted_sample_key_col(F.col("id"), F.col("w"), salt="v2").alias(
            "k"
        ),
    )
    alt = [r.id for r in other.orderBy(F.col("k").desc()).limit(50).collect()]
    assert alt != top
