"""Near-dup operator suite: LSH verification, SimHash pairing, bigint
MinHash plan shape."""

import pytest
from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators import neardup as ND

SF = "/root/testdata/sf0.001/documents.parquet"


def test_lsh_verified_subset_of_candidates(spark):
    docs = spark.read.parquet(SF)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in ND.lsh_candidate_pairs(docs).collect()
    }
    verified = ND.lsh_verified_pairs(docs, threshold=0.2).collect()
    assert len(verified) > 0
    assert {(r["doc_a"], r["doc_b"]) for r in verified} <= cand
    assert all(r["jaccard"] >= 0.2 for r in verified)


def test_lsh_verified_matches_allpairs_on_candidates(spark):
    """On the candidate set, the verified jaccard must equal the exact
    all-pairs jaccard (same shingles, same arithmetic)."""
    docs = spark.read.parquet(SF)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ND.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    for r in ND.lsh_verified_pairs(docs, threshold=0.2).collect():
        assert exact[(r["doc_a"], r["doc_b"])] == r["jaccard"]


def test_minhash_hash_aggregates(spark):
    """The bigint fold's whole point: both dedup phases must plan as
    HashAggregate (string MIN buffers would force SortAggregate)."""
    docs = spark.read.parquet(SF)
    plan = (
        ND.minhash_signatures(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_minhash_n_perm_parameterized(spark):
    docs = spark.read.parquet(SF)
    sig = ND.minhash_signatures(docs, n_perm=128)
    assert [f"mh{i}" for i in range(128)] == sig.columns[1:]
    row = sig.filter(F.col("mh0").isNotNull()).first()
    vals = [row[f"mh{i}"] for i in range(128)]
    assert all(isinstance(v, int) and v >= 0 for v in vals)
    # 128 permutations -> 32 bands of 4 rows each runs end-to-end
    n = ND.lsh_candidate_pairs(docs, n_perm=128, bands=32).count()
    assert n >= 0


def test_simhash_pairs_verified_and_banded(spark):
    docs = spark.read.parquet(SF)
    pairs = ND.simhash_neardup_pairs(
        docs, bits=32, bands=4, max_hamming=3
    ).collect()
    assert len(pairs) > 0
    assert all(0 <= r["hamming"] <= 3 for r in pairs)
    # completeness vs brute force: banding (pigeonhole) must not lose
    # any pair within the hamming budget
    fps = {
        r["doc_id"]: r["simhash"]
        for r in ND.simhash_fingerprints(docs, bits=32).collect()
    }
    ids = sorted(fps)[:80]  # bounded brute-force slice
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(x != y for x, y in zip(fps[a], fps[b]))
            if ham <= 3:
                assert (a, b) in got, (a, b, ham)


def test_simhash_pairs_pigeonhole_guard(spark):
    docs = spark.read.parquet(SF)
    with pytest.raises(ValueError, match="misses pairs"):
        ND.simhash_neardup_pairs(docs, bits=32, bands=4, max_hamming=4)


def test_simhash64_production_config(spark):
    """64-bit fingerprints (two md5s) with 4 x 16-bit bands: the
    production configuration must run end-to-end, stay banding-complete
    within the hamming budget, and be strictly MORE selective than the
    32-bit demo (more dimensions -> fewer random collisions)."""
    docs = spark.read.parquet(SF)
    fps = {
        r["doc_id"]: r["simhash"]
        for r in ND.simhash_fingerprints(docs, bits=64).collect()
    }
    assert all(len(v) == 64 for v in fps.values())
    # dimensions 32..63 use a different word hash: the two halves must
    # not be copies of each other on a real corpus
    assert any(v[:32] != v[32:] for v in fps.values())
    pairs = ND.simhash_neardup_pairs(
        docs, bits=64, bands=4, max_hamming=3
    ).collect()
    assert all(0 <= r["hamming"] <= 3 for r in pairs)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    ids = sorted(fps)[:80]
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = sum(x != y for x, y in zip(fps[a], fps[b]))
            if ham <= 3:
                assert (a, b) in got, (a, b, ham)
    n32 = ND.simhash_neardup_pairs(
        docs, bits=32, bands=4, max_hamming=3
    ).count()
    assert len(pairs) <= n32
    with pytest.raises(ValueError, match="<= 64"):
        ND.simhash_fingerprints(docs, bits=128)


def test_component_dedup_transitive_vs_greedy(spark):
    """Path pair graph (1,3),(2,3): the greedy drop-doc_b rule keeps
    {1, 2} (2's only neighbor is the HIGHER id 3), while component dedup
    transitively closes the graph - one component {1,2,3} - and keeps
    only its minimum, 1."""
    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (9,)], "doc_id long"
    )  # 9 = isolated doc, must always survive
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3)], "doc_a long, doc_b long"
    )
    greedy = docs.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    assert sorted(r["doc_id"] for r in greedy.collect()) == [1, 2, 9]
    cc = ND.component_dedup(docs, pairs)
    assert sorted(r["doc_id"] for r in cc.collect()) == [1, 9]
