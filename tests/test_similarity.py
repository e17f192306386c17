"""Similarity-search operator tests (brute force / LSH / IVF)."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators import similarity as SIM


def _brute(spark, emb, k=20):
    return [
        r["vec_id"]
        for r in SIM.cosine_topk(emb, query_vec_id=0, k=k).collect()
    ]


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = set(_brute(spark, emb, k=10))
    ivf = {
        r["vec_id"]
        for r in SIM.ivf_topk(
            emb, query_vec_id=0, k=10, n_cells=8, n_probe=4
        ).collect()
    }
    # IVF trades recall for pruning; with half the cells probed on 500
    # random vectors, expect decent overlap and exact top-1 agreement
    assert len(ivf) == 10
    recall = len(exact & ivf) / 10
    assert recall >= 0.5, recall
    top1_exact = _brute(spark, emb, k=1)[0]
    # top-1 is found if its cell was probed; assert it ranks first when
    # present (exact ranking within candidates)
    ivf_list = [
        r["vec_id"]
        for r in SIM.ivf_topk(
            emb, query_vec_id=0, k=10, n_cells=8, n_probe=8
        ).collect()
    ]
    assert ivf_list[0] == top1_exact  # all cells probed == exact


def test_lsh_subset_of_brute_order(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh = [
        r["vec_id"]
        for r in SIM.lsh_cosine_topk(
            emb, query_vec_id=0, dims=64, k=10
        ).collect()
    ]
    # candidates ranked exactly: the lsh list must respect brute-force
    # pairwise order
    brute_order = _brute(spark, emb, k=500)
    pos = {v: i for i, v in enumerate(brute_order)}
    ranks = [pos[v] for v in lsh if v in pos]
    assert ranks == sorted(ranks)


def test_ivf_build_query_split(spark, tmp_path):
    """build_ivf_index fits ONCE; ivf_query prunes partitions and never
    refits - and matches the convenience wrapper's answer."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    index = SIM.build_ivf_index(
        emb, str(tmp_path / "ivf"), n_cells=8, seed=42
    )
    assert len(index.centers) == 8
    qv = [
        float(x)
        for x in emb.filter("vec_id = 0").first()["embedding"]
    ]
    got = SIM.ivf_query(
        spark, index, qv, k=10, n_probe=4, exclude_id=0
    )
    # the pruned read must carry a partition filter on `cell`
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    wrapper = SIM.ivf_topk(
        emb, query_vec_id=0, k=10, n_cells=8, n_probe=4,
        index_tag="test_split",
    )
    assert [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in wrapper.collect()
    ]


def test_lsh_multiprobe_row_bearing(spark):
    """radius-0 LSH has recall 0 on this corpus (empty query bucket);
    radius-1 multi-probe must return rows - the non-vacuous evidence."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    r0 = SIM.lsh_cosine_topk(
        emb, query_vec_id=0, dims=64, k=10, probe_radius=0
    ).count()
    r1 = SIM.lsh_cosine_topk(
        emb, query_vec_id=0, dims=64, k=10, probe_radius=1
    ).count()
    assert r1 > 0
    assert r1 >= r0  # probing a superset of buckets never loses rows


def test_probe_bucket_set():
    probes = SIM.probe_bucket_set("0110", 1)
    assert probes == sorted(
        {"0110", "1110", "0010", "0100", "0111"}
    )
    assert len(SIM.probe_bucket_set("00000000", 2)) == 1 + 8 + 28


def test_ivf_memo_distinguishes_corpora(spark):
    """Two DIFFERENT embeddings DataFrames queried under the SAME
    index_tag and params must not share one stale index (ADVICE r2: the
    memo key now folds in the corpus' semantic hash)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half = emb.filter(F.col("vec_id") % 2 == 0)
    full_ids = {
        r["vec_id"]
        for r in SIM.ivf_topk(
            emb, query_vec_id=0, k=10, n_cells=4, n_probe=4,
            index_tag="memo_shared",
        ).collect()
    }
    half_ids = {
        r["vec_id"]
        for r in SIM.ivf_topk(
            half, query_vec_id=0, k=10, n_cells=4, n_probe=4,
            index_tag="memo_shared",
        ).collect()
    }
    # the half corpus has no odd ids; a shared stale index would return
    # the full corpus' neighbors (which include odd ids at this SF)
    assert all(v % 2 == 0 for v in half_ids)
    assert any(v % 2 == 1 for v in full_ids)


def test_planted_cluster_recall_is_deterministically_one(spark):
    """clustered_embeddings plants 8 well-separated clusters; 1-probe
    IVF recall@10 must be exactly 1.0 for several in-cluster queries,
    and exact top-10 must be the query's cluster mates."""
    from riksdagen_sentences_spark.operators import similarity as SIM
    from riksdagen_sentences_spark.sources.synth import clustered_embeddings

    emb = clustered_embeddings(spark).persist()
    try:
        for q in (0, 7, 123):
            exact = {
                r["vec_id"] for r in SIM.cosine_topk(emb, q, k=10).collect()
            }
            approx = {
                r["vec_id"]
                for r in SIM.ivf_topk(
                    emb, q, k=10, n_cells=8, n_probe=1,
                    index_tag="recall_test",
                ).collect()
            }
            assert exact == approx
            assert all(v % 8 == q % 8 for v in exact)
    finally:
        emb.unpersist()


def test_int8_quantization_bounds_and_zero_vector(spark):
    from riksdagen_sentences_spark.operators import similarity as SIM

    emb = spark.createDataFrame(
        [
            (0, [1.0, -2.0, 0.5, 2.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),   # all-zero: scale 0, qvec zeros
            (2, [-0.003, 0.001, 0.002, -0.001]),  # tiny magnitudes
        ],
        "vec_id bigint, embedding array<float>",
    )
    q = {r["vec_id"]: r for r in SIM.quantize_int8(emb).collect()}
    assert all(
        -127 <= x <= 127 for r in q.values() for x in r["qvec"]
    )
    assert q[1]["scale"] == 0.0 and q[1]["qvec"] == [0, 0, 0, 0]
    # max-magnitude component hits exactly +/-127
    assert 127 in [abs(x) for x in q[0]["qvec"]]
    # dequantization error bounded by scale/2 per component
    for r in emb.collect():
        s = q[r["vec_id"]]["scale"]
        for orig, qi in zip(r["embedding"], q[r["vec_id"]]["qvec"]):
            assert abs(orig - qi * s) <= s / 2 + 1e-12


def test_int8_cosine_preserves_cluster_structure(spark):
    """8-bit rounding noise is far below the planted cluster
    separation: every int8 top-10 neighbor of query 0 is a member of
    its planted cluster (vec_id % 8 == 0) with cosine ~ 1.0.  (Exact
    set equality vs float is NOT the right assertion - at 4-dp rounding
    all ~49 cluster mates tie and the tiebreak order is arbitrary.)"""
    from riksdagen_sentences_spark.operators import similarity as SIM
    from riksdagen_sentences_spark.sources.synth import (
        clustered_embeddings,
    )

    emb = clustered_embeddings(spark)
    quant = SIM.int8_cosine_topk(emb, 0, k=10).collect()
    assert len(quant) == 10
    for r in quant:
        assert r["vec_id"] % 8 == 0       # planted cluster of query 0
        assert r["cosine"] >= 0.999


def test_assign_cells_matches_mllib_assignment(spark, tmp_path):
    """The column-algebra argmin (assign_cells) must reproduce MLlib's
    own build-time cell for every vector - same squared-L2 metric, same
    lowest-index tie rule."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    index = SIM.build_ivf_index(
        emb, str(tmp_path / "ivf"), n_cells=8, seed=42
    )
    built = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(index.path).select(
            "vec_id", "cell"
        ).collect()
    }
    ours = {
        r["vec_id"]: r["cell"]
        for r in SIM.assign_cells(index, emb).select(
            "vec_id", "cell"
        ).collect()
    }
    assert ours == built


def test_append_ivf_index_full_probe_exact(spark, tmp_path):
    """Build on half the vectors, append the rest under the frozen
    quantizer: a full-probe query over the appended index must equal
    the same query over an index built on everything (exact cosine
    within probed cells is assignment-invariant)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half = SIM.build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0),
        str(tmp_path / "ivf_half"), n_cells=8, seed=42,
    )
    SIM.append_ivf_index(half, emb.filter(F.col("vec_id") % 2 == 1))
    full = SIM.build_ivf_index(
        emb, str(tmp_path / "ivf_full"), n_cells=8, seed=42
    )
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    a = SIM.ivf_query(spark, half, qv, k=10, n_probe=8, exclude_id=0)
    b = SIM.ivf_query(spark, full, qv, k=10, n_probe=8, exclude_id=0)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    # appended rows really live in the partitioned layout (no shadow
    # table): every vector is present exactly once
    n = spark.read.parquet(half.path).count()
    assert n == emb.count()


def test_semantic_dedup_planted_clusters(spark):
    """On the planted-cluster fixture (label = vec_id % 8, within-cluster
    cosine ~0.9999) semantic dedup at threshold 0.95 must keep exactly
    one survivor per cluster - the lowest id, i.e. vec_ids 0..7."""
    from riksdagen_sentences_spark.sources.synth import clustered_embeddings

    emb = clustered_embeddings(spark)
    out = SIM.semantic_dedup(emb, threshold=0.95, cluster_col="label")
    assert sorted(r["vec_id"] for r in out.collect()) == list(range(8))


def test_semantic_dedup_ivf_cells_match_labels(spark, tmp_path):
    """Clustering by IVF cells (the production path) recovers the planted
    partition, so survivors match the label-clustered run exactly."""
    from riksdagen_sentences_spark.sources.synth import clustered_embeddings

    emb = clustered_embeddings(spark)
    index = SIM.build_ivf_index(
        emb.drop("label"), str(tmp_path / "sem_ivf"), n_cells=8, seed=42
    )
    celled = SIM.assign_cells(index, emb.drop("label"))
    out = SIM.semantic_dedup(celled, threshold=0.95, cluster_col="cell")
    assert sorted(r["vec_id"] for r in out.collect()) == list(range(8))


def test_semantic_dedup_keeps_id_local_minima(spark):
    """Path graph 1-3, 3-2 within one cluster (ids 1 < 2 < 3): 3 has the
    lower-id near neighbor 1 so it is dropped; 2's only in-threshold
    neighbor is the HIGHER id 3, so 2 survives even though 3 - the item
    that made 2 a near-dup candidate - was itself dropped.  This is the
    documented keep-lowest-id greedy-variant semantics (survivors =
    id-local minima), deliberately distinct from connected-components
    keep-one-per-component."""
    import math

    def v(deg):
        r = math.radians(deg)
        return [float(math.cos(r)), float(math.sin(r))]

    emb = spark.createDataFrame(
        [(1, v(0.0), 0), (3, v(25.0), 0), (2, v(50.0), 0)],
        "vec_id long, embedding array<float>, cluster int",
    )
    # cos(25 deg) ~ 0.906 >= 0.9 links (1,3) and (3,2); cos(50) ~ 0.64 < 0.9
    out = SIM.semantic_dedup(emb, threshold=0.9, cluster_col="cluster")
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 2]


def test_semantic_dedup_max_cluster_size_bounds_hot_cluster(spark):
    """A degenerate clustering (every vector in ONE cluster) is the
    quadratic worst case; max_cluster_size subdivides it into hash-salt
    groups so the self-join is bounded.  The documented tradeoff is
    recall: the hot cluster keeps up to one survivor per salt instead
    of one overall.  Clusters under the cap must be byte-identical to
    the uncapped run."""
    from riksdagen_sentences_spark.sources.synth import clustered_embeddings

    emb = clustered_embeddings(spark, n_clusters=1, per_cluster=100)
    # uncapped: one cluster, one survivor (the min id)
    base = SIM.semantic_dedup(emb, threshold=0.95, cluster_col="label")
    assert [r["vec_id"] for r in base.collect()] == [0]
    capped = SIM.semantic_dedup(
        emb, threshold=0.95, cluster_col="label", max_cluster_size=10
    )
    survivors = sorted(r["vec_id"] for r in capped.collect())
    # ceil(100/10) = 10 salt groups -> exactly one survivor per
    # NON-EMPTY salt group (every pair within a salt is a near-dup):
    # more than 1 (recall tradeoff is real) but at most 10 (bounded)
    assert 1 < len(survivors) <= 10
    # the capped run is a superset of the uncapped survivors
    assert 0 in survivors
    # a multi-cluster corpus where no cluster exceeds the cap is
    # untouched by the subdivision
    emb8 = clustered_embeddings(spark, n_clusters=8, per_cluster=20)
    a = sorted(
        r["vec_id"]
        for r in SIM.semantic_dedup(
            emb8, threshold=0.95, cluster_col="label"
        ).collect()
    )
    b = sorted(
        r["vec_id"]
        for r in SIM.semantic_dedup(
            emb8, threshold=0.95, cluster_col="label", max_cluster_size=20
        ).collect()
    )
    assert a == b == list(range(8))
