"""Similarity-search operator tests (brute force / LSH / IVF)."""

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
