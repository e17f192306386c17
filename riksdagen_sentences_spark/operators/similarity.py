"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact baseline - fine for verification and
  for broadcast-sized query sets.
- ``lsh_cosine_topk``: the scale path - random-hyperplane LSH buckets
  (deterministic seeded planes) shrink the candidate set so the top-k
  scan is ~bucket-sized instead of corpus-sized; exact ranking is then
  applied within candidates.

Dot products run as JVM higher-order functions (zip_with + aggregate) -
elements are cast to double BEFORE multiplying so the arithmetic matches
the DuckDB oracle's double-precision path exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column, decimals: int = 4) -> Column:
    raw = dot_col(a, b) / (norm_col(a) * norm_col(b))
    scale = float(10**decimals)
    return F.floor(raw * scale + F.lit(0.5)) / scale


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors of one corpus vector (excluded from
    its own result).  The query vector is a one-row broadcast join - the
    corpus is scanned once, no shuffle besides the top-k."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q")
    )
    scored = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_col(F.col(vec_col), F.col("__q")).alias("cosine"),
        )
    )
    return scored.orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    ).limit(k)


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer partitions the
    corpus into cells; the query scans only its ``n_probe`` nearest
    cells, exact cosine within them.

    Scale path: write the table partitioned by ``cell`` and a query
    prunes to n_probe/n_cells of the data; the quantizer is trained once
    (MLlib KMeans, fixed seed -> deterministic within one Spark version)
    and broadcast.  Not SQL-expressible -> rows-only driver check; the
    recall-vs-brute-force bound is pinned in tests.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    with_vec = embeddings.withColumn(
        "__features", array_to_vector(_to_double(F.col(vec_col)))
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="__features", predictionCol="__cell"
    ).fit(with_vec)
    assigned = model.transform(with_vec).drop("__features")

    centers = model.clusterCenters()
    q_row = (
        assigned.filter(F.col(id_col) == query_vec_id)
        .select(vec_col)
        .first()
    )
    qv = [float(x) for x in q_row[vec_col]]

    import math

    def _cos(c) -> float:
        dot = sum(a * b for a, b in zip(qv, c))
        nc = math.sqrt(sum(a * a for a in c)) or 1.0
        nq = math.sqrt(sum(a * a for a in qv)) or 1.0
        return dot / (nc * nq)

    probe_cells = sorted(
        range(len(centers)), key=lambda i: -_cos(centers[i])
    )[:n_probe]

    q = assigned.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q")
    )
    cand = assigned.filter(
        F.col("__cell").isin(probe_cells) & (F.col(id_col) != query_vec_id)
    )
    scored = cand.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        cosine_col(F.col(vec_col), F.col("__q")).alias("cosine"),
    )
    return scored.orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    ).limit(k)


def lsh_plane_sign_cols(
    vec: Column, dims: int, n_planes: int = 8
) -> Column:
    """Deterministic random-hyperplane signature: plane p's component d is
    +1 if md5('p:d') first hex digit >= 8 else -1 (same constant both in
    Spark and any oracle); signature bit = sign(dot(plane, vec))."""
    import hashlib

    bits = []
    for p in range(n_planes):
        signs = [
            1.0
            if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) >= 8
            else -1.0
            for d in range(dims)
        ]
        plane = F.array(*[F.lit(s) for s in signs])
        dot = F.aggregate(
            F.zip_with(_to_double(vec), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    dims: int,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Bucketed ANN: exact cosine ranking within the query's LSH bucket.
    Recall < 1 by construction; at 100 TB this replaces the full scan
    with a partition-pruned bucket read (write the table partitioned by
    bucket)."""
    sig = embeddings.withColumn(
        "__bucket", lsh_plane_sign_cols(F.col(vec_col), dims, n_planes)
    )
    q = sig.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("__q"), F.col("__bucket").alias("__qb")
    )
    cand = sig.join(
        F.broadcast(q), F.col("__bucket") == F.col("__qb")
    ).filter(F.col(id_col) != query_vec_id)
    scored = cand.select(
        F.col(id_col),
        cosine_col(F.col(vec_col), F.col("__q")).alias("cosine"),
    )
    return scored.orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    ).limit(k)
