"""Distributed linear algebra over embedding columns: Gram matrix and
top-principal-component power iteration as pure DataFrame algebra.

The PCA direction of an embedding corpus is the standard diagnostic for
anisotropy (all-but-the-top-PC post-processing) and the building block
for PCA whitening in dedup/retrieval pipelines.  At 100 TB the ONLY
scalable shape is the one used here:

- ``gram_matrix``: G[i,j] = sum_rows x_i * x_j via a double posexplode
  and ONE map-side-combined hash aggregate - the corpus is read once
  and reduces to a dim^2-row table (4096 rows at dim 64), after which
  the eigen-iteration never touches the data again.  This is exactly
  how distributed PCA is done (compute the Gram/covariance in one pass,
  solve the tiny eigenproblem on the aggregate).
- ``top_principal_component``: fixed-round power iteration on the
  dim^2 table - each round is a dim^2-row join + two tiny aggregates,
  driver-free; fixed rounds keep it oracle-unrollable (the contract
  shared with pagerank/sssp/lpa/kcore).

Float handling: components are cast to DOUBLE before multiplying, so
each product is EXACT (a double product of two float-valued operands);
only sum order can move the result, at ~1e-14 relative - absorbed by
the 4dp rounding the consumers apply.  The eigenvector sign is fixed
deterministically: the largest-|z| component (ties -> lowest index) is
made positive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, v): the Gram matrix sum_rows x[i]*x[j] over the vector
    column (0-based positions).  One pass, one hash aggregate; the
    result is dim^2 rows regardless of corpus size."""
    a = vecs.select(
        F.col(vec_col).alias("__v"),
        F.posexplode(F.col(vec_col)).alias("i", "xi"),
    )
    b = a.select(
        "i",
        F.col("xi").cast("double").alias("xi"),
        F.posexplode("__v").alias("j", "xj"),
    )
    return b.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("xj").cast("double")).alias("v")
    )


def top_principal_component(
    vecs: DataFrame, n_iter: int = 3, vec_col: str = "embedding"
) -> DataFrame:
    """(i, z): the dominant eigenvector of the Gram matrix after
    ``n_iter`` power-iteration rounds from the all-ones start,
    L2-normalized each round, sign-fixed so the largest-|z| component
    (ties -> lowest index) is positive.  Rounds are fixed (no
    convergence probe) so a SQL oracle can unroll them."""
    g = gram_matrix(vecs, vec_col).localCheckpoint(eager=True)
    z = g.select("i").distinct().withColumn("z", F.lit(1.0))
    for _ in range(n_iter):
        y = (
            g.join(z.select(F.col("i").alias("j"), "z"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("v") * F.col("z")).alias("y"))
        )
        nrm = y.agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nrm"))
        z = (
            y.crossJoin(F.broadcast(nrm))
            .select("i", (F.col("y") / F.col("nrm")).alias("z"))
            .localCheckpoint(eager=True)
        )
    sgn = (
        z.orderBy(F.abs(F.col("z")).desc(), F.col("i").asc())
        .limit(1)
        .select(
            F.when(F.col("z") < 0, F.lit(-1.0))
            .otherwise(F.lit(1.0))
            .alias("sgn")
        )
    )
    return z.crossJoin(F.broadcast(sgn)).select(
        "i", (F.col("z") * F.col("sgn")).alias("z")
    )


def remove_top_component(
    vecs: DataFrame,
    pc: DataFrame,
    n_iter: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """All-but-the-top post-processing (Mu & Viswanath 2018): project
    the dominant direction out of every embedding,

        x' = x - (x . z) z

    the standard anisotropy correction before cosine retrieval.  The
    eigenvector is dim rows - it rides in as a broadcast collected into
    ONE array literal-free zip: the per-row projection is a single
    ``aggregate`` over zipped arrays, zero shuffle on the corpus.
    Returns the input columns with ``embedding_abtt`` (array<double>)
    appended.

    ``pc`` is the (i, z) frame from :func:`top_principal_component`
    (pass the same vectors and rounds for self-consistency).
    """
    zs = F.array(
        *[
            F.lit(float(r["z"]))
            for r in sorted(pc.collect(), key=lambda r: r["i"])
        ]
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(v, zs, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    proj = F.zip_with(v, zs, lambda a, b: a - F.col("__dot") * b)
    return (
        vecs.withColumn("__dot", dot)
        .withColumn("embedding_abtt", proj)
        .drop("__dot")
    )


def srp_signs(
    seed: str, out_dims: int, in_dims: int
) -> list[list[float]]:
    """The ±1 signed-random-projection matrix (out_dims × in_dims) as
    deterministic md5-derived constants: entry (i, j) is +1 when the
    first hex byte of md5("<seed>:<i>:<j>") is even.

    The matrix is a seed-fixed CONSTANT, not data: both the Spark plan
    and the DuckDB oracle inline the same literals, so engine parity
    is by construction and no runtime hashing happens per row."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(
                    f"{seed}:{i}:{j}".encode()
                ).hexdigest()[:2],
                16,
            )
            % 2
            == 0
            else -1.0
            for j in range(in_dims)
        ]
        for i in range(out_dims)
    ]


def signed_projection(
    vecs: DataFrame,
    signs: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, proj) — project each vector onto the ±1 rows of ``signs``
    (Achlioptas 2003 database-friendly random projection / the JL
    transform): proj[i] = Σ_j signs[i][j] · x_j / sqrt(out_dims).

    Scale shape: the matrix rides in the plan as literals and the
    corpus is touched by per-row array expressions ONLY — map-only,
    zero shuffle, no Python.  Inner products are preserved in
    expectation with variance O(1/out_dims), which is what the
    cosine-preservation query audits.  For out_dims large enough that
    literal arrays strain the plan (thousands), switch to the
    explode + broadcast-matrix-join variant — same algebra, one
    shuffle on the id."""
    import math

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = 1.0 / math.sqrt(len(signs))
    comps = [
        (
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(s) for s in row]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(scale)
        ).alias(f"p{i}")
        for i, row in enumerate(signs)
    ]
    return vecs.select(F.col(id_col), F.array(*comps).alias("proj"))
