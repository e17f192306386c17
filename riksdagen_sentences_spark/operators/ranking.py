"""Text ranking / language-model statistics over the document corpus.

The reference serves its corpus relationally; a training-data pipeline
additionally needs the classic IR statistics computed corpus-wide:

- ``doc_terms``: one tokenize pass (lower + non-alnum split), shared by
  everything below.  Pure JVM column algebra - the explode is the only
  row multiplier and every aggregate on top is map-side combined.
- ``tfidf_top_terms``: tf * ln(N/df) with a per-document top-k window.
  The df marginal is a term-keyed hash aggregate joined back on term
  (a standard shuffle join - both sides are already term-partitioned
  after the aggregate); N rides in as a 1-row cross join so the plan
  stays one declarative tree with no driver-side constants.
- ``bm25_scores``: Okapi BM25 for a FIXED query-term list.  The isin()
  filter prunes the exploded frame to query terms before any shuffle,
  so cost is O(matching postings), not O(corpus): exactly the shape an
  inverted-index probe would take on a real cluster.
- ``bigram_counts``: adjacent-token pairs via lead() over (doc, idx) -
  one shuffle on doc id - with conditional P(w2|w1) against the
  first-token marginal.

At 100 TB every step is a hash aggregate or an equi-join on the
aggregate's own key; no per-row Python, no driver materialization.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SPLIT = "[^a-z0-9]+"


def doc_terms(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, idx, term): lowercased non-alnum-split tokens with their
    original position (empties dropped, positions kept - adjacency is
    over the surviving sequence ordered by idx)."""
    arr = F.split(F.lower(F.col(text_col)), _SPLIT)
    return (
        docs.select(F.col(id_col).alias("doc"), F.posexplode(arr))
        .filter(F.col("col") != "")
        .select("doc", F.col("pos").alias("idx"), F.col("col").alias("term"))
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, term, tf, score_r, rnk): per-document top-``k`` terms by
    tf * ln(N / df), score rounded half-up at 4 dp BEFORE ranking so
    the ordering (score_r desc, term asc) is engine-portable."""
    terms = doc_terms(docs, id_col, text_col)
    tf = terms.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = tf.select("doc").dropDuplicates().agg(
        F.count("*").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df_, "term")
        .crossJoin(n_docs)
        .select(
            "doc", "term", "tf",
            (
                F.floor(
                    F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
                    * 10000.0 + F.lit(0.5)
                ) / 10000.0
            ).alias("score_r"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("score_r").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, score_r): Okapi BM25 of each document against the fixed
    query-term list, idf = ln((N - df + 0.5) / (df + 0.5) + 1), score
    rounded half-up at 4 dp.  Documents matching no query term are
    absent (their score is 0)."""
    terms = doc_terms(docs, id_col, text_col)
    lens = terms.groupBy("doc").agg(F.count("*").alias("dl"))
    avgdl = lens.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    n_docs = lens.agg(F.count("*").cast("double").alias("n_docs"))
    qt = terms.filter(F.col("term").isin(list(query_terms)))
    tf = qt.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    part = (
        tf.join(df_, "term")
        .join(lens, "doc")
        .crossJoin(avgdl)
        .crossJoin(n_docs)
        .select(
            "doc",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
    )
    return part.groupBy("doc").agg(
        (
            F.floor(F.sum("s") * 10000.0 + F.lit(0.5)) / 10000.0
        ).alias("score_r")
    )


def doc_bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, n_bigrams, avg_lp_r): per-document average log probability
    of its adjacent-token bigrams under the corpus-wide add-one-smoothed
    bigram LM,

        lp(w1, w2) = ln( (n(w1,w2) + 1) / (c1(w1) + V) )

    with V = corpus vocabulary size - the classic LM-based quality
    signal (a document whose word transitions the corpus model finds
    surprising scores low; boilerplate scores high).  Rounded half-up at
    4 dp AFTER the single sum/count division, so the window/order is
    engine-portable; the model is built from the same corpus, so every
    document bigram has a model row (smoothing still shifts the
    estimate exactly as a held-out scorer would).

    Scale shape: one explode, one lead() window per doc, two hash
    aggregates for the model, then a join of doc bigrams against the
    model on (w1, w2) - both sides already pair-partitioned after the
    aggregate - and a final per-doc aggregate.  No per-row Python."""
    terms = doc_terms(docs, id_col, text_col)
    w = Window.partitionBy("doc").orderBy(F.col("idx").asc())
    big = (
        terms.select(
            "doc",
            F.col("term").alias("w1"),
            F.lead("term").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    model = big.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    marg = model.groupBy("w1").agg(F.sum("n").alias("c1"))
    vocab = terms.select("term").distinct().agg(
        F.count("*").cast("double").alias("vsize")
    )
    lp = (
        big.join(model, ["w1", "w2"])
        .join(marg, "w1")
        .crossJoin(vocab)
        .select(
            "doc",
            F.log(
                (F.col("n") + 1.0) / (F.col("c1") + F.col("vsize"))
            ).alias("lp"),
        )
    )
    return lp.groupBy("doc").agg(
        F.count("*").alias("n_bigrams"),
        (
            F.floor(
                F.sum("lp") / F.count("*") * 10000.0 + F.lit(0.5)
            ) / 10000.0
        ).alias("avg_lp_r"),
    )


def bigram_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(w1, w2, n, c1, p_r): adjacent-token bigram counts over the
    corpus with the conditional probability P(w2 | w1) = n / c1 against
    the bigram-based first-token marginal, rounded half-up at 4 dp.
    Adjacency = lead() over (doc, idx) on the non-empty token sequence;
    document boundaries never pair (lead is per-partition NULL)."""
    terms = doc_terms(docs, id_col, text_col)
    w = Window.partitionBy("doc").orderBy(F.col("idx").asc())
    big = (
        terms.select(
            F.col("term").alias("w1"),
            F.lead("term").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )
    marg = big.groupBy("w1").agg(F.sum("n").alias("c1"))
    return big.join(marg, "w1").select(
        "w1", "w2", "n", "c1",
        (
            F.floor(
                F.col("n").cast("double") / F.col("c1") * 10000.0
                + F.lit(0.5)
            ) / 10000.0
        ).alias("p_r"),
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_col: str = "doc",
    rank_col: str = "rnk",
    k: int = 60,
) -> DataFrame:
    """(doc, n_lists, rrf) — Reciprocal Rank Fusion (Cormack et al.
    2009) of deterministic rankings: rrf(d) = Σ_lists 1 / (k + rank_d).

    The standard way to hybridize retrieval signals (lexical BM25 +
    semantic ANN + quality priors) WITHOUT score calibration — only
    ranks enter, so the lists' score scales never meet.  Each input
    must carry a total-order rank (row_number over a tie-broken sort;
    the caller owns tie-breaking).

    Plan: per-list map-only 1/(k+rank) projection, one union, ONE
    hash aggregate on the id — no joins, no sort until the consumer's
    top-N.  Determinism: each term is a single IEEE division; for two
    lists the sum is order-invariant exactly, beyond that the 4dp
    rounding consumers apply absorbs summation order."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col).alias("doc"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(
                "__c"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("doc").agg(
        F.count("*").cast("int").alias("n_lists"),
        F.sum("__c").alias("rrf"),
    )
