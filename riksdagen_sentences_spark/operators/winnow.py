"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 - the MOSS algorithm): rolling character k-gram hashes,
one fingerprint selected per sliding window of ``w`` consecutive
hashes.

Guarantee: any substring match of length >= w + k - 1 between two
documents shares at least one selected fingerprint - the local-
minimum selection makes the fingerprint set position-robust, unlike
fixed-stride sampling.  This is the spec's "document fingerprinting
(rolling hash)" operator done with the published selection rule rather
than ad-hoc sampling.

Selection rule: each window keeps its (hash, pos)-minimum - the
minimum hash, leftmost position on ties (the paper's robust variant
keeps the rightmost; leftmost is equally deterministic and
engine-portable: ``min(struct(hash, pos))`` in Spark == "min hash,
then min pos among its holders" in SQL).  Deviation documented here.

Scale shape: one explode (positions), ONE running-window pass per
document partition (rows are consecutive integer positions, so a ROWS
frame is exact), a distinct - all JVM column algebra, no Python.  The
shared-fingerprint pair join document-frequency-filters its postings
first (drop hashes seen in > df_cap docs), the same hot-key guard the
LSH bucket join uses: worst-case pair fan-out per hash is then
C(df_cap, 2), never quadratic in corpus size.

The reference has no fingerprint surface (its dedup is exact
UNIQUE(text, document, language), /root/reference/models/sentence.py);
this is part of the training-data-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

WINNOW_K = 5  # character k-gram length
WINNOW_W = 8  # window: one fingerprint per w consecutive k-grams
DF_CAP = 50  # postings with document frequency above this are dropped


def _fold_hash(s: Column) -> Column:
    """md5 -> 15 hex digits -> BIGINT (60 bits, exact in both
    engines; the same fold minhash/LSH use)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def kgram_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
) -> DataFrame:
    """(doc_id, pos, hash): the rolling k-gram hash at every character
    position of lower(text).  Documents shorter than k characters have
    no k-grams and drop out."""
    t = F.lower(F.col(text_col))
    return (
        docs.filter(F.length(t) >= k)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.sequence(F.lit(1), F.length(t) - k + 1)
            ).alias("pos"),
            t.alias("__t"),
        )
        .select(
            "doc_id",
            "pos",
            _fold_hash(
                F.col("__t").substr(F.col("pos"), F.lit(k))
            ).alias("hash"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, hash, pos): the winnowing fingerprint set.  Every
    window of ``w`` consecutive k-gram hashes contributes its
    (hash, pos)-minimum; documents with fewer than ``w`` k-grams
    contribute their global minimum (one whole-document window)."""
    h = kgram_hashes(docs, id_col, text_col, k)
    over = Window.partitionBy("doc_id").orderBy("pos")
    sel = h.select(
        "doc_id",
        "pos",
        F.min(F.struct("hash", "pos"))
        .over(over.rowsBetween(0, w - 1))
        .alias("m"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n"),
    )
    return (
        sel.filter(
            F.col("pos") <= F.greatest(F.lit(1), F.col("n") - w + 1)
        )
        .select("doc_id", F.col("m.hash").alias("hash"),
                F.col("m.pos").alias("pos"))
        .dropDuplicates(["doc_id", "hash", "pos"])
    )


def shared_fingerprint_pairs(
    fp: DataFrame, df_cap: int = DF_CAP
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs ranked by the number
    of distinct shared fingerprint hashes, after dropping hashes whose
    document frequency exceeds ``df_cap`` (boilerplate guard - the
    bucket-join hot-key cap)."""
    inv = fp.select("doc_id", "hash").dropDuplicates(["doc_id", "hash"])
    df_counts = inv.groupBy("hash").agg(F.count("*").alias("n_docs"))
    rare = inv.join(
        df_counts.filter(F.col("n_docs") <= df_cap).select("hash"), "hash"
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "hash")
    b = rare.select(F.col("doc_id").alias("doc_b"), "hash")
    return (
        a.join(b, "hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
