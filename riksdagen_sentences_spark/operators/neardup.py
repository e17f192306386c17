"""Near-duplicate detection operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale notes (the whole point of these operators):

- **exact**: hash-groupBy on sha256(normalized text) - map-side partial
  agg, no skew issue (hashes are uniform).
- **n-gram Jaccard**: the exact baseline; the shingle self-join is
  quadratic in the hottest shingle, so it is the thing MinHash exists to
  replace - keep it for verification at small SF, use MinHash at 100 TB.
- **MinHash+LSH**: signature = per-seed min over md5(seed || shingle)
  (md5 hex is identical in Spark and DuckDB, making the oracle exact);
  band keys bucket candidates so the join is linear in bucket sizes.
  Band width/count trade precision vs recall.
- **SimHash**: per-hex-digit sign aggregation over token md5s - a
  32-dimension bit fingerprint; Hamming-close docs are near-dups.

Everything is pure column expressions - no UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalized_text_col

SHINGLE_K = 3
MINHASH_SEEDS = 8
LSH_BANDS = 4  # rows-per-band = MINHASH_SEEDS / LSH_BANDS = 2
SIMHASH_BITS = 16  # hex digits of md5 used as dimensions


def words_col(text: Column) -> Column:
    return F.filter(
        F.split(normalized_text_col(text), " "), lambda w: w != ""
    )


def shingles_col(text: Column, k: int = SHINGLE_K) -> Column:
    """Distinct word k-gram shingles (empty when the doc has < k words)."""
    w = words_col(text)
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(w, i + 1, k), " "),
    )
    return F.array_distinct(
        F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (post-normalization) documents."""
    return (
        docs.select(
            "doc_id", F.sha2(normalized_text_col(F.col(text_col)), 256).alias(
                "fingerprint"
            )
        )
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n") > 1)
    )


def _doc_shingles(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(shingles_col(F.col(text_col))).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.2
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (doc_a < doc_b).

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), floor-rounded to 4 dp.
    """
    sh = _doc_shingles(docs, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    j = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.floor(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0,
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return j.select("doc_a", "doc_b", "jaccard")


def _hasher(prefix: str):
    # closure factory: a default-arg lambda would make Spark treat the
    # extra parameter as the element-index argument of transform()
    return lambda x: F.md5(F.concat(F.lit(prefix), x))


def minhash_signature_cols(sh: Column) -> list[Column]:
    """One min-hash per seed: min over md5(seed || ':' || shingle).
    ``sh`` must be a materialized shingle-array column (compute it once
    with withColumn - HOF subtrees are not CSE'd, so referencing
    shingles_col() 8x would evaluate the shingler 8x per row)."""
    return [
        F.array_min(F.transform(sh, _hasher(f"{seed}:"))).alias(f"mh{seed}")
        for seed in range(MINHASH_SEEDS)
    ]


def minhash_signatures(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    with_sh = docs.withColumn("__sh", shingles_col(F.col(text_col)))
    return with_sh.select(
        "doc_id", *minhash_signature_cols(F.col("__sh"))
    )


def lsh_candidate_pairs(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band key.

    Scale path: band-key groupBy is linear; candidate verification (here:
    none, pairs are emitted directly) would re-check Jaccard on the small
    candidate set instead of the full cross product.
    """
    sig = minhash_signatures(docs, text_col)
    rows_per_band = MINHASH_SEEDS // LSH_BANDS
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(band)),
                    *[
                        F.col(f"mh{band * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for band in range(LSH_BANDS)
        ]
    )
    # one pass over the signatures: explode the band array instead of a
    # 4-way union that would recompute the shingler per branch
    all_bands = (
        sig.filter(F.col("mh0").isNotNull())
        .select("doc_id", F.explode(band_keys).alias("band_key"))
    )
    a = all_bands.alias("a")
    b = all_bands.alias("b")
    return (
        a.join(b, F.col("a.band_key") == F.col("b.band_key"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


_HEX = "0123456789abcdef"


def simhash_bits_col(hashes: Column) -> Column:
    """SimHash from a materialized md5-array column: dimension j uses hex
    digit j; digit >= 8 votes +1 else -1; bit j = (sum > 0).  Returns the
    fingerprint as a SIMHASH_BITS-char '0'/'1' string."""

    def _voter(pos: int):
        return lambda h: F.when(
            F.upper(F.substring(h, pos, 1)).isin(*"89ABCDEF"), F.lit(1)
        ).otherwise(F.lit(-1))

    bits = []
    for j in range(SIMHASH_BITS):
        votes = F.transform(hashes, _voter(j + 1))
        total = F.aggregate(votes, F.lit(0), lambda acc, x: acc + x)
        bits.append(F.when(total > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    # materialize the token-hash array once (HOF subtrees are not CSE'd)
    with_hashes = docs.withColumn(
        "__h", F.transform(words_col(F.col(text_col)), lambda x: F.md5(x))
    )
    return with_hashes.select(
        "doc_id", simhash_bits_col(F.col("__h")).alias("simhash")
    )
