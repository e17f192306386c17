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


def _doc_shingles_fast(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct (doc_id, shingle) via posexplode + window lead - fully
    whole-stage-codegen (the array-HOF formulation in shingles_col is
    interpreted and ~4x slower; it remains as the per-row API and the
    semantics spec).  Shuffles once by doc_id for the window, which is
    the linear, skew-free shape at scale."""
    from pyspark.sql.window import Window

    w = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.split(normalized_text_col(F.col(text_col)), " ")
            ).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("w", i).over(win) for i in range(1, SHINGLE_K)]
    shingle = F.when(
        leads[-1].isNotNull(), F.concat_ws(" ", F.col("w"), *leads)
    )
    return (
        w.select("doc_id", shingle.alias("shingle"))
        .filter(F.col("shingle").isNotNull())
        .dropDuplicates(["doc_id", "shingle"])
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
    return _doc_shingles_fast(docs, text_col)


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


def minhash_signatures(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-seed min over md5(seed || ':' || shingle).

    Formulated as explode -> hash-aggregate rather than per-row
    higher-order functions: HOF expressions are interpreted (no
    whole-stage codegen), so 8 transform/array_min passes per row cost
    ~4x more than one codegen'd MIN aggregation over exploded shingles -
    and the explode+partial-agg shape is also the one that scales
    (map-side combine, no giant per-row arrays).  Docs with no shingles
    (< k words) are re-attached with NULL signatures to preserve the
    row-per-doc contract."""
    sh = _doc_shingles_fast(docs, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(
            f"mh{s}"
        )
        for s in range(MINHASH_SEEDS)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return docs.select("doc_id").join(sig, "doc_id", "left")


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
    # 4-way union that would recompute the shingler per branch; persist
    # because the self-join consumes the band table twice
    all_bands = (
        sig.filter(F.col("mh0").isNotNull())
        .select("doc_id", F.explode(band_keys).alias("band_key"))
        .persist()
    )
    all_bands.count()  # eager: both self-join sides must hit the cache,
    # not race to compute the signature lineage twice
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


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """SimHash over word tokens: dimension j uses hex digit j of
    md5(word); digit >= 8 votes +1 else -1; bit j = (sum > 0).

    Same explode -> codegen'd SUM aggregation shape as MinHash (per-row
    HOF voting is interpreted and ~10x slower).  Docs with no words get
    the all-zero fingerprint (matching the HOF formulation where every
    dimension sums to 0)."""
    toks = docs.select(
        "doc_id", F.explode(words_col(F.col(text_col))).alias("w")
    ).select("doc_id", F.md5("w").alias("h"))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.upper(F.substring("h", j + 1, 1)).isin(*"89ABCDEF"),
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    bits = F.concat(
        *[
            F.when(F.col(f"s{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = sums.select("doc_id", bits.alias("simhash"))
    return docs.select("doc_id").join(sig, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("simhash"), F.lit("0" * SIMHASH_BITS)).alias(
            "simhash"
        ),
    )
