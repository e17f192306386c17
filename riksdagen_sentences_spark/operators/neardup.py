"""Near-duplicate detection operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale notes (the whole point of these operators):

- **exact**: hash-groupBy on sha256(normalized text) - map-side partial
  agg, no skew issue (hashes are uniform).
- **n-gram Jaccard**: the exact baseline; the shingle self-join is
  quadratic in the hottest shingle, so it is the thing MinHash exists to
  replace - keep it for verification at small SF, use MinHash at 100 TB.
- **MinHash+LSH**: signature = per-seed min over the first 15 hex digits
  of md5(seed || shingle) FOLDED TO BIGINT (``conv(hex,16,10)``): md5 is
  identical in Spark and DuckDB so the oracle is exact, and a BIGINT min
  keeps both aggregation phases in whole-stage-codegen HashAggregate
  (string MIN buffers force SortAggregate).  Band keys bucket candidates
  so the join is linear in bucket sizes; ``n_perm``/``bands`` are
  parameters (8/4 for the oracle-twinned queries, 128/32 for the
  production-scale configuration exercised in tests/bench).
- **LSH verification**: ``lsh_verified_pairs`` re-checks exact Jaccard on
  the candidate set only - candidates are precision-unbounded by
  construction, so the verify stage is what a 100 TB dedup actually acts
  on (the all-pairs ``ngram_jaccard_pairs`` is the small-SF baseline it
  replaces).
- **SimHash**: per-hex-digit sign aggregation over token md5s - a bit
  fingerprint; ``simhash_neardup_pairs`` produces the near-dup pairs via
  banded bucketing (join on band equality, never all-pairs) + Hamming
  verification within candidates.

Everything is pure column expressions - no UDFs, no driver loops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cache import spread_input as _spread_input
from .cache import track
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

    # the normalize+split+explode map side runs on the INPUT
    # partitioning (everything before the window's doc_id shuffle):
    # spread a few-split source first (no-op at production split
    # counts - see cache.spread_input)
    w = (
        _spread_input(docs.select("doc_id", F.col(text_col)), "doc_id")
        .select(
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


def _minhash_term(seed: int) -> F.Column:
    """min-term for one permutation: first 15 hex digits of
    md5(seed || ':' || shingle) folded to BIGINT.  15 hex digits = 60
    bits < 63, so the fold is exact; a BIGINT agg buffer keeps the MIN in
    HashAggregate (a string buffer would force SortAggregate)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col("shingle"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")


def _signatures_from_shingles(sh: DataFrame, n_perm: int) -> DataFrame:
    aggs = [
        F.min(_minhash_term(s)).alias(f"mh{s}") for s in range(n_perm)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n_perm: int = MINHASH_SEEDS
) -> DataFrame:
    """Per-seed min over md5(seed || ':' || shingle), folded to bigint.

    Formulated as explode -> hash-aggregate rather than per-row
    higher-order functions: HOF expressions are interpreted (no
    whole-stage codegen), so n_perm transform/array_min passes per row
    cost ~4x more than one codegen'd MIN aggregation over exploded
    shingles - and the explode+partial-agg shape is also the one that
    scales (map-side combine, no giant per-row arrays).  Docs with no
    shingles (< k words) are re-attached with NULL signatures to preserve
    the row-per-doc contract."""
    sh = _doc_shingles_fast(docs, text_col)
    sig = _signatures_from_shingles(sh, n_perm)
    return docs.select("doc_id").join(sig, "doc_id", "left")


def _band_table(sig: DataFrame, n_perm: int, bands: int) -> DataFrame:
    """(doc_id, band_key) - one row per band per signed doc.  One pass
    over the signatures: explode the band array instead of a bands-way
    union that would recompute the signature lineage per branch."""
    rows_per_band = n_perm // bands
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(band)),
                    *[
                        F.col(f"mh{band * rows_per_band + r}").cast(
                            "string"
                        )
                        for r in range(rows_per_band)
                    ],
                )
            )
            for band in range(bands)
        ]
    )
    return sig.filter(F.col("mh0").isNotNull()).select(
        "doc_id", F.explode(band_keys).alias("band_key")
    )


def _pairs_from_bands(all_bands: DataFrame) -> DataFrame:
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


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n_perm: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band key.

    Scale path: band-key groupBy is linear in bucket sizes.  Candidates
    are precision-unbounded - pipe them through
    :func:`lsh_verified_pairs` before acting on them.
    """
    sh = _doc_shingles_fast(docs, text_col)
    sig = _signatures_from_shingles(sh, n_perm)
    # persist: both self-join sides must hit the cache, not race to
    # compute the signature lineage twice.  Tracked for cache.release_
    # intermediates() - the caller unpersists after materializing.
    all_bands = track(_band_table(sig, n_perm, bands).persist())
    all_bands.count()
    return _pairs_from_bands(all_bands)


def lsh_verified_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.2,
    n_perm: int = MINHASH_SEEDS,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """LSH candidates + exact Jaccard verification ON THE CANDIDATE SET
    ONLY: (doc_a, doc_b, jaccard) with jaccard >= threshold.

    This is how MinHash-LSH is actually used at 100 TB: the banded join
    produces a small candidate set (linear), then the exact re-check runs
    per-candidate (shingles join candidates, never shingles join
    shingles) - contrast with the quadratic all-pairs
    :func:`ngram_jaccard_pairs`, which exists only as the small-SF
    verification baseline.  Output rows are a subset of
    :func:`lsh_candidate_pairs` by construction."""
    sh = track(_doc_shingles_fast(docs, text_col).persist())
    sig = _signatures_from_shingles(sh, n_perm)
    all_bands = track(_band_table(sig, n_perm, bands).persist())
    # ONE eager materialization: computing the band table fills the
    # shingle cache on the way (jobs here are sequential - no race),
    # so a separate sh.count() barrier would only add a job; the verify
    # joins and size aggregate below then read both caches
    all_bands.count()
    cand = _pairs_from_bands(all_bands)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    # candidate-restricted intersection: |sh| x candidate-degree, linear
    inter = (
        sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        .join(cand, "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.floor(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast(
                    "double"
                )
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0,
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_HEX = "0123456789abcdef"


SIMHASH64_PREFIX = "b:"  # second-word-hash salt for dimensions 32..63


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash over word tokens: dimension j uses hex digit j of
    md5(word) (dimensions 32..63 use md5('b:' || word), giving the
    64-bit production configuration while keeping the DuckDB oracle
    exact - md5 is identical in both engines); digit >= 8 votes +1 else
    -1; bit j = (sum > 0).

    Same explode -> codegen'd SUM aggregation shape as MinHash (per-row
    HOF voting is interpreted and ~10x slower).  Docs with no words get
    the all-zero fingerprint (matching the HOF formulation where every
    dimension sums to 0).  ``bits`` <= 64 (two md5s' hex digits)."""
    if bits > 64:
        raise ValueError(f"simhash bits must be <= 64, got {bits}")
    hash_cols = [F.md5("w").alias("h")]
    if bits > 32:
        hash_cols.append(
            F.md5(F.concat(F.lit(SIMHASH64_PREFIX), F.col("w"))).alias(
                "h2"
            )
        )
    # Fold the hex digits each dimension votes on into 16-bit BIGINT
    # sub-chunks once per token (4 hex digits per conv - exact), so the
    # per-dimension vote in the aggregate is shift+mask integer
    # arithmetic instead of substring+uppercase+IN over characters:
    # "digit >= 8" is exactly "high bit of the nibble set".  Identical
    # output to the character formulation (the oracle SQL keeps the
    # character form - DuckDB runs it once at fixture scale).
    n_chunks = [(min(bits, 32) + 3) // 4, (max(bits - 32, 0) + 3) // 4]
    sub_cols = []
    for src_idx, src in enumerate(["h", "h2"][: len(hash_cols)]):
        for c in range(n_chunks[src_idx]):
            sub_cols.append(
                F.conv(F.substring(src, 4 * c + 1, 4), 16, 10)
                .cast("bigint")
                .alias(f"u{src_idx}_{c}")
            )
    # The md5s + votes are computed in the partial aggregate, which runs
    # on the INPUT partitioning - spread a single-split source first.
    toks = (
        _spread_input(docs.select("doc_id", F.col(text_col)), "doc_id")
        .select(
            "doc_id", F.explode(words_col(F.col(text_col))).alias("w")
        )
        .select("doc_id", *hash_cols)
        .select("doc_id", *sub_cols)
    )

    def _vote(j: int) -> Column:
        src_idx, d = (0, j) if j < 32 else (1, j - 32)
        chunk, p = d // 4, d % 4
        return F.shiftrightunsigned(
            F.col(f"u{src_idx}_{chunk}"), 4 * (3 - p) + 3
        ).bitwiseAND(F.lit(1))

    # +1/-1 vote sum == 2*(count of set high bits) - n, so "sum > 0"
    # is "2*s_j > n" - one shared COUNT instead of 64 CASE branches.
    sums = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(_vote(j)).alias(f"s{j}") for j in range(bits)],
    )
    bit_str = F.concat(
        *[
            F.when(
                F.col(f"s{j}") * 2 > F.col("n"), F.lit("1")
            ).otherwise(F.lit("0"))
            for j in range(bits)
        ]
    )
    sig = sums.select("doc_id", bit_str.alias("simhash"))
    return docs.select("doc_id").join(sig, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("simhash"), F.lit("0" * bits)).alias("simhash"),
    )


def hamming_col(a: F.Column, b: F.Column, bits: int) -> F.Column:
    """Hamming distance between two fixed-length '0'/'1' strings:
    32-bit chunks are folded to BIGINT (``conv(_, 2, 10)``), XORed, and
    popcounted with ``bit_count`` - ~6 codegen expressions total.  The
    per-position formulation (64 ``substring != substring`` terms) cost
    128 string allocations PER ROW and dominated the 64-bit pairing's
    verify stage ~10x."""

    def _chunk(col: F.Column, start: int, width: int) -> F.Column:
        return F.conv(F.substring(col, start, width), 2, 10).cast(
            "bigint"
        )

    terms = []
    pos = 1
    while pos <= bits:
        w = min(32, bits - pos + 1)
        terms.append(
            F.bit_count(_chunk(a, pos, w).bitwiseXOR(_chunk(b, pos, w)))
        )
        pos += w
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via banded bucketing + Hamming verify:
    (doc_a, doc_b, hamming) with hamming <= max_hamming.

    Pigeonhole: two fingerprints within ``max_hamming`` <= bands - 1 bit
    flips MUST agree on at least one of ``bands`` equal-width bands, so
    the band-equality join finds every true pair while staying linear in
    bucket sizes (never all-pairs).  The Hamming re-check then removes
    band-collision false positives.  This is the pairing half that makes
    the fingerprints useful.  The production configuration is
    ``bits=64, bands=4`` (4 x 16-bit bands - the two-md5 fingerprint
    keeps the DuckDB oracle exact at 64 bits too); 32/4 remains as the
    cheaper demo configuration."""
    if max_hamming > bands - 1:
        raise ValueError(
            "banded SimHash misses pairs when max_hamming > bands - 1 "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    band_w = bits // bands
    if band_w > 62:
        raise ValueError(
            f"band width {band_w} exceeds the exact BIGINT fold"
        )
    fp = simhash_fingerprints(docs, text_col, bits=bits)

    # Fold the '0'/'1' fingerprint into <=32-bit BIGINT chunks ONCE per
    # doc (32 binary digits < 63 bits - exact, same argument as the
    # minhash fold above), and the band key likewise.  The join then
    # carries only small integers: no 64-char strings through the
    # exchange, and the Hamming verify is bit_count(XOR) per chunk
    # instead of re-parsing both strings per candidate pair.
    def _b2(col: Column, start: int, width: int) -> Column:
        return F.conv(F.substring(col, start, width), 2, 10).cast(
            "bigint"
        )

    chunk_cols = []
    pos = 1
    while pos <= bits:
        w = min(32, bits - pos + 1)
        chunk_cols.append(
            _b2(F.col("simhash"), pos, w).alias(f"c{len(chunk_cols)}")
        )
        pos += w
    banded = fp.select(
        "doc_id",
        *chunk_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_no"),
                        _b2(
                            F.col("simhash"), i * band_w + 1, band_w
                        ).alias("band"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select(
        "doc_id", *[f"c{i}" for i in range(len(chunk_cols))],
        "b.band_no", "b.band",
    )
    # Repartition by band key BEFORE caching: a small source (one
    # parquet split) would otherwise persist as a single partition and
    # run the whole self-join probe + verify serially in one task.
    banded = track(banded.repartition("band_no", "band").persist())
    banded.count()  # both self-join sides read the cache
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = reduce(
        lambda x, y: x + y,
        [
            F.bit_count(
                F.col(f"a.c{i}").bitwiseXOR(F.col(f"b.c{i}"))
            )
            for i in range(len(chunk_cols))
        ],
    )
    return (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        # verify BEFORE distinct: hamming is a function of the pair, so
        # filtering first is equivalent but shrinks the distinct's input
        # from every band collision to just the true near-dup pairs
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .select(
            "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
        )
    )


def component_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-CLUSTER dedup: keep exactly ONE document per weakly
    connected component of the near-dup pair graph (the component's min
    id), dropping every other member.  Returns the surviving rows of
    ``docs`` unchanged.

    This is the third dedup semantics in the suite, and the strictest:

    - greedy drop-``doc_b`` (plans/curate.py): drops the larger id of
      every pair - survivors are the id-local minima,
    - semantic_dedup (operators/similarity.py): same local-minima rule,
      cluster-pruned in embedding space,
    - component_dedup (here): transitively closes the pair graph first,
      so a chain a~b~c with NO a~c pair still collapses to just a.

    On the path graph (1,3),(2,3) the greedy rule keeps {1, 2} (2's only
    neighbor is the higher id 3); this keeps {1} - the pair graph is one
    component.  Use this when near-duplication is transitive in the
    corpus (boilerplate families, mirrored sites); use the greedy rule
    when chained false positives must not wipe distinct content.

    Scale shape: min-label propagation is O(component diameter) shuffle
    rounds (operators/graph.connected_components docstring has the
    high-diameter contraction alternative); the dropped set is one
    filter over the labels; survivors come back via one left_anti join
    that AQE turns into a broadcast when the dropped set is small.
    """
    from .graph import connected_components

    edges = pairs.select(
        F.col(a_col).alias("subj"), F.col(b_col).alias("obj")
    )
    cc = connected_components(edges, max_iter=max_iter)
    dropped = (
        cc.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(dropped, on=id_col, how="left_anti")


def prefix_jaccard_pairs(
    docs: DataFrame,
    t_num: int = 3,
    t_den: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(a, b, isz, usz, jac_r): ALL document pairs whose word-SHINGLE
    set Jaccard similarity is >= t_num/t_den, found without an
    all-pairs join via AllPairs/PPJoin-style prefix filtering - the
    EXACT counterpart of the probabilistic MinHash+LSH pipeline (same
    SHINGLE_K-gram sets), with a deterministic no-missed-pairs
    guarantee instead of a banding recall bound.

    Under any global total order on tokens, a pair with |x ∩ y| >= α
    must share a token inside each set's first |set| - α + 1 tokens
    (if the smallest common token sat outside x's prefix, ALL common
    tokens would sit in x's (α-1)-sized suffix - contradiction).  With
    J(x,y) >= t it holds that |x ∩ y| >= ceil(t·|x|) and ceil(t·|y|),
    so joining on prefix tokens of length |x| - ceil(t·|x|) + 1 yields
    a candidate set that provably contains every qualifying pair; exact
    Jaccard is then verified on candidates only.  The global order is
    (document frequency ASC, token ASC): rare-first prefixes keep the
    candidate join sparse - the hottest token lands in almost no prefix.

    The threshold is a RATIONAL t_num/t_den and every filter compares
    integers (ceil(t·n) = (t_num·n + t_den - 1) // t_den;
    J >= t  <=>  t_den·isz >= t_num·usz), so Spark and a SQL oracle
    agree bit-for-bit; the reported jac_r = floor(isz/usz·1e4 + 0.5)/1e4
    is one double division of two exact integers.

    Scale shape: one explode + distinct for the token sets, one hash
    aggregate for document frequency, one row_number window per doc
    (partitioned by doc - no global sort), a candidate join keyed on
    prefix tokens (linear in per-token prefix occurrence, the quantity
    prefix filtering minimizes), and a verify join restricted to
    candidates.  The all-pairs ``ngram_jaccard_pairs`` baseline is what
    this replaces at scale.
    """
    from pyspark.sql.window import Window

    toks = (
        _doc_shingles(docs.withColumnRenamed(id_col, "doc_id"), text_col)
        .select(F.col("doc_id").alias("doc"), F.col("shingle").alias("term"))
        .persist()
    )
    sizes = toks.groupBy("doc").agg(F.count("*").alias("sz"))
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    ranked = (
        toks.join(dfreq, "term")
        .withColumn("r", F.row_number().over(w))
        .join(sizes, "doc")
    )
    # prefix length = sz - ceil(t*sz) + 1, all-integer
    alpha = F.floor(
        (F.lit(t_num) * F.col("sz") + F.lit(t_den - 1)) / F.lit(t_den)
    )
    pref = ranked.filter(F.col("r") <= F.col("sz") - alpha + 1).select(
        "doc", "term", "r", "sz"
    )
    # PPJoin positional filter: a shared prefix token at ranks (ra, rb)
    # bounds the overlap by 1 + min(sza - ra, szb - rb) (every other
    # common token is globally larger, so it ranks strictly behind in
    # BOTH sets); the smallest common token of a qualifying pair always
    # survives this bound (monotonicity of t_den*o >= t_num*(|union|)),
    # so pruning rows whose bound cannot reach the threshold is exact.
    ub = F.lit(1) + F.least(
        F.col("sza") - F.col("ra"), F.col("szb") - F.col("rb")
    )
    cand = (
        pref.select(
            F.col("doc").alias("a"), "term",
            F.col("r").alias("ra"), F.col("sz").alias("sza"),
        )
        .join(
            pref.select(
                F.col("doc").alias("b"), "term",
                F.col("r").alias("rb"), F.col("sz").alias("szb"),
            ),
            "term",
        )
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.lit(t_den) * ub
            >= F.lit(t_num) * (F.col("sza") + F.col("szb") - ub)
        )
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    inter = (
        cand.join(toks.select(F.col("doc").alias("a"), "term"), "a")
        .join(toks.select(F.col("doc").alias("b"), "term"), ["b", "term"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("isz"))
    )
    out = (
        inter.join(
            sizes.select(F.col("doc").alias("a"), F.col("sz").alias("sza")),
            "a",
        )
        .join(
            sizes.select(F.col("doc").alias("b"), F.col("sz").alias("szb")),
            "b",
        )
        .withColumn("usz", F.col("sza") + F.col("szb") - F.col("isz"))
        .filter(
            F.lit(t_den) * F.col("isz") >= F.lit(t_num) * F.col("usz")
        )
        .select(
            "a", "b", "isz", "usz",
            (
                F.floor(
                    F.col("isz") / F.col("usz") * 10000.0 + F.lit(0.5)
                ) / 10000.0
            ).alias("jac_r"),
        )
    )
    track(toks)
    return out


def containment_pairs(
    docs: DataFrame, text_col: str = "text", threshold: float = 0.8
) -> DataFrame:
    """(doc_a, doc_b, containment) — DIRECTIONAL shingle containment
    |A ∩ B| / |A| ≥ threshold: doc_a's content substantially appears
    inside doc_b (quotation, excerpt, wrapper-page inclusion).  The
    case symmetric Jaccard structurally misses: a 100-word doc fully
    quoted inside a 10,000-word doc has Jaccard ≈ 0.01 but
    containment 1.0 — exactly the dedup blind spot Lee et al. 2022
    flag for exact-substring handling.

    Both directions are emitted as separate ordered pairs; floor-4dp
    rounding keeps the ratio engine-portable (inter and |A| are exact
    integers).  Plan shape: the same shared-shingle posting-list join
    as ngram_jaccard_pairs — linear in true intersection mass; a
    corpus-boilerplate hot shingle fans out quadratically there, and
    the standard mitigation (drop shingles above a document-frequency
    cap before the join) applies upstream of this operator."""
    sh = _doc_shingles(docs, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") != F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    c = (
        inter.join(
            sizes.select(
                F.col("doc_id").alias("doc_a"),
                F.col("n_shingles").alias("na"),
            ),
            "doc_a",
        )
        .withColumn(
            "containment",
            F.floor(
                F.col("inter").cast("double")
                / F.col("na").cast("double")
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0,
        )
        .filter(F.col("containment") >= threshold)
    )
    return c.select("doc_a", "doc_b", "containment")
