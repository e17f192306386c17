"""Training-data curation operators beyond dedup: repetition quality
signals, benchmark decontamination, deterministic stratified sampling.

All three are standard large-corpus pipeline stages (Gopher/C4-style
repetition filters; GPT-3-style n-gram decontamination against held-out
benchmarks; mixture sampling by source weights).  Spark side is pure
JVM column expressions / one broadcast join; DuckDB oracle twins are
generated in plans/corpus.py from the same constants.

Scale notes
- repetition_stats: per-row array expressions only - no shuffle at all.
- decontaminate: doc-shingle explode is linear in corpus tokens; the
  benchmark shingle set is broadcast (benchmarks are MBs, corpora TBs),
  and the contaminated-id set flows back as a broadcast anti-join - the
  corpus is never shuffled.
- stratified_sample: a filter on md5 arithmetic - embarrassingly
  parallel, no shuffle, reproducible across runs/cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .neardup import words_col

# n-gram width for repetition signals (Gopher uses 2-4; 3 matches the
# neardup shingle width) and for decontamination overlap (longer grams
# ~= exact benchmark phrases; GPT-3 used 13, scaled down for the
# fixture-sized corpus here)
REPETITION_K = 3
DECONTAM_K = 8
SAMPLE_MOD = 1_000_000


def _grams_col(text: Column, k: int) -> Column:
    """ALL word k-grams (with repeats - repetition needs multiplicity,
    unlike the distinct shingles_col)."""
    w = words_col(text)
    n = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.array_join(F.slice(w, i + 1, k), " "),
    )
    return F.when(n >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def _ratio4(num: Column, den: Column) -> Column:
    raw = F.when(den == 0, F.lit(0.0)).otherwise(
        num.cast("double") / den.cast("double")
    )
    return F.floor(raw * 10000.0 + F.lit(0.5)) / 10000.0


def dup_ngram_ratio_col(text: Column, k: int = REPETITION_K) -> Column:
    """The duplicate-k-gram ratio as a bare column expression (the
    composed curation chain attaches it with withColumn - joining the
    ``repetition_stats`` frame back onto its own source would make the
    optimizer inline and re-evaluate the array expressions into every
    join branch)."""
    grams = _grams_col(text, k)
    total = F.size(grams)
    uniq = F.size(F.array_distinct(grams))
    return _ratio4(total - uniq, total)


def dup_ngram_ratio_agg(
    docs: DataFrame, text_col: str = "text", k: int = REPETITION_K
) -> DataFrame:
    """(doc_id, dup_ngram_ratio) by explode + lead-window + one hash
    aggregate - bit-identical values to :func:`dup_ngram_ratio_col`
    (the same integer total/distinct counts feed the same 4dp floor),
    ~10x faster on long documents: the per-row array formulation pays
    interpreted higher-order functions per gram (measured 14 s for the
    column vs 1.5 s for this shape over sf0.1), while the exploded form
    stays in whole-stage codegen.  Costs one shuffle on doc_id; docs
    with fewer than ``k`` words produce no grams and come back at ratio
    0.0 via the caller's left join + coalesce."""
    from pyspark.sql.window import Window

    from .cache import spread_input
    from .neardup import normalized_text_col

    # spread a few-split source: the normalize+explode map side runs on
    # the input partitioning until the window's doc_id shuffle
    w = (
        spread_input(docs.select("doc_id", F.col(text_col)), "doc_id")
        .select(
            "doc_id",
            F.posexplode(
                F.split(normalized_text_col(F.col(text_col)), " ")
            ).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("w", i).over(win) for i in range(1, k)]
    gram = F.when(
        leads[-1].isNotNull(), F.concat_ws(" ", F.col("w"), *leads)
    )
    g = w.select("doc_id", gram.alias("gram")).filter(
        F.col("gram").isNotNull()
    )
    return g.groupBy("doc_id").agg(
        _ratio4(
            F.count("*") - F.count_distinct(F.col("gram")), F.count("*")
        ).alias("dup_ngram_ratio")
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", k: int = REPETITION_K
) -> DataFrame:
    """Per-document repetition signals (Gopher-style quality gates):
    duplicate k-gram ratio (1 - distinct/total occurrences) and
    duplicate line ratio.  Pure per-row arrays - no shuffle."""
    text = F.col(text_col)
    grams = _grams_col(text, k)
    total = F.size(grams)
    uniq = F.size(F.array_distinct(grams))
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    n_lines = F.size(lines)
    u_lines = F.size(F.array_distinct(lines))
    return docs.select(
        "doc_id",
        total.alias("total_ngrams"),
        _ratio4(total - uniq, total).alias("dup_ngram_ratio"),
        n_lines.alias("total_lines"),
        _ratio4(n_lines - u_lines, n_lines).alias("dup_line_ratio"),
    )


def contaminated_doc_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = DECONTAM_K,
) -> DataFrame:
    """doc_ids sharing ANY word k-gram with the benchmark corpus
    (GPT-3-style n-gram decontamination).  The benchmark's distinct
    shingle set is broadcast; the corpus explodes once and semi-joins -
    linear, never shuffled on the corpus side."""
    from .cache import spread_input

    # the per-doc gram explode (interpreted HOFs over the full text)
    # runs pre-shuffle: spread a few-split corpus first
    doc_sh = spread_input(
        docs.select("doc_id", F.col(text_col)), "doc_id"
    ).select(
        "doc_id",
        F.explode(F.array_distinct(_grams_col(F.col(text_col), k))).alias(
            "shingle"
        ),
    )
    bench_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(_grams_col(F.col(text_col), k))
            ).alias("shingle")
        )
        .dropDuplicates(["shingle"])
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .dropDuplicates(["doc_id"])
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    k: int = DECONTAM_K,
) -> DataFrame:
    """docs minus any document sharing a k-gram with the benchmark.
    The contaminated-id set is tiny relative to the corpus - broadcast
    anti-join, corpus unshuffled."""
    bad = contaminated_doc_ids(docs, benchmark, text_col, k)
    return docs.join(F.broadcast(bad), "doc_id", "left_anti")


def sample_keep_col(
    id_col: Column, fraction: Column | float, salt: str = "samp"
) -> Column:
    """Deterministic Bernoulli keep-decision: fold md5(salt:id) to a
    60-bit int, keep when (fold % 1e6) < fraction * 1e6.  Identical
    arithmetic is expressible in any engine (the DuckDB twin uses the
    same md5), so samples are reproducible across runs, cluster sizes,
    and engines - unlike rand(seed), which is partitioning-dependent."""
    fold = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    frac = fraction if isinstance(fraction, Column) else F.lit(fraction)
    return (fold % SAMPLE_MOD) < (frac * SAMPLE_MOD).cast("bigint")


def stratified_sample(
    docs: DataFrame,
    weights: dict[str, float],
    group_col: str = "source",
    salt: str = "samp",
) -> DataFrame:
    """Per-group deterministic sampling by mixture weight (training-data
    mixture construction).  Groups absent from ``weights`` are dropped
    (weight 0).  A broadcast map join + filter - no shuffle."""
    import itertools

    pairs = list(itertools.chain.from_iterable(weights.items()))
    wmap = F.create_map(*[F.lit(x) for x in pairs])
    frac = wmap[F.col(group_col)]
    return docs.filter(
        frac.isNotNull() & sample_keep_col(F.col("doc_id"), frac, salt)
    )


# ---------------------------------------------------------------------------
# PII redaction (emails / IPv4 / international phone numbers)
# ---------------------------------------------------------------------------
# Standard pre-training scrub (C4/RefinedWeb-style).  Patterns are kept
# in the Java-regex AND RE2 common subset (character classes, bounded
# repetition, \b) so the DuckDB oracle twin applies the IDENTICAL
# expressions; replacement order is fixed (email -> ip -> phone) and
# deterministic in both engines.  Pure per-row regexp_replace /
# regexp_count - zero shuffle at any scale.

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9]{7,15}\b"

_PII_ORDER = (
    (PII_EMAIL_RE, "<EMAIL>"),
    (PII_IPV4_RE, "<IP>"),
    (PII_PHONE_RE, "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``redacted_text`` plus per-class match counts
    (``n_emails``, ``n_ips``, ``n_phones``).  Counts are taken on the
    ORIGINAL text; replacements are applied in the fixed class order,
    so the output is bit-identical across engines and cluster sizes."""
    text = F.col(text_col)
    red = text
    for pat, token in _PII_ORDER:
        red = F.regexp_replace(red, pat, token)
    return docs.withColumns(
        {
            "redacted_text": red,
            "n_emails": F.regexp_count(text, F.lit(PII_EMAIL_RE)),
            "n_ips": F.regexp_count(text, F.lit(PII_IPV4_RE)),
            "n_phones": F.regexp_count(text, F.lit(PII_PHONE_RE)),
        }
    )


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup with document reassembly
# ---------------------------------------------------------------------------
# RefinedWeb/C4-style: boilerplate paragraphs (headers, footers, license
# blocks) repeat across millions of documents; the FIRST global
# occurrence keeps the paragraph, every later document drops it and is
# reassembled from its surviving paragraphs in original order.  Scale
# shape: one explode (linear in corpus paragraphs), one hash aggregate
# on the normalized paragraph (map-side combined - the min(struct) is
# computed per partition before the shuffle), one join back, one
# reassembly aggregate keyed by doc_id.  No windows, no sorts beyond
# the per-document array_sort over that document's own paragraphs.


def _paragraphs_col(text: Column) -> Column:
    """Non-empty trimmed segments split on newline runs."""
    return F.filter(
        F.transform(F.split(text, r"\n+"), lambda p: F.trim(p)),
        lambda p: p != "",
    )


def dedup_paragraphs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_dedup, n_paras, n_kept): keep-first paragraph
    dedup across the corpus, first occurrence = lowest (doc_id,
    position).  Paragraph identity is the whitespace-collapsed
    lower-cased text; reassembly preserves each document's own
    paragraph order and joins with a single newline.  Documents whose
    every paragraph was seen earlier come back with ``text_dedup = ''``
    (callers drop or keep them by policy)."""
    paras = docs.select(
        "doc_id",
        F.posexplode(_paragraphs_col(F.col(text_col))).alias(
            "pos", "para"
        ),
    ).withColumn(
        "pkey",
        F.trim(F.regexp_replace(F.lower(F.col("para")), r"\s+", " ")),
    )
    # the kept set IS the min aggregate: carrying `para` in the struct
    # (it never influences the ordering - (doc_id, pos) is unique)
    # avoids joining every occurrence back against the winners, which
    # would concentrate a mass-shared boilerplate paragraph's millions
    # of occurrences onto one join key.  The hot key costs ONE reduced
    # row here, and the aggregate is map-side combined.
    kept = paras.groupBy("pkey").agg(
        F.min(F.struct("doc_id", "pos", "para")).alias("f")
    ).select("f.doc_id", "f.pos", "f.para")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "para"))
                ),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("text_dedup"),
        F.count("*").alias("n_kept"),
    )
    sizes = docs.select(
        "doc_id",
        F.size(_paragraphs_col(F.col(text_col))).alias("n_paras"),
    )
    return (
        sizes.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    val_pct: int = 10,
    max_iter: int = 20,
) -> DataFrame:
    """Train/validation split that near-duplicates can NEVER straddle.

    A plain hash split leaks: a near-copy of a validation document
    lands in train and the eval is contaminated (the exact failure
    n-gram decontamination guards against, but INTERNAL to the corpus).
    Here the unit of assignment is the connected component of the
    verified near-dup pair graph - every member of a duplicate family
    rides its component representative (min id) into the same side.

    Returns (id_col, component, split) with split in {'train', 'val'};
    ``val_pct``/100 of COMPONENTS go to val.  Assignment is md5
    arithmetic on the component id - deterministic across runs,
    cluster sizes, and engines (the DuckDB oracle reproduces it).

    Scale shape: component labels come from min-label propagation
    (O(diameter) rounds) over the pair graph - pairs only, never the
    corpus; the corpus sees one left join against the (tiny) labeled
    set plus pure per-row hash arithmetic.  Unpaired documents - the
    overwhelming majority - short-circuit to their own id via
    coalesce, costing nothing.
    """
    from .graph import connected_components

    edges = pairs.select(
        F.col(a_col).alias("subj"), F.col(b_col).alias("obj")
    )
    cc = connected_components(edges, max_iter=max_iter).withColumnRenamed(
        "node", id_col
    )
    lab = (
        docs.select(id_col)
        .join(cc, id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("component"),
        )
    )
    fold = (
        F.conv(
            F.substring(F.md5(F.col("component").cast("string")), 1, 4),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return lab.select(
        id_col,
        "component",
        F.when(fold < val_pct, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def exact_quota_sample(
    docs: DataFrame,
    frac_num: int = 1,
    frac_den: int = 5,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """(strata, id, rnk): EXACT-quota deterministic stratified sample -
    within each stratum, rows are ranked by md5(id) (a fixed, seedless,
    engine-portable permutation) and the first floor(n · num/den) are
    kept.

    ``stratified_sample`` (Bernoulli on the same md5 arithmetic) hits
    the target fraction only in expectation; a mixture recipe with a
    hard per-source token budget needs the quota EXACT, which costs one
    rank.  All comparisons are integer (rnk · den <= n · num), so the
    kept set is bit-identical across engines and cluster sizes.

    Scale shape: one window per stratum (row_number + count over the
    stratum partition - a single shuffle on the stratum key).  Strata
    are coarse (sources, domains), so per-partition width is the
    stratum size: for billion-row strata switch to the two-pass variant
    (aggregate exact counts, broadcast, then filter on the same md5
    rank order via a per-stratum threshold) - same semantics, no wide
    window."""
    from pyspark.sql.window import Window

    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(order.asc(),
                                               F.col(id_col).asc())
    wc = Window.partitionBy(strata_col)
    ranked = docs.select(
        F.col(strata_col).alias("strata"),
        F.col(id_col).alias("id"),
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(wc).alias("n_str"),
    )
    return ranked.filter(
        F.col("rnk") * F.lit(frac_den) <= F.col("n_str") * F.lit(frac_num)
    ).select("strata", "id", "rnk")


def dup_span_coverage(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DECONTAM_K,
) -> DataFrame:
    """Exact-substring dedup accounting (the deduplicate-text-datasets
    motif, Lee et al. 2022, at token-span granularity): for every doc,
    how many tokens sit inside a maximal span covered by CROSS-document
    duplicated ``k``-grams.

    Shape (all window algebra, zero UDFs, one shuffle per step):
    tokenize with positions (explode + lead window - the fast k-gram
    shape, see dup_ngram_ratio_agg) -> grams duplicated across >= 2
    docs (groupBy gram) -> covered intervals [pos, pos+k-1] -> classic
    island merge per doc: a row opens a new island iff its start
    exceeds the running max end of all earlier intervals (running max
    via ROWS UNBOUNDED PRECEDING..1 PRECEDING), island id = running sum
    of the open flags.  Returns per-doc
    ``(doc, n_islands, removed_tokens)`` - only affected docs.

    The gram-side join is a plain shuffle join: at 100 TB the
    duplicated-gram set is NOT broadcastable and partitions by gram
    hash; AQE may still broadcast it at fixture scale."""
    from pyspark.sql.window import Window

    toks = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.posexplode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("idx", "term"),
        )
        .filter(F.col("term") != "")
    )
    wdoc = Window.partitionBy("doc").orderBy(F.col("idx").asc())
    toks = toks.select(
        "doc", "term",
        (F.row_number().over(wdoc) - F.lit(1)).alias("pos"),
    )
    wpos = Window.partitionBy("doc").orderBy(F.col("pos").asc())
    leads = [F.lead("term", i).over(wpos) for i in range(1, k)]
    sp = toks.select(
        "doc", "pos",
        F.when(
            leads[-1].isNotNull(),
            F.concat_ws(" ", F.col("term"), *leads),
        ).alias("gram"),
    ).filter(F.col("gram").isNotNull())
    dup = (
        sp.groupBy("gram")
        .agg(F.count_distinct("doc").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    iv = sp.join(dup, "gram").select(
        "doc", F.col("pos").alias("s"), (F.col("pos") + F.lit(k - 1)).alias("e")
    )
    ws = Window.partitionBy("doc").orderBy(F.col("s").asc())
    prev_max = F.max("e").over(
        ws.rowsBetween(Window.unboundedPreceding, -1)
    )
    fl = iv.withColumn(
        "nw",
        F.when(
            prev_max.isNull() | (F.col("s") > prev_max), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    isl = fl.withColumn("island", F.sum("nw").over(ws))
    merged = isl.groupBy("doc", "island").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    return merged.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("ie") - F.col("is_") + F.lit(1)).alias(
            "removed_tokens"
        ),
    )


def temperature_quotas(
    docs: DataFrame,
    budget: int,
    alpha: float = 0.5,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based mixture quotas (the multilingual/multi-source
    sampling rule p_i ~ c_i^alpha): per source, the integer number of
    documents to draw for a ``budget``-doc mixture, rounded by largest
    remainder so the quotas sum to the budget EXACTLY.

    alpha < 1 flattens the natural distribution (upweights rare
    sources), alpha = 1 is proportional.  One hash aggregate over the
    corpus; everything after is per-source-cardinality work (two scalar
    cross joins + one window over the source list).  pow/sqrt are
    IEEE-correctly-rounded on both engines, so the double arithmetic -
    and therefore the integer quotas - are oracle-exact.
    """
    from pyspark.sql.window import Window

    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = counts.withColumn(
        "__w", F.pow(F.col("n_docs").cast("double"), F.lit(alpha))
    )
    z = w.agg(F.sum("__w").alias("__z"))
    shares = w.crossJoin(F.broadcast(z)).withColumn(
        "__t", F.lit(float(budget)) * F.col("__w") / F.col("__z")
    )
    based = shares.select(
        "source", "n_docs",
        F.floor(F.col("__t")).cast("bigint").alias("__base"),
        (F.col("__t") - F.floor(F.col("__t"))).alias("__rem"),
    )
    used = based.agg(F.sum("__base").alias("__used"))
    wr = Window.orderBy(F.col("__rem").desc(), F.col("source").asc())
    return (
        based.crossJoin(F.broadcast(used))
        .withColumn("__rnk", F.row_number().over(wr))
        .select(
            "source", "n_docs",
            (
                F.col("__base")
                + F.when(
                    F.col("__rnk") <= F.lit(budget) - F.col("__used"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("quota"),
        )
    )


def doc_novelty(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty_r) — per document, the
    fraction of its distinct shingles whose FIRST owner (minimum
    doc_id) is this document: the corpus-redundancy accounting curve.
    A crawl ordered by fetch time shows novelty decaying as the corpus
    saturates; documents near 0 novelty are pure recombinations of
    already-seen text — the aggregate view the per-pair dedup
    operators (Jaccard/LSH/containment) cannot give.

    Plan: one shingle explode (shared shape with the dedup suite), one
    map-side-combined MIN per shingle, one join back, one grouped
    count — no pairwise term anywhere, so this runs where the O(pairs)
    operators cannot.  Docs with fewer than k words carry no shingles
    and are absent, like every shingle-based operator here."""
    from .neardup import _doc_shingles

    sh = _doc_shingles(docs, text_col)
    first = sh.groupBy("shingle").agg(
        F.min("doc_id").alias("first_doc")
    )
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1)
                .otherwise(0)
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (
                F.floor(
                    F.col("n_novel")
                    / F.col("n_shingles")
                    * 10000.0
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("novelty_r"),
        )
    )


#: dyadic uniform modulus: 2^30 keeps (fold % M + 0.5) / M exactly
#: representable, so u is bit-identical in any IEEE engine
_WS_MOD = 1 << 30


def weighted_sample_key_col(
    id_col: Column, weight_col: Column, salt: str = "wsamp"
) -> Column:
    """Efraimidis–Spirakis (2006) A-Res key u^(1/w): taking the top-k
    keys draws a weighted sample WITHOUT replacement where inclusion
    probability follows the weights — the one-pass, merge-able,
    coordination-free way to downsample a 100 TB corpus by token
    count / quality weight (a rand()-based pass is partitioning-
    dependent and unreproducible).

    u is md5-derived and DYADIC ((fold % 2^30 + 0.5) / 2^30), so it is
    bit-identical across engines; pow is the only libm call, and
    consumers rank on an 8dp-rounded key with the id as tie-break, so
    a last-ulp pow divergence cannot change the selected set."""
    fold = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = ((fold % F.lit(_WS_MOD)).cast("double") + F.lit(0.5)) / F.lit(
        float(_WS_MOD)
    )
    return F.pow(u, F.lit(1.0) / weight_col.cast("double"))


def weighted_sample_key_sql(
    id_expr: str, weight_expr: str, salt: str = "wsamp"
) -> str:
    """DuckDB twin of :func:`weighted_sample_key_col`."""
    fold = (
        f"CAST(concat('0x', substr(md5('{salt}:' || "
        f"CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return (
        f"pow((CAST({fold} % {_WS_MOD} AS DOUBLE) + 0.5) / "
        f"{float(_WS_MOD)}, 1.0 / CAST({weight_expr} AS DOUBLE))"
    )
