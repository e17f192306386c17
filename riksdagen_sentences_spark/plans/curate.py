"""The composed training-data curation chain, shared VERBATIM between
the spark-submit job (jobs/curate_corpus.py) and the oracled driver
query (plans/corpus.py `curated_training_corpus_v2`) - the production
pipeline shape itself sits under the DuckDB oracle, not just its
individual stages.

Stage order (each the bucketed/broadcast variant - no all-pairs, the
corpus is never shuffled by decontamination or sampling):

1. quality + repetition gate (textstats.quality_score_col,
   curation.repetition_stats - pure per-row column algebra),
2. exact dedup (normalized-sha256 fingerprint, keep MIN(doc_id)),
3. LSH-verified near-dup removal computed over the CURRENT SURVIVORS -
   not the raw input - so a surviving copy can never be dropped on
   account of a keeper that was itself already removed by an earlier
   gate (which would eliminate every copy of that content),
4. n-gram decontamination against a benchmark corpus (optional),
5. deterministic stratified mixture sample by source weight (optional).

Sequence packing (operators/packing.py) composes AFTER the chain on
the survivor set; callers attach it where needed (the job behind
--pack-capacity, the driver query unconditionally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import curation as CU
from ..operators import neardup as ND
from ..operators import textstats as TS


def curation_stages(
    docs: DataFrame,
    min_quality: float = 0.3,
    max_dup_ngram_ratio: float = 0.3,
    neardup_threshold: float = 0.5,
    benchmark: DataFrame | None = None,
    weights: dict[str, float] | None = None,
    cache: bool = True,
) -> dict[str, DataFrame]:
    """Ordered survivor frames, one per stage: ``input`` ->
    ``quality_rep`` -> ``exact_dedup`` -> ``neardup`` [->
    ``decontam``] [-> ``sample``].  Every frame after ``input`` carries
    the doc columns plus (quality, fingerprint, bpe_tokens,
    dup_ngram_ratio), so downstream stages (LSH shingles, packing token
    budgets) read the already-joined row instead of re-deriving.

    ``cache=True`` persists the two multiply-consumed cut-points (the
    exact-dedup survivors feed the LSH pair mining AND the anti-join;
    the near-dup survivors feed decontamination AND sampling) - the
    same shape production would materialize as tables between stages
    (jobs/curate_corpus.py writes exactly these).  Blocks live until
    ``spark.catalog.clearCache()`` or session end."""
    # enrichment as BARE COLUMN EXPRESSIONS, not a self-join of derived
    # projection frames: joining docs against doc_stats(docs) makes the
    # optimizer inline the (interpreted-HOF-heavy) stat trees into every
    # join branch and drags the unused langid expressions along.  The
    # repetition ratio instead comes from the codegen explode+aggregate
    # shape (dup_ngram_ratio_agg - ~10x the per-row array formulation);
    # an AGGREGATE result is an optimizer barrier, so joining it back
    # cannot re-inline anything.
    from ..operators.cache import spread_input

    # spread a few-split source ONCE at chain entry: the enrichment
    # projection (quality/fingerprint/bpe-token expressions over full
    # document text) is pre-shuffle, per-row work and would otherwise
    # run on the input partitioning - one task for a one-split corpus
    # (no-op at production split counts)
    docs = spread_input(docs, "doc_id")
    text = F.col("text")
    rep = CU.dup_ngram_ratio_agg(docs)
    enriched = docs.select(
        "*",
        TS.quality_score_col(text).alias("quality"),
        TS.fingerprint_col(text).alias("fingerprint"),
        TS.bpe_token_count_col(text).alias("bpe_tokens"),
    ).join(rep, "doc_id", "left").withColumn(
        "dup_ngram_ratio",
        F.coalesce(F.col("dup_ngram_ratio"), F.lit(0.0)),
    )

    stages: dict[str, DataFrame] = {"input": docs}
    d = enriched.filter(
        (F.col("quality") >= min_quality)
        & (F.col("dup_ngram_ratio") <= max_dup_ngram_ratio)
    )
    if cache:
        # the quality/repetition expressions are the most expensive
        # per-row work in the chain, and this frame feeds BOTH sides of
        # the exact-dedup semi-join (the keep aggregate and the probe):
        # unpersisted, the whole enrichment lineage evaluates twice
        d = d.persist()
    stages["quality_rep"] = d

    keep = d.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    d = d.join(keep, ["fingerprint", "doc_id"], "left_semi")
    if cache:
        d = d.persist()
    stages["exact_dedup"] = d

    # near-dup pairs over the survivor set: doc_a (the kept lower id)
    # is guaranteed to still be IN the corpus when doc_b is dropped
    nd = (
        ND.lsh_verified_pairs(
            d.select("doc_id", "text"), threshold=neardup_threshold
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    d = d.join(F.broadcast(nd), "doc_id", "left_anti")
    if cache:
        d = d.persist()
    stages["neardup"] = d

    if benchmark is not None:
        d = CU.decontaminate(d, benchmark)
        stages["decontam"] = d
    if weights is not None:
        d = CU.stratified_sample(d, weights)
        stages["sample"] = d
    return stages
