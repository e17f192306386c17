"""Optimization-round helper bench (bench.py stays FROZEN for the
driver): runs a named subset of the headline queries with the same
methodology (same closures, best-of-N, cache clearing) so an
optimization's effect can be measured in isolation, plus noop-sink
phase isolation for the pipeline cut-points (guide §1.4).

Usage: python bench_extra.py [query ...]
       python bench_extra.py phases     # noop-sink phase breakdown

Prints one JSON line like bench.py.  Never used by the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
_pp = os.environ.get("PYTHONPATH", "")
if REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = REPO + (os.pathsep + _pp if _pp else "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))


def main() -> None:
    only = set(sys.argv[1:])
    loadavg_start = round(os.getloadavg()[0], 2)

    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.operators import neardup as ND
    from riksdagen_sentences_spark.operators.cache import (
        release_intermediates,
    )
    from riksdagen_sentences_spark.plans import pipeline as P
    from riksdagen_sentences_spark.session import get_spark

    spark = get_spark(parallelism=CPUS, app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).count()  # JVM/codegen warmup

    docs_raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = P.docs_from_documents(docs_raw)

    timings: dict[str, float] = {}

    def timed(name: str, fn, repeats: int = REPEATS) -> None:
        if only and name not in only:
            return
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(max(1, repeats)):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    synth_path = "/tmp/bench_synth_100k"
    dup_path = "/tmp/bench_synth_100k_dup5"
    for path, kw in ((synth_path, {}), (dup_path, {"dup_factor": 5})):
        if not os.path.isdir(path):
            from riksdagen_sentences_spark.sources.synth import files_table

            files_table(spark, n_rows=100_000, seed=42, **kw).repartition(
                64
            ).write.mode("overwrite").parquet(path)

    # --- phase isolation (noop sink) -----------------------------------
    if "phases" in only:
        dup_files = spark.read.parquet(dup_path)
        sha = F.sha2(F.col("content"), 256)
        reps = dup_files.select(
            sha.alias("content_sha"), "content"
        ).dropDuplicates(["content_sha"])
        rdocs = reps.select(
            F.col("content_sha").alias("document_id"), "content"
        )
        timed("phase_mapping_count", lambda: P.files_mapping(dup_files).count())
        timed("phase_base_noop", lambda: noop(P.sentence_base(rdocs)))
        base = P.sentence_base(rdocs).persist()
        base.count()
        timed("phase_sents_noop", lambda: noop(P.sentences(base)))
        timed("phase_toks_noop", lambda: noop(P.token_base(base)))
        spark.catalog.clearCache()

    # --- headline subset (same closures as bench.py) -------------------
    def q_triples():
        P.triples(spark, docs).count()
        spark.catalog.clearCache()

    timed("triples_full_graph", q_triples)

    def q_sentences():
        base = P.sentence_base(docs).persist()
        P.sentences(base).count()
        spark.catalog.clearCache()

    timed("sentences", q_sentences)

    def q_rawtokens():
        base = P.sentence_base(docs).persist()
        P.rawtokens(P.token_base(base)).count()
        spark.catalog.clearCache()

    timed("rawtokens", q_rawtokens)

    def q_ner_join():
        from riksdagen_sentences_spark.sources import dims

        base = P.sentence_base(docs).persist()
        sents = P.sentences(base)
        gaz = dims.synthetic_gazetteer(spark, 100_000)
        P.mention_rows_join(sents, gaz, max_term_words=2).count()
        spark.catalog.clearCache()

    timed("ner_join_100k", q_ner_join)

    def q_lsh():
        ND.lsh_candidate_pairs(docs_raw).count()
        release_intermediates()

    timed("lsh_candidate_pairs", q_lsh)

    def q_simhash64():
        ND.simhash_neardup_pairs(
            docs_raw, bits=64, bands=4, max_hamming=3
        ).count()
        release_intermediates()

    timed("simhash64_neardup_pairs", q_simhash64)

    def q_curate():
        from riksdagen_sentences_spark.operators import packing as PK
        from riksdagen_sentences_spark.plans.curate import curation_stages

        cdocs = docs_raw.select("doc_id", "text", "source")
        bench_fix = cdocs.filter(F.col("doc_id") % 97 == 0).select(
            "doc_id", "text"
        )
        st = curation_stages(
            cdocs,
            min_quality=0.3,
            max_dup_ngram_ratio=0.3,
            neardup_threshold=0.5,
            benchmark=bench_fix,
            weights={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        )
        PK.pack_into_bins(
            st["sample"].select(
                "doc_id", F.col("bpe_tokens").alias("tokens")
            ),
            4096,
        ).count()
        release_intermediates()

    timed("curate_chain_pack", q_curate)

    def q_serve():
        from riksdagen_sentences_spark.plans.lookup import (
            materialize_serving_tables,
        )
        from riksdagen_sentences_spark.sources.tables import ParquetCatalog

        serve_cat = ParquetCatalog(spark, "/tmp/bench_extra_serve_lake")
        materialize_serving_tables(
            spark, docs, serve_cat, n_buckets=8, prefix="benchx_"
        )
        for t in ("sentences", "rawtokens", "occursin"):
            spark.sql(f"DROP TABLE IF EXISTS benchx_serve_{t}")

    timed("serve_materialize", q_serve)

    def q_synth():
        sdocs = P.docs_from_files(spark.read.parquet(synth_path))
        P.triples(spark, sdocs, cache=True).count()
        spark.catalog.clearCache()

    timed("triples_synth_100k", q_synth)

    def q_dup_naive():
        P.triples(
            spark, P.docs_from_files(spark.read.parquet(dup_path))
        ).count()
        spark.catalog.clearCache()

    def q_dup_dedup():
        P.triples_dedup(spark, spark.read.parquet(dup_path)).count()
        spark.catalog.clearCache()

    timed("triples_dup5_naive_100k", q_dup_naive)
    timed("triples_dup5_dedup_100k", q_dup_dedup)

    if not only or {"delta_seed_100k", "delta_update_reuse_100k"} & only:
        import shutil
        import tempfile

        from riksdagen_sentences_spark.plans import delta as DL

        delta_store = tempfile.mkdtemp(prefix="bench_extra_delta_")
        base_files = spark.read.parquet(dup_path)
        reuse_files = base_files.withColumn(
            "commit", F.concat(F.lit("next-"), F.col("commit"))
        )
        timed(
            "delta_seed_100k",
            lambda: DL.update_graph(spark, delta_store, base_files),
            repeats=1,
        )
        timed(
            "delta_update_reuse_100k",
            lambda: DL.update_graph(spark, delta_store, reuse_files),
            repeats=1,
        )
        shutil.rmtree(delta_store, ignore_errors=True)

    def q_prefix_jaccard():
        ND.prefix_jaccard_pairs(docs_raw, t_num=3, t_den=10).count()
        release_intermediates()

    timed("prefix_jaccard_pairs", q_prefix_jaccard)

    def q_bpe():
        from riksdagen_sentences_spark.operators.bpe import learn_bpe

        learn_bpe(docs_raw, n_merges=8).count()

    timed("bpe_merges_8", q_bpe)

    def q_ntriples():
        from riksdagen_sentences_spark.operators.rdf import to_ntriples

        to_ntriples(P.triples(spark, docs, cache=True)).count()
        spark.catalog.clearCache()

    timed("rdf_ntriples_export", q_ntriples)

    def q_infer():
        from riksdagen_sentences_spark.operators.infer import (
            invert,
            materialize_rule,
        )

        base = P.sentence_base(docs).persist()
        sents = P.sentences(base)
        materialize_rule(
            invert(P.part_of_edges(sents)),
            P.mention_edges(sents),
            "docMentions",
        ).count()
        spark.catalog.clearCache()

    timed("infer_doc_mentions", q_infer)

    print(
        json.dumps(
            {
                "metric": "bench_extra_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                "cpus": CPUS,
                "loadavg_start": loadavg_start,
                "loadavg_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
