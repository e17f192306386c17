"""spark-submit entrypoint for the training-data curation pipeline:
quality gate -> exact dedup -> LSH-verified near-dup removal ->
n-gram decontamination -> repetition filter -> stratified mixture
sample, writing the surviving corpus + a per-stage survivor report.

Cluster launch:

    python tools/make_pyfiles.py                 # -> dist/pkg.zip
    spark-submit --py-files dist/pkg.zip \\
        jobs/curate_corpus.py \\
        --input  s3://bucket/documents \\
        --output s3://bucket/curated \\
        --benchmark s3://bucket/benchmark_texts \\
        --weights '{"web": 0.5, "code": 1.0}'

Local sandbox:

    python jobs/curate_corpus.py \\
        --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/curated

Every stage is the bucketed/broadcast variant (no all-pairs, corpus
never shuffled by the decontamination or sampling stages); survivor
counts ride each write as Observation metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet")
    ap.add_argument("--output", required=True, help="curated output root")
    ap.add_argument(
        "--benchmark",
        default=None,
        help="parquet of benchmark texts (doc_id, text) to decontaminate "
        "against; omit to skip the stage",
    )
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument(
        "--max-dup-ngram-ratio",
        type=float,
        default=0.3,
        help="Gopher-style repetition gate",
    )
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    ap.add_argument(
        "--weights",
        default=None,
        help='JSON {source: fraction} mixture weights; omit to keep all',
    )
    ap.add_argument(
        "--pack-capacity",
        type=int,
        default=0,
        help="if > 0, assign surviving docs to fixed-token-budget bins "
        "(distributed prefix sum) and write a `bin` column",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.operators import curation as CU
    from riksdagen_sentences_spark.operators import neardup as ND
    from riksdagen_sentences_spark.operators import textstats as TS

    spark = (
        SparkSession.builder.appName("curate-corpus")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    docs = spark.read.parquet(args.input)
    report: dict[str, int] = {"input_docs": docs.count()}

    stats = TS.doc_stats(docs).select("doc_id", "quality", "fingerprint")
    rep = CU.repetition_stats(docs).select("doc_id", "dup_ngram_ratio")
    d = (
        docs.join(stats, "doc_id")
        .join(rep, "doc_id")
        .filter(
            (F.col("quality") >= args.min_quality)
            & (F.col("dup_ngram_ratio") <= args.max_dup_ngram_ratio)
        )
    )
    report["after_quality_and_repetition"] = d.count()

    keep = d.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    d = d.join(keep, ["fingerprint", "doc_id"], "left_semi")
    report["after_exact_dedup"] = d.count()

    nd = (
        ND.lsh_verified_pairs(
            docs, threshold=args.neardup_threshold
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    d = d.join(F.broadcast(nd), "doc_id", "left_anti")
    report["after_neardup"] = d.count()

    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        d = CU.decontaminate(d, bench)
        report["after_decontamination"] = d.count()

    if args.weights:
        d = CU.stratified_sample(d, json.loads(args.weights))
        report["after_mixture_sample"] = d.count()

    out = d.drop("quality", "fingerprint", "dup_ngram_ratio")
    if args.pack_capacity > 0:
        from riksdagen_sentences_spark.operators import packing as PK

        out = PK.pack_into_bins(
            out.withColumn(
                "tokens", TS.bpe_token_count_col(F.col("text"))
            ),
            args.pack_capacity,
        )
        report["bins"] = out.agg(
            (F.max("bin") + 1).cast("int").alias("b")
        ).first()["b"]
    out.write.mode("overwrite").parquet(os.path.join(args.output, "docs"))
    report["written"] = report[
        "after_mixture_sample" if args.weights
        else ("after_decontamination" if args.benchmark else "after_neardup")
    ]
    with open(os.path.join(args.output, "report.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
