"""Capture .explain('formatted') for the round-6-touched queries into
plans/r06/<name>_{before,after}.txt.

Usage:  python tools/capture_plans_r06.py after
        PYTHONPATH=<r5-worktree> python tools/capture_plans_r06.py before <r5-worktree>

The 'before' invocation must run with the round-5 tree FIRST on
sys.path (a git worktree of the round-start commit) so the captured
plans are the genuine round-start plans; output always lands in THIS
repo's plans/r06/.
"""

from __future__ import annotations

import os
import sys

THIS_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
SRC = sys.argv[2] if len(sys.argv) > 2 else THIS_REPO
sys.path.insert(0, SRC)
os.environ["PYTHONPATH"] = SRC
OUT = os.path.join(THIS_REPO, "plans", "r06")
os.makedirs(OUT, exist_ok=True)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.operators import neardup as ND
    from riksdagen_sentences_spark.plans import pipeline as P
    from riksdagen_sentences_spark.session import get_spark

    spark = get_spark(parallelism=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    docs_raw = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs = P.docs_from_documents(docs_raw)
    dup_path = "/tmp/bench_synth_100k_dup5"

    def cap(name: str, df) -> None:
        path = os.path.join(OUT, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            ))
        print("wrote", path)

    base = P.sentence_base(docs)
    cap("sentence_base", base)
    cap("sentences", P.sentences(base))
    cap("rawtokens", P.rawtokens(P.token_base(base)))
    cap("triples_full_graph", P.triples(spark, docs, cache=False))
    cap(
        "triples_dup5_dedup",
        P.triples_dedup(spark, spark.read.parquet(dup_path), cache=True),
    )
    from riksdagen_sentences_spark.sources import dims

    gaz = dims.synthetic_gazetteer(spark, 100_000)
    cap(
        "ner_join_100k",
        P.mention_rows_join(P.sentences(base), gaz, max_term_words=2),
    )
    cap("prefix_jaccard_pairs", ND.prefix_jaccard_pairs(docs_raw, 3, 10))
    cap(
        "simhash64_neardup_pairs",
        ND.simhash_neardup_pairs(docs_raw, bits=64, bands=4, max_hamming=3),
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    rev = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    cap("revenue_by_nation", rev)
    from riksdagen_sentences_spark.operators import packing as PK
    from riksdagen_sentences_spark.plans.curate import curation_stages

    cdocs = docs_raw.select("doc_id", "text", "source")
    bench_fix = cdocs.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")
    st = curation_stages(
        cdocs,
        min_quality=0.3,
        max_dup_ngram_ratio=0.3,
        neardup_threshold=0.5,
        benchmark=bench_fix,
        weights={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        cache=False,
    )
    cap(
        "curate_chain_pack",
        PK.pack_into_bins(
            st["sample"].select("doc_id", F.col("bpe_tokens").alias("tokens")),
            4096,
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
