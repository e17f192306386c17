"""spark-submit entrypoint for BPE tokenizer training: one corpus pass
into the (word, n) frequency table, then ``--merges`` rounds of the
pure-DataFrame BPE learner, writing the ordered merge-rule table, the
segmented vocabulary, and a summary report.

The learner itself lives in riksdagen_sentences_spark.operators.bpe and
is EXACTLY what the oracled driver query `bpe_merge_rules` checks - the
job adds only I/O.

Cluster launch:

    python tools/make_pyfiles.py                 # -> dist/pkg.zip
    spark-submit --py-files dist/pkg.zip \\
        jobs/train_tokenizer.py \\
        --input  s3://bucket/documents \\
        --output s3://bucket/tokenizer \\
        --merges 512

Each merge is one (vocabulary-sized) Spark job, so per-round latency -
not data volume - bounds the practical merge count at a few hundred to
a few thousand.  A full 32k-merge production vocabulary would batch
non-overlapping merges per round or collect the (tiny) word-frequency
table and finish driver-side; the corpus-pass half, which is the part
that actually scales with data, is identical either way.

Local sandbox:

    python jobs/train_tokenizer.py \\
        --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/tokenizer --merges 16

Every round is vocabulary-sized (pair-count aggregate + 1-row argmax
broadcast cross join + literal replace merge); the corpus itself is
read exactly once.  The report writes through Spark's Hadoop FS layer,
so --output may be any supported URI.
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
    ap.add_argument("--output", required=True, help="tokenizer output root")
    ap.add_argument("--merges", type=int, default=16)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from riksdagen_sentences_spark.operators import bpe
    from riksdagen_sentences_spark.session import get_spark

    spark = get_spark(parallelism=args.cpus, app_name="train_tokenizer")
    spark.sparkContext.setLogLevel("WARN")

    docs = spark.read.parquet(args.input)
    merges = bpe.learn_bpe(
        docs, n_merges=args.merges, text_col=args.text_col
    ).localCheckpoint(eager=True)
    merges.orderBy("round").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.output, "merges")
    )
    seg = bpe.segment_words(docs, merges, text_col=args.text_col)
    seg.write.mode("overwrite").parquet(os.path.join(args.output, "vocab"))

    stats = seg.agg(
        F.count("*").alias("n_words"),
        F.sum(F.size("pieces") * F.col("n")).alias("corpus_pieces"),
        F.sum(F.length("w") * F.col("n")).alias("corpus_chars"),
    ).first()
    report = {
        "merges": args.merges,
        "vocab_words": stats["n_words"],
        "corpus_pieces": stats["corpus_pieces"],
        "corpus_chars": stats["corpus_chars"],
        # chars per emitted piece - rises as merges are learned
        "chars_per_piece": round(
            stats["corpus_chars"] / max(1, stats["corpus_pieces"]), 3
        ),
    }
    spark.createDataFrame(
        [(json.dumps(report),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(
        os.path.join(args.output, "report.json")
    )
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
