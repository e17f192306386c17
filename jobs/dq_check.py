"""spark-submit entrypoint for the data-quality publish gate: run the
declarative expectations suite (operators/expectations.py) over a fact
table - optionally with a dimension table for referential integrity -
write the per-rule report, and exit non-zero if any rule failed, so a
workflow scheduler can gate the downstream publish step on it.

The checks themselves are EXACTLY what the oracled driver query
`dq_report_orders` pins - the job adds only I/O and the exit code.

Cluster launch:

    python tools/make_pyfiles.py                 # -> dist/pkg.zip
    spark-submit --py-files dist/pkg.zip \\
        jobs/dq_check.py \\
        --input  s3://bucket/orders \\
        --dim    s3://bucket/customer \\
        --fk o_custkey --pk c_custkey \\
        --not-null o_custkey --positive o_totalprice \\
        --unique o_orderkey \\
        --output s3://bucket/dq_report

All row-local rules fold into ONE scan of the fact table; uniqueness
is one aggregate; referential integrity one anti-join.  The report
writes through Spark's Hadoop FS layer, so --output may be any
supported URI.

Local sandbox:

    python jobs/dq_check.py \\
        --input /root/testdata/sf0.001/orders.parquet \\
        --dim /root/testdata/sf0.001/customer.parquet \\
        --fk o_custkey --pk c_custkey \\
        --not-null o_custkey --positive o_totalprice \\
        --unique o_orderkey --output /tmp/dq_report
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="fact table parquet")
    ap.add_argument("--dim", help="dimension parquet (for --fk/--pk)")
    ap.add_argument("--fk", help="fact foreign-key column")
    ap.add_argument("--pk", help="dimension primary-key column")
    ap.add_argument("--not-null", action="append", default=[])
    ap.add_argument("--positive", action="append", default=[])
    ap.add_argument("--unique", action="append", default=[],
                    help="comma-separated key columns per use")
    ap.add_argument("--output", required=True, help="report output root")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from riksdagen_sentences_spark.operators import expectations as DQ
    from riksdagen_sentences_spark.session import get_spark

    spark = get_spark(parallelism=args.cpus, app_name="dq_check")
    spark.sparkContext.setLogLevel("WARN")

    fact = spark.read.parquet(args.input)
    parts = []
    row_rules = [DQ.expect_not_null(c) for c in args.not_null] + [
        DQ.expect_positive(c) for c in args.positive
    ]
    if row_rules:
        parts.append(DQ.check_rules(fact, row_rules))
    for keys in args.unique:
        parts.append(DQ.check_unique(fact, keys.split(",")))
    if args.fk:
        if not (args.dim and args.pk):
            ap.error("--fk needs --dim and --pk")
        dim = spark.read.parquet(args.dim)
        parts.append(DQ.check_references(fact, args.fk, dim, args.pk))
    if not parts:
        ap.error("no rules given")

    report = DQ.quality_report(parts).localCheckpoint(eager=True)
    report.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.output, "report")
    )
    rows = report.collect()
    summary = {
        "rules": len(rows),
        "failed": sum(1 for r in rows if not r["passed"]),
        "violations": sum(r["n_violations"] for r in rows),
    }
    spark.createDataFrame(
        [(json.dumps(summary),)], "value string"
    ).coalesce(1).write.mode("overwrite").text(
        os.path.join(args.output, "summary.json")
    )
    print(json.dumps(summary))
    spark.stop()
    return 1 if summary["failed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
