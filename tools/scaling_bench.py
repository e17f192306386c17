"""Scaling evidence for the north rule: the same KG-construction job at
two parallelism levels (local[8] vs local[32]) on identical input;
reports triples/sec at both and the scaling efficiency
    eff = (T8 / T32) / (32 / 8)
which must stay >= 0.8.  Results are written to BENCH/BASELINE.md.

The input is the deterministic synthetic files table (seed=42, one hot
repo with ~30% of rows - FIXTURES.md §5) materialized to parquet ONCE and
read by both runs.  Each session runs one warm-up iteration (Python UDF
worker spin-up is a fixed cost, not a scaling property) and then times
``measure_iters`` full graph constructions.

Usage: python tools/scaling_bench.py [n_rows] [out_md]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
_pp = os.environ.get("PYTHONPATH", "")
if REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = REPO + (os.pathsep + _pp if _pp else "")

LEVELS = tuple(
    int(x)
    for x in os.environ.get("SPARK_SCALING_LEVELS", "8,32").split(",")
)
MEASURE_ITERS = int(os.environ.get("SPARK_SCALING_ITERS", "3"))


def run_level(parallelism: int, input_path: str) -> dict:
    from pyspark.sql import SparkSession

    from riksdagen_sentences_spark.plans import pipeline as P
    from riksdagen_sentences_spark.session import get_spark

    spark = get_spark(parallelism=parallelism, app_name=f"scale-{parallelism}")
    spark.sparkContext.setLogLevel("ERROR")
    files = spark.read.parquet(input_path)
    docs = P.docs_from_files(files)

    def job() -> int:
        return P.triples(spark, docs, cache=True).count()

    n = job()  # warm-up (spins up Python workers, fills no caches we keep)
    spark.catalog.clearCache()
    times = []
    for _ in range(MEASURE_ITERS):
        t0 = time.time()
        n = job()
        times.append(time.time() - t0)
        spark.catalog.clearCache()
    spark.stop()
    best = min(times)
    return {
        "parallelism": parallelism,
        "triples": n,
        "seconds_best": round(best, 3),
        "seconds_all": [round(t, 3) for t in times],
        "triples_per_sec": round(n / best, 1),
    }


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH", "LATEST.md"
    )  # BASELINE.md is the curated summary; don't clobber it by default
    input_path = f"/tmp/scaling_input_{n_rows}"
    if not os.path.isdir(input_path):
        from riksdagen_sentences_spark.session import get_spark
        from riksdagen_sentences_spark.sources.synth import files_table

        spark = get_spark(parallelism=8, app_name="gen")
        spark.sparkContext.setLogLevel("ERROR")
        files_table(spark, n_rows=n_rows, seed=42).repartition(64).write.mode(
            "overwrite"
        ).parquet(input_path)
        spark.stop()

    loadavg_start = round(os.getloadavg()[0], 2)
    results = [run_level(p, input_path) for p in LEVELS]
    lo, hi = results[0], results[-1]
    speedup = lo["seconds_best"] / hi["seconds_best"]
    ideal = LEVELS[-1] / LEVELS[0]
    eff = speedup / ideal
    summary = {
        "metric": "triples_per_sec_scaling",
        "n_rows": n_rows,
        "levels": results,
        "speedup": round(speedup, 3),
        "ideal": ideal,
        "efficiency": round(eff, 3),
        "loadavg_start": loadavg_start,
        "loadavg_end": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(summary))

    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(
            "# BENCH/BASELINE - scaling evidence (north rule)\n\n"
            "Same job (full six-predicate graph construction + count) on "
            "identical input\n(deterministic synthetic files table, "
            f"seed=42, {n_rows} rows, one hot repo with ~30% of rows),\n"
            "run at two parallelism levels in-sandbox per the driver "
            "instruction\n"
            f"(local[{LEVELS[0]}] vs local[{LEVELS[-1]}] stands in for N "
            "vs 4N executors).  Timing is the\nbest of "
            f"{MEASURE_ITERS} iterations after one warm-up per session.\n\n"
            "| parallelism | triples | best seconds | triples/sec |\n"
            "|---|---|---|---|\n"
        )
        for r in results:
            f.write(
                f"| local[{r['parallelism']}] | {r['triples']} | "
                f"{r['seconds_best']} | {r['triples_per_sec']} |\n"
            )
        f.write(
            f"\n- speedup {LEVELS[0]}->{LEVELS[-1]}: **{summary['speedup']}x** "
            f"(ideal {ideal}x)\n"
            f"- scaling efficiency: **{summary['efficiency']}** "
            f"(target >= 0.8)\n"
            f"- all timings: {json.dumps({r['parallelism']: r['seconds_all'] for r in results})}\n"
        )


if __name__ == "__main__":
    main()
