"""Materialization + resumability tests (north rule: resumable from
per-partition checkpoints with lineage and row-count metrics; kill/resume
must reproduce identical output)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from riksdagen_sentences_spark.checkpoint import (
    completed_partitions,
    lineage_fingerprint,
)
from riksdagen_sentences_spark.plans import materialize as M
from riksdagen_sentences_spark.plans import pipeline as P
from riksdagen_sentences_spark.sources.synth import files_table


@pytest.fixture(scope="module")
def docs_df(spark):
    return P.docs_from_files(files_table(spark, n_rows=200, seed=42)).persist()


def _table_rows(spark, out_dir, name, key_cols):
    df = M.read_graph_table(spark, out_dir, name)
    return sorted(tuple(r) for r in df.select(*key_cols).collect())


def test_write_graph_counts(spark, docs_df, tmp_path):
    out = str(tmp_path / "graph")
    counts = M.write_graph(spark, docs_df, out)
    assert set(counts) == set(M.TABLES)
    assert counts["sentences"] > 0
    assert counts["triples"] > counts["sentences"]
    # partition layout on disk: triples by pred, sentences by lang
    assert any(
        d.startswith("pred=") for d in os.listdir(f"{out}/triples")
    )
    assert any(
        d.startswith("lang=") for d in os.listdir(f"{out}/sentences")
    )


def test_incremental_kill_resume_identical(spark, docs_df, tmp_path):
    one_shot = str(tmp_path / "oneshot")
    M.write_graph(spark, docs_df, one_shot)

    inc = str(tmp_path / "inc")
    # simulate a crash after 3 of 8 buckets
    first = M.run_incremental(spark, docs_df, inc, buckets=8, fail_after=3)
    assert len(first) == 3
    assert completed_partitions(spark, inc) == set(first)
    # resume: processes only the remaining buckets
    second = M.run_incremental(spark, docs_df, inc, buckets=8)
    assert set(first).isdisjoint(second)
    assert len(completed_partitions(spark, inc)) == len(first) + len(second)

    # identical graph vs the one-shot run (canonical read)
    for name, keys in (
        ("sentences", ["sentence_id"]),
        ("rawtokens", ["rawtoken_id"]),
        ("normtokens", ["normtoken_id"]),
        ("entities", ["entity_id"]),
        ("triples", ["subj", "pred", "obj"]),
    ):
        a = _table_rows(spark, one_shot, name, keys)
        b = _table_rows(spark, inc, name, keys)
        assert a == b, name

    # re-running with a complete ledger is a no-op (idempotent)
    third = M.run_incremental(spark, docs_df, inc, buckets=8)
    assert third == []


def test_lineage_metrics_recorded(spark, docs_df, tmp_path):
    out = str(tmp_path / "lineage")
    M.run_incremental(spark, docs_df, out, buckets=4)
    ledger = f"{out}/_ledger"
    entries = [
        json.load(open(os.path.join(ledger, f)))
        for f in sorted(os.listdir(ledger))
        if f.endswith(".json")
    ]
    assert len(entries) == 4
    total_in = sum(e["rows_in"] for e in entries)
    assert total_in == docs_df.count()
    for e in entries:
        assert e["sentences_rows"] >= 0
        assert e["triples_rows"] >= e["sentences_rows"]
        assert len(e["input_fingerprint"]) >= 1
        assert e["seconds"] >= 0


def test_lineage_fingerprint_order_independent(spark, docs_df):
    fp1 = lineage_fingerprint(docs_df)
    fp2 = lineage_fingerprint(docs_df.orderBy(F.rand(7)))
    assert fp1 == fp2


def test_compact_canonical_globally_dedups(spark, docs_df, tmp_path):
    out = str(tmp_path / "compact")
    M.run_incremental(spark, docs_df, out, buckets=6)
    raw_before = spark.read.parquet(f"{out}/rawtokens")
    dup_rows = raw_before.count()
    distinct_rows = raw_before.drop("bucket").dropDuplicates(
        ["rawtoken_id"]
    ).count()
    assert dup_rows > distinct_rows  # cross-bucket duplicates exist
    counts = M.compact_canonical(spark, out)
    assert counts["rawtokens"] == distinct_rows
    after = spark.read.parquet(f"{out}/rawtokens")
    assert after.count() == distinct_rows
    # canonical read is unchanged by compaction
    assert (
        M.read_graph_table(spark, out, "rawtokens").count() == distinct_rows
    )
    # single-rewrite: staging/old dirs swapped away, no read-back copy
    import os

    leftovers = [
        d for d in os.listdir(out)
        if d.startswith("__compact_") or d.startswith("__old_")
    ]
    assert leftovers == []


def test_compact_canonical_recovers_from_crash_between_renames(
    spark, docs_df, tmp_path
):
    """A crash between `live -> __old_` and `__compact_ -> live` leaves
    only __old_<name>; the next compaction must restore it and proceed
    (the swap is two renames, not one atomic op)."""
    import os
    import shutil

    out = str(tmp_path / "compact2")
    M.run_incremental(spark, docs_df, out, buckets=4)
    expected = (
        spark.read.parquet(f"{out}/rawtokens")
        .drop("bucket").dropDuplicates(["rawtoken_id"]).count()
    )
    # simulate the crash point: live dir gone, __old_ holds the data
    os.rename(f"{out}/rawtokens", f"{out}/__old_rawtokens")
    # plus a stale staging leftover that must not confuse recovery
    os.makedirs(f"{out}/__compact_rawtokens", exist_ok=True)
    counts = M.compact_canonical(spark, out)
    assert counts["rawtokens"] == expected
    assert spark.read.parquet(f"{out}/rawtokens").count() == expected
    leftovers = [
        d for d in os.listdir(out)
        if d.startswith("__compact_") or d.startswith("__old_")
    ]
    assert leftovers == []
    shutil.rmtree(out, ignore_errors=True)
