"""Repository-history operators: HEAD snapshot, cross-repo clones,
language stats (operators/repo.py over sources/synth.files_history)."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators import repo as R
from riksdagen_sentences_spark.sources.synth import files_history


def test_snapshot_is_newest_commit_per_file(spark):
    fh = files_history(spark)
    snap = R.latest_snapshot(fh)
    rows = snap.collect()
    # one row per (repo, path), all at the final commit ordinal
    assert len(rows) == 6 * 30
    assert {r.commit_seq for r in rows} == {7}
    # content carries the final version (ver = (7 - 7%3)/3 = 2)
    assert all(r.content.endswith("# v2") for r in rows)
    # the winning commit digest really is the seq-7 digest
    expect = fh.filter("commit_seq = 7").select("repo", "path", "commit")
    assert (
        snap.select("repo", "path", "commit")
        .exceptAll(expect)
        .count()
        == 0
    )


def test_snapshot_single_exchange_partial_agg(spark):
    plan = R.latest_snapshot(files_history(spark))._jdf.queryExecution(
    ).executedPlan().toString()
    # one shuffle on (repo, path); history rows collapse map-side first
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_max" in plan or "partial max" in plan.lower()


def test_cross_repo_clone_groups_planted(spark):
    snap = R.latest_snapshot(files_history(spark))
    clones = R.cross_repo_clones(snap).collect()
    # every 5th path (6 of 30) is planted identical across all 6 repos
    assert len(clones) == 6
    assert all(r.n_repos == 6 and r.n_files == 6 for r in clones)


def test_language_breakdown_shares(spark):
    snap = R.latest_snapshot(files_history(spark))
    per_repo = (
        R.language_breakdown(snap)
        .groupBy("repo")
        .agg(F.sum("share").alias("total"), F.sum("n_files").alias("files"))
        .collect()
    )
    assert len(per_repo) == 6
    for r in per_repo:
        assert r.files == 30
        assert abs(r.total - 1.0) < 0.001  # floor-rounding slack


def test_snapshot_asof_travels_to_earlier_content(spark):
    from pyspark.sql import functions as F

    fh = files_history(spark)
    asof = R.latest_snapshot(fh.filter(F.col("commit_seq") <= 3))
    rows = asof.collect()
    assert len(rows) == 6 * 30
    assert {r.commit_seq for r in rows} == {3}
    # content version at seq 3 is v1, not HEAD's v2
    assert all(r.content.endswith("# v1") for r in rows)


def test_scd2_intervals_shape(spark):
    """Versions tile each file's history: first starts at the first
    commit, exactly one open (valid_to NULL) version per (repo, path),
    and consecutive intervals abut (next valid_from = valid_to + 1)."""
    from riksdagen_sentences_spark.operators.repo import scd2_intervals
    from riksdagen_sentences_spark.sources.synth import files_history

    hist = files_history(spark, n_repos=2, n_paths=3, n_commits=8)
    rows = scd2_intervals(hist).collect()
    byfile = {}
    for r in rows:
        byfile.setdefault((r["repo"], r["path"]), []).append(
            (r["valid_from"], r["valid_to"])
        )
    assert len(byfile) == 6
    for spans in byfile.values():
        spans.sort()
        assert spans[0][0] == 0
        assert [s for s in spans if s[1] is None] == [spans[-1]]
        for (_, t0), (f1, _) in zip(spans, spans[1:]):
            assert f1 == t0 + 1
