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


def test_import_edges_extraction(spark):
    """imports=True plants 2 statements per file; extraction finds
    exactly those, identical across repos for a given path, and the
    default (imports=False) content yields zero edges."""
    snap = R.latest_snapshot(files_history(spark, imports=True))
    edges = R.import_edges(snap)
    rows = edges.collect()
    assert len(rows) == 6 * 30 * 2
    # per-path module set matches the generator arithmetic
    by_path = {}
    for r in rows:
        by_path.setdefault((r.repo, r.path), set()).add(r.module)
    for (repo, path), mods in by_path.items():
        p = int(path.split("f")[1].split(".")[0])
        assert mods == {f"m{(p * 3 + 1) % 30}", f"m{(p * 7 + 2) % 30}"}
    # plain fixture has no import statements to find
    plain = R.import_edges(R.latest_snapshot(files_history(spark)))
    assert plain.count() == 0
    # pure map stage: no exchange beyond the snapshot's own aggregate
    # (post-execution AQE repeats nodes under "== Initial Plan ==" -
    # count only the final section)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_module_import_stats_fanin(spark):
    """m_k with k%3==1 is hit by the 3p+1 cycle (3 paths) plus the
    7p+2 bijection (1 path) -> 4 imports per repo; other residues get
    only the bijection hit or nothing."""
    snap = R.latest_snapshot(files_history(spark, imports=True))
    stats = {
        r.module: (r.n_imports, r.n_repos)
        for r in R.module_import_stats(R.import_edges(snap)).collect()
    }
    assert sum(n for n, _ in stats.values()) == 6 * 30 * 2
    assert all(nr == 6 for _, nr in stats.values())
    assert stats["m1"] == (24, 6)  # 3 cycle hits + 1 bijection hit, x6


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


def test_symbol_definitions_extracts_defs(spark):
    fh = files_history(spark, imports=True)
    snap = R.latest_snapshot(fh)
    defs = R.symbol_definitions(snap)
    rows = defs.collect()
    # one def per file, symbol f<path_id>
    assert len(rows) == 6 * 30
    assert all(
        r.symbol == "f" + r.path.split("/f")[1].split(".")[0]
        for r in rows
    )
    sym = {(r.repo, r.path): r.symbol for r in rows}
    assert sym[("repo_0", "src/f3.js")] == "f3"


def test_resolve_imports_intra_repo_dependency(spark):
    snap = R.latest_snapshot(files_history(spark, imports=True))
    provides = R.symbol_definitions(snap).select(
        "repo", "path",
        F.concat(F.lit("m"), F.substring("symbol", 2, 100)).alias(
            "module"),
    )
    deps = R.resolve_imports(R.import_edges(snap), provides)
    rows = deps.collect()
    # every file imports m<(3p+1)%30> and m<(7p+2)%30>; self-imports
    # (p == (3p+1)%30 etc.) are excluded by the operator
    assert all(r.src_path != r.def_path for r in rows)
    got = {
        (r.repo, r.src_path, r.module, r.def_path) for r in rows
    }
    # file f0 imports m1 (3*0+1) and m2 (7*0+2)
    assert ("repo_0", "src/f0.py", "m1", "src/f1.rs") in got
    assert ("repo_0", "src/f0.py", "m2", "src/f2.go") in got
