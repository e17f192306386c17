"""Repository-history operators over the north-rule files table.

A source-code corpus at 10^12-file scale is commit-addressed: every
(repo, path) carries its full commit history, and most downstream
consumers (KG construction, training-data curation) want one of two
views - the HEAD snapshot (newest commit per file) or the
content-addressed distinct set.  These operators provide the snapshot,
cross-repo clone detection over it, and per-repo language statistics.

Reference analog: the reference analyzes "the latest download" of each
document (models/datasets.py:21-36 walks one directory per dataset) -
its corpus IS a head snapshot; at code-repo scale the snapshot must be
computed, not assumed.

Scale notes
- latest_snapshot: groupBy(repo, path) + max(struct(...)) - partial
  aggregation runs map-side, so deep histories collapse BEFORE the
  shuffle; a window row_number would ship every commit row through the
  exchange and sort it.  One hash exchange on (repo, path); mega-repos
  do not skew it because path spreads the key space.
- cross_repo_clones: sha256 runs AFTER the snapshot agg (on ~n_files
  rows, not n_commits x n_files), then one groupBy on the digest.
  Identical content hashes to identical digests regardless of repo, so
  the group is tiny even when the corpus is not.
- language_breakdown: agg to (repo, lang) grain first (result is
  catalog-sized), then a window over repo for the share - the window
  input is already small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_snapshot(files: DataFrame, order_col: str = "commit_seq") -> DataFrame:
    """HEAD view: the newest commit of every (repo, path).

    Ties on ``order_col`` (which a real deployment maps to the commit
    timestamp from git metadata) break on the commit digest, so the
    result is deterministic under concurrent-commit clocks.
    """
    payload = F.max(
        F.struct(
            F.col(order_col).alias("o"),
            F.col("commit").alias("commit"),
            F.col("lang").alias("lang"),
            F.col("content").alias("content"),
        )
    ).alias("s")
    return files.groupBy("repo", "path").agg(payload).select(
        "repo",
        "path",
        F.col("s.commit").alias("commit"),
        F.col("s.o").alias(order_col),
        F.col("s.lang").alias("lang"),
        F.col("s.content").alias("content"),
    )


def cross_repo_clones(snapshot: DataFrame, min_repos: int = 2) -> DataFrame:
    """Content-addressed clone groups spanning >= ``min_repos`` repos.

    (content_sha, n_repos, n_files) per duplicated blob - the file-level
    twin of document exact dedup, and the first gate a code-corpus
    curation pipeline applies (vendored/forked trees dominate raw
    crawls).
    """
    return (
        snapshot.select(
            "repo", F.sha2(F.col("content"), 256).alias("content_sha")
        )
        .groupBy("content_sha")
        .agg(
            F.countDistinct("repo").alias("n_repos"),
            F.count("*").alias("n_files"),
        )
        .filter(F.col("n_repos") >= min_repos)
    )


def language_breakdown(snapshot: DataFrame) -> DataFrame:
    """(repo, lang, n_files, share) over the HEAD snapshot; share is
    floor-rounded to 4dp so both engines produce the identical double."""
    per = snapshot.groupBy("repo", "lang").agg(F.count("*").alias("n_files"))
    w = Window.partitionBy("repo")
    share = F.col("n_files") / F.sum("n_files").over(w)
    return per.select(
        "repo",
        "lang",
        "n_files",
        (F.floor(share * 10000.0 + F.lit(0.5)) / 10000.0).alias("share"),
    )


def import_edges(
    snapshot: DataFrame, pattern: str = r"import (m[0-9]+)"
) -> DataFrame:
    """(repo, path, module) import statements extracted from file
    content — the KG-construction step for a code corpus: every row is
    a ``(repo:path, imports, module)`` triple.

    Reference analog: the reference extracts (token, linksTo, lexeme)
    triples from document text via a broadcast dictionary
    (models/sentences.py); over code the dictionary is replaced by a
    syntax pattern, but the plan shape is identical — one JVM-side
    ``regexp_extract_all`` per row followed by one explode, zero
    Python, zero shuffle.  At 10^12-file scale this is a pure map
    stage: partitioning is whatever the snapshot scan provides, and
    nothing here adds an exchange.
    """
    mods = F.explode(
        F.regexp_extract_all(F.col("content"), F.lit(pattern), 1)
    )
    return snapshot.select(
        "repo", "path", mods.alias("module")
    )


def module_import_stats(edges: DataFrame) -> DataFrame:
    """(module, n_imports, n_repos) over the import-edge set — the
    fan-in profile of the dependency graph (which modules the corpus
    actually depends on, and how widely).  One hash aggregate; the
    module key space is vocabulary-sized, so the exchange is tiny
    regardless of corpus size.
    """
    return edges.groupBy("module").agg(
        F.count("*").alias("n_imports"),
        F.countDistinct("repo").alias("n_repos"),
    )


def commit_churn(files: DataFrame, order_col: str = "commit_seq") -> DataFrame:
    """(repo, commit_seq, n_changed): per repo and commit ordinal, how
    many files CHANGED content relative to their own previous commit
    (a file's first appearance counts as changed).

    The churn profile is the code-corpus curation signal for
    incremental-build sizing (how much kernel work a delta batch will
    actually do - see plans/delta.py) and for repo health analytics.

    Scale shape: one lag() window per (repo, path) - a single hash
    exchange keyed on the file identity, so mega-repos spread across
    the key space - then one catalog-sized hash aggregate.  Content
    equality compares the raw column; swap in a sha256 projection
    first when contents are large (same plan shape).
    """
    w = Window.partitionBy("repo", "path").orderBy(F.col(order_col).asc())
    ch = files.withColumn("__prev", F.lag("content").over(w))
    return (
        ch.filter(
            F.col("__prev").isNull()
            | (F.col("__prev") != F.col("content"))
        )
        .groupBy("repo", order_col)
        .agg(F.count("*").alias("n_changed"))
    )


def scd2_intervals(
    files: DataFrame, order_col: str = "commit_seq"
) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals per (repo, path):
    one row per content VERSION with ``valid_from``/``valid_to`` commit
    bounds (``valid_to`` NULL = current).  The warehouse-standard
    history compaction: downstream as-of reads become a range predicate
    instead of a window over every commit.

    Two lag/lead windows over ONE hash exchange keyed on the file
    identity (change detection, then interval close-off over the
    surviving change rows - same partitioning, no second shuffle).
    """
    w = Window.partitionBy("repo", "path").orderBy(F.col(order_col).asc())
    changes = (
        files.withColumn("__prev", F.lag("content").over(w))
        .filter(
            F.col("__prev").isNull()
            | (F.col("__prev") != F.col("content"))
        )
        .drop("__prev")
    )
    return changes.select(
        "repo", "path", "content",
        F.col(order_col).alias("valid_from"),
        (F.lead(order_col).over(w) - F.lit(1)).alias("valid_to"),
    )


def symbol_definitions(
    snapshot: DataFrame, pattern: str = r"def (\w+)\("
) -> DataFrame:
    """(repo, path, symbol) — defined-symbol triples extracted from
    file content: the ``(file, defines, symbol)`` side of the code KG,
    dual to :func:`import_edges`'s ``(file, imports, module)`` side.

    Same plan shape as import_edges: one JVM regexp_extract_all + one
    explode, a pure map stage at any corpus size."""
    syms = F.explode(
        F.regexp_extract_all(F.col("content"), F.lit(pattern), 1)
    )
    return snapshot.select("repo", "path", syms.alias("symbol"))


def resolve_imports(
    imports: DataFrame, provides: DataFrame
) -> DataFrame:
    """(repo, src_path, module, def_path) — link every import edge to
    the file DEFINING that module within the same repo: the
    KG-linking step that turns two extraction passes (imports,
    definitions) into a file-level dependency graph.

    Reference analog: token→lexeme linking joins extracted tokens to a
    dictionary (/root/reference/models/sentences.py); here both sides
    are extracted from the corpus itself.  Plan: ONE equi-join on
    (repo, module).  The provides side is catalog-sized (one row per
    defining file), so at 10^12-file scale this is a broadcast-able
    dimension against the import fact table; self-imports are excluded
    (a file does not depend on itself)."""
    prov = provides.select(
        "repo", "module", F.col("path").alias("def_path")
    )
    return (
        imports.select(
            "repo", F.col("path").alias("src_path"), "module"
        )
        .join(prov, ["repo", "module"])
        .filter(F.col("src_path") != F.col("def_path"))
    )
