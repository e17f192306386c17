"""Deterministic synthetic ``files`` table (north-rule input shape).

BASELINE.json input_hint: ``(repo:string, path:string, commit:string,
lang:string, content:string)``.  Seed-fixed (default 42), no external
data.  One HOT repo holds ~30% of all rows (FIXTURES.md §1) to exercise
the salted-dedup skew path, and the generated content includes every edge
case the cleaning rules must handle (TOC leader lines, digit-words,
punctuation, short/one-word sentences, duplicate sentences within and
across documents, >100k-char chunking documents, HTML fragments).

Generation is distributed: ``spark.range(n)`` + column expressions and a
deterministic pandas UDF keyed on the row id - no driver-side loops, so
the same generator scales to any row count.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SV_WORDS = (
    "och att det som en av den med om inte har till ett han var jag vi "
    "riksdagen regeringen beslut lag förslag utskott betänkande motion "
    "anförande ledamot tal land folk arbete skola vård skatt miljö"
).split()
_EN_WORDS = (
    "the and of to in that it is was for on with he as be at by "
    "parliament government decision law proposal committee report motion"
).split()

HOT_REPO = "repo_hot"
FILES_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _make_content(rng: random.Random, lang: str, edge: int) -> str:
    words = _SV_WORDS if lang in ("sv", "nb", "da") else _EN_WORDS
    n_sent = rng.randint(2, 8)
    sentences = []
    for _ in range(n_sent):
        n = rng.randint(3, 14)
        s = " ".join(rng.choice(words) for _ in range(n))
        sentences.append(s.capitalize() + rng.choice(".!?") + " ")
    text = "".join(sentences).strip()
    # deterministic edge-case injection by bucket
    if edge == 0:
        text = "Innehåll ......... 4\n" + text + "\nKapitel 2 .... 17"
    elif edge == 1:
        text += " Ja. Nej! Ett (två) tre-fyra 5:e 2024 pris4u."
    elif edge == 2:
        text += " Kort."  # one-word sentence
    elif edge == 3:
        text += " <p>html &amp; taggar</p> ¶¤¥ $100 a|b."
    elif edge == 4:
        # duplicate sentence repeated within the document
        dup = "Och att det som en av den med stora beslut i riksdagen."
        text = dup + " " + text + " " + dup
    return text


def files_table(
    spark: SparkSession,
    n_rows: int = 5000,
    n_repos: int = 50,
    seed: int = 42,
    hot_fraction: float = 0.30,
    big_doc_every: int = 0,
    dup_factor: int = 1,
) -> DataFrame:
    """Deterministic distributed generator for the files table.

    ``big_doc_every``: if >0, every k-th row gets >100k chars of content
    to exercise the chunking path (kernels/sentenize.py).

    ``dup_factor``: if >1, contents are drawn from only
    ``n_rows // dup_factor`` distinct texts (content seed = row id
    modulo that), while (repo, path, commit) stay unique per row - the
    cross-commit duplication profile of a real code corpus, the input
    regime ``pipeline.triples_dedup`` exists for.  ``dup_factor=1``
    reproduces the historical table byte for byte.
    """
    n_distinct = max(1, n_rows // max(1, dup_factor))

    @F.pandas_udf(StringType())
    def gen_content(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            ci = int(i) % n_distinct
            rng = random.Random(seed * 1_000_003 + ci)
            lang = rng.choices(
                ["sv", "en", "nb", "de", "fr", "da", "xx"],
                weights=[60, 12, 8, 8, 6, 3, 3],
            )[0]
            text = _make_content(rng, lang, ci % 11)
            if big_doc_every and ci % big_doc_every == 7:
                text = (text + " ") * (120_000 // max(1, len(text)) + 1)
            out.append(text)
        return pd.Series(out, index=ids.index)

    @F.pandas_udf(StringType())
    def gen_lang(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            rng = random.Random(seed * 1_000_003 + int(i))
            out.append(
                rng.choices(
                    ["sv", "en", "nb", "de", "fr", "da", "xx"],
                    weights=[60, 12, 8, 8, 6, 3, 3],
                )[0]
            )
        return pd.Series(out, index=ids.index)

    hot_cut = int(n_rows * hot_fraction)
    df = (
        spark.range(n_rows)
        .withColumn(
            "repo",
            F.when(F.col("id") < hot_cut, F.lit(HOT_REPO)).otherwise(
                F.concat(F.lit("repo_"), (F.col("id") % n_repos).cast("string"))
            ),
        )
        .withColumn(
            "path",
            F.concat(
                F.lit("dir"),
                (F.col("id") % 7).cast("string"),
                F.lit("/file"),
                F.col("id").cast("string"),
                F.lit(".txt"),
            ),
        )
        .withColumn(
            "commit",
            F.substring(
                F.sha2(F.concat(F.lit(f"commit:{seed}:"), F.col("id")), 256), 1, 40
            ),
        )
        .withColumn("lang", gen_lang(F.col("id")))
        .withColumn("content", gen_content(F.col("id")))
    )
    return df.select("repo", "path", "commit", "lang", "content")


def clustered_embeddings(
    spark: SparkSession,
    n_clusters: int = 8,
    per_cluster: int = 50,
    dim: int = 16,
) -> DataFrame:
    """Planted-cluster embeddings: ``n_clusters`` well-separated centers
    with tiny within-cluster jitter, so ANN ground truth is structural -
    the top-(per_cluster-1) neighbors of any point are exactly its
    cluster mates.  Deterministic and distributed (spark.range + md5
    arithmetic, no RNG state, no driver loop).

    Center c, component d ~ U(-1, 1) from md5("ctr:c:d"); jitter for
    point p, component d ~ U(-0.01, 0.01) from md5("jit:p:d").  With
    unit-scale centers the expected inter-center distance dwarfs the
    0.02 jitter diameter, so cluster cosine structure is unambiguous:
    IVF with a KMeans quantizer of k = n_clusters recovers the planted
    partition and 1-probe recall@k is exactly 1.0 - the deterministic
    fixture the partial-probe recall gate needs (near-random vectors
    give unstable 0.2-1.0 recall)."""

    def _unit(tag: str, salt_cols) -> F.Column:
        h = F.md5(F.concat_ws(":", F.lit(tag), *salt_cols))
        return (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / float(0xFFFFFFFF)
        ) * 2.0 - 1.0

    base = spark.range(n_clusters * per_cluster).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % n_clusters).cast("int").alias("label"),
    )
    comps = [
        (
            _unit("ctr", [F.col("label"), F.lit(d)])
            + 0.01 * _unit("jit", [F.col("vec_id"), F.lit(d)])
        ).cast("float")
        for d in range(dim)
    ]
    return base.select(
        "vec_id", F.array(*comps).alias("embedding"), "label"
    )


def files_history(
    spark: SparkSession,
    n_repos: int = 6,
    n_paths: int = 30,
    n_commits: int = 8,
    imports: bool = False,
) -> DataFrame:
    """Commit-HISTORY variant of the files table: every (repo, path)
    carries ``n_commits`` commits, content evolves every 3rd commit,
    and every 5th path's content is IDENTICAL across all repos (the
    planted cross-repo clone set for operators/repo.py).

    Pure column algebra (integer decomposition + md5), no RNG state and
    no Python UDF, so plans/corpus.py can generate a bit-identical
    DuckDB twin (``_files_history_sql``) and the snapshot / clone /
    language queries get exact oracles.  The same expressions run
    unchanged at any row count - this is a generator shape, not a
    fixture-size trick.

    ``imports=True`` prefixes every content with two deterministic
    import statements (``import m<(3p+1)%P>; import m<(7p+2)%P>; ``,
    identical across repos for a given path) so the import-edge
    extraction operators have real statements to parse.  Default off:
    the plain-content oracles stay byte-identical.
    """
    n = n_repos * n_paths * n_commits
    id_ = F.col("id")
    seq = (id_ % n_commits).cast("long")
    fid = ((id_ - seq) / F.lit(n_commits)).cast("long")
    path_id = (fid % n_paths).cast("long")
    repo_id = ((fid - path_id) / F.lit(n_paths)).cast("long")
    ver = ((seq - seq % 3) / F.lit(3)).cast("long")
    lang = (
        F.when(path_id % 4 == 0, F.lit("py"))
        .when(path_id % 4 == 1, F.lit("rs"))
        .when(path_id % 4 == 2, F.lit("go"))
        .otherwise(F.lit("js"))
    )
    key = F.when(
        path_id % 5 == 0, F.concat_ws(":", F.lit("shared"), path_id)
    ).otherwise(F.concat_ws(":", repo_id, path_id))
    imp_prefix = (
        F.concat(
            F.lit("import m"),
            ((path_id * 3 + 1) % n_paths).cast("string"),
            F.lit("; import m"),
            ((path_id * 7 + 2) % n_paths).cast("string"),
            F.lit("; "),
        )
        if imports
        else F.lit("")
    )
    return spark.range(n).select(
        F.concat_ws("_", F.lit("repo"), repo_id).alias("repo"),
        F.concat(
            F.lit("src/f"), path_id.cast("string"), F.lit("."), lang
        ).alias("path"),
        F.md5(F.concat_ws(":", F.lit("c"), repo_id, path_id, seq)).alias(
            "commit"
        ),
        seq.alias("commit_seq"),
        lang.alias("lang"),
        F.concat(
            imp_prefix,
            F.lit("def f"), path_id.cast("string"),
            F.lit("(): return "), key,
            F.lit(" # v"), ver.cast("string"),
        ).alias("content"),
    )
