"""Multinomial Naive Bayes document classifier as pure column algebra.

The quality-classifier stage of LLM curation pipelines (CCNet / GPT-3
style: score every document against a small labeled seed set, keep or
down-weight by predicted class) expressed Spark-first: TRAINING is two
groupBy counts over the labeled seed (priors + per-class token counts,
Laplace-smoothed over the full vocab x class cross), SCORING is one
inner join of the corpus token stream against the broadcast model and
a map-side-combined sum of log-likelihoods.  No MLlib, no iterative
fitting, no Python in the hot path - which is exactly why the whole
operator carries an exact DuckDB oracle.

Scale shape: the labeled seed and its vocabulary are small by
definition (they are hand-curated), so the model frame broadcasts; the
corpus is touched once - explode, broadcast join, partial-agg sum per
(doc, class).  Docs whose tokens are all out-of-vocabulary still score
(prior only) via the doc x class left join.  Argmax is max(struct(
score, label)) - deterministic tie-break toward the greater label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def _tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    return df.select(
        *keep,
        F.explode(
            F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)
        ).alias("token"),
    ).filter(F.col("token") != "")


def nb_train(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    alpha: float = 1.0,
) -> DataFrame:
    """(label, token, log_lik, log_prior), fully crossed vocab x classes.

    log_lik = ln((count(token, class) + alpha) / (tokens_in_class +
    alpha * |vocab|)); log_prior = ln(docs_in_class / docs).  Unseen
    (token, class) cells exist with the smoothed floor, so scoring
    never needs a per-class default.
    """
    tok = _tokens(labeled, text_col, [label_col])
    vocab = tok.select("token").distinct()
    v_n = vocab.agg(F.count("*").alias("v"))
    classes = labeled.groupBy(label_col).agg(F.count("*").alias("n_docs"))
    total = labeled.agg(F.count("*").alias("n_total"))
    class_tok = tok.groupBy(label_col).agg(F.count("*").alias("n_tok"))
    counts = tok.groupBy(label_col, "token").agg(F.count("*").alias("c"))
    return (
        classes.crossJoin(total)
        .crossJoin(v_n)
        .join(class_tok, label_col)
        .crossJoin(vocab)
        .join(counts, [label_col, "token"], "left")
        .select(
            F.col(label_col).alias("label"),
            "token",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(alpha))
                / (F.col("n_tok") + F.lit(alpha) * F.col("v"))
            ).alias("log_lik"),
            F.log(
                F.col("n_docs").cast("double") / F.col("n_total")
            ).alias("log_prior"),
        )
    )


def nb_predict(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, pred_label, score) - argmax class per document.

    Out-of-vocabulary tokens are skipped (they carry no class
    evidence); a document with NO in-vocab tokens scores on priors
    alone.
    """
    tok = _tokens(docs, text_col, [id_col])
    summed = (
        tok.join(F.broadcast(model.select("label", "token", "log_lik")),
                 "token")
        .groupBy(id_col, "label")
        .agg(F.sum("log_lik").alias("s"))
    )
    priors = model.select("label", "log_prior").distinct()
    scores = (
        docs.select(id_col)
        .crossJoin(F.broadcast(priors))
        .join(summed, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            (F.col("log_prior") + F.coalesce(F.col("s"), F.lit(0.0))
             ).alias("score"),
        )
    )
    best = scores.groupBy(id_col).agg(
        F.max(F.struct("score", "label")).alias("b")
    )
    return best.select(
        id_col,
        F.col("b.label").alias("pred_label"),
        F.col("b.score").alias("score"),
    )


# Hand-curated labeled seed (the "wikipedia-vs-crawl" stand-in): the
# corpus.py oracle generates its VALUES twin from these same constants,
# so the two engines cannot drift.  Class vocabularies overlap on
# purpose ('table', 'data') - the classifier must win on weight, not
# on disjoint vocab.
NB_SEED = (
    ("systems", "join hash scan filter merge exchange shuffle partition"),
    ("systems", "hash join broadcast filter scan batch vector column"),
    ("systems", "agg group window order stream spark merge table data"),
    ("generic", "the quick brown fox jumps over the lazy dog"),
    ("generic", "a small slow line of data value and key"),
    ("generic", "table row men of the people and a dog"),
)

# Planted scoring probes: one unambiguous member of each class, so the
# per-class count artifact is always 2 rows even if the sf documents
# all land on one side.
NB_PROBES = (
    ("probe_systems", "join hash scan merge filter stream batch spark"),
    ("probe_generic", "quick brown fox jumps over a lazy dog of men"),
)
