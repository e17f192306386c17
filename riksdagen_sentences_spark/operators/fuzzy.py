"""Fuzzy string matching: symmetric-delete (SymSpell) candidate join +
Levenshtein verification.

The reference links tokens to lexemes by EXACT form equality
(/root/reference/models/token.py linksTo semantics); a production
entity-linking pass additionally needs typo-tolerant matching.  The
scale-safe shape is the SymSpell symmetric-delete join:

- every string generates its deletion neighborhood (itself + each
  single-character deletion, |w|+1 variants),
- two strings within Levenshtein distance 1 ALWAYS share a variant
  (substitution at i: both delete position i; insertion/deletion: the
  longer string's deletion of the extra character equals the shorter
  string itself),
- so an equi-join on the variant key yields a complete candidate set,
  verified by an exact ``levenshtein`` filter (built into both Spark
  and DuckDB with identical semantics - the filter is oracle-exact).

Cost is linear in total variant count (sum of |w|+1 per string) with a
hash join on the variant key - no length-band quadratic blowup, no
all-pairs.  The dictionary side broadcasts when small; both sides
shuffle on the variant key otherwise.  Pure column algebra throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """array<string>: the string itself plus every single-character
    deletion (the distance-1 symmetric-delete neighborhood)."""
    return F.transform(
        F.sequence(F.lit(0), F.length(col)),
        lambda i: F.when(i == F.lit(0), col).otherwise(
            F.concat(
                col.substr(F.lit(1), (i - 1).cast("int")),
                col.substr((i + 1).cast("int"), F.length(col)),
            )
        ),
    )


def fuzzy_matches(
    terms: DataFrame,
    dictionary: DataFrame,
    term_col: str = "term",
    dict_col: str = "form",
    max_dist: int = 1,
) -> DataFrame:
    """(form, term, dist): every (dictionary form, term) pair within
    Levenshtein distance ``max_dist`` (currently 1: the symmetric-delete
    neighborhood is generated at depth 1), exact-verified.  Inputs are
    deduplicated on their key columns."""
    t = terms.select(F.col(term_col).alias("term")).dropDuplicates(["term"])
    d = dictionary.select(F.col(dict_col).alias("form")).dropDuplicates(
        ["form"]
    )
    tv = t.select(
        "term", F.explode(deletion_variants(F.col("term"))).alias("var")
    ).dropDuplicates(["term", "var"])
    dv = d.select(
        "form", F.explode(deletion_variants(F.col("form"))).alias("var")
    ).dropDuplicates(["form", "var"])
    cand = (
        tv.join(dv, "var")
        .select("form", "term")
        .dropDuplicates(["form", "term"])
    )
    return cand.withColumn(
        "dist", F.levenshtein(F.col("form"), F.col("term"))
    ).filter(F.col("dist") <= max_dist)
