"""Entity resolution for KG construction: blocking -> exact verify ->
connected components -> canonical relabeling.

The reference keys entities by EXACT (label, ner_label)
(/root/reference/models/entity.py:36-48, models/entities.py:21-27), so
surface-form variants ("stockholm" / "stockholms") mint distinct KG
nodes.  Production knowledge-graph construction resolves those variants
into one canonical node BEFORE edges are counted, or the graph's degree
distribution fragments.  The scale-safe shape:

- **blocking**: the SymSpell symmetric-delete neighborhood join
  (operators/fuzzy.py) - provably complete for Levenshtein distance
  <= 1, linear in total variant count, no all-pairs comparison;
- **verification**: exact ``levenshtein`` on the blocked candidates
  only (built into both Spark and DuckDB with identical semantics);
- **clustering**: min-label connected components over the verified
  similarity graph (operators/graph.py) - variants chain transitively
  (a~b, b~c => one cluster even when a is not within distance 1 of c),
  the same LSH->CC motif neardup.py uses for documents;
- **canonical id**: the lexicographically smallest member of each
  cluster - deterministic across engines, partitionings, and cluster
  sizes (min is associative/commutative).

Every stage is a hash join or a bounded-round label propagation; the
plan survives a name dictionary of 10^8 rows on 1000 executors because
nothing here is quadratic in names - only in verified-duplicate group
size, which real name data keeps tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fuzzy import fuzzy_matches
from .graph import connected_components


def similarity_edges(
    names: DataFrame, name_col: str = "name", max_dist: int = 1
) -> DataFrame:
    """(subj, obj) undirected-once (subj < obj) edges between distinct
    names within Levenshtein distance ``max_dist``, found via the
    symmetric-delete blocking join and exact-verified."""
    n = names.select(F.col(name_col).alias("name")).dropDuplicates(["name"])
    pairs = fuzzy_matches(
        n, n, term_col="name", dict_col="name", max_dist=max_dist
    )
    return pairs.filter(F.col("form") < F.col("term")).select(
        F.col("form").alias("subj"), F.col("term").alias("obj")
    )


def resolve_names(
    names: DataFrame,
    name_col: str = "name",
    max_dist: int = 1,
    max_iter: int = 20,
) -> DataFrame:
    """(name, canonical): every distinct input name mapped to the
    lexicographically smallest member of its similarity component.
    Names with no near-duplicate resolve to themselves (left join +
    coalesce - singletons never enter the component computation, so
    the CC rounds only pay for names that actually have candidates)."""
    n = names.select(F.col(name_col).alias("name")).dropDuplicates(["name"])
    edges = similarity_edges(n, "name", max_dist)
    cc = connected_components(edges, max_iter=max_iter)
    return n.join(cc, n["name"] == cc["node"], "left").select(
        F.col("name"),
        F.coalesce(F.col("component"), F.col("name")).alias("canonical"),
    )
