"""Rule-based triple inference: property-chain materialization over the
(subj, pred, obj) graph.

A KG-construction pipeline rarely stops at extracted triples — the
standard next step is materializing ENTAILED triples from rules
(RDFS/OWL 2 property chains, e.g. ``partOf⁻ ∘ mentions ⊑ docMentions``:
"a document mentions every entity its sentences mention").  The
reference stops at extraction (its graph lives as MariaDB rows,
/root/reference/models/database_handler.py); this module adds the
inference layer Spark-first:

- ``invert``: flip a relation's direction — pure projection, no
  shuffle.
- ``compose``: R1 ∘ R2 as ONE equi-join on the shared middle node plus
  a distinct — the relational-algebra form of a SPARQL property path
  ``R1/R2``.  At 100 TB both sides shuffle once on the middle key; a
  hot middle node (one sentence mentioning thousands of entities)
  multiplies output rows, which is semantic fan-out, not a plan
  artifact — cap upstream if the ontology allows.
- ``materialize_rule``: compose + tag with the entailed predicate, the
  unit a forward-chaining loop would run until fixpoint.  Fixed single
  application keeps every registered query oracle-expressible (the
  fixpoint loop is the caller's — see graph.bfs_depths for the
  iterative pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def invert(edges: DataFrame) -> DataFrame:
    """(subj, obj) → (obj, subj): the inverse relation, shuffle-free."""
    return edges.select(
        F.col("obj").alias("subj"), F.col("subj").alias("obj")
    )


def compose(r1: DataFrame, r2: DataFrame) -> DataFrame:
    """Distinct pairs (a, c) with r1(a, b) and r2(b, c): relation
    composition via one equi-join on the middle node."""
    left = r1.select(F.col("subj").alias("__a"), F.col("obj").alias("__b"))
    right = r2.select(F.col("subj").alias("__b"), F.col("obj").alias("__c"))
    return (
        left.join(right, "__b")
        .select(F.col("__a").alias("subj"), F.col("__c").alias("obj"))
        .dropDuplicates(["subj", "obj"])
    )


def materialize_rule(
    r1: DataFrame, r2: DataFrame, entailed_pred: str
) -> DataFrame:
    """(subj, pred, obj) triples entailed by the chain r1 ∘ r2."""
    return compose(r1, r2).select(
        "subj", F.lit(entailed_pred).alias("pred"), "obj"
    )


def transitive_closure(
    edges: DataFrame, max_rounds: int = 6
) -> DataFrame:
    """All distinct (subj, obj) pairs connected by a DIRECTED path of
    length ≥ 1: the reachability relation — transitive-predicate
    materialization (partOf*, dependsOn*), the fixpoint counterpart of
    the single-step :func:`compose`.

    Iterative DOUBLING, not one-step expansion: round r covers paths
    up to length 2^r, so ``max_rounds`` = ⌈log₂(diameter)⌉ suffices —
    the O(log n) round bound every distributed closure uses (same
    contract as graph.connected_components_contraction).  Each round
    is one self-join + distinct, eagerly localCheckpoint'ed so the
    plan stays flat; the loop exits early when a round adds no pairs
    (monotone growth, so equal counts == fixpoint — one cheap count
    job per round against a checkpointed frame).

    Scale: the closure of a dense graph is O(n²) rows — materializing
    it is the caller's decision; for hub-heavy graphs prefer on-demand
    bfs_depths from the nodes you actually query."""
    def _release_checkpoint(df: DataFrame) -> None:
        # localCheckpoint blocks hang off the LogicalRDD leaf, not the
        # cache manager (same note as cache.release_intermediates);
        # superseded round frames are dead the moment the next round's
        # eager checkpoint materializes
        try:
            plan = df._jdf.queryExecution().analyzed()
            if plan.getClass().getSimpleName() == "LogicalRDD":
                plan.rdd().unpersist(False)
        except Exception:
            pass

    cur = (
        edges.select("subj", "obj")
        .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
        .dropDuplicates(["subj", "obj"])
        .localCheckpoint(eager=True)
    )
    n_cur = cur.count()
    converged = False
    for _ in range(max_rounds):
        x = cur.select(
            F.col("subj").alias("__a"), F.col("obj").alias("__m")
        )
        y = cur.select(
            F.col("subj").alias("__m"), F.col("obj").alias("__b")
        )
        comp = x.join(y, "__m").select(
            F.col("__a").alias("subj"), F.col("__b").alias("obj")
        )
        nxt = (
            cur.unionByName(comp)
            .dropDuplicates(["subj", "obj"])
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        _release_checkpoint(cur)
        cur = nxt
        if n_nxt == n_cur:
            converged = True
            break
        n_cur = n_nxt
    if not converged:
        import warnings

        warnings.warn(
            f"transitive_closure: fixpoint NOT reached within "
            f"{max_rounds} doubling rounds (paths up to length "
            f"2^{max_rounds} covered); cycle_nodes/scc_components built "
            "on this closure may be incomplete - raise max_rounds",
            RuntimeWarning,
            stacklevel=2,
        )
    return cur


def cycle_nodes(edges: DataFrame, max_rounds: int = 6) -> DataFrame:
    """(node) — nodes lying on a directed cycle: self-reachable under
    the transitive closure.  The dependency-hygiene probe for the code
    KG (circular imports) and the guard a DAG-expecting consumer runs
    before topological processing."""
    return (
        transitive_closure(edges, max_rounds=max_rounds)
        .filter(F.col("subj") == F.col("obj"))
        .select(F.col("subj").alias("node"))
    )


def scc_components(edges: DataFrame, max_rounds: int = 6) -> DataFrame:
    """(node, scc_id) — strongly connected components labeled by the
    minimum member node: condensing the cycle structure the
    DAG-expecting consumers need (a topological pass runs on the
    condensation, never the raw graph).

    Derivation is closure-based: a and b share an SCC iff each reaches
    the other, so one self-join of the transitive closure against its
    transpose yields the mutual-reachability pairs, and the SCC label
    is min(node, min(mutual partners)) — one aggregate.  Honest bound:
    this materializes the closure (O(n·reach) rows), the right trade
    for catalog-scale dependency graphs; corpus-scale graphs want the
    forward/backward-BFS condensation instead (graph.bfs_depths is the
    building block).  Singleton nodes (no cycle) are their own SCC."""
    clo = transitive_closure(edges, max_rounds=max_rounds)
    rev = clo.select(
        F.col("obj").alias("subj"), F.col("subj").alias("obj")
    )
    mutual = clo.join(rev, ["subj", "obj"]).select(
        F.col("subj").alias("node"), F.col("obj").alias("partner")
    )
    nodes = (
        edges.select(F.col("subj").alias("node"))
        .unionByName(edges.select(F.col("obj").alias("node")))
        .dropDuplicates(["node"])
    )
    lab = mutual.groupBy("node").agg(
        F.min("partner").alias("__min_partner")
    )
    return nodes.join(lab, "node", "left").select(
        "node",
        F.least(
            F.col("node"),
            F.coalesce(F.col("__min_partner"), F.col("node")),
        ).alias("scc_id"),
    )
