"""Graph analytics over the materialized triple store.

The reference's KG is only ever queried relationally (sql/*.sql); these
operators add the graph-native views a KG consumer needs at scale:

- ``degrees``: per-node degree (in/out/total) - one hash aggregation.
- ``connected_components``: iterative min-label propagation with
  periodic ``localCheckpoint`` to cut the lineage (the standard Spark
  iterative-algorithm pattern; without the checkpoint the plan doubles
  every iteration and the driver OOMs on plan size long before data
  size matters).  Converges in O(diameter) rounds; each round is one
  shuffle on node id.  AQE handles the skewed super-nodes ("och") that
  dominate the edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .cache import track


def degrees(triples: DataFrame) -> DataFrame:
    """(node, out_degree, in_degree, degree) over (subj, pred, obj)."""
    out_d = triples.groupBy(F.col("subj").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = triples.groupBy(F.col("obj").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, component) where component = min node id in the weakly
    connected component.  ``edges`` needs columns (subj, obj).

    Label propagation: every node repeatedly adopts the minimum label
    among itself and its neighbors until a fixpoint.  Deterministic
    (min over string ids).

    Raises ``RuntimeError`` if ``max_iter`` rounds exhaust WITHOUT
    reaching the fixpoint (component diameter > max_iter) - silently
    returning non-converged labels would hand the caller wrong
    components.  min-label propagation converges in O(diameter) rounds,
    so raise ``max_iter`` for long-chain graphs.

    ONE Spark action per iteration: the changed-row count rides along as
    an ``Observation`` metric (``sum(__changed)``) on the same job that
    materializes the new labels - no separate convergence-probe
    join+count pass.  All persisted frames (including the final labels)
    are unpersisted on the non-convergence raise path.

    Scale note: plain label propagation is O(diameter) shuffle rounds -
    the right trade for entity-mention graphs, whose diameter is tiny
    (entities are hubs; every node is <= 2 hops from a hub).  For
    general high-diameter graphs at 100 TB the known fix is the
    large-star/small-star contraction of Kiveris et al. (CC in
    MapReduce), which converges in O(log^2 n) rounds by pointing every
    node at its component minimum instead of its neighborhood minimum;
    propagation is preferred here because contraction's per-round cost
    is ~2x and never pays off at diameter <= ~6.
    """
    # localCheckpoint, not persist: persist caches DATA but every
    # round's plan still textually inlines the full upstream lineage
    # (an LSH verified-pairs input contributes ~400 nodes), so 20
    # rounds explode the executed plan to tens of thousands of nodes -
    # pure driver-side analysis cost.  The checkpoint leaf (Scan
    # ExistingRDD) severs it once, exactly as pagerank's cedges.
    sym = (
        edges.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
        .unionByName(
            edges.select(F.col("obj").alias("a"), F.col("subj").alias("b"))
        )
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .dropDuplicates(["node"])
        .withColumn("component", F.col("node"))
        .persist()
    )
    converged = False
    for i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        obs = Observation()
        flagged = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
                F.when(
                    F.coalesce(
                        F.col("nbr_min") < F.col("component"), F.lit(False)
                    ),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .alias("__changed"),
            )
            .observe(obs, F.sum("__changed").alias("changed"))
            .drop("__changed")
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = flagged.localCheckpoint(eager=True)
        else:
            new_labels = flagged.persist()
            new_labels.count()
        changed = obs.get["changed"] or 0
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    track(sym)  # checkpoint blocks: freed by release_intermediates()
    track(labels)  # released by cache.release_intermediates() after use
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "iterations (component diameter exceeds max_iter); raise "
            "max_iter - returning partial labels would be silently wrong"
        )
    return labels.select("node", "component")


def connected_components_contraction(
    edges: DataFrame,
    max_iter: int = 30,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, component) by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) - the high-diameter scale path: converges in
    O(log^2 n) rounds regardless of component diameter, vs the
    O(diameter) rounds of :func:`connected_components`' label
    propagation.  Use propagation for hub-and-spoke graphs (entity
    mentions: diameter <= ~6, half the per-round cost); use this for
    chain/lattice-shaped graphs where diameter grows with data size.

    Per round (both steps are one groupBy shuffle each):
    - large-star: every node u computes m = min(neighbors(u) + [u]) and
      rewires each LARGER neighbor v to m - emit (v, m),
    - small-star: over the rewired (larger, smaller) edges, every node u
      computes m = min(smaller-neighbors) and rewires those neighbors
      and itself to m.

    Fixpoint = the edge set is unchanged by a full round; then every
    edge is (node, component-min) and labels read off directly.
    Deterministic (min over the NATIVE node-id type - like
    :func:`connected_components`, subj/obj must share one orderable
    type; numeric-id graphs get numeric min labels of the input type,
    not the lexicographic min of their string rendering, so the two
    variants stay interchangeable under one oracle).  Raises like the
    propagation variant if ``max_iter`` rounds don't reach the fixpoint.
    """
    if edges.schema["subj"].dataType != edges.schema["obj"].dataType:
        raise TypeError(
            "connected_components_contraction needs subj and obj of one "
            f"type, got {edges.schema['subj'].dataType} vs "
            f"{edges.schema['obj'].dataType}; cast before calling"
        )
    # localCheckpoint (not just persist) both seeds: the input edge
    # lineage may be an entire pipeline's plan, and every round's plan
    # would otherwise embed it twice per step - the driver heap dies on
    # plan size long before data size matters.
    nodes = (
        edges.select(F.col("subj").alias("node"))
        .unionByName(edges.select(F.col("obj").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint(eager=True)
    )
    e = (
        edges.select(
            F.col("subj").alias("a"),
            F.col("obj").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .dropDuplicates(["hi", "lo"])
        .localCheckpoint(eager=True)
    )
    converged = False
    for i in range(max_iter):
        # large-star: symmetric neighborhoods, rewire larger neighbors
        sym = e.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(e.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select(
            "u", F.least(F.col("u"), F.col("mv")).alias("m")
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .dropDuplicates(["hi", "lo"])
        )
        # small-star: per larger endpoint, rewire its smaller neighbors
        # (and itself) to their minimum
        small_min = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(small_min, "hi")
            .filter(F.col("lo") != F.col("m"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(
                small_min.select(
                    F.col("hi"), F.col("m").alias("lo")
                )
            )
            .filter(F.col("hi") != F.col("lo"))
            .dropDuplicates(["hi", "lo"])
        )
        if (i + 1) % checkpoint_every == 0:
            new_e = small.localCheckpoint(eager=True)
        else:
            new_e = small.persist()
            new_e.count()
        same = (
            new_e.count() == e.count()
            and new_e.join(e, ["hi", "lo"], "left_anti").limit(1).count()
            == 0
        )
        e.unpersist()
        e = new_e
        if same:
            converged = True
            break
    track(e)
    if not converged:
        nodes.unpersist()
        e.unpersist()
        raise RuntimeError(
            "connected_components_contraction did not converge within "
            f"{max_iter} rounds; raise max_iter"
        )
    labels = nodes.join(
        e.select(F.col("hi").alias("node"), F.col("lo").alias("component")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("component", "node").alias("component")
    )
    track(nodes)
    return labels


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, rank) after ``n_iter`` synchronous PageRank iterations
    over the directed (subj, obj) edge list:

        r_{k+1}(v) = (1 - d)/N  +  d * sum_{u->v} r_k(u) / outdeg(u)

    Dangling mass is DROPPED (nodes without out-edges leak their rank),
    so ranks sum to < 1 on graphs with sinks - the fixed-point ORDERING
    is unaffected, and the recurrence stays a pure join+aggregate that
    any SQL engine reproduces exactly, which is what makes the result
    oracle-checkable.  Multi-edges contribute multiply (weight =
    multiplicity); pre-``dropDuplicates`` to get the simple-graph
    variant.

    Scale shape: one edge⋈outdeg pre-join paid ONCE and persisted, then
    per iteration exactly one shuffle-join of the (node, rank) frame
    against the persisted contribution edges plus one hash aggregate on
    the destination - the canonical distributed PageRank plan.  Hub
    destinations (entity super-nodes) are map-side combined by the
    partial aggregate; ``localCheckpoint`` every ``checkpoint_every``
    rounds cuts the iterative plan growth exactly as in
    :func:`connected_components`.  The reference consumes its KG only
    relationally (sql/*.sql); ranking is a graph-native extension.
    """
    nodes = (
        edges.select(F.col("subj").alias("node"))
        .unionByName(edges.select(F.col("obj").alias("node")))
        .dropDuplicates(["node"])
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = edges.groupBy(F.col("subj").alias("node")).agg(
        F.count("*").alias("deg")
    )
    # contribution edges: (src, dst, deg) - the only per-iteration join
    # input; localCheckpoint severs the (possibly whole-pipeline) edge
    # lineage so each round's plan stays constant-size.
    cedges = (
        edges.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .join(outdeg.withColumnRenamed("node", "src"), "src")
        .localCheckpoint(eager=True)
    )
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(n_iter):
        contribs = (
            ranks.join(cedges, ranks["node"] == cedges["src"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            # checkpoint blocks survive unpersist(); track() each so the
            # caller's release_intermediates() frees the whole chain.
            new = track(new_ranks.localCheckpoint(eager=True))
        else:
            new = new_ranks.persist()
            new.count()
        ranks.unpersist()
        ranks = new
    track(nodes)
    track(cedges)
    return ranks.select("node", "rank")


def cooccurrence_pairs(
    edges: DataFrame, group_col: str = "subj", item_col: str = "obj"
) -> DataFrame:
    """(a, b, n) - unordered item pairs sharing a group, counted over
    groups: the co-mention graph builder (entities co-mentioned in a
    sentence, repos sharing a path, ...).

    Scale shape: the self-join explodes quadratically only WITHIN a
    group (per-sentence entity sets are small and bounded by the
    matcher); the pair aggregate is a map-side-combined hash groupBy.
    A pathological hot group (one sentence mentioning thousands of
    entities) is the caller's signal to cap or sample that group - the
    quadratic blowup is semantic, not a plan artifact."""
    return _pairs_from_base(_group_items(edges, group_col, item_col))


def _group_items(
    edges: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Persisted distinct (g, a) frame - the cut-point every
    co-occurrence consumer (self-join sides, marginals, group count)
    reads instead of re-running the upstream edge lineage per
    reference.  Released via cache.release_intermediates()."""
    base = (
        edges.select(
            F.col(group_col).alias("g"), F.col(item_col).alias("a")
        )
        .dropDuplicates(["g", "a"])
        .persist()
    )
    return track(base)


def _pairs_from_base(base: DataFrame) -> DataFrame:
    other = base.select("g", F.col("a").alias("b"))
    return (
        base.join(other, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )


def cooccurrence_pmi(
    edges: DataFrame, group_col: str = "subj", item_col: str = "obj"
) -> DataFrame:
    """(a, b, n_ab, n_a, n_b, pmi): pointwise mutual information of
    co-occurring items over the group universe,

        pmi(a, b) = ln( n_ab * N / (n_a * n_b) )

    with N = number of distinct groups carrying at least one item.
    Positive pmi = the pair co-occurs more than its marginals predict -
    the standard edge weight for KG co-mention graphs.  Marginals are
    one hash aggregate each and join the (much smaller) pair table;
    N rides in as a literal-free scalar via a 1-row cross join so the
    whole plan stays a single declarative tree.  All four consumers
    (both self-join sides, the marginal, the group count) read ONE
    persisted (g, item) frame - the upstream edge lineage runs once."""
    base = _group_items(edges, group_col, item_col)
    pairs = _pairs_from_base(base).withColumnRenamed("n", "n_ab")
    marg = base.groupBy("a").agg(F.count("*").alias("m"))
    # Spark resolves column names case-insensitively by default, so the
    # scalar cannot be called "N" next to the pair count "n".
    n_groups = base.select("g").dropDuplicates().agg(
        F.count("*").cast("double").alias("n_groups")
    )
    return (
        pairs.join(marg.select(F.col("a"),
                               F.col("m").alias("n_a")), "a")
        .join(marg.select(F.col("a").alias("b"),
                          F.col("m").alias("n_b")), "b")
        .crossJoin(n_groups)
        .select(
            "a", "b", "n_ab", "n_a", "n_b",
            F.log(
                F.col("n_ab") * F.col("n_groups")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("pmi"),
        )
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """1-row (n_triangles) over an undirected simple graph given as
    (subj, obj) pairs (direction and duplicates ignored).

    Canonicalize to a < b once, then the classic two-join plan: wedges
    (a<b<c) from e(a,b) x e(b,c), closed by a left-semi probe against
    e(a,c).  Both joins shuffle on a single node key; no node ever sees
    more than its own adjacency squared (the standard distributed
    triangle enumeration bound).  Left-semi keeps the probe side from
    materializing payload columns."""
    e = (
        edges.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    wedges = e.select(F.col("a").alias("wa"), F.col("b").alias("wb")).join(
        e.select(F.col("a").alias("wb"), F.col("b").alias("wc")), "wb"
    )
    closed = wedges.join(
        e,
        (wedges["wa"] == e["a"]) & (wedges["wc"] == e["b"]),
        "left_semi",
    )
    track(e)
    return closed.agg(F.count("*").cast("bigint").alias("n_triangles"))


def bfs_depths(
    edges: DataFrame, source_df: DataFrame, max_depth: int = 10
) -> DataFrame:
    """(node, depth) - unweighted shortest-path depth from the source
    node(s) over the undirected (subj, obj) graph, capped at
    ``max_depth`` (unreached nodes are absent).

    ``source_df`` is a 1-column (node) DataFrame so the source can be
    chosen by a query (e.g. the max-degree hub) without collecting it.
    Frontier expansion: each round joins the CURRENT frontier (not the
    whole visited set) against the symmetric edge list, anti-joins the
    visited set, and unions the survivors in at depth+1 - the textbook
    distributed BFS; rounds = eccentricity <= max_depth, each one
    shuffle on node id.  Lineage cut per round via localCheckpoint
    exactly as the other iterative operators."""
    sym = (
        edges.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
        .unionByName(
            edges.select(F.col("obj").alias("u"), F.col("subj").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .persist()
    )
    visited = track(
        source_df.select(F.col("node"))
        .dropDuplicates(["node"])
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .dropDuplicates(["node"])
            .join(visited, "node", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        nxt = track(nxt.localCheckpoint(eager=True))
        if nxt.limit(1).count() == 0:
            break
        visited = track(
            visited.unionByName(nxt).localCheckpoint(eager=True)
        )
        frontier = nxt
    track(sym)
    return visited


def sssp(
    edges: DataFrame,
    source_df: DataFrame,
    n_iter: int = 4,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
) -> DataFrame:
    """(node, dist) - weighted shortest-path distance from the source
    node(s) over DIRECTED (u, v, w) edges after exactly ``n_iter``
    synchronous Bellman-Ford rounds (pass a symmetrized edge list for
    undirected graphs; nodes unreached within n_iter hops are absent).

    Each round relaxes every edge out of the current distance set and
    folds with one hash aggregate:

        dist' = min over {dist} U {dist[u] + w : (u, v, w)}

    - one shuffle on node id per round, the same fixed-iteration shape
    (and oracle-unrolling contract) as ``pagerank``.  min/+ over doubles
    is the identical op sequence in any engine, so unrolled SQL twins
    hash-match exactly.  Lineage cut per round via localCheckpoint as in
    the other iterative operators."""
    e = edges.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v"),
        F.col(w_col).cast("double").alias("w"),
    ).persist()
    dist = track(
        source_df.select("node")
        .dropDuplicates(["node"])
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iter):
        cand = dist.join(e, dist["node"] == e["u"]).select(
            F.col("v").alias("node"),
            (F.col("dist") + F.col("w")).alias("dist"),
        )
        dist = track(
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    track(e)
    return dist


def kcore_nodes(
    edges: DataFrame,
    k: int = 2,
    n_iter: int = 3,
) -> DataFrame:
    """(node,) - nodes still alive after exactly ``n_iter`` synchronous
    rounds of k-core peeling over the undirected simple graph given as
    (subj, obj) pairs (duplicates/direction collapsed).

    Peeling round: drop every node whose degree *within the surviving
    subgraph* is < k; repeat.  The fixed-round synchronous variant (same
    contract as :func:`label_propagation` / :func:`sssp`) keeps the
    recurrence pure join/aggregate algebra so a SQL oracle can unroll it
    round by round; run more rounds for the true fixpoint (peeling
    converges in at most |V| rounds, in practice a handful).

    Scale shape: per round two left-semi joins of the checkpointed edge
    list against the (much smaller) alive set - broadcastable once
    peeling bites - and one map-side-combined degree aggregate.
    ``localCheckpoint`` cuts the iterative lineage as in the other
    fixed-round operators."""
    und = track(
        edges.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
        .unionByName(
            edges.select(F.col("obj").alias("u"), F.col("subj").alias("v"))
        )
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    alive = track(
        und.select(F.col("u").alias("node"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iter):
        surv = (
            und.join(alive.select(F.col("node").alias("u")), "u", "left_semi")
            .join(alive.select(F.col("node").alias("v")), "v", "left_semi")
        )
        alive = track(
            surv.groupBy(F.col("u").alias("node"))
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
    return alive


def label_propagation(
    edges: DataFrame,
    n_iter: int = 3,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, label) after ``n_iter`` rounds of SYNCHRONOUS label
    propagation over the undirected simple graph of (subj, obj):

        label_0(v)     = v
        label_{r+1}(v) = most frequent label among v's neighbors,
                         ties -> MIN label

    Community detection one notch softer than connected components:
    min-label CC floods the whole component with one label, while the
    neighbor-majority vote lets dense cores keep their own labels
    inside a sparsely-bridged component.  Synchronous + fixed rounds +
    deterministic tie-break = the recurrence is pure join/aggregate
    algebra, so a SQL oracle can unroll it round by round (the same
    contract as :func:`pagerank` and :func:`sssp`; asynchronous LPA is
    faster to converge but order-dependent, useless under an oracle).

    Multi-edges are collapsed first (simple-graph votes); pass a
    weighted edge list through a pre-aggregation if weighted votes are
    wanted.  Scale shape: per round exactly one shuffle-join of the
    (node, label) frame against the checkpointed undirected edges and
    one two-level aggregate (count votes, then min(struct(-count,
    label)) - both map-side combined); ``localCheckpoint`` cuts the
    iterative lineage exactly as in :func:`connected_components`.
    """
    und = (
        edges.select(F.col("subj").alias("u"), F.col("obj").alias("v"))
        .unionByName(
            edges.select(F.col("obj").alias("u"), F.col("subj").alias("v"))
        )
        .dropDuplicates(["u", "v"])
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for i in range(n_iter):
        votes = (
            labels.join(und, labels["node"] == und["u"])
            .groupBy(F.col("v").alias("dst"), "label")
            .agg(F.count("*").alias("c"))
        )
        new_labels = (
            votes.groupBy(F.col("dst").alias("node"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("w")
            )
            .select("node", F.col("w.l").alias("label"))
        )
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            new = track(new_labels.localCheckpoint(eager=True))
        else:
            new = new_labels.persist()
            new.count()
        labels.unpersist()
        labels = new
    track(und)
    return labels


def hits(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """(node, authority) HITS authority scores after ``n_iter``
    synchronous rounds over the directed bipartite-usable (subj, obj)
    edge list:

        a_k(v) = sum_{u->v} h_{k-1}(u),  normalized by max(a_k)
        h_k(u) = sum_{u->v} a_k(v),      normalized by max(h_k)

    Max-normalization (not L2) keeps every step a join + aggregate +
    one scalar division of doubles - deterministic enough that a 4-dp
    round at the END matches the SQL oracle exactly (the same
    FP-sum-order argument as linalg.top_principal_component).

    Scale shape: edges localCheckpointed once; each round is two
    shuffle-joins against the (node, score) frames plus two map-side-
    combined hash aggregates - identical plan skeleton to
    :func:`pagerank`, with the hub/authority frames strictly smaller
    than the edge list.  Multi-edges contribute multiply;
    pre-dropDuplicates for the simple-graph variant.
    """
    e = edges.select("subj", "obj").localCheckpoint(eager=True)
    hubs = e.select("subj").distinct().withColumn("h", F.lit(1.0))
    auth = None
    for _ in range(n_iter):
        # a_raw/h_raw are each consumed TWICE (max + normalize); an
        # eager localCheckpoint severs the lineage so the double use
        # does not double the plan per round (2^k blowup by the last
        # round - the connected_components defect-27 shape)
        a_raw = track(
            e.join(hubs, "subj")
            .groupBy("obj")
            .agg(F.sum("h").alias("a"))
            .localCheckpoint(eager=True)
        )
        a_max = a_raw.agg(F.max("a").alias("__m"))
        auth = a_raw.crossJoin(F.broadcast(a_max)).select(
            "obj", (F.col("a") / F.col("__m")).alias("a")
        )
        h_raw = track(
            e.join(auth, "obj")
            .groupBy("subj")
            .agg(F.sum("a").alias("h"))
            .localCheckpoint(eager=True)
        )
        h_max = h_raw.agg(F.max("h").alias("__m"))
        hubs = h_raw.crossJoin(F.broadcast(h_max)).select(
            "subj", (F.col("h") / F.col("__m")).alias("h")
        )
    track(e)
    return auth.select(
        F.col("obj").alias("node"), F.col("a").alias("authority")
    )


def adamic_adar(
    edges: DataFrame, max_hub_degree: int | None = None
) -> DataFrame:
    """(a, b, cn, aa) — common-neighbor count and Adamic–Adar score

        aa(a, b) = Σ_{z ∈ N(a) ∩ N(b)}  1 / ln(deg(z))

    for every NON-edge node pair with at least one common neighbor:
    the classic KG link-prediction baseline (Adamic & Adar 2003),
    here for proposing missing co-mention edges.

    Plan shape: symmetrize once, wedge-join the adjacency on the
    middle node z (each z contributes deg(z)² candidate pairs), drop
    existing edges with one left-anti join on the canonical (a < b)
    edge set, then a single map-side-combined hash aggregate.  deg(z)
    ≥ 2 for any z forming a wedge, so ln(deg) > 0 always.

    Scale: the wedge join is quadratic in per-node degree — the same
    bound as triangle counting.  ``max_hub_degree`` drops nodes above
    the cap from the MIDDLE position only (they still appear as
    endpoints): a standard, explicitly-lossy mitigation — hubs
    contribute the least Adamic–Adar weight per wedge (1/ln(deg) → 0)
    while costing deg² pairs, so capping trades negligible score mass
    for removing the dominant skew term."""
    e = (
        edges.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .persist()
    )
    track(e)
    adj = e.select(F.col("a").alias("z"), F.col("b").alias("n")).unionByName(
        e.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("z").agg(F.count("*").alias("deg"))
    if max_hub_degree is not None:
        deg = deg.filter(F.col("deg") <= F.lit(max_hub_degree))
    mid = adj.join(deg, "z")
    wedges = (
        mid.select("z", F.col("n").alias("wa"), "deg")
        .join(mid.select("z", F.col("n").alias("wb")), "z")
        .filter(F.col("wa") < F.col("wb"))
    )
    new_pairs = wedges.join(
        e,
        (wedges["wa"] == e["a"]) & (wedges["wb"] == e["b"]),
        "left_anti",
    )
    return new_pairs.groupBy(
        F.col("wa").alias("a"), F.col("wb").alias("b")
    ).agg(
        F.count("*").alias("cn"),
        F.sum(F.lit(1.0) / F.log(F.col("deg"))).alias("aa"),
    )
