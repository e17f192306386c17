"""Graph-analytics operator tests (degrees + connected components)."""

from pyspark.sql import functions as F

from riksdagen_sentences_spark.operators.graph import (
    connected_components,
    degrees,
)
from riksdagen_sentences_spark.plans import pipeline as P
from riksdagen_sentences_spark.sources.synth import files_table


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_degrees_on_tiny_graph(spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c"), ("b", "p", "c")],
        "subj string, pred string, obj string",
    )
    rows = {r["node"]: (r["out_degree"], r["in_degree"], r["degree"])
            for r in degrees(t).collect()}
    assert rows == {"a": (2, 0, 2), "b": (1, 1, 2), "c": (0, 2, 2)}


def test_connected_components_matches_union_find(spark):
    edges = [
        ("a", "b"), ("b", "c"),          # comp min 'a'
        ("d", "e"),                       # comp min 'd'
        ("f", "g"), ("g", "h"), ("h", "f"),  # cycle, min 'f'
        ("i", "i"),                       # self loop
    ]
    df = spark.createDataFrame(edges, "subj string, obj string")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=10).collect()
    }
    exp = _union_find(edges)
    # normalize union-find roots to min-of-component
    comp_members = {}
    for n, r in exp.items():
        comp_members.setdefault(r, []).append(n)
    exp_min = {
        n: min(members)
        for r, members in comp_members.items()
        for n in members
    }
    assert got == exp_min


def test_connected_components_on_pipeline_graph(spark):
    docs = P.docs_from_files(files_table(spark, n_rows=100, seed=42))
    triples = P.triples(spark, docs, cache=True)
    occ = triples.filter(F.col("pred") == "occursIn")
    cc = connected_components(occ, max_iter=15)
    n_nodes = cc.count()
    n_comps = cc.select("component").distinct().count()
    assert 0 < n_comps < n_nodes  # shared tokens connect sentences
    # every component label is a member of the component
    bad = (
        cc.alias("x")
        .join(cc.alias("y"), F.col("x.component") == F.col("y.node"),
              "left_anti")
        .count()
    )
    assert bad == 0


def test_connected_components_nonconvergence_raises(spark):
    """A path graph of length > max_iter cannot converge in max_iter
    min-label rounds - the operator must raise, never return partial
    labels as final."""
    import pytest
    from pyspark.sql import functions as F

    chain = spark.range(12).select(
        F.format_string("n%03d", F.col("id")).alias("subj"),
        F.format_string("n%03d", F.col("id") + 1).alias("obj"),
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)


def test_contraction_matches_union_find_and_propagation(spark):
    """Large-star/small-star contraction: same labels as union-find and
    as label propagation on a mixed multi-component graph."""
    import random

    from riksdagen_sentences_spark.operators.graph import (
        connected_components_contraction,
    )

    rng = random.Random(7)
    edges = [("a", "b"), ("b", "c"), ("d", "e"), ("i", "i")]
    # random graph over 60 nodes, ~50 edges -> several components
    names = [f"n{i:03d}" for i in range(60)]
    for _ in range(50):
        edges.append((rng.choice(names), rng.choice(names)))
    df = spark.createDataFrame(edges, "subj string, obj string")
    got = {
        r["node"]: r["component"]
        for r in connected_components_contraction(df, max_iter=30).collect()
    }
    exp = _union_find(edges)
    comp_members = {}
    for n, r in exp.items():
        comp_members.setdefault(r, []).append(n)
    exp_min = {
        n: min(members)
        for r, members in comp_members.items()
        for n in members
    }
    assert got == exp_min
    prop = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=30).collect()
    }
    assert got == prop


def test_contraction_beats_diameter_on_long_chain(spark):
    """The point of contraction: a 256-node path graph (diameter 255,
    where propagation would need ~255 rounds) must converge in
    O(log^2 n) rounds - well under 20."""
    from riksdagen_sentences_spark.operators.graph import (
        connected_components_contraction,
    )

    chain = spark.range(255).select(
        F.format_string("n%04d", F.col("id")).alias("subj"),
        F.format_string("n%04d", F.col("id") + 1).alias("obj"),
    )
    labels = connected_components_contraction(chain, max_iter=18)
    got = labels.collect()
    assert len(got) == 256
    assert {r["component"] for r in got} == {"n0000"}


def test_contraction_preserves_numeric_id_type(spark):
    """On numeric-id graphs the contraction variant must label with the
    NUMERIC min of each component (not the lexicographic min of the
    string rendering, where '10' < '2') and keep the input id type -
    interchangeability with connected_components under one oracle."""
    from riksdagen_sentences_spark.operators.graph import (
        connected_components,
        connected_components_contraction,
    )

    # component {2, 10, 30}: lexicographic-min-of-string would pick 10
    df = spark.createDataFrame(
        [(10, 2), (10, 30), (100, 7)], "subj bigint, obj bigint"
    )
    labels = connected_components_contraction(df, max_iter=10)
    assert dict(labels.dtypes)["component"] == "bigint"
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert got == {2: 2, 10: 2, 30: 2, 7: 7, 100: 7}
    prop = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iter=10).collect()
    }
    assert got == prop


def test_contraction_rejects_mismatched_id_types(spark):
    import pytest

    from riksdagen_sentences_spark.operators.graph import (
        connected_components_contraction,
    )

    df = spark.createDataFrame([(1, "a")], "subj bigint, obj string")
    with pytest.raises(TypeError, match="one type"):
        connected_components_contraction(df)


def test_release_intermediates_frees_checkpoint_blocks(spark):
    """release_intermediates must actually free localCheckpoint'ed
    frames (blocks live on the checkpoint RDD, where plain
    DataFrame.unpersist() is a no-op)."""
    from riksdagen_sentences_spark.operators.cache import (
        release_intermediates,
        track,
    )

    release_intermediates()  # drain anything tracked by earlier tests
    df = spark.range(1000).localCheckpoint(eager=True)
    jsc = spark.sparkContext._jsc.sc()
    n_before = jsc.getPersistentRDDs().size()
    assert n_before >= 1  # the checkpoint RDD is registered
    track(df)
    assert release_intermediates() == 1
    assert jsc.getPersistentRDDs().size() < n_before


def _pagerank_py(edges, damping=0.85, n_iter=3):
    """Reference NumPy-free PageRank, dangling mass dropped."""
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for a, b in edges:
            contrib[b] += r[a] / outdeg[a]
        r = {
            v: (1.0 - damping) / n + damping * contrib[v] for v in nodes
        }
    return r


def test_pagerank_matches_reference_loop(spark):
    from riksdagen_sentences_spark.operators.graph import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),                      # d is a source
        ("c", "e"),                      # e is a sink (dangling)
    ]
    df = spark.createDataFrame(edges, "subj string, obj string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, damping=0.85, n_iter=4).collect()
    }
    exp = _pagerank_py(edges, damping=0.85, n_iter=4)
    assert set(got) == set(exp)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12, (v, got[v], exp[v])
    # hub 'c' (3 in-edges) must outrank everything
    assert max(exp, key=exp.get) == "c"
    # dangling mass dropped: total rank strictly below 1
    assert sum(got.values()) < 1.0


def test_pagerank_multi_edge_weighting(spark):
    from riksdagen_sentences_spark.operators.graph import pagerank

    # a->b twice: b receives 2/3 of a's rank, c receives 1/3
    edges = [("a", "b"), ("a", "b"), ("a", "c")]
    df = spark.createDataFrame(edges, "subj string, obj string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, damping=0.85, n_iter=1).collect()
    }
    exp = _pagerank_py(edges, damping=0.85, n_iter=1)
    for v in exp:
        assert abs(got[v] - exp[v]) < 1e-12


def test_pagerank_empty_edges(spark):
    from riksdagen_sentences_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "subj string, obj string")
    assert pagerank(df, n_iter=2).count() == 0


# ---------------------------------------------------------------------------
# Co-occurrence graph, triangles, BFS
# ---------------------------------------------------------------------------

def _cooc_edges(spark):
    # groups: g1={a,b,c}, g2={a,b}, g3={b,c,d}, g4={d} (singleton)
    rows = [
        ("g1", "a"), ("g1", "b"), ("g1", "c"), ("g1", "a"),  # dup ignored
        ("g2", "a"), ("g2", "b"),
        ("g3", "b"), ("g3", "c"), ("g3", "d"),
        ("g4", "d"),
    ]
    return spark.createDataFrame(rows, "subj string, obj string")


def test_cooccurrence_pairs_counts(spark):
    from riksdagen_sentences_spark.operators.graph import cooccurrence_pairs

    got = {
        (r["a"], r["b"]): r["n"]
        for r in cooccurrence_pairs(_cooc_edges(spark)).collect()
    }
    assert got == {
        ("a", "b"): 2,           # g1, g2
        ("a", "c"): 1,           # g1
        ("b", "c"): 2,           # g1, g3
        ("b", "d"): 1, ("c", "d"): 1,  # g3
    }


def test_cooccurrence_pmi_matches_formula(spark):
    import math

    from riksdagen_sentences_spark.operators.graph import cooccurrence_pmi

    rows = {
        (r["a"], r["b"]): r
        for r in cooccurrence_pmi(_cooc_edges(spark)).collect()
    }
    # marginals over dedup'd (group, item): a=2, b=3, c=2, d=2; N=4 groups
    marg = {"a": 2, "b": 3, "c": 2, "d": 2}
    n_ab = {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 2,
            ("b", "d"): 1, ("c", "d"): 1}
    assert set(rows) == set(n_ab)
    for (a, b), r in rows.items():
        assert (r["n_ab"], r["n_a"], r["n_b"]) == (
            n_ab[(a, b)], marg[a], marg[b]
        )
        exp = math.log(n_ab[(a, b)] * 4.0 / (marg[a] * marg[b]))
        assert abs(r["pmi"] - exp) < 1e-12, (a, b, r["pmi"], exp)


def test_triangle_count_known_graphs(spark):
    from riksdagen_sentences_spark.operators.graph import triangle_count

    # K4 has 4 triangles; direction/duplicates/self-loops must not matter
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a != b]
    k4 += [("a", "a"), ("b", "a")]  # self loop + duplicate reversed edge
    df = spark.createDataFrame(k4, "subj string, obj string")
    assert triangle_count(df).collect()[0]["n_triangles"] == 4

    # a path graph has none
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "subj string, obj string"
    )
    assert triangle_count(path).collect()[0]["n_triangles"] == 0


def test_bfs_depths_path_cycle_and_cap(spark):
    from riksdagen_sentences_spark.operators.graph import bfs_depths

    # a-b-c-d-e chain with a shortcut a-d, plus isolated pair x-y
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "d"),
         ("x", "y")],
        "subj string, obj string",
    )
    src = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["depth"]
           for r in bfs_depths(edges, src, max_depth=10).collect()}
    # shortest paths respect the a-d shortcut; x/y unreachable
    assert got == {"a": 0, "b": 1, "c": 2, "d": 1, "e": 2}

    # depth cap: from 'e', depth 1 only reaches d
    src_e = spark.createDataFrame([("e",)], "node string")
    capped = {r["node"]: r["depth"]
              for r in bfs_depths(edges, src_e, max_depth=1).collect()}
    assert capped == {"e": 0, "d": 1}


def test_sssp_matches_dijkstra(spark):
    import heapq

    from riksdagen_sentences_spark.operators.graph import sssp

    edges = [
        ("a", "b", 1.0), ("b", "c", 1.0), ("a", "c", 2.5),  # a-c direct loses
        ("c", "d", 0.5), ("a", "d", 10.0),                   # via c wins
        ("d", "a", 0.1),                                      # cycle back
        ("x", "y", 1.0),                                      # unreachable
    ]
    df = spark.createDataFrame(edges, "u string, v string, w double")
    src = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in sssp(df, src, n_iter=4).collect()}

    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
    dist, pq = {"a": 0.0}, [(0.0, "a")]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            if d + w < dist.get(v, float("inf")):
                dist[v] = d + w
                heapq.heappush(pq, (d + w, v))
    assert got == dist  # n_iter=4 >= longest shortest path (3 hops)
    assert "x" not in got and "y" not in got


def test_sssp_iteration_cap_is_hop_bound(spark):
    from riksdagen_sentences_spark.operators.graph import sssp

    chain = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "d", 1.0)],
        "u string, v string, w double",
    )
    src = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"]
           for r in sssp(chain, src, n_iter=2).collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}  # d needs 3 rounds


def test_label_propagation_barbell_two_communities(spark):
    from riksdagen_sentences_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    # two triangles bridged by 3-4: one CC, but two LPA communities
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
        "subj long, obj long",
    )
    got = {r.node: r.label for r in
           label_propagation(edges, n_iter=3).collect()}
    # hand-unrolled synchronous rounds (see docstring semantics):
    # l1 = {1:2, 2:1, 3:1, 4:3, 5:4, 6:4}
    # l2 = {1:1, 2:1, 3:1, 4:4, 5:3, 6:3}
    # l3 = {1:1, 2:1, 3:1, 4:3, 5:3, 6:3}
    assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}
    cc = connected_components(edges)
    assert cc.select("component").distinct().count() == 1


def test_hits_authority_ordering(spark):
    """Hand-checkable bipartite graph: e1 referenced by all three hubs
    stays the max authority (1.0 after max-normalization) every round;
    e2 referenced only by the strongest hub lands strictly between the
    round-2 value 0.4 and 0.5 after four rounds."""
    from riksdagen_sentences_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [("s1", "e1"), ("s2", "e1"), ("s3", "e1"), ("s1", "e2")],
        "subj string, obj string",
    )
    got = {r["node"]: r["authority"] for r in hits(edges).collect()}
    assert got["e1"] == 1.0
    assert 0.0 < got["e2"] < 1.0
    # analytic round-by-round (a(e2) after rounds 1..4: 1/3, 2/5, 7/17,
    # 12/29); pin the round-4 value to guard regressions
    assert abs(got["e2"] - 12.0 / 29.0) < 1e-9
