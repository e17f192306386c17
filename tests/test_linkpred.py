"""Adamic–Adar link prediction (operators/graph.adamic_adar): wedge
enumeration, existing-edge suppression, score arithmetic, hub cap."""

import math

from riksdagen_sentences_spark.operators.graph import adamic_adar


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "subj string, obj string")


def test_path_graph_predicts_endpoints(spark):
    # a-b, b-c: the only non-edge pair with a common neighbor is (a, c)
    out = adamic_adar(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    assert len(out) == 1
    (r,) = out
    assert (r.a, r.b, r.cn) == ("a", "c", 1)
    assert abs(r.aa - 1.0 / math.log(2)) < 1e-12


def test_existing_edges_suppressed_and_multi_neighbor(spark):
    # K3 plus pendant d on a: (b,d) and (c,d) via a; (b,c) is an edge
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "d")]
    out = {(r.a, r.b): r for r in adamic_adar(_edges(spark, edges)).collect()}
    assert set(out) == {("b", "d"), ("c", "d")}
    assert out[("b", "d")].cn == 1
    # deg(a) = 3 in the simple graph
    assert abs(out[("b", "d")].aa - 1.0 / math.log(3)) < 1e-12
    # two common neighbors: square a-b-d-c-a predicts the diagonals
    sq = [("a", "b"), ("b", "d"), ("d", "c"), ("c", "a")]
    out2 = {
        (r.a, r.b): r for r in adamic_adar(_edges(spark, sq)).collect()
    }
    assert out2[("a", "d")].cn == 2
    assert abs(out2[("a", "d")].aa - 2.0 / math.log(2)) < 1e-12


def test_direction_and_duplicates_ignored(spark):
    out = adamic_adar(
        _edges(spark, [("b", "a"), ("a", "b"), ("b", "c")])
    ).collect()
    assert len(out) == 1 and out[0].cn == 1


def test_hub_cap_drops_middle_but_keeps_endpoints(spark):
    # star center h with 4 leaves, plus a disjoint path p1-x-p2
    edges = [("h", f"l{i}") for i in range(4)] + [
        ("p1", "x"), ("x", "p2"),
    ]
    capped = {
        (r.a, r.b)
        for r in adamic_adar(
            _edges(spark, edges), max_hub_degree=3
        ).collect()
    }
    # wedges through h (deg 4) are gone; the one through x (deg 2) stays
    assert capped == {("p1", "p2")}
    uncapped = {
        (r.a, r.b) for r in adamic_adar(_edges(spark, edges)).collect()
    }
    assert ("l0", "l3") in uncapped
