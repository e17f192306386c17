"""Property-chain inference (operators/infer.py)."""

from riksdagen_sentences_spark.operators.infer import (
    compose,
    invert,
    materialize_rule,
)


def _rel(spark, pairs):
    return spark.createDataFrame(pairs, "subj string, obj string")


def test_invert_flips_direction(spark):
    out = invert(_rel(spark, [("s1", "d1")])).collect()
    assert [(r.subj, r.obj) for r in out] == [("d1", "s1")]


def test_compose_joins_on_middle_and_dedups(spark):
    # two sentences of d1 both mention e1 -> ONE entailed (d1, e1)
    part_of_inv = _rel(spark, [("d1", "s1"), ("d1", "s2"), ("d2", "s3")])
    mentions = _rel(
        spark, [("s1", "e1"), ("s2", "e1"), ("s2", "e2"), ("s3", "e1")]
    )
    got = {
        (r.subj, r.obj)
        for r in compose(part_of_inv, mentions).collect()
    }
    assert got == {("d1", "e1"), ("d1", "e2"), ("d2", "e1")}


def test_no_match_on_disjoint_middle(spark):
    assert (
        compose(
            _rel(spark, [("a", "x")]), _rel(spark, [("y", "c")])
        ).count()
        == 0
    )


def test_materialize_rule_tags_predicate(spark):
    out = materialize_rule(
        _rel(spark, [("d1", "s1")]),
        _rel(spark, [("s1", "e1")]),
        "docMentions",
    ).collect()
    assert [(r.subj, r.pred, r.obj) for r in out] == [
        ("d1", "docMentions", "e1")
    ]
    assert out[0].__fields__ == ["subj", "pred", "obj"]


def test_transitive_closure_chain_and_fixpoint(spark):
    from riksdagen_sentences_spark.operators.infer import (
        transitive_closure,
    )

    # chain a->b->c->d: closure adds (a,c),(a,d),(b,d)
    e = _rel(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {(r.subj, r.obj) for r in transitive_closure(e).collect()}
    assert got == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d"),
    }
    # doubling depth: a 9-node path closes within 4 rounds (2^4 >= 8)
    path = [(f"n{i}", f"n{i+1}") for i in range(8)]
    full = transitive_closure(_rel(spark, path), max_rounds=4)
    assert full.count() == 8 * 9 // 2


def test_cycle_nodes_detects_only_cycle_members(spark):
    from riksdagen_sentences_spark.operators.infer import cycle_nodes

    # cycle a->b->c->a plus a tail c->t (t not on a cycle)
    e = _rel(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("c", "t")])
    got = {r.node for r in cycle_nodes(e).collect()}
    assert got == {"a", "b", "c"}
    # a DAG has no cycle nodes
    dag = _rel(spark, [("a", "b"), ("b", "c")])
    assert cycle_nodes(dag).count() == 0


def test_scc_components_labels(spark):
    from riksdagen_sentences_spark.operators.infer import scc_components

    # cycle {a,b,c}, tail t, disjoint 2-cycle {x,y}, singleton chain s->a
    e = _rel(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "t"),
         ("x", "y"), ("y", "x"), ("s", "a")],
    )
    got = {r.node: r.scc_id for r in scc_components(e).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a",
        "t": "t", "s": "s",
        "x": "x", "y": "x",
    }
