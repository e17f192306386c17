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
