"""N-Triples serialization (operators/rdf.py): escape chain, IRI vs
literal dispatch, and round-trip parseability."""

import re

from riksdagen_sentences_spark.operators.rdf import to_ntriples

_NT_LINE = re.compile(
    r"^<[^ >]+> <[^ >]+> (<[^ >]+>|\"(?:[^\"\\]|\\.)*\") \.$"
)


def _lines(spark, rows):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    return [r.ntriple for r in to_ntriples(df).collect()]


def test_iri_and_literal_dispatch(spark):
    out = _lines(
        spark,
        [("s1", "partOf", "d1"), ("s1", "hasText", "plain text")],
    )
    assert (
        "<https://example.org/kg/resource/s1> "
        "<https://example.org/kg/ontology/partOf> "
        "<https://example.org/kg/resource/d1> ." in out
    )
    assert (
        "<https://example.org/kg/resource/s1> "
        "<https://example.org/kg/ontology/hasText> "
        '"plain text" .' in out
    )


def test_escape_chain_order_and_coverage(spark):
    # backslash first: a literal \n sequence in the source must NOT be
    # double-escaped into \\\\n, and a real newline becomes \n
    (line,) = _lines(spark, [("s", "hasText", 'a\\b "q"\nx\ry\tz')])
    assert '"a\\\\b \\"q\\"\\nx\\ry\\tz"' in line
    assert "\n" not in line and "\r" not in line and "\t" not in line


def test_every_line_parses(spark):
    rows = [
        ("s1", "partOf", "d1"),
        ("s1", "hasText", 'tricky "\\" literal\n'),
        ("t1", "occursIn", "s1"),
    ]
    for line in _lines(spark, rows):
        assert _NT_LINE.match(line), line


def test_map_only_plan(spark):
    df = spark.createDataFrame(
        [("s", "hasText", "x")], "subj string, pred string, obj string"
    )
    plan = (
        to_ntriples(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
