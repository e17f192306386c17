"""N-Triples serialization of the sentence graph.

The reference materializes its graph into MariaDB rows
(/root/reference/models/database_handler.py — INSERT per edge); the
standard interchange format for a knowledge graph is RDF N-Triples
(one `<subj> <pred> <obj> .` line per triple, W3C N-Triples spec).
This module renders the engine's (subj, pred, obj) edge frames into
spec-escaped N-Triples lines as a pure per-row projection:

* zero shuffle — serialization is map-only, so at 100 TB it pipelines
  straight from the graph build into a text/parquet sink with no
  exchange;
* JVM-side only — the escape chain is `replace()` calls (whole-stage
  codegen), no Python in the hot path;
* engine-portable — the same `replace()` chain is valid DuckDB SQL,
  so the serialized lines sit under the exact oracle.

Only the five escapes N-Triples requires for literals are applied
(backslash, quote, LF, CR, TAB); IRIs in this graph are uuid5 hex /
`Q...` / `doc_...` identifiers, which contain no characters needing
percent-encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (search, replacement) pairs, applied in order.  Backslash MUST be
#: first or it would re-escape the escapes introduced later.
_LITERAL_ESCAPES = (
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
)


def escape_literal(col: Column) -> Column:
    """N-Triples literal escaping as a chain of replace() calls."""
    for search, repl in _LITERAL_ESCAPES:
        col = F.replace(col, F.lit(search), F.lit(repl))
    return col


def escape_literal_sql(expr: str) -> str:
    """The identical escape chain as portable SQL (DuckDB oracle twin).

    Quoting note: the SQL string literal for a single backslash is
    '\\' only in engines with backslash escapes; both Spark SQL
    (default config) and DuckDB treat standard string literals as
    escape-free, so chr() builds the troublesome characters.
    """
    out = expr
    pairs = (
        ("chr(92)", "chr(92) || chr(92)"),
        ("chr(34)", "chr(92) || chr(34)"),
        ("chr(10)", "chr(92) || 'n'"),
        ("chr(13)", "chr(92) || 'r'"),
        ("chr(9)", "chr(92) || 't'"),
    )
    for search, repl in pairs:
        out = f"replace({out}, {search}, {repl})"
    return out


def to_ntriples(
    triples: DataFrame,
    base_iri: str = "https://example.org/kg/",
    literal_preds: tuple[str, ...] = ("hasText",),
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Render a (subj, pred, obj) frame to one `ntriple` string column.

    Predicates in ``literal_preds`` serialize their object as an
    escaped quoted literal; every other object is an IRI under
    ``<base_iri>resource/``.  Predicates live under
    ``<base_iri>ontology/``.
    """
    s_iri = F.concat(
        F.lit(f"<{base_iri}resource/"), F.col(subj), F.lit(">")
    )
    p_iri = F.concat(
        F.lit(f"<{base_iri}ontology/"), F.col(pred), F.lit(">")
    )
    o_term = F.when(
        F.col(pred).isin(*literal_preds),
        F.concat(F.lit('"'), escape_literal(F.col(obj)), F.lit('"')),
    ).otherwise(
        F.concat(F.lit(f"<{base_iri}resource/"), F.col(obj), F.lit(">"))
    )
    # F.concat, NOT concat_ws: concat_ws silently DROPS a NULL term and
    # emits a malformed 3-token line; concat propagates NULL - exactly
    # what the DuckDB twin's '||' chain does, so both engines agree on
    # arbitrary stored-triples input (current edge builders never emit
    # NULL terms, so serialized output is unchanged)
    return triples.select(
        F.concat(
            s_iri, F.lit(" "), p_iri, F.lit(" "), o_term, F.lit(" .")
        ).alias("ntriple")
    )


def to_ntriples_sql(
    source: str,
    base_iri: str = "https://example.org/kg/",
    literal_preds: tuple[str, ...] = ("hasText",),
) -> str:
    """DuckDB twin of :func:`to_ntriples` over ``source`` (a relation
    exposing subj/pred/obj columns)."""
    lits = ", ".join(f"'{p}'" for p in literal_preds)
    esc = escape_literal_sql("obj")
    return (
        f"SELECT '<{base_iri}resource/' || subj || '> ' || "
        f"'<{base_iri}ontology/' || pred || '> ' || "
        f"CASE WHEN pred IN ({lits}) "
        f"THEN chr(34) || {esc} || chr(34) "
        f"ELSE '<{base_iri}resource/' || obj || '>' END || ' .' "
        f"AS ntriple FROM {source}"
    )
