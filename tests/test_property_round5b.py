"""Property-based checks for the round-5b operators whose correctness
rests on a non-obvious encoding argument:

- BPE merge application: the double-space string ``replace()`` fold
  must equal the reference greedy leftmost scan-merge for ARBITRARY
  symbol sequences and pair choices (this is the claim the module
  docstring proves; hypothesis probes it with adversarial inputs -
  overlapping runs, merged-symbol collisions, back-to-back matches).
- Prefix-filter completeness: for random tiny corpora, the
  prefix+positional candidate set must contain every brute-force
  qualifying pair (the no-missed-pairs lemma), checked end to end
  through the public operator.

Both run the Spark expression engine against pure-Python references -
no oracle indirection, the semantics themselves are the subject.
"""

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _greedy_merge(syms, x, y):
    """Reference greedy leftmost single-pass BPE merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _encode(syms):
    return " " + "  ".join(syms) + " "


def _apply_replace(seq, x, y):
    """The operator's encoding: non-overlapping left-to-right literal
    replace on the double-space string form (Python str.replace shares
    these semantics with Spark's replace() and DuckDB's replace())."""
    return seq.replace(f" {x}  {y} ", f" {x}{y} ")


symbols = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=2), min_size=1, max_size=8
)


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(symbols, st.text(alphabet="ab", min_size=1, max_size=2),
       st.text(alphabet="ab", min_size=1, max_size=2))
def test_bpe_replace_encoding_equals_greedy_merge(syms, x, y):
    got = _apply_replace(_encode(syms), x, y)
    want = _encode(_greedy_merge(syms, x, y))
    assert got == want, (syms, x, y)


@settings(max_examples=100, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(symbols, st.text(alphabet="ab", min_size=1, max_size=2),
       st.text(alphabet="ab", min_size=1, max_size=2))
def test_bpe_replace_encoding_matches_duckdb_replace(syms, x, y):
    """DuckDB's replace() (the oracle side) agrees with Python's
    str.replace (proven equal to the greedy merge above)."""
    con = duckdb.connect()
    got = con.execute(
        "SELECT replace(?, ?, ?)",
        [_encode(syms), f" {x}  {y} ", f" {x}{y} "],
    ).fetchone()[0]
    assert got == _apply_replace(_encode(syms), x, y)


def _brute_pairs(docsets, t_num, t_den):
    out = set()
    ids = sorted(docsets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(docsets[a] & docsets[b])
            union = len(docsets[a] | docsets[b])
            if union and t_den * inter >= t_num * union:
                out.add((a, b, inter))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(
            st.sampled_from("red blue green gold pale dark icy".split()),
            min_size=3, max_size=9,
        ),
        min_size=2, max_size=5,
    ),
    st.sampled_from([(1, 2), (3, 10), (2, 3)]),
)
def test_prefix_jaccard_complete_on_random_corpora(spark, wordlists, t):
    import pyspark.sql.functions as F

    from riksdagen_sentences_spark.operators.neardup import (
        _doc_shingles,
        prefix_jaccard_pairs,
    )

    t_num, t_den = t
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(wordlists)],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b, r.isz)
        for r in prefix_jaccard_pairs(docs, t_num=t_num, t_den=t_den)
        .collect()
    }
    sets = {
        r.doc_id: set()
        for r in docs.select("doc_id").collect()
    }
    for r in _doc_shingles(docs, "text").collect():
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    sets = {k: v for k, v in sets.items() if v}
    assert got == _brute_pairs(sets, t_num, t_den), (wordlists, t)
