"""IR ranking / LM statistics operator tests (operators/ranking)."""

import math
import re

from riksdagen_sentences_spark.operators.ranking import (
    bigram_counts,
    bm25_scores,
    doc_terms,
    tfidf_top_terms,
)

_DOCS = [
    (0, "Hash join beats sort merge; hash tables are fast."),
    (1, "Scan then filter then join -- the optimizer reorders."),
    (2, "spark spark spark shuffle"),
    (3, "!!!"),  # tokenizes to nothing
]


def _toks(text):
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _docs_df(spark):
    return spark.createDataFrame(_DOCS, "doc_id bigint, text string")


def test_doc_terms_positions_and_empties(spark):
    rows = doc_terms(_docs_df(spark)).collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc"], []).append((r["idx"], r["term"]))
    # empties dropped, original split positions kept, doc 3 absent
    assert 3 not in got
    assert [t for _, t in sorted(got[2])] == ["spark"] * 3 + ["shuffle"]
    assert [t for _, t in sorted(got[0])] == _toks(_DOCS[0][1])


def test_tfidf_matches_reference(spark):
    tf, docs_with = {}, []
    for d, text in _DOCS:
        ts = _toks(text)
        if not ts:
            continue
        docs_with.append(d)
        for t in ts:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = float(len(docs_with))
    exp = {}
    for d in docs_with:
        scored = [
            (math.floor(c * math.log(n / df[t]) * 10000.0 + 0.5) / 10000.0, t)
            for (dd, t), c in tf.items() if dd == d
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        exp[d] = scored[:2]
    got = {}
    for r in tfidf_top_terms(_docs_df(spark), k=2).collect():
        got.setdefault(r["doc"], []).append(
            (r["rnk"], r["score_r"], r["term"])
        )
    assert set(got) == set(exp)
    for d in exp:
        assert [(s, t) for _, s, t in sorted(got[d])] == exp[d], d


def test_bm25_prefers_matching_docs(spark):
    rows = {r["doc"]: r["score_r"]
            for r in bm25_scores(_docs_df(spark), ["hash", "spark"]).collect()}
    # only docs 0 (hash x2) and 2 (spark x3) match; no zero-score rows
    assert set(rows) == {0, 2}
    assert rows[0] > 0 and rows[2] > 0
    # tf saturation: doc 2's three 'spark' hits score less than 3x one hit
    one = bm25_scores(
        spark.createDataFrame(
            [(0, "spark shuffle a b"), (1, "x y z w")],
            "doc_id bigint, text string",
        ),
        ["spark"],
    ).collect()
    assert len(one) == 1 and one[0]["doc"] == 0


def test_bigram_counts_and_conditionals(spark):
    rows = {(r["w1"], r["w2"]): (r["n"], r["c1"], r["p_r"])
            for r in bigram_counts(_docs_df(spark)).collect()}
    # doc 2: spark->spark x2, spark->shuffle x1 => P(spark|spark)=2/3
    assert rows[("spark", "spark")][0] == 2
    assert rows[("spark", "shuffle")][0] == 1
    assert rows[("spark", "spark")][1] == 3
    assert rows[("spark", "spark")][2] == round(2 / 3, 4)
    # bigrams never cross documents: last token of doc 0 ('fast') pairs
    # with nothing from doc 1
    assert ("fast", "scan") not in rows
    # hand-check one chain from doc 1
    assert rows[("scan", "then")] == (1, 1, 1.0)
    assert rows[("then", "filter")][0] == 1
    assert rows[("then", "join")][0] == 1
    assert rows[("then", "filter")][2] == 0.5
