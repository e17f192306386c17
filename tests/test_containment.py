"""Directional containment (operators/neardup.containment_pairs)."""

from riksdagen_sentences_spark.operators.neardup import containment_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_excerpt_contained_but_not_container(spark):
    big = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10))
    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(
            _docs(spark, [(1, big), (2, excerpt)]), threshold=0.5
        ).collect()
    }
    # excerpt (8 shingles) fully inside big -> containment 1.0
    assert out == {(2, 1): 1.0}
    # the reverse direction (big in excerpt) is 8/38, below threshold


def test_jaccard_blind_spot(spark):
    # same fixture: symmetric Jaccard is 8/38 ~ 0.21 -> a 0.5-threshold
    # Jaccard pass misses it, containment catches it
    from riksdagen_sentences_spark.operators.neardup import (
        ngram_jaccard_pairs,
    )

    big = " ".join(f"w{i}" for i in range(40))
    excerpt = " ".join(f"w{i}" for i in range(10))
    docs = _docs(spark, [(1, big), (2, excerpt)])
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0
    assert containment_pairs(docs, threshold=0.5).count() == 1


def test_partial_overlap_ratio_exact(spark):
    # doc 2 = 5 words: 3 shingles, exactly 2 shared with doc 1
    d1 = "a b c d e f"
    d2 = "a b c d x"
    out = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(
            _docs(spark, [(1, d1), (2, d2)]), threshold=0.1
        ).collect()
    }
    assert out[(2, 1)] == round(2 / 3, 4)
    assert out[(1, 2)] == 0.5  # 2 of doc1's 4 shingles
