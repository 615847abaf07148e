"""Positional phrase / proximity search — crafted-fixture semantics
(overlap counting, repeated phrase words, absent terms, distance
boundaries) plus the contract entries' sequential-spec equivalence on
hand-checkable rows."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import phrase


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_phrase_basic_and_counts(spark):
    docs = _docs(spark, [
        (1, "the quick brown fox"),
        (2, "quick brown quick brown fox"),
        (3, "brown quick"),          # reversed — no match
        (4, "quick  brown"),         # double space tokenizes clean
        (5, None),
    ])
    out = _by_id(phrase.phrase_match(docs, ["quick", "brown"]))
    assert set(out) == {1, 2, 4}
    assert out[1]["phrase_tf"] == 1
    assert out[2]["phrase_tf"] == 2
    assert out[4]["phrase_tf"] == 1


def test_phrase_overlapping_repeated_word(spark):
    # "a a a" contains "a a" at starts 0 and 1 — overlaps both count
    docs = _docs(spark, [(1, "a a a"), (2, "a b a")])
    out = _by_id(phrase.phrase_match(docs, ["a", "a"]))
    assert set(out) == {1}
    assert out[1]["phrase_tf"] == 2


def test_phrase_longer_than_doc_and_absent(spark):
    docs = _docs(spark, [(1, "x y"), (2, "x y z")])
    assert phrase.phrase_match(docs, ["x", "y", "z"]).count() == 1
    assert phrase.phrase_match(docs, ["z", "x"]).count() == 0


def test_phrase_empty_raises(spark):
    with pytest.raises(ValueError):
        phrase.phrase_match(_docs(spark, [(1, "x")]), [])


def test_proximity_distance_boundary(spark):
    docs = _docs(spark, [
        (1, "alpha x x beta"),        # dist 3
        (2, "alpha x x x x beta"),    # dist 5
        (3, "beta alpha"),            # dist 1, order-free
        (4, "alpha only here"),       # beta absent
        (5, "alpha x x x x x beta alpha"),  # min over pairs = 1
    ])
    out = _by_id(phrase.proximity_match(docs, "alpha", "beta", max_dist=3))
    assert set(out) == {1, 3, 5}
    assert out[1]["min_dist"] == 3
    assert out[3]["min_dist"] == 1
    assert out[5]["min_dist"] == 1


def test_proximity_arg_guards(spark):
    docs = _docs(spark, [(1, "x y")])
    with pytest.raises(ValueError):
        phrase.proximity_match(docs, "x", "x", 3)
    with pytest.raises(ValueError):
        phrase.proximity_match(docs, "x", "y", 0)


def test_positional_postings_restriction(spark):
    docs = _docs(spark, [(1, "a b a c")])
    rows = phrase.positional_postings(docs, terms=["a"]).collect()
    assert sorted((r["term"], r["pos"]) for r in rows) == [("a", 0), ("a", 2)]
