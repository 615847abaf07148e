"""Char-walk snippet mode (VERDICT r2 #8): reference-parity semantics
(SnippetMapper.java:13-142) pinned on crafted fixtures and compared
against the oracle-checked word-window default."""

from __future__ import annotations

from searchengine_spark.functions.textproc import (
    make_snippet,
    make_snippet_charwalk,
)

Q = ["индекс"]


def test_basic_window_and_highlight():
    t = "один два индекс три четыре пять"
    got = make_snippet_charwalk(t, Q, radius=2)
    assert got == "... один два <b>индекс</b> три четыре ..."


def test_bracket_stops_the_walk():
    # scanning LEFT stops at '>', scanning RIGHT stops at '<'
    # (SnippetMapper.java:68: bracket = isScanningRight ? '<' : '>')
    t = "скрыто <b>видно индекс виден</b> дальше слова"
    got = make_snippet_charwalk(t, Q, radius=3)
    assert "скрыто" not in got, "walk crossed a '>' going left"
    assert "дальше" not in got, "walk crossed a '<' going right"
    assert "<b>индекс</b>" in got


def test_overlapping_intervals_merge():
    # two hits 2 words apart with radius 3 → ONE merged fragment
    # (squashCollisions, SnippetMapper.java:47-63)
    t = "a b c индекс x y поиск d e f"
    got = make_snippet_charwalk(t, ["индекс", "поиск"], radius=3)
    assert got.count("<...>") == 0
    assert "<b>индекс</b>" in got and "<b>поиск</b>" in got


def test_distant_hits_stay_separate_fragments():
    pad = " ".join(f"w{i}" for i in range(30))
    t = f"индекс {pad} поиск"
    got = make_snippet_charwalk(t, ["индекс", "поиск"], radius=2)
    assert got.count("<...>") == 1, got


def test_first_occurrence_only_vs_word_window():
    """Documented reference quirk: the char-walk positions each
    distinct surface at its FIRST occurrence only (indexOf,
    SnippetMapper.java:95-106); the word-window mode excerpts every
    hit. Both highlight the same surface."""
    t = "один два индекс три четыре пять шесть семь индекс восемь"
    cw = make_snippet_charwalk(t, Q, radius=2)
    ww = make_snippet(t, Q, radius=2)
    assert cw.count("<b>индекс</b>") == 1
    assert ww.count("<b>индекс</b>") == 2
    # the shared (first) window reads the same words in both modes
    assert "два <b>индекс</b> три" in cw
    assert "два <b>индекс</b> три" in ww


def test_inflected_surface_highlighting():
    # lemma 'индекс' must highlight the inflected surface 'индексы'
    t = "старые индексы работали быстро"
    got = make_snippet_charwalk(t, Q, radius=2)
    assert "<b>индексы</b>" in got


def test_empty_and_miss_cases():
    assert make_snippet_charwalk(None, Q) == ""
    assert make_snippet_charwalk("", Q) == ""
    assert make_snippet_charwalk("ничего похожего здесь", Q) == ""


def test_udf_mode_switch(spark):
    from pyspark.sql import functions as F

    from searchengine_spark.functions.udfs import snippet_udf

    df = spark.createDataFrame(
        [(1, "один два индекс три четыре")], "doc_id long, text string"
    )
    out = df.select(
        snippet_udf(Q, radius=2)(F.col("text")).alias("ww"),
        snippet_udf(Q, radius=2, mode="charwalk")(F.col("text")).alias("cw"),
    ).collect()[0]
    assert out["ww"] == "один два <b>индекс</b> три четыре"
    assert out["cw"] == "... один два <b>индекс</b> три четыре ..."
