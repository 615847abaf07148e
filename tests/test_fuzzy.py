"""SymSpell fuzzy term suggestion: deletion-key candidates + exact
levenshtein verify == brute-force full-scan semantics."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import fuzzy
from searchengine_spark.operators import postings as P


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def term_stats(spark, corpus_small):
    tabs = P.build_index(corpus_small, use_html=True)
    ts = tabs.term_stats.select("term", "df").cache()
    ts.count()
    return ts


@pytest.mark.parametrize(
    "word",
    [
        "поиск",     # exact dictionary word (distance 0 included)
        "поис",      # deletion
        "поискс",    # insertion
        "паиск",     # substitution
        "xyzzy",     # nothing within distance 1
        "и",         # single char: matches every 1-char term + itself
    ],
)
def test_suggest_equals_bruteforce(spark, term_stats, word):
    dict_rows = [(r["term"], r["df"]) for r in term_stats.collect()]
    want = sorted(
        ((t, d) for t, d in dict_rows if _lev(t, word) <= 1),
        key=lambda x: (-x[1], x[0]),
    )[:10]
    got = [
        (r["term"], r["df"])
        for r in fuzzy.suggest_terms(term_stats, word, topn=10).collect()
    ]
    assert got == want


def test_deletion_keys_complete_for_distance_1(spark, term_stats):
    """Key-match completeness: every dictionary pair within distance 1
    of a probe word shares a delete-1 key with it (the SymSpell
    invariant the engine's candidate join relies on)."""
    terms = [r["term"] for r in term_stats.collect()]
    probes = terms[:40]
    for q in probes:
        qk = fuzzy._delete1(q)
        for t in terms:
            if _lev(t, q) <= 1:
                assert qk & fuzzy._delete1(t), (q, t)


def test_max_edit_2_rejected(term_stats):
    with pytest.raises(ValueError):
        fuzzy.suggest_terms(term_stats, "поиск", max_edit=2)


def test_prebuilt_key_index_equals_on_the_fly(spark, term_stats):
    idx = fuzzy.deletion_key_index(term_stats).cache()
    idx.count()
    for word in ("поис", "паиск"):
        a = fuzzy.suggest_terms(term_stats, word).collect()
        b = fuzzy.suggest_terms(term_stats, word, key_index=idx).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
    idx.unpersist()
