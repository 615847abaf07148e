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


def test_multi_suggest_equals_per_word(spark, term_stats):
    """suggest_terms_multi(words) per word == suggest_terms(word):
    identical candidates, ranking, and top-n cut."""
    words = ["поис", "паиск", "xyzzy", "поиск", "и"]
    idx = fuzzy.deletion_key_index(term_stats).cache()
    idx.count()
    multi = fuzzy.suggest_terms_multi(
        term_stats, words, topn=10, key_index=idx
    ).collect()
    by_word: dict[str, list] = {}
    for r in multi:
        by_word.setdefault(r["word"], []).append((r["term"], r["df"]))
    for w in words:
        want = [
            (r["term"], r["df"])
            for r in fuzzy.suggest_terms(term_stats, w, topn=10).collect()
        ]
        assert by_word.get(w, []) == want, w
    idx.unpersist()


def test_multi_suggest_job_count_flat_in_words(spark, term_stats):
    """The serving claim behind VERDICT r4 #3: a correction batch is
    ONE keyed lookup — the Spark job count does not grow with the
    number of unknown words (vs one job per word in the old loop)."""
    idx = fuzzy.deletion_key_index(term_stats).cache()
    idx.count()
    sc = spark.sparkContext

    def njobs(group: str, words: list[str]) -> int:
        sc.setJobGroup(group, group)
        try:
            fuzzy.suggest_terms_multi(
                term_stats, words, key_index=idx
            ).collect()
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    one = njobs("fuzzy-batch-1", ["поис"])
    five = njobs("fuzzy-batch-5", ["поис", "паиск", "xyzzy", "поиск", "и"])
    assert five == one, (one, five)
    idx.unpersist()


def test_multi_suggest_empty_and_max_edit(spark, term_stats):
    assert fuzzy.suggest_terms_multi(term_stats, []).count() == 0
    with pytest.raises(ValueError):
        fuzzy.suggest_terms_multi(term_stats, ["поиск"], max_edit=2)
