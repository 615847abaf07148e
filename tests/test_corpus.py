"""Corpus generator invariants (M0) + the per-row byte-identity
invariant engine-vs-oracle (BASELINE.json input_hint)."""

from pyspark.sql import functions as F

from searchengine_spark.functions import textproc
from searchengine_spark.functions.udfs import extract_text_udf
from searchengine_spark.sources.corpus import corpus_rows, gen_rows


def test_extraction_invariant_pure_python():
    """extract_text(html) == text for every generated row."""
    for r in corpus_rows(400):
        assert textproc.extract_text(r["html"]) == r["text"], r["url"]


def test_determinism_any_order_any_subset():
    a = gen_rows([5, 100, 37, 38])
    b = {r["url"]: r for r in corpus_rows(200)}
    for r in a:
        assert b[r["url"]] == r


def test_exact_duplicates_are_full_row():
    rows = corpus_rows(80)
    assert rows[38] == rows[37]  # id 38 % 37 == 1 → verbatim dup of 37
    assert rows[38]["url"] == rows[37]["url"]


def test_near_duplicates():
    rows = corpus_rows(60)
    # id 48 % 23 == 2 → near-dup of 46
    assert rows[48]["text"].startswith(rows[46]["text"])
    assert rows[48]["url"] != rows[46]["url"]


def test_skew_term_df():
    rows = corpus_rows(500)
    urls = {}
    for r in rows:
        urls.setdefault(r["url"], r)
    n_with = sum(1 for r in urls.values() if "data" in r["text"].split(" "))
    assert n_with / len(urls) > 0.95  # the engineered F4/skew target


def test_extraction_byte_identity_spark_vs_oracle(spark, corpus_small):
    """The per-row invariant: Spark pandas-UDF path produces the exact
    bytes the pure-Python oracle produces (here: == the ground truth
    column, which the oracle also reproduces)."""
    bad = (
        corpus_small.withColumn("ext", extract_text_udf(F.col("html")))
        .filter(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_corpus_df_matches_driver_rows(spark, corpus_small):
    got = {r["url"]: r for r in corpus_small.collect()}
    want = {r["url"]: r for r in corpus_rows(300)}
    assert set(got) == set(want)
    for url, w in want.items():
        g = got[url]
        assert g["text"] == w["text"]
        assert bytes(g["html"]) == w["html"]
        assert g["lang"] == w["lang"]
