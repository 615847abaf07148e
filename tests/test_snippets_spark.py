"""Spark-side snippet path: search_with_snippets returns the top-k
with highlighted snippets (reference: ApiService.java:141 →
SnippetMapper.java:13-27), oracle-checked against the pure-Python
kernel on the same rows."""

from searchengine_spark.functions import textproc
from searchengine_spark.operators.postings import build_index, prepare_docs
from searchengine_spark.operators.search import (
    lemmatize_query,
    search,
    search_with_snippets,
)
from searchengine_spark.sources.corpus import corpus_df

N = 200
QUERY = "быстрый поиск"


def test_snippets_match_kernel(spark):
    docs = corpus_df(spark, N)
    prepared = prepare_docs(docs, use_html=True).cache()
    idx = build_index(docs, use_html=True)
    out = search_with_snippets(spark, idx, prepared, QUERY, k=5).collect()
    assert 0 < len(out) <= 5

    # snippet equals the shared kernel applied to the winner's text
    text_by_id = {
        r["doc_id"]: r["text"]
        for r in prepared.select("doc_id", "text").collect()
    }
    lemmas = lemmatize_query(QUERY)
    for r in out:
        expected = textproc.make_snippet(text_by_id[r["doc_id"]], lemmas, 3)
        assert r["snippet"] == expected
        assert "<b>" in r["snippet"]

    # same ranking as plain search
    plain = search(spark, idx, QUERY, k=5).collect()
    assert [r["doc_id"] for r in out] == [r["doc_id"] for r in plain]
