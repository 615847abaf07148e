"""materialize_index (single-UDF-pass production build) must produce
exactly the same three tables as the lazy build_index DAG."""

from searchengine_spark.operators.postings import (
    build_index,
    materialize_index,
)
from searchengine_spark.sources.corpus import corpus_df

N = 250


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(cols).collect())


def test_materialize_matches_lazy_build(spark, tmp_path):
    docs = corpus_df(spark, N)
    lazy = build_index(docs, use_html=True)
    mat = materialize_index(spark, docs, str(tmp_path / "idx"), use_html=True)

    pc = ["term", "doc_id", "tf"]
    assert _rows(mat.postings, pc) == _rows(lazy.postings, pc)
    tc = ["term", "df", "cf"]
    assert _rows(mat.term_stats, tc) == _rows(lazy.term_stats, tc)
    dc = ["doc_id", "url", "site", "doclen"]
    assert _rows(mat.doc_stats, dc) == _rows(lazy.doc_stats, dc)


def test_relational_search_over_materialized_index(spark, tmp_path):
    """Regression: the materialized postings table carries doclen (and
    the ttf/tlen field layer) IN-ROW for the segment pack — every
    relational consumer that joins doc_stats must project postings to
    (term, doc_id, tf) first or `doclen` turns ambiguous. Search,
    match_count and the prefix bm25 scorer must serve the same results
    from a materialized index as from the lazy build."""
    from searchengine_spark.operators.prefix import prefix_search
    from searchengine_spark.operators.search import match_count, search

    docs = corpus_df(spark, N)
    lazy = build_index(docs, use_html=True)
    mat = materialize_index(spark, docs, str(tmp_path / "idx2"),
                            use_html=True)
    assert "doclen" in mat.postings.columns  # the in-row pack layout

    q = "быстрый поиск"
    want = [(r["doc_id"], r["score"])
            for r in search(spark, lazy, q, k=10).collect()]
    got = [(r["doc_id"], r["score"])
           for r in search(spark, mat, q, k=10).collect()]
    assert got == want and got
    assert match_count(spark, mat, q) == match_count(spark, lazy, q)

    pw = _rows(prefix_search(spark, lazy, "поис"), ["doc_id", "score"])
    pg = _rows(prefix_search(spark, mat, "поис"), ["doc_id", "score"])
    assert pg == pw
