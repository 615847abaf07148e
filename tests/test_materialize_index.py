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
