"""M1 rank-identity gate: Spark relational search ≡ pure-Python oracle
on the reference query set (SURVEY.md §5.2.3; north_rule "matching the
reference's top-k docIDs and BM25 scores (rank-identical)")."""

import pytest

from searchengine_spark.operators import postings as P
from searchengine_spark.operators import search as S
from searchengine_spark.sources.corpus import corpus_rows

from .oracle import Oracle
from .queries import QUERIES

N_DOCS = 300


@pytest.fixture(scope="module")
def index(spark, corpus_small):
    tabs = P.build_index(corpus_small, use_html=True)
    tabs.postings = tabs.postings.cache()
    tabs.term_stats = tabs.term_stats.cache()
    tabs.doc_stats = tabs.doc_stats.cache()
    tabs.postings.count()
    return tabs


@pytest.fixture(scope="module")
def oracle():
    return Oracle(corpus_rows(N_DOCS), use_html=True)


@pytest.fixture(scope="module")
def constants(index):
    return S.corpus_constants(index.doc_stats)


@pytest.mark.parametrize(
    "qid,query,site,offset,limit,mode,conj", QUERIES, ids=[str(q[0]) for q in QUERIES]
)
def test_rank_identity(spark, index, oracle, constants, qid, query, site, offset, limit, mode, conj):
    from searchengine_spark.functions.docid import doc_id_for_url

    got = S.search(
        spark, index, query, k=limit, offset=offset, site=site,
        mode=mode, conjunctive=conj, constants=constants,
    ).collect()
    got = sorted(
        ((r["url"], r["score"]) for r in got),
        key=lambda t: (-t[1], doc_id_for_url(t[0])),
    )
    want = oracle.search(query, k=limit, offset=offset, site=site,
                         mode=mode, conjunctive=conj)
    assert [u for u, _ in got] == [u for u, _ in want], f"query {qid} rank mismatch"
    for (gu, gs), (wu, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-9), f"query {qid} score mismatch at {gu}"


def test_stats_identity(index, oracle):
    n = index.doc_stats.count()
    assert n == oracle.n_docs
    # doclen per url
    got = {r["url"]: r["doclen"] for r in index.doc_stats.collect()}
    assert got == oracle.doclen
    # df per term
    gdf = {r["term"]: r["df"] for r in index.term_stats.collect()}
    assert gdf == dict(oracle.df)


def test_match_count(spark, index, oracle, constants):
    q = "spark join"
    assert S.match_count(spark, index, q, constants=constants) == oracle.match_count(q)


def test_dedup_applied(index):
    # 300 ids contain verbatim duplicate rows → fewer unique urls
    assert index.doc_stats.count() < N_DOCS
