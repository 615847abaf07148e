"""Prefix (wildcard) retrieval: bounded expansion + disjunctive WAND
== relational spec == independent Python reference."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import postings as P
from searchengine_spark.operators import prefix as PX
from searchengine_spark.operators import search as S
from searchengine_spark.operators.search import bm25_score_py


@pytest.fixture(scope="module")
def index(spark, corpus_small):
    tabs = P.build_index(corpus_small, use_html=True)
    for t in (tabs.postings, tabs.term_stats, tabs.doc_stats):
        t.cache().count()
    return tabs


@pytest.fixture(scope="module")
def constants(index):
    return S.corpus_constants(index.doc_stats)


@pytest.fixture(scope="module")
def segments(spark, index, constants, tmp_path_factory):
    from searchengine_spark.index.segments import (
        build_segments,
        write_segments,
    )

    n, avgdl = constants
    seg = build_segments(index, n, avgdl, n_shards=4)
    path = str(tmp_path_factory.mktemp("pfxseg") / "index_segments")
    write_segments(seg, path)
    df = spark.read.parquet(path).cache()
    df.count()
    return df


def test_expand_prefix_rank_and_cap(spark, index):
    dict_rows = [
        (r["term"], r["df"]) for r in index.term_stats.collect()
    ]
    want_all = sorted(
        ((t, d) for t, d in dict_rows if t.startswith("по")),
        key=lambda x: (-x[1], x[0]),
    )
    got = PX.expand_prefix(index.term_stats, "по", max_expansions=3)
    assert got == [t for t, _ in want_all[:3]]
    assert PX.expand_prefix(index.term_stats, "zzzznope") == []
    with pytest.raises(ValueError):
        PX.expand_prefix(index.term_stats, "")


@pytest.mark.parametrize("pfx", ["по", "s", "инд"])
def test_packed_equals_relational(spark, index, constants, segments, pfx):
    n, avgdl = constants
    rel = {
        r["doc_id"]: r["score"]
        for r in PX.prefix_search(
            spark, index, pfx, constants=constants
        ).collect()
    }
    got = {
        r["doc_id"]: r["score"]
        for r in PX.prefix_search_packed(
            spark, segments, index.term_stats, n, avgdl, pfx, k=10000
        ).collect()
    }
    assert set(got) == set(rel)
    for d in rel:
        assert np.isclose(got[d], rel[d], rtol=1e-12)


def test_relational_matches_python_reference(spark, index, constants):
    n_docs, avgdl = constants
    terms = PX.expand_prefix(index.term_stats, "по")
    assert terms
    rows = index.postings.filter(F.col("term").isin(terms)).collect()
    dfs = {
        r["term"]: r["df"]
        for r in index.term_stats.filter(
            F.col("term").isin(terms)
        ).collect()
    }
    doclen = {r["doc_id"]: r["doclen"] for r in index.doc_stats.collect()}
    want: dict[int, float] = {}
    for r in rows:
        want[r["doc_id"]] = want.get(r["doc_id"], 0.0) + bm25_score_py(
            r["tf"], dfs[r["term"]], doclen[r["doc_id"]], n_docs, avgdl
        )
    got = {
        r["doc_id"]: r["score"]
        for r in PX.prefix_search(
            spark, index, "по", constants=constants
        ).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert np.isclose(got[d], want[d], rtol=1e-12)


def test_expansion_cap_changes_results_deterministically(
    spark, index, constants, segments
):
    """With a cap of 1, only the highest-df expansion term scores —
    the deterministic (df DESC, term) rank makes the capped set
    reproducible."""
    n, avgdl = constants
    top_term = PX.expand_prefix(index.term_stats, "по", max_expansions=1)[0]
    got = {
        r["doc_id"]: r["score"]
        for r in PX.prefix_search_packed(
            spark, segments, index.term_stats, n, avgdl, "по",
            k=10000, max_expansions=1,
        ).collect()
    }
    single = {
        r["doc_id"]: r["score"]
        for r in PX.prefix_search_packed(
            spark, segments, index.term_stats, n, avgdl, top_term,
            k=10000, max_expansions=1,
        ).collect()
    }
    assert got == single
