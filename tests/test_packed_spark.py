"""Spark-level M2/M3: build packed segments from the corpus, verify
segment integrity against relational postings, and packed-search ≡
relational-search ≡ oracle rank identity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.index.segments import (
    build_segments,
    merge_runs,
    unpack_segment,
    write_segments,
)
from searchengine_spark.index.wand import search_packed
from searchengine_spark.operators import postings as P
from searchengine_spark.operators import search as S


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
    n, avgdl = constants
    seg = build_segments(index, n, avgdl, n_shards=4)
    path = str(tmp_path_factory.mktemp("seg") / "index_segments")
    write_segments(seg, path)
    df = spark.read.parquet(path).cache()
    df.count()
    return df


def test_segments_cover_all_postings(spark, index, segments):
    total = segments.agg(F.sum("n_docs")).collect()[0][0]
    assert total == index.postings.count()
    # per-term totals match df
    per_term = {
        r["term"]: r["s"]
        for r in segments.groupBy("term").agg(F.sum("n_docs").alias("s")).collect()
    }
    for r in index.term_stats.collect():
        assert per_term[r["term"]] == r["df"]


def test_segment_unpack_matches_postings(spark, index, segments):
    rows = segments.filter(F.col("term") == "индекс").collect()
    want = {
        r["doc_id"]: r["tf"]
        for r in index.postings.filter(F.col("term") == "индекс").collect()
    }
    got = {}
    for row in rows:
        ids, tfs, dls = unpack_segment(row)
        assert np.all(np.diff(ids) > 0)  # sorted, unique within segment
        for d, t in zip(ids, tfs):
            got[int(d)] = int(t)
    assert got == want


PACKED_QUERIES = [
    ("индекс", True),
    ("поиска индексы", True),
    ("spark join", True),
    ("быстрый поиск слова", True),
    ("быстрый поиск", False),
    ("merge sort hash", True),
    ("данные", True),
    ("и в на", True),
    ("data", True),
    ("nosuchwordxyz", True),
    ("стекла", True),
]


@pytest.mark.parametrize("query,conj", PACKED_QUERIES)
def test_packed_equals_relational(spark, index, segments, constants, query, conj):
    n, avgdl = constants
    got = search_packed(
        spark, segments, index.term_stats, n, avgdl, query, k=20, conjunctive=conj
    ).collect()
    want = S.search(
        spark, index, query, k=20, conjunctive=conj, constants=constants
    ).collect()
    gd = [(r["doc_id"], r["score"]) for r in got]
    # relational path ties break on url; packed path on doc_id — compare
    # as (score-sorted) doc sets with scores
    wd = {r["doc_id"]: r["score"] for r in want}
    assert len(gd) == len(wd)
    assert {d for d, _ in gd} == set(wd)
    for d, s in gd:
        assert s == pytest.approx(wd[d], rel=1e-9)


def test_merge_runs_spark(spark, index, segments, constants):
    n, avgdl = constants
    merged = merge_runs(segments, n, avgdl, run_id=1)
    assert merged.agg(F.sum("n_docs")).collect()[0][0] == index.postings.count()
    assert merged.select("run_id").distinct().collect()[0][0] == 1
