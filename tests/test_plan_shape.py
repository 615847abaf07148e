"""Physical-plan regression tests: the optimizations that matter at
100 TB must be visible in the plan, not assumed (SURVEY.md §4).

Locked properties:
  * query-term predicate is PUSHED into the postings parquet scan
    (row-group pruning via term min/max — postings are written
    term-sorted);
  * the query side joins are broadcast (no shuffle of postings for the
    join itself);
  * the final top-k is TakeOrderedAndProject (distributed heap), not a
    global sort;
  * packed-segment scan for WAND is pruned by the term predicate.
"""

import contextlib
import io

import pytest

from searchengine_spark.index.segments import build_segments, write_segments
from searchengine_spark.index.wand import search_packed
from searchengine_spark.operators.postings import (
    build_index,
    read_index,
    write_index,
)
from searchengine_spark.operators.search import corpus_constants, search
from searchengine_spark.sources.corpus import corpus_df

N = 300


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("plan"))
    idx0 = build_index(corpus_df(spark, N), use_html=True)
    write_index(idx0, f"{tmp}/idx")
    idx = read_index(spark, f"{tmp}/idx")
    n, avgdl = corpus_constants(idx.doc_stats)
    segs = build_segments(idx, n, avgdl)
    write_segments(segs, f"{tmp}/segments")
    segments = spark.read.parquet(f"{tmp}/segments")
    return idx, segments, n, avgdl


def test_search_plan_pushdown_and_topk(spark, built):
    idx, _, n, avgdl = built
    out = search(spark, idx, "быстрый поиск", k=20, constants=(n, avgdl))
    plan = _plan(out)
    assert "In(term, [быстрый,поиск])" in plan, "term predicate not pushed to scan"
    assert "TakeOrderedAndProject" in plan, "top-k not a distributed heap"
    assert "BroadcastHashJoin" in plan, "query-side join not broadcast"
    # postings never become a broadcast build side by accident
    assert "SortMergeJoin" not in plan


def test_wand_plan_term_pruned(spark, built):
    idx, segments, n, avgdl = built
    out = search_packed(
        spark, segments, idx.term_stats, n, avgdl, "быстрый поиск", k=20
    )
    plan = _plan(out)
    assert "In(term," in plan, "segment scan not pruned by query terms"
    assert "TakeOrderedAndProject" in plan
