"""Bucketed co-located join: postings ⋈ doc_stats on doc_id must plan
WITHOUT a shuffle on either side when both tables are bucketed by the
join key (SURVEY §4 — the one big-big join of the relational path)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.postings import (
    build_index,
    write_index_bucketed,
)
from searchengine_spark.sources.corpus import corpus_df


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        idx = build_index(corpus_df(spark, 200), use_html=True)
        write_index_bucketed(idx, db="bjtest", n_buckets=8)
        p = spark.table("bjtest.postings")
        d = spark.table("bjtest.doc_stats")
        joined = p.join(d, "doc_id").groupBy("term").agg(
            F.sum(F.col("tf") * F.col("doclen")).alias("x")
        )
        plan = _plan(joined)
        # the join itself must be exchange-free; the only allowed
        # exchange is the final groupBy("term") aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange" not in join_part, "bucketed join still shuffles"
        # sanity: same numbers as the plain join
        plain = (
            idx.postings.join(idx.doc_stats.select("doc_id", "doclen"), "doc_id")
            .groupBy("term")
            .agg(F.sum(F.col("tf") * F.col("doclen")).alias("x"))
        )
        got = {r["term"]: r["x"] for r in joined.collect()}
        want = {r["term"]: r["x"] for r in plain.collect()}
        assert got == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bjtest.postings")
        spark.sql("DROP TABLE IF EXISTS bjtest.doc_stats")
        spark.sql("DROP DATABASE IF EXISTS bjtest")
