"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship end-to-end search on sf0.001: build the
relational inverted index over the ``documents`` corpus (native
tokenize → postings → term/doc stats) and run a conjunctive BM25 top-20
query, the reference's GET /api/search path re-expressed Spark-first
(reference: services/ApiService.java:82-146).

``queries()`` / ``oracle_sql()`` — operator registry, see
searchengine_spark/contract.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from searchengine_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.postings import (
        build_index_prepared,
        prepare_docs_native,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    prepared = prepare_docs_native(docs, doc_id_col="doc_id", text_col="text",
                                   site_col="source")
    index = build_index_prepared(prepared)

    # conjunctive BM25 top-20 for the reference query, scored natively
    from searchengine_spark.operators.search import bm25_term_score

    qt = contract.QT
    stats = index.doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
    )
    w = bm25_term_score(n_docs=F.col("n"), avgdl=F.col("avgdl"))
    return (
        index.postings.filter(F.col("term").isin(qt))
        .join(F.broadcast(index.term_stats.filter(F.col("term").isin(qt))), "term")
        .join(index.doc_stats.select("doc_id", "doclen"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(w).alias("score"), F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == len(qt))
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column names."""
    return contract.oracle_sql()
