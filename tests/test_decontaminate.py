"""Benchmark decontamination (operators/dedup.decontaminate):
shingle-overlap semantics + the broadcast-eval plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import decontaminate


def test_overlap_semantics(spark):
    train = spark.createDataFrame(
        [
            # shares the trigram "x y z" with eval (twice — counted once)
            (1, "a b x y z c d x y z"),
            # shares two distinct eval trigrams
            (2, "x y z w p q r"),
            # no overlap
            (3, "m n o p2 q2 r2"),
            # short doc == whole-text shingle, exact match in eval
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "x y z w"), (101, "tiny")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(train, ev).collect()}
    assert got == {1: 1, 2: 2, 4: 1}


def test_eval_side_broadcasts(spark):
    train = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    ev = spark.createDataFrame([(2, "a b c")], "doc_id long, text string")
    plan = decontaminate(train, ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
