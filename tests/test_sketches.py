"""KMV distinct-count sketch (operators/sketches.py): estimator
accuracy on known cardinalities and the small-set exact fallback.
Cross-engine value identity is covered by the q_kmv_distinct oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators.sketches import kmv_distinct


def test_kmv_estimates_known_cardinalities(spark):
    # group 'big': 5000 distinct keys; group 'small': 10 distinct keys
    df = spark.range(5000).select(
        F.lit("big").alias("grp"), F.col("id").alias("key")
    ).unionByName(
        spark.range(10).select(
            F.lit("small").alias("grp"), F.col("id").alias("key")
        )
    )
    rows = {r["grp"]: r for r in kmv_distinct(df, "key", "grp", k=64).collect()}
    small = rows["small"]
    assert small["kth_hash"] is None
    assert small["est_distinct"] == small["n_hashes"] == 10  # exact fallback
    big = rows["big"]
    assert big["kth_hash"] is not None
    # KMV with k=64 has ~1/sqrt(62) ≈ 13% relative error; allow 3 sigma
    assert abs(big["est_distinct"] - 5000) / 5000 < 0.4
    # estimate must be deterministic across invocations
    again = {
        r["grp"]: r["est_distinct"]
        for r in kmv_distinct(df, "key", "grp", k=64).collect()
    }
    assert again["big"] == big["est_distinct"]


def test_kmv_ignores_null_keys(spark):
    df = spark.range(100).select(
        F.lit("g").alias("grp"), F.col("id").alias("key")
    ).unionByName(
        spark.sql("SELECT 'g' AS grp, CAST(NULL AS LONG) AS key")
    )
    row = kmv_distinct(df, "key", "grp", k=64).collect()[0]
    # the null key contributes neither a hash nor a count
    assert row["n_hashes"] == 100
