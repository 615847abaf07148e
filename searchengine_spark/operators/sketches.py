"""Deterministic cardinality sketch: KMV (k-minimum values).

The brief asks for sketch operators a 100 TB pipeline would use for
monitoring-scale cardinalities. HyperLogLog (F.approx_count_distinct)
is engine-private — its estimates can never be oracle-checked across
engines. KMV is the sketch that CAN: hash every key with the shared
md5-derived h32, keep the k smallest distinct hash values, and
estimate |distinct| = (k-1) * 2^32 / h_(k) — pure integer arithmetic
over deterministic hashes, so Spark and DuckDB produce the identical
estimate bit-for-bit (standard KMV estimator; see Bar-Yossef et al.,
"Counting distinct elements in a data stream").

Scale shape: one distinct-shuffle on (group, hash) — the same cost as
an exact count-distinct's first stage — then a per-group top-k window
over distinct hashes only. A production variant replaces the window
with a bounded per-partition heap (cf. similarity._local_topk); at
monitoring cardinalities the distinct-hash frame is already tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h32

KMV_K = 64


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """(group, n_hashes, kth_hash, est_distinct): KMV estimate of
    |distinct key| per group. Groups with fewer than k distinct keys
    report the EXACT count (est = n_hashes, the standard small-set
    fallback); kth_hash is null there. Null keys are excluded up front
    (a null hashes to null, and the engines disagree on NULL ordering
    inside the rank window — NULLS FIRST in Spark, LAST in DuckDB)."""
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            h32(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    ranked = hashes.withColumn("rn", F.row_number().over(w))
    per_group = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth_hash"),
    )
    est = F.when(
        F.col("kth_hash").isNotNull(),
        F.floor(F.lit((k - 1) * (1 << 32)) / F.col("kth_hash")).cast("long"),
    ).otherwise(F.col("n_hashes").cast("long"))
    return per_group.select(
        F.col("grp").alias(group_col),
        F.col("n_hashes").cast("long").alias("n_hashes"),
        "kth_hash",
        est.alias("est_distinct"),
    )
