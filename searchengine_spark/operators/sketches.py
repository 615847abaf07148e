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
an exact count-distinct's first stage — then a BOUNDED per-partition
partial: every post-distinct partition emits at most (groups × k)
hashes plus one count per group (an Arrow mapInPandas pass holding a
k-slot min-heap per group, never the group's full hash set), and the
final per-group merge sees ≤ n_partitions × k rows. No window, no
per-group serialization point — a 10⁹-distinct group costs the same
reducer memory as a 10³-distinct one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    (a null hashes to null and must contribute neither a hash nor a
    count).

    Correctness of the partial min-k: after .distinct() every
    (group, hash) pair exists exactly once globally, so (a) summing
    per-partition counts is the exact distinct count, and (b) each of
    the k globally-smallest hashes is among its own partition's k
    smallest, hence present in the merged candidate set."""
    hashes = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            h32(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    grp_type = df.schema[group_col].dataType.simpleString()

    def _partial(batches):
        import numpy as np
        import pandas as pd

        counts: dict = {}
        mins: dict = {}
        for pdf in batches:
            # dropna=False: a null GROUP is still a group (only null
            # KEYS are excluded, and that happened before the shuffle)
            for g, sub in pdf.groupby("grp", sort=False, dropna=False):
                hv = sub["h"].to_numpy()
                counts[g] = counts.get(g, 0) + len(hv)
                cur = mins.get(g)
                allh = hv if cur is None else np.concatenate([cur, hv])
                if len(allh) > k:
                    allh = np.partition(allh, k - 1)[: k]
                mins[g] = allh
        if counts:
            keys = list(counts)
            yield pd.DataFrame(
                {
                    "grp": keys,
                    "cnt": [counts[g] for g in keys],
                    "mins": [np.sort(mins[g]).tolist() for g in keys],
                }
            )

    partial = hashes.mapInPandas(
        _partial, schema=f"grp {grp_type}, cnt long, mins array<long>"
    )
    merged = partial.groupBy("grp").agg(
        F.sum("cnt").alias("n_hashes"),
        F.slice(F.array_sort(F.flatten(F.collect_list("mins"))), 1, k)
        .alias("mink"),
    )
    # F.get is 0-based and null-safe out of bounds (element_at throws
    # under ANSI mode when the group has fewer than k hashes)
    kth = F.when(F.col("n_hashes") >= k, F.get(F.col("mink"), k - 1))
    est = F.when(
        kth.isNotNull(),
        F.floor(F.lit((k - 1) * (1 << 32)) / kth).cast("long"),
    ).otherwise(F.col("n_hashes").cast("long"))
    return merged.select(
        F.col("grp").alias(group_col),
        F.col("n_hashes").cast("long").alias("n_hashes"),
        kth.alias("kth_hash"),
        est.alias("est_distinct"),
    )
