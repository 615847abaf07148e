"""Similarity search over embedding columns (array<float>).

Training-data-pipeline ANN: brute-force cosine top-k as the exactness
baseline, plus a random-hyperplane LSH bucketing as the scale path
(bucket first, exact-score within bucket — the classic two-stage ANN).

Scale notes (10^9+ vectors):
  * cosine is a native `aggregate(zip_with(...))` fold — JVM-side,
    whole-stage codegen, no Python;
  * brute force is queries × corpus: fine for a broadcast-able query
    set (Q ≤ thousands) since the corpus side never shuffles — each
    partition scores its vectors against all Q and emits only its
    local top-k via a same-stage mapInPandas reducer (_local_topk —
    no exchange between the scoring projection and the reducer), so
    the one shuffle that follows carries ≤ n_partitions·Q·k rows, not
    |corpus|·Q; a tiny window then ranks the merged candidates;
  * LSH path cuts the scored candidates to one bucket per query
    (expected corpus/2^planes of the data): the bucket id is a
    partition-prunable join key at scale;
  * hyperplanes are deterministic integer grids (hp_{i,j} derived from
    fixed multiplicative constants) so engine and oracle agree exactly.

Norms ignore zero vectors (cosine undefined) — filtered out up front.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
HP_MOD = 2001
HP_SHIFT = 1000
HP_A = 73_856_093
HP_B = 19_349_663


def _e4(col: Column) -> Column:
    """Exact ×10⁴ fixed-point (floor(x·10⁴+0.5)) — see textstats.e4."""
    return F.floor(col * 10000.0 + F.lit(0.5)).cast("long")


def dot_col(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as double — sequential fold, same order as the
    oracle's list_reduce."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def hyperplane_col(i: int, dim: int) -> Column:
    """Deterministic pseudo-random integer hyperplane i as
    array<bigint> of length dim: hp_j = ((i·A + j·B) % MOD) - SHIFT."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.lit(i * HP_A) + j * HP_B) % HP_MOD - HP_SHIFT,
    )


def lsh_bucket_col(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane LSH bucket id: bit i = (vec · hp_i) > 0."""
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        bit = F.when(dot_col(vec, hyperplane_col(i, dim)) > 0, 1).otherwise(0)
        bucket = bucket + (bit * F.lit(1 << i)).cast("long")
    return bucket


def _local_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-partition partial top-k per q_vec_id — the ANN analog of the
    map-side combine in TakeOrderedAndProject. Runs as mapInPandas in
    the SAME stage as the scoring projection (no exchange before it),
    so the downstream shuffle/window sees at most n_partitions·Q·k rows
    instead of |corpus|·Q. The global top-k under the total order
    (cos desc, vec_id asc) is a subset of the union of per-partition
    top-ks under that order, so the final window result is identical to
    ranking the full scored frame.

    Input must have columns (q_vec_id, vec_id, cos); each Arrow batch
    is truncated first so a partition never materializes more than
    batch + Q·k rows in pandas."""
    schema = scored.schema

    def run(batches):
        import pandas as pd

        def topk(pdf: pd.DataFrame) -> pd.DataFrame:
            return (
                pdf.sort_values(["cos", "vec_id"], ascending=[False, True])
                .groupby("q_vec_id", sort=False)
                .head(k)
            )

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            part = topk(pdf)
            acc = part if acc is None else topk(pd.concat([acc, part]))
        if acc is not None:
            yield acc

    return scored.mapInPandas(run, schema=schema)


def ann_brute_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector:
    (q_vec_id, vec_id, cos_sim, rank). Self-matches excluded; ties
    broken by vec_id asc (deterministic). Scoring is native column
    math; the only Python crossing is the bounded per-partition top-k
    reducer (_local_topk)."""
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("q_vec"))
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("q_vec_id"))
        .select(
            "q_vec_id",
            F.col(id_col).alias("vec_id"),
            cosine_col(F.col("q_vec"), F.col(vec_col)).alias("cos"),
        )
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        _local_topk(scored, k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "vec_id", _e4(F.col("cos")).alias("cos_e4"), "rank")
    )


def lsh_buckets(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket) — the LSH partition assignment."""
    return emb.select(
        F.col(id_col).alias("vec_id"),
        lsh_bucket_col(F.col(vec_col), dim).alias("bucket"),
    )


def ann_lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: exact cosine rank within the query's bucket.
    Recall < 1 by construction (approximate); the candidate set is the
    bucket, so compute is corpus/2^planes per query."""
    withb = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), dim).alias("bucket"),
    )
    q = (
        withb.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("q_vec_id"),
            F.col("vec").alias("q_vec"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    cand = withb.join(
        F.broadcast(q), withb.bucket == q.q_bucket
    ).filter(F.col("vec_id") != F.col("q_vec_id"))
    scored = cand.select(
        "q_vec_id",
        "vec_id",
        cosine_col(F.col("q_vec"), F.col("vec")).alias("cos"),
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        _local_topk(scored, k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "vec_id", _e4(F.col("cos")).alias("cos_e4"), "rank")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    dim: int,
    min_cos: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed: only pairs
    sharing a bucket are scored (the scale path; exactness within the
    recall of `n_planes` hyperplanes — fewer planes than the ANN path
    because near-dup wants recall over bucket selectivity):
    (vec_a, vec_b, cos_e4 ≥ min_cos·10⁴)."""
    withb = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    a = withb.select(
        F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), "bucket"
    )
    b = withb.select(
        F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine_col(F.col("va"), F.col("vb")).alias("cos"),
        )
        .filter(F.col("cos") >= min_cos)
        .select("vec_a", "vec_b", _e4(F.col("cos")).alias("cos_e4"))
        .distinct()
    )
