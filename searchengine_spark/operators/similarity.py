"""Similarity search over embedding columns (array<float>).

Training-data-pipeline ANN: brute-force cosine top-k as the exactness
baseline, plus a random-hyperplane LSH bucketing as the scale path
(bucket first, exact-score within bucket — the classic two-stage ANN).

Scale notes (10^9+ vectors):
  * cosine scoring runs as Arrow-batched numpy kernels, NOT as
    zip_with/aggregate column expressions: Spark's higher-order
    functions have no whole-stage codegen (they evaluate interpreted,
    ~10-100× slower than vectorized numpy). The kernels fold
    SEQUENTIALLY over components (a j-loop of vectorized row ops,
    never np.sum's pairwise reassociation), so every double — and the
    DuckDB oracle — matches bit-for-bit;
  * brute force is queries × corpus: fine for a broadcast-able query
    set (Q ≤ thousands) since the corpus side never shuffles — each
    partition scores its vectors against all Q (queries ride in the
    task closure; the corpus×Q rows are never materialized) and emits
    only its local top-k, so the one shuffle that follows carries
    ≤ n_partitions·Q·k rows, not |corpus|·Q; a tiny window then ranks
    the merged candidates;
  * LSH path cuts the scored candidates to one bucket per query
    (expected corpus/2^planes of the data): the bucket id is a
    partition-prunable join key at scale;
  * hyperplanes are deterministic integer grids (hp_{i,j} derived from
    fixed multiplicative constants) so engine and oracle agree exactly.

Norms ignore zero vectors (cosine undefined) — filtered out up front.
"""

from __future__ import annotations

import pandas as pd
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
    """Native-expression cosine — kept as the executable specification
    the Arrow kernels are checked against (tests/test_plan_shape.py);
    NOT used in hot paths: higher-order functions run interpreted."""
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


def _np_seq_norm2(M):
    """Σ_j M[:,j]² per row — sequential left fold over j (bit-identical
    to the oracle's list_reduce; np.sum would reassociate)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for j in range(M.shape[1]):
        acc = acc + M[:, j] * M[:, j]
    return acc


def _np_seq_dot_vec(M, v):
    """Σ_j v[j]·M[:,j] per row — sequential left fold; v[j]·e[j]
    operand order matches _cos_sql(a=query, b=corpus)."""
    import numpy as np

    acc = np.zeros(M.shape[0], dtype=np.float64)
    for j in range(M.shape[1]):
        acc = acc + v[j] * M[:, j]
    return acc


def _np_seq_dot_rows(A, B):
    """Σ_j A[:,j]·B[:,j] per row — sequential left fold."""
    import numpy as np

    acc = np.zeros(A.shape[0], dtype=np.float64)
    for j in range(A.shape[1]):
        acc = acc + A[:, j] * B[:, j]
    return acc


def _pd_topk(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    return (
        pdf.sort_values(["cos", "vec_id"], ascending=[False, True])
        .groupby("q_vec_id", sort=False)
        .head(k)
    )


_SCORED_SCHEMA = "q_vec_id long, vec_id long, cos double"


def _score_pairs_topk(cand: DataFrame, k: int | None) -> DataFrame:
    """(q_vec_id, vec_id, q_vec, vec) candidate pairs → per-partition
    (q_vec_id, vec_id, cos), reduced to the local top-k per q when `k`
    is given. Scoring + partial top-k fused in one Arrow kernel
    (same-stage with the producing join — no exchange before it); with
    k set, the downstream shuffle carries ≤ n_partitions·Q·k rows."""

    def run(batches):
        import numpy as np

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["q_vec"].tolist(), dtype=np.float64)
            B = np.array(pdf["vec"].tolist(), dtype=np.float64)
            cos = _np_seq_dot_rows(A, B) / (
                np.sqrt(_np_seq_norm2(A)) * np.sqrt(_np_seq_norm2(B))
            )
            part = pd.DataFrame(
                {
                    "q_vec_id": pdf["q_vec_id"].to_numpy(),
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cos": cos,
                }
            )
            if k is None:
                yield part
                continue
            part = _pd_topk(part, k)
            acc = part if acc is None else _pd_topk(pd.concat([acc, part]), k)
        if acc is not None:
            yield acc

    return cand.select("q_vec_id", "vec_id", "q_vec", "vec").mapInPandas(
        run, schema=_SCORED_SCHEMA
    )


def ann_brute_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector:
    (q_vec_id, vec_id, cos_sim, rank). Self-matches excluded; ties
    broken by vec_id asc (deterministic).

    One Arrow kernel per corpus partition scores its vectors against
    all Q closure-held queries and emits only its local top-k — the
    corpus never shuffles and the |corpus|·Q scored rows never
    materialize; a tiny window ranks the ≤ n_partitions·Q·k merged
    candidates."""
    import math

    import numpy as np

    qrows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
        .collect()
    )
    qlist = []
    for r in qrows:
        qv = np.array([float(x) for x in r["qv"]], dtype=np.float64)
        nq = 0.0
        for j in range(len(qv)):  # sequential fold, matches the oracle
            nq = nq + float(qv[j]) * float(qv[j])
        qlist.append((int(r["qid"]), qv, math.sqrt(nq)))
    if not qlist:  # no query id exists in the corpus → empty result
        from .search import empty_df

        return empty_df(
            emb.sparkSession,
            "q_vec_id long, vec_id long, cos_e4 long, rank long",
        )

    def run(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["vec"].tolist(), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy()
            sn = np.sqrt(_np_seq_norm2(M))
            frames = []
            for qid, qv, sq in qlist:
                cos = _np_seq_dot_vec(M, qv) / (sq * sn)
                mask = ids != qid
                frames.append(
                    pd.DataFrame(
                        {
                            "q_vec_id": qid,
                            "vec_id": ids[mask],
                            "cos": cos[mask],
                        }
                    )
                )
            part = _pd_topk(pd.concat(frames), k)
            acc = part if acc is None else _pd_topk(pd.concat([acc, part]), k)
        if acc is not None:
            yield acc

    local = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec")
    ).mapInPandas(run, schema=_SCORED_SCHEMA)
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
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
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        _score_pairs_topk(cand, k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "vec_id", _e4(F.col("cos")).alias("cos_e4"), "rank")
    )


# --- IVF (inverted-file) ANN -------------------------------------------------
# The classic two-stage scale path: a coarse k-means quantizer
# partitions the corpus into K cells; a query probes only its nprobe
# nearest cells and scores exactly within them. Everything is engineered
# for cross-engine determinism so the DuckDB oracle reproduces training
# bit-for-bit:
#   * vectors are quantized to e4 fixed-point BIGINTs first, so cluster
#     sums are EXACT integer arithmetic (order-insensitive — the one
#     float hazard in distributed k-means);
#   * centroids are the exact rationals sum/count (one IEEE division);
#   * distances fold sequentially over components in index order;
#   * ties (equal distance) assign to the smallest centroid id;
#   * empty clusters keep their previous centroid;
#   * init = the K smallest sampled vec_ids' quantized vectors, ITERS
#     fixed.
# Scale shape (implemented, not aspirational): Lloyd trains on the
# deterministic IVF_SAMPLE_MOD sample only, the K·dim centroids ship in
# the task closure, assignment is a MAP-ONLY Arrow/numpy kernel on the
# scan (no join, no shuffle) run ONCE over the full corpus; the
# per-query probe joins only nprobe cells' vectors.

IVF_K = 8
IVF_ITERS = 2
IVF_NPROBE = 2
# Lloyd trains on a deterministic ~1/MOD sample (vec_id % MOD == 0),
# plus the first MOD·K ids so a small corpus still trains on every
# vector (degrade semantics + init identical to full training). The
# predicate is pure integer arithmetic on nonnegative ids, so the
# DuckDB oracle replicates the sample exactly. Full-corpus training
# cost scales with the corpus; sampled training is the standard IVF
# recipe (train on a sample, assign everything once).
IVF_SAMPLE_MOD = 4


def _quantize_col(vec: Column) -> Column:
    """array<float> → array<bigint> e4 fixed-point (floor(x·10⁴+0.5))."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * 10000.0 + F.lit(0.5)).cast("long")
    )


def _assign_udf(centroids: list[list[float]]):
    """Cell assignment as an Arrow-batched numpy kernel: argmin of
    squared distance over the closure-captured centroids, smallest-id
    tie-break (np.argmin returns the first minimum). Map-only — no
    join, no shuffle; the centroid table rides in the task closure
    (the broadcast-small-side pattern).

    Bit-for-bit identical to the oracle's list_reduce: the fold runs
    SEQUENTIALLY over components (acc = acc + d·d per j, a left fold —
    never np.sum, whose pairwise summation reassociates), and every
    operand is the same IEEE double on both sides (quantized ints are
    exact in float64; centroids are the exact rationals sum/count).

    A native-expression formulation (zip_with+aggregate per centroid)
    is semantically identical but runs INTERPRETED (higher-order
    functions have no codegen) — measured ~9 s per Lloyd iteration at
    10k×64 vs milliseconds here."""
    C = [list(map(float, c)) for c in centroids]

    @F.pandas_udf("int")
    def assign(qv: pd.Series) -> pd.Series:
        import numpy as np

        if not len(qv):
            return pd.Series([], dtype="int32")
        M = np.array(qv.tolist(), dtype=np.float64)  # (n, dim)
        n = M.shape[0]
        dists = np.empty((n, len(C)), dtype=np.float64)
        for k, c in enumerate(C):
            acc = np.zeros(n, dtype=np.float64)
            for j in range(len(c)):
                d = M[:, j] - c[j]
                acc = acc + d * d  # sequential left fold over j
            dists[:, k] = acc
        return pd.Series(np.argmin(dists, axis=1).astype("int32"))

    return assign


def _sqdist_py(qv: list[int], c: list[float]) -> float:
    """Driver-side replica of _sqdist_expr (same fold order)."""
    acc = 0.0
    for j in range(len(qv)):
        d = float(qv[j]) - c[j]
        acc += d * d
    return acc


def ivf_train(
    emb: DataFrame,
    dim: int,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse quantizer: k centroids after `iters` Lloyd
    iterations over the e4-quantized vectors of the TRAINING SAMPLE
    (vec_id % IVF_SAMPLE_MOD == 0, plus the first MOD·k ids — see
    IVF_SAMPLE_MOD). Each iteration is one groupBy over (assignment,
    component) whose output is K·dim integer sums — tiny, collected to
    the driver, and turned into the next round's literal centroids
    (broadcast-by-literal). The full corpus is never scanned during
    training; ann_ivf_topk assigns it once with the final centroids."""
    q_all = emb.select(
        F.col(id_col).alias("vec_id"), _quantize_col(F.col(vec_col)).alias("qv")
    )
    q = q_all.filter(
        (F.col("vec_id") % IVF_SAMPLE_MOD == 0)
        | (F.col("vec_id") < IVF_SAMPLE_MOD * k)
    )
    init = q.orderBy("vec_id").limit(k).collect()
    if not init:
        # sparse id space (every id ≥ MOD·k and none ≡ 0 mod MOD) —
        # fall back to full training; never triggered on dense 0-based
        # ids, so the SQL oracle needn't replicate this branch
        q = q_all
        init = q.orderBy("vec_id").limit(k).collect()
    if not init:
        raise ValueError("cannot train an IVF quantizer on an empty corpus")
    # corpora smaller than k degrade to one cell per vector
    centroids = [[float(x) for x in r["qv"]] for r in init]
    k = len(centroids)
    q = q.persist()  # each Lloyd pass re-reads the sample; quantize once
    try:
        for _ in range(iters):
            assign = _assign_udf(centroids)
            parts = (
                q.select(assign(F.col("qv")).alias("c"),
                         F.posexplode("qv").alias("j", "v"))
                .groupBy("c", "j")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
                .collect()
            )
            sums: dict[int, list[int]] = {}
            cnts: dict[int, int] = {}
            for r in parts:
                sums.setdefault(r["c"], [0] * dim)[r["j"]] = r["s"]
                cnts[r["c"]] = r["cnt"]
            centroids = [
                [s / cnts[kk] for s in sums[kk]] if kk in sums else centroids[kk]
                for kk in range(k)
            ]
    finally:
        q.unpersist()
    return centroids


def ann_ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    dim: int,
    k: int = 10,
    n_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: exact cosine rank within the query's nprobe nearest
    cells → (q_vec_id, vec_id, cos_e4, rank). Candidate set ≈
    nprobe/n_cells of the corpus; same partial-top-k merge as the other
    ANN paths (no corpus-sized shuffle anywhere)."""
    centroids = ivf_train(emb, dim, k=n_cells, id_col=id_col, vec_col=vec_col)
    withc = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _assign_udf(centroids)(_quantize_col(F.col(vec_col))).alias("cell"),
    )
    # nprobe nearest cells per query vector — driver-side on ≤|Q| rows
    qrows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("vec_id"), _quantize_col(F.col(vec_col)).alias("qv"))
        .collect()
    )
    probe_pairs = []
    for r in qrows:
        qv = [int(x) for x in r["qv"]]
        ranked = sorted(
            ((_sqdist_py(qv, c), kk) for kk, c in enumerate(centroids))
        )[:nprobe]
        probe_pairs.extend((int(r["vec_id"]), kk) for _, kk in ranked)
    spark = emb.sparkSession
    probes = spark.createDataFrame(probe_pairs, "q_vec_id long, cell int")

    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("q_vec"))
    )
    cand = (
        withc.join(F.broadcast(probes), "cell")
        .join(F.broadcast(q), "q_vec_id")
        .filter(F.col("vec_id") != F.col("q_vec_id"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        _score_pairs_topk(cand, k)
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
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            F.col("vec_a").alias("q_vec_id"),
            F.col("vec_b").alias("vec_id"),
            F.col("va").alias("q_vec"),
            F.col("vb").alias("vec"),
        )
    )
    # same fused Arrow scorer as the ANN paths; no top-k here — every
    # pair over the threshold is a near-dup
    scored = _score_pairs_topk(pairs, k=None)
    return (
        scored.filter(F.col("cos") >= min_cos)
        .select(
            F.col("q_vec_id").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            _e4(F.col("cos")).alias("cos_e4"),
        )
        .distinct()
    )
