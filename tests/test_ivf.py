"""IVF ANN (operators/similarity.py): deterministic training, map-only
cell assignment, and exact-cosine consistency with the brute-force
path. The cross-engine value identity is covered by the
`q_ann_ivf` DuckDB-oracle contract entry; these tests lock the
engine-side properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators import similarity

EMB = "/root/testdata/sf0.001/embeddings.parquet"
DIM = 64
QIDS = [0, 1, 2, 3, 4]


def test_ivf_train_deterministic(spark):
    emb = spark.read.parquet(EMB)
    c1 = similarity.ivf_train(emb, DIM)
    c2 = similarity.ivf_train(emb, DIM)
    assert c1 == c2  # exact float equality — integer sums + one division
    assert len(c1) == similarity.IVF_K
    assert all(len(c) == DIM for c in c1)


def test_ivf_assignment_is_map_only(spark):
    """The scale path: assigning a vector to a cell must be a map-only
    stage (Arrow-batched kernel, centroids in the task closure) — no
    join, no shuffle."""
    emb = spark.read.parquet(EMB)
    centroids = similarity.ivf_train(emb, DIM)
    cells = emb.select(
        "vec_id",
        similarity._assign_udf(centroids)(
            similarity._quantize_col(F.col("embedding"))
        ).alias("cell"),
    )
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
    # every vector lands in exactly one valid cell
    rows = cells.groupBy("cell").count().collect()
    assert all(0 <= r["cell"] < similarity.IVF_K for r in rows)
    assert sum(r["count"] for r in rows) == emb.count()


def test_ivf_topk_consistent_with_brute(spark):
    """IVF results carry the TRUE cosine (exact within probed cells):
    every returned (q, vec) pair must have the same cos_e4 the
    brute-force scorer computes, ranks contiguous from 1, ≤ k rows."""
    emb = spark.read.parquet(EMB)
    ivf = similarity.ann_ivf_topk(emb, QIDS, dim=DIM, k=10).collect()
    brute = similarity.ann_brute_topk(emb, QIDS, k=10**6)
    # brute with huge k returns all pairs ranked; build lookup
    bmap = {
        (r["q_vec_id"], r["vec_id"]): r["cos_e4"]
        for r in brute.collect()
    }
    per_q: dict[int, list[int]] = {}
    for r in ivf:
        assert bmap[(r["q_vec_id"], r["vec_id"])] == r["cos_e4"]
        per_q.setdefault(r["q_vec_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q
        assert len(ranks) <= 10


def test_ann_edge_cases(spark):
    """Guards: unknown query ids → empty frame (not a crash); corpora
    smaller than IVF_K degrade to one cell per vector."""
    emb = spark.read.parquet(EMB)
    assert similarity.ann_brute_topk(emb, [10**12], k=5).count() == 0
    small = emb.limit(5)
    cents = similarity.ivf_train(small, DIM)
    assert len(cents) == 5
    out = similarity.ann_ivf_topk(small, [0], dim=DIM, k=3)
    assert 0 < out.count() <= 3
