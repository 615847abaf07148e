"""Dataset-assembly operators (operators/sampling.py): semantics vs
sequential specs and the plan shapes that make them scale (map-only
split, bounded-heap sample, distributed prefix-sum packing). Cross-
engine value identity is covered by the q_train_split /
q_stratified_sample / q_pack_sequences oracle entries."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from searchengine_spark.functions.hashing import h32
from searchengine_spark.operators import sampling

DOCS = "/root/testdata/sf0.001/documents.parquet"
W = [("train", 0.90), ("val", 0.05), ("test", 0.05)]


def test_hash_split_is_map_only_and_stable(spark):
    docs = spark.read.parquet(DOCS).select("doc_id")
    out = sampling.hash_split(docs, "doc_id", W)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    full = {r["doc_id"]: r["split"] for r in out.collect()}
    assert set(full.values()) == {"train", "val", "test"}
    # growth stability: a doc's split never changes when the corpus
    # shrinks/grows (pure function of the id)
    half = sampling.hash_split(
        docs.filter(F.col("doc_id") % 2 == 0), "doc_id", W
    )
    for r in half.collect():
        assert full[r["doc_id"]] == r["split"]
    # weights roughly respected (h32 is uniform; 500 docs, 3σ slack)
    n = len(full)
    train = sum(1 for s in full.values() if s == "train")
    assert abs(train / n - 0.9) < 0.05


def test_stratified_sample_matches_window_spec(spark):
    docs = spark.read.parquet(DOCS).select("source", "doc_id")
    got = sampling.stratified_sample(docs, "source", "doc_id", 3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "per-group window back in the sample plan"
    assert "MapInPandas" in plan
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    want = (
        docs.withColumn("h", h32(F.col("doc_id").cast("string")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", "h")
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # exactly min(3, |group|) rows per group
    sizes = {r["source"]: r["c"] for r in
             got.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    avail = {r["source"]: r["c"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    for s, c in sizes.items():
        assert c == min(3, avail[s])


def test_pack_sequences_matches_global_window_spec(spark):
    docs = spark.read.parquet(DOCS)
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda t: t != ""
    )
    sized = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    got = sampling.pack_sequences(sized, "doc_id", "n_tokens", budget=512,
                                  n_buckets=7)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "global running-sum window in the pack plan"
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = (
        sized.withColumn("cs", F.sum("n_tokens").over(w))
        .select(
            "doc_id", "n_tokens",
            (F.col("cs") - F.col("n_tokens")).alias("global_start"),
            ((F.col("cs") - F.col("n_tokens")) / 512).cast("long")
            .alias("chunk_id"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_pack_sequences_empty_and_chunk_semantics(spark):
    empty = spark.createDataFrame([], "doc_id long, n_tokens long")
    assert sampling.pack_sequences(empty, "doc_id", "n_tokens", 128).count() == 0
    rows = [(i, 100) for i in range(10)]  # 1000 tokens, budget 256
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = {
        r["doc_id"]: (r["global_start"], r["chunk_id"])
        for r in sampling.pack_sequences(
            df, "doc_id", "n_tokens", 256, n_buckets=3
        ).collect()
    }
    assert out[0] == (0, 0)
    assert out[2] == (200, 0)      # starts inside chunk 0 (200 < 256)
    assert out[3] == (300, 1)      # first token at 300 → chunk 1
    assert out[9] == (900, 3)


def test_pack_sequences_hash_sized_and_negative_ids(spark):
    """Bucket assignment must be exact at xxhash64 id magnitudes
    (integer division, no float boundary wobble) and for negative ids."""
    rows = [
        (-(2**62) - 3, 10), (-(2**40), 20), (-1, 30), (0, 40),
        (2**40 + 7, 50), (2**62 + 11, 60),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = sorted(
        (r["doc_id"], r["global_start"], r["chunk_id"])
        for r in sampling.pack_sequences(
            df, "doc_id", "n_tokens", budget=64, n_buckets=4
        ).collect()
    )
    # sequential spec: ascending doc_id, running offsets
    offs, want, acc = {}, [], 0
    for sid, nt in sorted(rows):
        want.append((sid, acc, acc // 64))
        acc += nt
    assert got == want


def test_mixture_sample_copies_and_stability(spark):
    from searchengine_spark.operators.sampling import (
        mixture_params,
        mixture_sample,
    )

    w = {"a": 2.0, "b": 0.0, "c": 2.5}
    df = spark.createDataFrame(
        [(i, g) for i in range(1, 41) for g in ("a", "b", "c")],
        "doc_id long, grp string",
    )
    out = mixture_sample(df, w, "grp").collect()
    by = {}
    for r in out:
        by.setdefault((r["grp"], r["doc_id"]), []).append(r["copy"])
    # b (weight 0) and unknown groups vanish entirely
    assert not any(g == "b" for g, _ in by)
    # a: exactly 2 copies each, indices 0..1
    for (g, d), copies in by.items():
        if g == "a":
            assert sorted(copies) == [0, 1]
        else:
            assert sorted(copies) in ([0, 1], [0, 1, 2])
    # c: fractional part ≈ half the docs get a 3rd copy (hash-driven,
    # deterministic) — and the bound is the shared integer literal
    n3 = sum(1 for (g, _), cs in by.items() if g == "c" and len(cs) == 3)
    assert 0 < n3 < 40
    whole, fb = mixture_params(2.5)
    assert (whole, fb) == (2, 1 << 31)
    # growth stability: adding docs never changes existing copy counts
    df2 = df.union(
        spark.createDataFrame([(100 + i, "c") for i in range(10)],
                              "doc_id long, grp string")
    )
    out2 = mixture_sample(df2, w, "grp").collect()
    by2 = {}
    for r in out2:
        by2.setdefault((r["grp"], r["doc_id"]), []).append(r["copy"])
    assert all(sorted(by2[k]) == sorted(v) for k, v in by.items())
    # dropped groups are absent even when present in input (explicit
    # mixture contract)
    assert mixture_sample(df, {"a": 1.0}, "grp").filter(
        "grp != 'a'"
    ).count() == 0
