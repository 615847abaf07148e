"""Connected components over near-dup pair graphs
(operators/dedup.connected_components / minhash_dedup_groups):
transitive closure correctness the pairwise entries can't show."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.dedup import (
    connected_components,
    minhash_dedup_groups,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "u long, v long")
    got = connected_components(df, **kw).collect()
    return {r["id"]: r["comp_id"] for r in got}


def test_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3) + island pair (10,11) + triangle
    comp = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11),
                       (20, 21), (21, 22), (22, 20)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_min_label_not_order_dependent(spark):
    # min id sits at the END of the chain; must still win
    comp = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)])
    assert set(comp.values()) == {1}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="no fixpoint"):
        _cc(spark, [(i, i + 1) for i in range(1, 8)], max_iters=2)


def test_minhash_groups_transitive(spark):
    # doc 1 ~ doc 2 and doc 2 ~ doc 3 by construction (shared shingle
    # windows), so all three must land in ONE group even if the 1-3
    # pair itself is below the LSH/min_common bar
    mk = lambda words: " ".join(words)  # noqa: E731
    a = [f"a{i}" for i in range(30)]
    b = a[:27] + ["b0", "b1", "b2"]      # near-dup of a
    c = ["c0", "c1", "c2"] + b[3:]       # near-dup of b, not of a
    docs = spark.createDataFrame(
        [(1, mk(a)), (2, mk(b)), (3, mk(c)),
         (9, mk([f"z{i}" for i in range(40)]))],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in __import__(
            "searchengine_spark.operators.dedup", fromlist=["dedup"]
        ).minhash_lsh_pairs(docs).collect()
    }
    # precondition for the transitivity claim: both links present,
    # the long link absent (otherwise the fixture needs retuning)
    assert (1, 2) in pairs and (2, 3) in pairs
    out = minhash_dedup_groups(docs).collect()
    got = {r["doc_id"]: (r["comp_id"], r["n_members"]) for r in out}
    assert 9 not in got
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}
