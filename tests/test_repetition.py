"""Gopher-style repetition stats (operators/textstats.repetition_stats):
hand-computed edge cases — the contract sweep covers the corpus-scale
oracle, this pins single-token / all-same / threshold-boundary docs the
testdata never contains."""

from __future__ import annotations

from searchengine_spark.operators.textstats import (
    REP_MIN_TOKENS,
    repetition_stats,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}


def test_repetition_hand_computed(spark):
    out = _run(spark, [
        # 4 tokens, bigrams: "a b","b a","a b" → nb=3 db=2 dup=1/3;
        # top token a: 2/4; top bigram "a b": 2/3
        (1, "a b a b"),
        # single token: no bigrams → dup=0, top_bigram=0, top_token=1
        (2, "solo"),
        # all-same: bigrams all equal → dup=(n-2)/(n-1)
        (3, "x x x x x"),
        # empty-token doc is dropped (same contract as quality_score)
        (4, "   "),
    ])
    assert set(out) == {1, 2, 3}
    d1 = out[1]
    assert d1["n_tokens"] == 4
    assert d1["dup_bigram_e4"] == 3333   # floor(1/3*1e4+0.5)
    assert d1["top_token_e4"] == 5000
    assert d1["top_bigram_e4"] == 6667   # floor(2/3*1e4+0.5)
    d2 = out[2]
    assert d2["n_tokens"] == 1
    assert (d2["dup_bigram_e4"], d2["top_bigram_e4"]) == (0, 0)
    assert d2["top_token_e4"] == 10000
    d3 = out[3]
    assert d3["dup_bigram_e4"] == 7500   # (4-1)/4
    assert d3["top_token_e4"] == 10000
    # all three fail the keep gate (too short / too repetitive)
    assert all(v["keep"] == 0 for v in out.values())


def test_repetition_keep_gate_boundaries(spark):
    # exactly REP_MIN_TOKENS distinct-ish tokens, low repetition → keep
    good = " ".join(f"w{i}" for i in range(REP_MIN_TOKENS))
    # same length but one token dominating above 15% → reject
    bad = " ".join(["w"] * (REP_MIN_TOKENS // 2)
                   + [f"u{i}" for i in range(REP_MIN_TOKENS // 2)])
    out = _run(spark, [(1, good), (2, bad),
                       (3, " ".join(f"w{i}" for i in range(REP_MIN_TOKENS - 1)))])
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0          # top_token_e4 = 5000 > 1500
    assert out[3]["keep"] == 0          # one token short of the gate
