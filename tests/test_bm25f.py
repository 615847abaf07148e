"""BM25F (operators/fielded.py): reduction to classic BM25 in the
single-field case, the title-weighting property, and input validation.
(Cross-engine parity vs DuckDB is contract.q_bm25f_title, exercised at
three SFs by test_entry_contract / verify_contract.)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.fielded import bm25f_scores
from searchengine_spark.operators.search import bm25_score_py


def _tf_len(spark, rows):
    """rows: (doc_id, [tokens]) → (tf, lens) frames."""
    toks = spark.createDataFrame(
        [(d, t) for d, ts in rows for t in ts], "doc_id long, term string"
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    return tf, lens


DOCS = [
    (1, ["spark", "join", "scan", "row", "row"]),
    (2, ["join", "scan", "row", "row", "filter"]),
    (3, ["spark", "spark", "merge", "row", "group", "filter"]),
    (4, ["hash", "merge", "window", "order"]),
]


def test_single_field_reduces_to_bm25(spark):
    """With one field at w=1, b=0.75, k1=1.2 BM25F is algebraically
    classic BM25: tf~·(1+k1)/(k1+tf~) = tf·(1+k1)/(tf + k1·B)."""
    tf, lens = _tf_len(spark, DOCS)
    got = {
        r["doc_id"]: (r["score"], r["n_hit"])
        for r in bm25f_scores(
            {"body": tf}, {"body": lens}, {"body": 1.0}, {"body": 0.75},
            ["spark", "join"],
        ).collect()
    }
    dls = {d: len(ts) for d, ts in DOCS}
    n = len(DOCS)
    avgdl = sum(dls.values()) / n
    dfm = {"spark": 2, "join": 2}
    for d, ts in DOCS:
        want = sum(
            bm25_score_py(ts.count(t), dfm[t], dls[d], n, avgdl)
            for t in ("spark", "join") if t in ts
        )
        hits = sum(1 for t in ("spark", "join") if t in ts)
        if hits == 0:
            assert d not in got
        else:
            assert got[d][0] == pytest.approx(want, rel=1e-12)
            assert got[d][1] == hits


def test_title_hit_outranks_body_hit(spark):
    """Two docs, same body; one carries the query term in its title.
    With title weight > 0 the titled doc must score strictly higher —
    and the title's SHORT length must not be diluted by the body's
    normalizer (the defining BM25F property)."""
    body = [(1, ["alpha", "beta", "gamma"]), (2, ["alpha", "beta", "gamma"])]
    title = [(1, ["spark"]), (2, ["other"])]
    btf, blen = _tf_len(spark, body)
    ttf, tlen = _tf_len(spark, title)
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25f_scores(
            {"title": ttf, "body": btf}, {"title": tlen, "body": blen},
            {"title": 2.0, "body": 1.0}, {"title": 0.5, "body": 0.75},
            ["spark", "alpha"],
        ).collect()
    }
    assert scores[1] > scores[2]


def test_mismatched_field_keys_raise(spark):
    tf, lens = _tf_len(spark, DOCS)
    with pytest.raises(ValueError, match="keys must match"):
        bm25f_scores({"body": tf}, {"body": lens}, {"body": 1.0},
                     {"title": 0.5}, ["spark"])
