"""Null-text semantics of the dedup ladder (ADVICE r2): a null-text
doc must contribute NO minhash signature and NO candidate pair — the
column formulation null-propagated (null mh never equality-joins) and
the SQL oracle does the same, so the Arrow kernel must not hash null
as '' (which would make every null-text doc a mutual near-dup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from searchengine_spark.operators import dedup

TXT = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lambda mu nu xi omicron pi rho sigma tau upsilon"
)


def _docs(spark):
    rows = [
        (1, TXT),
        (2, TXT),          # verbatim duplicate of 1 → must pair
        (3, None),
        (4, None),         # two null-text docs → must NOT pair
        (5, ""),           # empty string is a REAL value (hashes "")
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_null_text_never_pairs(spark):
    pairs = dedup.minhash_lsh_pairs(_docs(spark)).collect()
    ids = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in ids, "verbatim duplicates must still pair"
    flat = {d for p in ids for d in p}
    assert 3 not in flat and 4 not in flat, "null-text docs paired"


def test_null_text_has_no_signature(spark):
    sig = dedup.minhash_signatures(_docs(spark))
    got = {r["doc_id"] for r in sig.collect()}
    assert got == {1, 2, 5}
    # empty-string text keeps the defined '' signature (both engines
    # hash the whole text when there are <3 tokens)
    row = sig.filter(F.col("doc_id") == 5).collect()[0]
    assert row["mh0"] is not None
