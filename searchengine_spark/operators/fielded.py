"""BM25F: field-weighted ranking over multi-field documents.

The reference scores one undifferentiated text blob per page
(services/ApiService.java:130-146 — title, headings and body all feed
ONE per-page lemma frequency). Real web ranking weights fields: a
query term in the <title> is worth more than the same term buried in
the body. Two public-literature treatments, both in this repo:

  * VIRTUAL DOCUMENT (Lucene boost-by-duplication era; already
    implemented for anchors — operators/linkgraph.merge_anchor_tf):
    tf' = tf + w·field_tf. Simple, serves unchanged through the
    packed index, but lets a long field's length dilute a short
    field's signal.
  * BM25F PROPER (Robertson & Zaragoza 2004, "Simple BM25 extension
    to multiple weighted fields" — THIS module): per-field length
    normalization BEFORE the saturation, so a term hit in a 5-word
    title is not normalized by a 500-word body:

        tf~(t,d) = Σ_f  w_f · tf_{t,f,d} / (1 - b_f + b_f·len_f(d)/avgl_f)
        score(d) = Σ_t  idf(t) · tf~·(1+k1) / (k1 + tf~)

    with idf the repo's BM25 idf (df counted over docs containing t
    in ANY field) and the (1+k1) numerator kept for consistency with
    operators/search.bm25_term_score (pure scaling — rank-neutral).

Everything here is native Column math (whole-stage codegen, no
Python): the per-field TF frames full-outer-join on (doc_id, term) —
a field can contribute a term the body never contains — then one
groupBy(doc_id) sums the per-term scores. One shuffle per TF frame +
one for the join + one for the final agg; at 10^12 docs the per-field
TF frames come straight out of the index build's term_counts maps, so
no extra corpus pass. Cross-engine parity: contract.q_bm25f_title
replays the identical expression in DuckDB, bit-exact via the e4
fixed-point convention.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BM25F_K1 = 1.2

# Pack-time length-normalization slopes for the packed-index field
# layer (index/segments.py): the per-block field-normalized maxima
# that make BM25F block-max pruning possible are computed with THESE
# b values at pack time, so the packed serving path (index/wand.py
# mode="bm25f") normalizes with the same constants. Field WEIGHTS
# stay query-time-free (w_f-scaled maxima remain sound bounds); the
# slopes are baked like Lucene norms. The relational operator below
# keeps arbitrary per-call bs.
FIELD_B_BODY = 0.75  # == the BM25 b of the body scorer
FIELD_B_TITLE = 0.5


def field_norm_tf(tf: Column, flen: Column, avg_flen: Column,
                  weight: float, b: float) -> Column:
    """One field's contribution to tf~: w · (tf / (1 - b + b·len/avg)).

    The weight multiplies the NORMALIZED tf (w·(tf/norm), not
    (w·tf)/norm) on purpose: the packed index stores per-block maxima
    of tf/norm, and IEEE multiplication by a positive w is monotone,
    so w·max_i(tf_i/norm_i) ≥ w·(tf_j/norm_j) holds BITWISE — the
    block bound stays sound without any epsilon. (w·tf)/norm could
    exceed w·(tf/norm) by an ulp and silently break pruning. The SQL
    oracle (contract._SQL_BM25F) mirrors this literal structure."""
    return F.lit(weight) * (
        tf / (F.lit(1.0) - F.lit(b) + F.lit(b) * flen / avg_flen)
    )


def bm25f_term_score(tf_tilde: Column, df: Column, n_docs: Column,
                     k1: float = BM25F_K1) -> Column:
    """idf(t) · tf~·(1+k1)/(k1 + tf~) — the saturation applied AFTER
    field combination (the defining property of BM25F: a strong title
    hit and a strong body hit saturate together, not separately)."""
    idf = F.log(
        F.lit(1.0) + (n_docs - df + F.lit(0.5)) / (df + F.lit(0.5))
    )
    return idf * tf_tilde * F.lit(1.0 + k1) / (F.lit(k1) + tf_tilde)


def bm25f_scores(
    field_tfs: dict[str, DataFrame],
    field_lens: dict[str, DataFrame],
    weights: dict[str, float],
    bs: dict[str, float],
    query_terms: list[str],
    k1: float = BM25F_K1,
) -> DataFrame:
    """Disjunctive BM25F → DataFrame(doc_id, score, n_hit).

    field_tfs[f]:  (doc_id, term, tf)   — per-field term frequencies
    field_lens[f]: (doc_id, len)        — per-field token lengths
    weights/bs[f]: field weight and length-normalization slope

    df/N are computed over the UNION of fields (a doc "contains" a
    term if any field does). All inputs small-per-doc; the plan is
    joins + one aggregation, no Python.
    """
    fields = list(field_tfs)
    if sorted(fields) != sorted(field_lens) or sorted(fields) != sorted(
        weights
    ) or sorted(fields) != sorted(bs):
        raise ValueError("field_tfs/field_lens/weights/bs keys must match")

    # union TF presence for df: doc contains term iff any field does
    present = None
    for f in fields:
        p = field_tfs[f].select("doc_id", "term")
        present = p if present is None else present.union(p)
    present = present.distinct()
    dfx = present.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # docs universe + avg field lengths
    docs_n = None
    for f in fields:
        d = field_lens[f].select("doc_id")
        docs_n = d if docs_n is None else docs_n.union(d)
    stats = docs_n.distinct().agg(F.count(F.lit(1)).alias("n"))

    # assemble per-(doc, term) per-field tf and per-doc lens by
    # iterative full-outer join (fields can disagree on term sets)
    joined = None
    for f in fields:
        tf_f = field_tfs[f].filter(F.col("term").isin(query_terms)).select(
            "doc_id", "term", F.col("tf").alias(f"tf_{f}")
        )
        joined = tf_f if joined is None else joined.join(
            tf_f, ["doc_id", "term"], "full_outer"
        )
    for f in fields:
        ln_f = field_lens[f].select(
            "doc_id", F.col("len").alias(f"len_{f}")
        )
        avg_f = field_lens[f].agg(F.avg("len").alias(f"avg_{f}"))
        joined = joined.join(ln_f, "doc_id", "left").crossJoin(
            F.broadcast(avg_f)
        )

    tf_tilde = None
    for f in fields:
        c = field_norm_tf(
            F.coalesce(F.col(f"tf_{f}"), F.lit(0)).cast("double"),
            F.coalesce(F.col(f"len_{f}"), F.lit(0)).cast("double"),
            F.col(f"avg_{f}"), weights[f], bs[f],
        )
        tf_tilde = c if tf_tilde is None else tf_tilde + c

    per_term = bm25f_term_score(tf_tilde, F.col("df"), F.col("n"), k1)
    return (
        joined.join(F.broadcast(dfx), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(per_term).alias("score"),
            F.count(F.lit(1)).alias("n_hit"),
        )
    )
