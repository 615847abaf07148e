"""Positional phrase and proximity search.

The reference engine ranks on bag-of-words TF only (LemmaMapper.java
15-43 discards token order before anything is stored); phrase ("exact
quote") and proximity (terms near each other) queries are the standard
next step for any fulltext index, so this module adds them over the
same corpus with the positional-postings formulation a 100 TB index
serves them with.

Scale shape
-----------
``positional_postings`` is the (doc_id, term, pos) relation — at index
time a deployment materializes it next to the TF postings (same salted
layout as operators/postings.py); at query time only the PHRASE TERMS'
rows are touched, so the filter pushes into the scan and the single
shuffle (groupBy doc_id) moves just those postings — never the corpus.
Phrase matching is then pure per-doc array math: the classic
shift-and-intersect

    match_starts = P(w0) ∩ (P(w1) − 1) ∩ … ∩ (P(w_{m−1}) − (m−1))

where P(w) is the sorted position array of w in the doc.  No window
functions, no self-joins, no per-row Python — the arrays are per-doc
and bounded by per-doc term frequency.

``proximity_match`` computes the minimum token distance between two
terms' occurrences with an O(tf_a·tf_b) per-doc cross of the two
(small) arrays; the 0/1-based choice of position index cancels out of
every distance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda t: t != "")


def positional_postings(
    docs: DataFrame,
    terms: list[str] | None = None,
    text: str = "text",
) -> DataFrame:
    """(doc_id, term, pos): 0-based token positions.  With ``terms``
    the explode is pre-filtered to the query's terms (the query-time
    scan path); without it, the full relation an index build would
    materialize."""
    out = docs.select(
        "doc_id",
        F.posexplode(_tokens(F.coalesce(F.col(text), F.lit("")))).alias(
            "pos", "term"
        ),
    )
    if terms is not None:
        out = out.filter(F.col("term").isin(list(set(terms))))
    return out


def phrase_match(
    docs: DataFrame,
    phrase: list[str],
    text: str = "text",
) -> DataFrame:
    """(doc_id, phrase_tf): docs containing the exact consecutive token
    sequence ``phrase``, with the number of occurrences.  Repeated
    words in the phrase are handled naturally — the same position
    array is intersected at each offset where the word recurs.

    Plan: postings filtered to the distinct phrase words (pushed into
    the scan) → one groupBy(doc_id) building a sorted position array
    per word (collect_list drops the nulls of non-matching rows) →
    per-row shift-and-intersect.  The only shuffle is keyed by doc_id
    and carries the phrase words' postings, nothing else."""
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    uniq = sorted(set(phrase))
    slot = {t: i for i, t in enumerate(uniq)}
    pp = positional_postings(docs, terms=uniq, text=text)
    per_term = [
        F.array_sort(
            F.collect_list(F.when(F.col("term") == t, F.col("pos")))
        ).alias(f"p{i}")
        for t, i in slot.items()
    ]
    grouped = pp.groupBy("doc_id").agg(*per_term)
    # closure via factory, not a default arg: Spark higher-order
    # lambdas must have exactly the declared arity
    def _shift(j: int):
        return lambda x: x - j

    starts = F.col(f"p{slot[phrase[0]]}")
    for j, w in enumerate(phrase[1:], start=1):
        shifted = F.transform(F.col(f"p{slot[w]}"), _shift(j))
        starts = F.array_intersect(starts, shifted)
    return (
        grouped.select(
            "doc_id", F.size(starts).cast("long").alias("phrase_tf")
        )
        .filter(F.col("phrase_tf") > 0)
    )


def proximity_match(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    max_dist: int,
    text: str = "text",
) -> DataFrame:
    """(doc_id, min_dist): docs where ``term_a`` and ``term_b`` both
    occur within ``max_dist`` tokens, with the minimum |pos_a − pos_b|.
    Same postings-restricted scan + doc_id-keyed shuffle as
    phrase_match; the per-doc distance cross is O(tf_a·tf_b) over two
    small arrays (adversarially long docs are bounded upstream by the
    repetition/quality gates)."""
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    pp = positional_postings(docs, terms=[term_a, term_b], text=text)
    grouped = pp.groupBy("doc_id").agg(
        F.collect_list(
            F.when(F.col("term") == term_a, F.col("pos"))
        ).alias("pa"),
        F.collect_list(
            F.when(F.col("term") == term_b, F.col("pos"))
        ).alias("pb"),
    )
    dists = F.flatten(
        F.transform(
            F.col("pa"),
            lambda a: F.transform(F.col("pb"), lambda b: F.abs(a - b)),
        )
    )
    return (
        grouped.select(
            "doc_id", F.array_min(dists).cast("long").alias("min_dist")
        )
        .filter(F.col("min_dist") <= max_dist)
    )
