"""Fuzzy term suggestion ("did you mean") over the term dictionary.

The reference resolves query words through morphology only — a typo
("sparc") silently matches nothing (services/ApiService.java:121-126
drops unknown lemmas). This module adds edit-distance-1 suggestion
over the term dictionary with the SymSpell deletion-neighborhood
formulation, the shape that scales to a web-corpus dictionary:

  * OFFLINE (or on the fly at test scale): each dictionary term emits
    its delete-1 variants plus itself as join keys — |term|+1 keys per
    term, a bounded linear explode. At 10^12 docs the keyed table is
    materialized next to term_stats and partitioned by key.
  * QUERY: the query word's |q|+1 keys are a tiny driver-side set,
    pushed into the key scan (``key IN``) — a point-lookup join, never
    a dictionary scan. Candidates are verified with an exact
    levenshtein(term, q) <= 1 (Spark built-in, JVM-side) — the
    deletion-key match is complete for distance <= 1 (insert, delete,
    substitute each share a delete-1 key with the original), so the
    verify only REMOVES false candidates (distance-2 key collisions
    like transposed-ish pairs), guaranteeing engine == full-scan
    semantics.

Ranking: df DESC (suggest the most attested term first), term ASC as
the deterministic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# delete-1 variants of the term column plus the term itself, as one
# native higher-order expression (no Python in the dictionary pass)
_KEYS_EXPR = (
    "array_union(array(term), transform(sequence(1, length(term)), "
    "i -> concat(substr(term, 1, i - 1), substr(term, i + 1))))"
)


def _delete1(word: str) -> set[str]:
    return {word} | {word[:i] + word[i + 1 :] for i in range(len(word))}


def deletion_key_index(term_stats: DataFrame) -> DataFrame:
    """(key, term, df): the precomputable SymSpell key table."""
    return term_stats.select(
        F.explode(F.expr(_KEYS_EXPR)).alias("key"), "term", "df"
    )


def suggest_terms(
    term_stats: DataFrame,
    word: str,
    max_edit: int = 1,
    topn: int = 10,
    key_index: DataFrame | None = None,
) -> DataFrame:
    """Terms within ``max_edit`` (only 1 supported — the delete-1 key
    set is complete exactly for distance <= 1) of ``word``, ranked
    (df DESC, term ASC), top ``topn`` -> DataFrame(term, df).

    ``key_index``: a prebuilt ``deletion_key_index(term_stats)`` —
    pass it in a serving deployment so each query is a key lookup
    against the materialized (ideally key-partitioned/bucketed) table
    instead of re-exploding the dictionary; without it the index is
    derived on the fly (fine at test scale, a full dictionary pass
    per query at web scale)."""
    if max_edit != 1:
        raise ValueError(
            "suggest_terms supports max_edit=1 (delete-1 keys are "
            "complete only for distance <= 1; distance 2 needs "
            "delete-2 keys)"
        )
    qkeys = sorted(_delete1(word))
    idx = key_index if key_index is not None else deletion_key_index(
        term_stats
    )
    cand = (
        idx.filter(F.col("key").isin(qkeys))
        .select("term", "df")
        .distinct()
    )
    return (
        cand.filter(F.levenshtein(F.col("term"), F.lit(word)) <= max_edit)
        .orderBy(F.col("df").desc(), F.col("term"))
        .limit(topn)
    )


def suggest_terms_multi(
    term_stats: DataFrame,
    words: list[str],
    max_edit: int = 1,
    topn: int = 10,
    key_index: DataFrame | None = None,
) -> DataFrame:
    """Batched suggestion for MANY query words in ONE job:
    DataFrame(word, term, df), per-word top ``topn`` ranked
    (df DESC, term ASC). The serving shape for query correction — a
    query's unknown lemmas resolve in a single key-lookup join
    instead of one Spark job per word. Semantics per word are
    identical to ``suggest_terms`` (delete-1 keys, exact levenshtein
    verify)."""
    from pyspark.sql import Window

    if max_edit != 1:
        raise ValueError(
            "suggest_terms_multi supports max_edit=1 (delete-1 keys "
            "are complete only for distance <= 1)"
        )
    spark = term_stats.sparkSession
    pairs = [
        (w, k)
        for w in dict.fromkeys(words)
        for k in sorted(_delete1(w))
    ]
    if not pairs:
        return spark.createDataFrame(
            [], "word string, term string, df bigint"
        )
    qdf = spark.createDataFrame(pairs, "word string, key string")
    idx = key_index if key_index is not None else deletion_key_index(
        term_stats
    )
    allkeys = sorted({k for _, k in pairs})
    cand = (
        # key IN <driver set> prunes the (cached / key-partitioned)
        # index scan; the tiny (word, key) frame broadcasts INTO it
        idx.filter(F.col("key").isin(allkeys))
        .join(F.broadcast(qdf), "key")
        .select("word", "term", "df")
        .distinct()
        .filter(F.levenshtein(F.col("term"), F.col("word")) <= max_edit)
    )
    win = Window.partitionBy("word").orderBy(
        F.col("df").desc(), F.col("term")
    )
    return (
        cand.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= topn)
        .drop("rn")
    )
