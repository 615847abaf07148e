"""Positional packed index: phrase queries served from compressed
posting runs, not a corpus scan.

operators/phrase.py answers phrase/proximity queries by scanning the
corpus — correct, and the right plan for ad-hoc curation passes, but a
query ENGINE cannot re-read 100 TB of text per phrase. This module
adds the positional layer real fulltext indexes carry (the reference
stores bag-of-words TF only, LemmaMapper.java:15-43, so this is
beyond-reference capability): per (term, shard) runs of

    doc_ids    delta-gap + varbyte        (same layout as segments.py)
    counts     varbyte, one per doc       (positions per doc)
    positions  per-doc delta-gap varbyte, concatenated in doc order

with per-block (BLOCK docs) skip metadata: last docID and the byte
offset of the block's first position value — so the query kernel
decodes position bytes ONLY for blocks containing candidate docs.

Scale shape (same argument as segments.py): shard = pmod(hash(doc_id),
n_shards) bounds every build group and every query kernel group to
~corpus/n_shards docs regardless of term skew, and makes doc-space
intersection shard-local. The build pre-aggregates positions per
(doc, term) INSIDE a pandas UDF (one Arrow row per doc-term with a
position array — the same "count where it's local" move as
term_counts_udf), so the build shuffle carries doc-term rows, never
one row per token occurrence.

Query: rarest-first docID intersection (decode-cheap streams first),
then lazy per-block position decode for survivors, then the classic
shift-and-intersect. Only the phrase terms' runs are read (parquet
min/max prunes the term-sorted files) and the only shuffle is the
groupBy(shard) that cogroups those runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import textproc
from . import varbyte as vb
from .segments import BLOCK

POSITIONAL_SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("counts", T.BinaryType(), False),
        T.StructField("positions", T.BinaryType(), False),
        T.StructField("block_last_doc", T.ArrayType(T.LongType()), False),
        T.StructField("block_off_pos", T.ArrayType(T.LongType()), False),
    ]
)

_POS_LISTS_TYPE = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("poss", T.ArrayType(T.ArrayType(T.IntegerType()))),
    ]
)


@F.pandas_udf(_POS_LISTS_TYPE)
def _positional_lists_udf(lemmas: pd.Series) -> pd.DataFrame:
    """ordered lemma list → (distinct terms, per-term position lists).
    Positions index the LEMMA stream (the same stream whose counts are
    the TF postings), computed inside the doc row — no token explode."""
    terms_out, poss_out = [], []
    for ls in lemmas:
        acc: dict[str, list[int]] = {}
        if ls is not None:
            for i, t in enumerate(ls):
                acc.setdefault(t, []).append(i)
        terms_out.append(list(acc.keys()))
        poss_out.append(list(acc.values()))
    return pd.DataFrame({"terms": terms_out, "poss": poss_out})


def _pack_pos_group(pdf: pd.DataFrame, block: int) -> pd.DataFrame:
    """One (term, shard) group of (doc_id, positions) → one packed
    positional run."""
    term = pdf["term"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    pos_lists = [
        np.asarray(p, dtype=np.uint64) for p in pdf["positions"].iloc[order]
    ]
    n = len(doc_ids)
    counts = np.array([len(p) for p in pos_lists], dtype=np.uint64)
    # per-doc delta gaps (first position raw), concatenated in doc order
    flat = np.concatenate(pos_lists) if n else np.empty(0, dtype=np.uint64)
    gaps = flat.copy()
    start = 0
    for c in counts:
        c = int(c)
        if c > 1:
            gaps[start + 1 : start + c] = (
                flat[start + 1 : start + c] - flat[start : start + c - 1]
            )
        start += c
    n_blocks = -(-n // block)
    block_last = [
        int(doc_ids[min((i + 1) * block, n) - 1]) for i in range(n_blocks)
    ]
    # byte offset of each block's first position value
    # int64 for index math — concatenating a python 0 with a uint64
    # cumsum silently promotes to float64 and breaks indexing
    lens = vb.varbyte_lengths(gaps).astype(np.int64)
    cum = np.concatenate((np.zeros(1, dtype=np.int64), np.cumsum(lens)))
    val_starts = np.concatenate(
        (np.zeros(1, dtype=np.int64), np.cumsum(counts.astype(np.int64)))
    )[np.arange(n_blocks) * block]
    block_off = [int(cum[v]) for v in val_starts]
    return pd.DataFrame(
        [
            {
                "term": term,
                "shard": shard,
                "n_docs": n,
                "doc_ids": vb.delta_encode_ids(doc_ids),
                "counts": vb.varbyte_encode(counts),
                "positions": vb.varbyte_encode(gaps, nbytes=lens),
                "block_last_doc": block_last,
                "block_off_pos": block_off,
            }
        ]
    )


def build_positional_segments(
    prepared: DataFrame,
    n_shards: int,
    block: int = BLOCK,
) -> DataFrame:
    """prepared docs (doc_id, lemmas) → positional segment runs."""
    flat = (
        prepared.select(
            "doc_id", _positional_lists_udf("lemmas").alias("pc")
        )
        .select(
            "doc_id",
            F.explode(F.arrays_zip("pc.terms", "pc.poss")).alias("e"),
        )
        .select(
            "doc_id",
            F.col("e.terms").alias("term"),
            F.col("e.poss").alias("positions"),
        )
        .withColumn(
            "shard", F.pmod(F.hash("doc_id"), F.lit(n_shards)).cast("int")
        )
    )
    return flat.groupBy("term", "shard").applyInPandas(
        lambda pdf: _pack_pos_group(pdf, block),
        schema=POSITIONAL_SEGMENTS_SCHEMA,
    )


def write_positional_segments(
    segments: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Same layout discipline as write_segments: partition by shard,
    term-sorted within files so parquet min/max stats prune the
    phrase-term scan."""
    (
        segments.repartition("shard")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def _decode_positions_for(
    row: dict,
    want_idx: np.ndarray,
    ids_n: int,
    counts: np.ndarray,
    block: int,
) -> dict[int, np.ndarray]:
    """Decode position arrays for the docs at indices ``want_idx`` of
    one run, touching only the blocks that contain them."""
    offs = list(row["block_off_pos"])
    pos_bytes = bytes(row["positions"])
    offs.append(len(pos_bytes))
    val_starts = np.concatenate(
        (np.zeros(1, dtype=np.int64), np.cumsum(counts.astype(np.int64)))
    )
    out: dict[int, np.ndarray] = {}
    for b in np.unique(want_idx // block):
        b = int(b)
        lo_doc = b * block
        hi_doc = min((b + 1) * block, ids_n)
        vals = vb.varbyte_decode(pos_bytes[offs[b] : offs[b + 1]])
        base = val_starts[lo_doc]
        for i in want_idx[(want_idx >= lo_doc) & (want_idx < hi_doc)]:
            i = int(i)
            s = int(val_starts[i] - base)
            e = int(s + counts[i])
            # int64: uint64 arithmetic would wrap on the phrase shift
            # (position 0 − offset) instead of going negative
            out[i] = np.cumsum(vals[s:e]).astype(np.int64)
    return out


def _phrase_kernel(
    pdf: pd.DataFrame, phrase: list[str], block: int
) -> pd.DataFrame:
    """One shard's runs for the phrase's distinct terms → matching
    (doc_id, phrase_tf) rows."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "phrase_tf": pd.Series([], dtype="int64")})
    runs = {r["term"]: r for _, r in pdf.iterrows()}
    uniq = sorted(set(phrase))
    if any(t not in runs for t in uniq):
        return empty
    ids = {t: vb.delta_decode_ids(bytes(runs[t]["doc_ids"])) for t in uniq}
    # rarest-first docID intersection — position bytes untouched so far
    cand = None
    for t in sorted(uniq, key=lambda t: len(ids[t])):
        cand = ids[t] if cand is None else np.intersect1d(
            cand, ids[t], assume_unique=True
        )
        if len(cand) == 0:
            return empty
    # lazy per-block position decode for survivors only
    pos: dict[str, dict[int, np.ndarray]] = {}
    idx_of: dict[str, np.ndarray] = {}
    for t in uniq:
        counts = vb.varbyte_decode(bytes(runs[t]["counts"]))
        want = np.searchsorted(ids[t], cand)
        idx_of[t] = want
        pos[t] = _decode_positions_for(
            runs[t], want, len(ids[t]), counts, block
        )
    out_ids, out_tfs = [], []
    for j, d in enumerate(cand):
        starts = pos[phrase[0]][int(idx_of[phrase[0]][j])]
        for off, w in enumerate(phrase[1:], start=1):
            nxt = pos[w][int(idx_of[w][j])] - off
            starts = np.intersect1d(starts, nxt, assume_unique=True)
            if len(starts) == 0:
                break
        if len(starts):
            out_ids.append(int(d))
            out_tfs.append(len(starts))
    return pd.DataFrame(
        {"doc_id": pd.Series(out_ids, dtype="int64"),
         "phrase_tf": pd.Series(out_tfs, dtype="int64")}
    )


def _proximity_kernel(
    pdf: pd.DataFrame, term_a: str, term_b: str, max_dist: int, block: int
) -> pd.DataFrame:
    """One shard's two runs → (doc_id, min_dist ≤ max_dist) rows.
    Min distance per doc is a sorted-merge (searchsorted against the
    other term's positions), O((tf_a+tf_b)·log) — no position cross."""
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "min_dist": pd.Series([], dtype="int64")})
    runs = {r["term"]: r for _, r in pdf.iterrows()}
    if term_a not in runs or term_b not in runs:
        return empty
    ids = {t: vb.delta_decode_ids(bytes(runs[t]["doc_ids"]))
           for t in (term_a, term_b)}
    cand = np.intersect1d(ids[term_a], ids[term_b], assume_unique=True)
    if len(cand) == 0:
        return empty
    pos, idx_of = {}, {}
    for t in (term_a, term_b):
        counts = vb.varbyte_decode(bytes(runs[t]["counts"]))
        want = np.searchsorted(ids[t], cand)
        idx_of[t] = want
        pos[t] = _decode_positions_for(
            runs[t], want, len(ids[t]), counts, block
        )
    out_ids, out_d = [], []
    for j, d in enumerate(cand):
        pa = pos[term_a][int(idx_of[term_a][j])]
        pb = pos[term_b][int(idx_of[term_b][j])]
        k = np.searchsorted(pb, pa)
        right = np.abs(pb[np.clip(k, 0, len(pb) - 1)] - pa)
        left = np.abs(pa - pb[np.clip(k - 1, 0, len(pb) - 1)])
        md = int(min(right.min(), left.min()))
        if md <= max_dist:
            out_ids.append(int(d))
            out_d.append(md)
    return pd.DataFrame(
        {"doc_id": pd.Series(out_ids, dtype="int64"),
         "min_dist": pd.Series(out_d, dtype="int64")}
    )


def proximity_search_packed_terms(
    spark: SparkSession,
    pos_segments: DataFrame,
    term_a: str,
    term_b: str,
    max_dist: int,
    block: int = BLOCK,
) -> DataFrame:
    """(doc_id, min_dist): docs where the two lemmas occur within
    ``max_dist`` tokens, served from the positional runs (same scan
    pruning + shard cogroup as phrase_search_packed_terms)."""
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    segs = pos_segments.filter(F.col("term").isin([term_a, term_b]))
    return segs.groupBy("shard").applyInPandas(
        lambda pdf: _proximity_kernel(pdf, term_a, term_b, max_dist, block),
        schema="doc_id long, min_dist long",
    )


def phrase_search_packed_terms(
    spark: SparkSession,
    pos_segments: DataFrame,
    phrase: list[str],
    block: int = BLOCK,
) -> DataFrame:
    """(doc_id, phrase_tf) for an already-analyzed lemma sequence."""
    if not phrase:
        return spark.createDataFrame([], "doc_id long, phrase_tf long")
    uniq = sorted(set(phrase))
    segs = pos_segments.filter(F.col("term").isin(uniq))
    return segs.groupBy("shard").applyInPandas(
        lambda pdf: _phrase_kernel(pdf, list(phrase), block),
        schema="doc_id long, phrase_tf long",
    )


def phrase_search_packed(
    spark: SparkSession,
    pos_segments: DataFrame,
    query: str,
    block: int = BLOCK,
) -> DataFrame:
    """(doc_id, phrase_tf): docs whose LEMMA stream contains the
    query's lemma sequence consecutively. The query goes through the
    same analyzer as the corpus (tokenize_lemmatize, duplicates and
    order PRESERVED — unlike lemmatize_query's set semantics, a phrase
    needs the full sequence)."""
    return phrase_search_packed_terms(
        spark, pos_segments, textproc.tokenize_lemmatize(query), block
    )
