"""Block-max WAND top-k retrieval over packed segments.

North-rule query path: "conjunctive/disjunctive posting-list
intersection with block-max WAND pruning and Okapi BM25 top-k heap
scoring". Reference analog: the AND-intersection + scoring loop of
services/ApiService.java:127-139, which walked Java lists row-by-row;
here each shard's intersection runs as one vectorized numpy kernel
inside applyInPandas, and shards execute in parallel across the
cluster.

Soundness (rank-identity contract): pruning only ever SKIPS a doc when
a provable upper bound on its total BM25 score is below the current
threshold θ:

  * conjunctive: candidates start from the rarest term's postings
    (R1, reference ApiService.java:205-220) and are intersected with
    every other term via sorted-array searchsorted — no doc that
    matches all terms is ever dropped; scores are then EXACT.
  * disjunctive: a block b of term t is prunable iff
    block_max_t(b) + Σ_{u≠t} global_max_u < θ. A doc is dropped only
    if EVERY block containing it is prunable, which implies its exact
    score < θ. Survivors are scored exactly against ALL decoded
    postings (including pruned blocks — pruning limits the candidate
    set, never the scoring).

θ is seeded with the k-th best single-term score (a valid lower bound
on the final k-th best total) and zero when fewer than k candidates
exist. Exact float64 scoring from packed (tf, doclen) integers keeps
scores bit-comparable with the relational path and the oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.search import lemmatize_query
from .segments import bm25_scores_np, unpack_segment

TOPK_OUT_SCHEMA = "doc_id long, score double, n_hit int"


class _TermList:
    """Decoded postings of one term within one shard."""

    __slots__ = ("ids", "scores", "block_last", "block_max", "df", "gmax")

    def __init__(self, rows: pd.DataFrame, n_docs: int, avgdl: float,
                 mode: str = "bm25"):
        # merge runs (last run wins per doc_id — upsert semantics)
        if len(rows) == 1:
            row = rows.iloc[0]
            ids, tfs, dls = unpack_segment(row)
        else:
            parts = []
            for _, row in rows.sort_values("run_id").iterrows():
                i, t, d = unpack_segment(row)
                parts.append((i, t, d, int(row["run_id"])))
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            runs = np.concatenate(
                [np.full(len(p[0]), p[3], dtype=np.int64) for p in parts]
            )
            order = np.lexsort((runs, ids))
            ids, tfs, dls = ids[order], tfs[order], dls[order]
            keep = np.ones(len(ids), dtype=bool)
            keep[:-1] = ids[1:] != ids[:-1]  # keep last (highest run)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        df = int(rows["df"].iloc[0])
        self.ids = ids
        self.df = df
        if mode == "legacy":
            # reference scoring (ApiService.java:130-142): per-term
            # contribution is the raw rank (= tf); the shard kernel
            # finishes with sum/max
            self.scores = tfs.astype(np.float64)
        else:
            self.scores = bm25_scores_np(tfs, dls, df, n_docs, avgdl)
        # block metadata recomputed post-merge (exact, block=128)
        from .segments import BLOCK

        n = len(ids)
        n_blocks = -(-n // BLOCK) if n else 0
        self.block_last = np.array(
            [ids[min((i + 1) * BLOCK, n) - 1] for i in range(n_blocks)],
            dtype=np.int64,
        )
        self.block_max = np.array(
            [self.scores[i * BLOCK : (i + 1) * BLOCK].max() for i in range(n_blocks)],
            dtype=np.float64,
        )
        self.gmax = float(self.scores.max()) if n else 0.0

    def lookup(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(scores, present_mask) of candidate ids (sorted)."""
        pos = np.searchsorted(self.ids, cand)
        pos_c = np.minimum(pos, len(self.ids) - 1) if len(self.ids) else pos
        present = (
            (pos < len(self.ids)) & (self.ids[pos_c] == cand)
            if len(self.ids)
            else np.zeros(len(cand), dtype=bool)
        )
        sc = np.zeros(len(cand), dtype=np.float64)
        sc[present] = self.scores[pos_c[present]]
        return sc, present


def _theta_seed(lists: list[_TermList], k: int) -> float:
    """k-th best single-term score — a valid lower bound on the final
    k-th best total score (every doc's total ≥ its best single-term
    contribution)."""
    best = np.concatenate([t.scores for t in lists]) if lists else np.empty(0)
    if len(best) <= k:
        return 0.0
    return float(np.partition(best, -k)[-k])


def _topk_frame(cand, scores, n_hit, k: int) -> pd.DataFrame:
    n = len(cand)
    if n > k:
        # O(n) selection of the k-th score, keep ALL ties at the
        # boundary, then resolve them by the global total order
        # (score desc, doc_id asc) — dropping an arbitrary tied doc
        # here would break rank-identity after the cross-shard merge
        kth = np.partition(scores, n - k)[n - k]
        keep = scores >= kth
        cand, scores, n_hit = cand[keep], scores[keep], n_hit[keep]
        order = np.lexsort((cand, -scores))[:k]
        cand, scores, n_hit = cand[order], scores[order], n_hit[order]
    return pd.DataFrame(
        {"doc_id": cand.astype(np.int64), "score": scores,
         "n_hit": n_hit.astype(np.int32)}
    )


def wand_shard_topk(
    pdf: pd.DataFrame, n_docs: int, avgdl: float, k: int, conjunctive: bool,
    n_terms: int, mode: str = "bm25",
) -> pd.DataFrame:
    """One shard's segments (all query terms) → shard-local top-k.
    mode="legacy" scores sum(tf)/max(tf) (reference A3) — block-max
    pruning is disabled there (the block annotations bound BM25, not
    tf ratios); candidates are scored exhaustively."""
    lists = [
        _TermList(rows, n_docs, avgdl, mode)
        for _, rows in pdf.groupby("term", sort=False)
    ]
    if not lists:
        return _topk_frame(np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64), k)

    if conjunctive:
        if len(lists) < n_terms:
            # a query term has no postings in this shard ⇒ no doc here
            # can match all terms (shards partition the doc space)
            return _topk_frame(np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64), k)
        # rarest-first intersection cascade (R1)
        lists.sort(key=lambda t: len(t.ids))
        cand = lists[0].ids
        for t in lists[1:]:
            if len(cand) == 0:
                break
            _, present = t.lookup(cand)
            cand = cand[present]
        if len(cand) == 0:
            return _topk_frame(cand, np.empty(0), np.empty(0, np.int64), k)
        scores = np.zeros(len(cand), dtype=np.float64)
        maxs = np.zeros(len(cand), dtype=np.float64)
        for t in lists:
            sc, _ = t.lookup(cand)
            scores += sc
            np.maximum(maxs, sc, out=maxs)
        if mode == "legacy":
            scores = scores / maxs  # sum(rank)/max(rank), A3
        n_hit = np.full(len(cand), len(lists), dtype=np.int64)
        return _topk_frame(cand, scores, n_hit, k)

    # disjunctive: block-max pruning, then exact scoring of survivors
    # (legacy mode: no sound block bound for sum/max → no pruning)
    theta = _theta_seed(lists, k) if mode == "bm25" else 0.0
    gmax_sum = sum(t.gmax for t in lists)
    survivors = []
    for t in lists:
        if len(t.ids) == 0:
            continue
        bound = t.block_max + (gmax_sum - t.gmax)
        keep_blocks = np.flatnonzero(bound >= theta)
        if len(keep_blocks) == 0:
            continue
        from .segments import BLOCK

        idx = np.concatenate(
            [
                np.arange(b * BLOCK, min((b + 1) * BLOCK, len(t.ids)))
                for b in keep_blocks
            ]
        )
        survivors.append(t.ids[idx])
    if not survivors:
        return _topk_frame(np.empty(0, np.int64), np.empty(0), np.empty(0, np.int64), k)
    cand = np.unique(np.concatenate(survivors))
    scores = np.zeros(len(cand), dtype=np.float64)
    maxs = np.zeros(len(cand), dtype=np.float64)
    n_hit = np.zeros(len(cand), dtype=np.int64)
    for t in lists:
        sc, present = t.lookup(cand)
        scores += sc
        np.maximum(maxs, sc, out=maxs)
        n_hit += present.astype(np.int64)
    if mode == "legacy":
        scores = np.divide(scores, maxs, out=np.zeros_like(scores),
                           where=maxs > 0)
    return _topk_frame(cand, scores, n_hit, k)


def search_packed(
    spark,
    segments: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    k: int = 20,
    conjunctive: bool = True,
    max_rel_freq: float = 0.95,
    df_map: dict | None = None,
    mode: str = "bm25",
) -> DataFrame:
    """Top-k over the packed index → DataFrame(doc_id, score).

    Plan shape: parquet scan pruned to the query terms (term predicate
    + shard partitioning) → one applyInPandas kernel per shard →
    global TakeOrderedAndProject of ≤ n_shards·k rows. Two shuffles
    total, both tiny.

    `df_map` (term → df): pass a pre-collected dictionary to skip the
    per-query term_stats lookup job — a query server collects it once
    (or holds the broadcast) and serves every query from it.
    """
    lemmas = lemmatize_query(query)
    if not lemmas:
        from ..operators.search import empty_df
        return empty_df(spark, "doc_id long, score double")
    if df_map is not None:
        stats = {t: df_map[t] for t in lemmas if t in df_map}
    else:
        stats = {
            r["term"]: r["df"]
            for r in term_stats.filter(F.col("term").isin(lemmas)).collect()
        }
    # F4 pruning + absent-term drop — same contract as the relational
    # path and the oracle (reference: ApiService.java:121-126,222-236 —
    # lemmas not found in the dictionary simply vanish from the query)
    terms = [
        t for t in lemmas
        if t in stats and stats[t] / float(n_docs) <= max_rel_freq
    ]
    if not terms:
        from ..operators.search import empty_df
        return empty_df(spark, "doc_id long, score double")
    n_terms = len(terms)

    seg = segments.filter(F.col("term").isin(terms))
    per_shard = seg.groupBy("shard").applyInPandas(
        lambda pdf: wand_shard_topk(pdf, n_docs, avgdl, k, conjunctive,
                                    n_terms, mode),
        schema=TOPK_OUT_SCHEMA,
    )
    out = per_shard
    if conjunctive:
        out = out.filter(F.col("n_hit") == n_terms)
    return (
        out.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
