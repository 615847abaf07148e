"""Packed index build: postings → compressed, block-max segments.

The north rule's "salted-hash-partitioned (term-sharded, skew-aware
for stopword-heavy terms) posting-list construction": the unit of
storage is the (term, shard) segment, where

    shard = pmod(hash(doc_id), n_shards)

is a single GLOBAL doc-space hash partitioning. This is simultaneously
the salt for skew (a 98%-DF term's posting list splits evenly across
all shards — no single applyInPandas group ever exceeds ~corpus/
n_shards postings) and the alignment that makes query-time conjunctive
intersection shard-local (every doc lives in exactly one shard for
every term).

Per segment we store docIDs delta-gap + varbyte compressed, tfs and
doclens varbyte compressed, and per-block (128 postings) metadata:
last docID (skip pointer) and the exact max float64 BM25 score
(WAND upper bound — computed from the true per-posting scores, so it
can never underestimate).

Sizing at 10^12 docs: n_shards chosen so corpus/n_shards ≈ 64k docs
per shard → the hottest (term, shard) group decodes to ≤64k postings,
bounded executor memory regardless of term skew. Written partitioned
by shard bucket with term-sorted row groups → parquet min/max stats
prune query scans to the touched terms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.postings import IndexTables
from ..operators.search import bm25_score_py
from ..schemas import INDEX_SEGMENTS_SCHEMA
from . import varbyte as vb

BLOCK = 128
DEFAULT_DOCS_PER_SHARD = 65536


def n_shards_for(
    n_docs: int,
    docs_per_shard: int = DEFAULT_DOCS_PER_SHARD,
    min_parallelism: int = 1,
) -> int:
    """Shard count = max(corpus/docs_per_shard, cluster parallelism).
    The first term bounds per-group memory at huge N; the second keeps
    the pack kernel, the segment write, and the per-shard WAND query
    kernel parallel even when the corpus is smaller than
    cores × docs_per_shard (otherwise a small build collapses to ONE
    task and scaling dies)."""
    return max(1, -(-n_docs // docs_per_shard), min_parallelism)


def bm25_scores_np(
    tfs: np.ndarray, doclens: np.ndarray, df: int, n_docs: int, avgdl: float,
    k1: float = 1.2, b: float = 0.75,
) -> np.ndarray:
    """Vectorized BM25 per-posting scores — float64, same arithmetic as
    operators.search.bm25_score_py (kept in lockstep)."""
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    tf = tfs.astype(np.float64)
    norm = tf + k1 * (1.0 - b + b * doclens.astype(np.float64) / avgdl)
    return idf * tf * (1.0 + k1) / norm


def _pack_group(pdf: pd.DataFrame, n_docs: int, avgdl: float, run_id: int) -> pd.DataFrame:
    """One (term, shard) group of (doc_id, tf, doclen, df) → one packed
    segment row. Runs inside applyInPandas (Arrow batch, numpy body)."""
    term = pdf["term"].iloc[0]
    shard = int(pdf["shard"].iloc[0])
    df_term = int(pdf["df"].iloc[0])
    order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
    doclens = pdf["doclen"].to_numpy()[order].astype(np.int64)
    scores = bm25_scores_np(tfs, doclens, df_term, n_docs, avgdl)
    n = len(doc_ids)
    n_blocks = -(-n // BLOCK)
    block_last = [int(doc_ids[min((i + 1) * BLOCK, n) - 1]) for i in range(n_blocks)]
    block_max = [float(scores[i * BLOCK : (i + 1) * BLOCK].max()) for i in range(n_blocks)]

    # per-block byte offsets into each varbyte stream (lazy decode);
    # lengths computed once per stream and reused by the encoder
    u = vb.to_u64(doc_ids)
    gaps = np.empty_like(u)
    if n:
        gaps[0] = u[0]
        gaps[1:] = u[1:] - u[:-1]
    starts = np.arange(n_blocks, dtype=np.int64) * BLOCK
    tfs_u = tfs.astype(np.uint64)
    dls_u = doclens.astype(np.uint64)
    enc = {}
    offs = {}
    for key, vals in (("ids", gaps), ("tfs", tfs_u), ("dls", dls_u)):
        lens = vb.varbyte_lengths(vals)
        cum = np.concatenate(([0], np.cumsum(lens)))
        offs[key] = [int(x) for x in cum[starts]]
        enc[key] = vb.varbyte_encode(vals, nbytes=lens)

    return pd.DataFrame(
        [
            {
                "term": term,
                "shard": shard,
                "run_id": run_id,
                "n_docs": n,
                "df": df_term,
                "doc_ids": enc["ids"],
                "tfs": enc["tfs"],
                "doclens": enc["dls"],
                "block_last_doc": block_last,
                "block_max_score": block_max,
                "block_off_ids": offs["ids"],
                "block_off_tfs": offs["tfs"],
                "block_off_dls": offs["dls"],
            }
        ]
    )


def build_segments(
    index: IndexTables,
    n_docs: int,
    avgdl: float,
    n_shards: int | None = None,
    run_id: int = 0,
) -> DataFrame:
    """postings + stats → packed index_segments DataFrame."""
    if n_shards is None:
        par = index.postings.sparkSession.sparkContext.defaultParallelism
        n_shards = n_shards_for(n_docs, min_parallelism=par)
    enriched = (
        index.postings
        .join(index.doc_stats.select("doc_id", "doclen"), "doc_id")
        .join(index.term_stats.select("term", "df"), "term")
        .withColumn("shard", F.pmod(F.hash("doc_id"), F.lit(n_shards)).cast("int"))
    )
    return enriched.groupBy("term", "shard").applyInPandas(
        lambda pdf: _pack_group(pdf, n_docs, avgdl, run_id),
        schema=INDEX_SEGMENTS_SCHEMA,
    )


def write_segments(segments: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Partition by shard; sort by term within files so parquet min/max
    column stats prune query-term scans."""
    (
        segments.repartition("shard")
        .sortWithinPartitions("term")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def unpack_segment(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, doclens) from a segment row (dict-like)."""
    return (
        vb.delta_decode_ids(bytes(row["doc_ids"])),
        vb.decode_ints(bytes(row["tfs"])),
        vb.decode_ints(bytes(row["doclens"])),
    )


def delta_segments(
    delta_prepared: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    n_shards: int,
    run_id: int,
) -> DataFrame:
    """Incremental update (reference I1, single-page reindex
    IndexingService.java:71-95): a small batch of new/changed docs →
    packed segments tagged with a NEW run_id, appended alongside the
    base run. Query-time _TermList merges runs last-wins (upsert), so
    updated docs take effect without rewriting the base index;
    index.refresh.refresh_and_repack compacts when runs accumulate.

    df/doclen statistics for the delta reuse the BASE corpus stats
    (n_docs, avgdl, term df) — the standard approximation for small
    deltas; index.refresh.refresh_and_repack re-aggregates exactly
    (idempotent, no ±1 mutation — SURVEY §3.3) and closes the window."""
    from ..operators.postings import doclen_from_counts, explode_term_counts

    postings = explode_term_counts(delta_prepared)
    doclen = delta_prepared.select(
        "doc_id", doclen_from_counts(delta_prepared).alias("doclen")
    )
    enriched = (
        postings.join(doclen, "doc_id")
        .join(term_stats.select("term", "df"), "term", "left")
        .fillna(1, subset=["df"])  # unseen term: df ≥ 1 once this doc lands
        .withColumn(
            "shard", F.pmod(F.hash("doc_id"), F.lit(n_shards)).cast("int")
        )
    )
    return enriched.groupBy("term", "shard").applyInPandas(
        lambda pdf: _pack_group(pdf, n_docs, avgdl, run_id),
        schema=INDEX_SEGMENTS_SCHEMA,
    )


def write_delta_run(
    spark,
    delta_prepared: DataFrame,
    index_base: str,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    n_shards: int,
    run_id: int,
) -> None:
    """Append one delta run: packed segments (delta_segments) PLUS the
    delta docs' meta rows (doc_id, url, site, doclen, run_id) to
    idx/doc_meta_runs — the breadcrumb refresh_and_repack needs to
    rebuild doc_stats exactly (url/site are not recoverable from
    packed postings). Both writes are appends; the run becomes visible
    to queries via last-run-wins merge immediately.

    `delta_prepared` is persisted across the two writes: its lineage
    contains the extract/tokenize UDFs (the hottest Python path), which
    would otherwise run a second time just to derive the meta doclens.

    Crash/replay safety: segments are appended FIRST - a crash before
    the meta append leaves orphan segment rows that are inert (the
    refresh supersede is keyed on the META run, not the postings), and
    an at-least-once replay re-appends value-identical rows that every
    consumer dedups (index.refresh.current_postings /
    _doc_meta_resolved; the read-time merge)."""
    from ..operators.postings import doclen_from_counts

    delta_prepared = delta_prepared.persist()
    try:
        delta = delta_segments(
            delta_prepared, term_stats, n_docs=n_docs, avgdl=avgdl,
            n_shards=n_shards, run_id=run_id,
        )
        (
            delta.repartition("shard")
            .write.mode("append")
            .partitionBy("shard")
            .parquet(f"{index_base}/segments")
        )
        title = (
            F.col("title") if "title" in delta_prepared.columns
            else F.lit(None).cast("string")
        ).alias("title")
        meta = delta_prepared.select(
            "doc_id", "url", "site", title,
            doclen_from_counts(delta_prepared).alias("doclen"),
            F.lit(run_id).cast("int").alias("run_id"),
            F.lit(False).alias("deleted"),
        )
        meta.write.mode("append").parquet(f"{index_base}/idx/doc_meta_runs")
    finally:
        delta_prepared.unpersist()


def write_tombstones(
    spark, doc_ids: list[int], index_base: str, run_id: int
) -> int:
    """Delete documents (reference analog: the reindex path's
    delete-old-postings step, IndexingService.java:152, promoted to a
    first-class operation — takedowns/opt-outs at corpus scale).

    Appends tombstone meta rows (deleted=True) tagged with `run_id`;
    doc-level last-wins makes the tombstone authoritative at the next
    refresh_and_repack, which drops the docs' postings and meta and
    re-aggregates stats exactly. Until then queries still see the doc
    (documented staleness window, same as delta-run stats). A doc
    re-landed by a LATER delta run supersedes its tombstone; a
    tombstone TIED with a live run wins (deleted-wins tie-break in the
    meta resolution), so passing run_id >= the doc's latest run always
    deletes. Returns the number of tombstones written (ids not in the
    index are no-ops)."""
    from .manifest import fs_exists

    def _tcol(df):
        col = F.col("title") if "title" in df.columns else F.lit(None)
        return col.cast("string").alias("title")

    ids = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    base_meta = spark.read.parquet(f"{index_base}/idx/doc_stats")
    meta = base_meta.select("doc_id", "url", "site", _tcol(base_meta))
    # docs landed by un-refreshed deltas are deletable too; explicit
    # existence check — a read failure on an existing dir must
    # propagate, not silently no-op the deletions
    delta_path = f"{index_base}/idx/doc_meta_runs"
    if fs_exists(spark, delta_path):
        raw = spark.read.parquet(delta_path)
        meta = meta.unionByName(
            raw.select("doc_id", "url", "site", _tcol(raw))
        )
    known = meta.dropDuplicates(["doc_id"]).join(F.broadcast(ids), "doc_id")
    rows = known.select(
        "doc_id", "url", "site", "title",
        F.lit(0).cast("long").alias("doclen"),
        F.lit(run_id).cast("int").alias("run_id"),
        F.lit(True).alias("deleted"),
    ).persist()  # count + write = two actions; one metadata scan
    try:
        n = rows.count()
        if n:
            rows.write.mode("append").parquet(
                f"{index_base}/idx/doc_meta_runs"
            )
    finally:
        rows.unpersist()
    return n


def merge_runs(segments: DataFrame, n_docs: int, avgdl: float, run_id: int = 0) -> DataFrame:
    """Multi-pass sorted posting merge (north rule): k-way merge all
    runs of each (term, shard) into a single fresh run. Incremental
    builds append runs with increasing run_id. NOTE: compaction no
    longer calls this — scripts/compact.py runs
    index.refresh.refresh_and_repack (DOC-level supersede + exact
    stats); this kernel remains the (term, shard)-level read-time
    merge semantics only.
    Later runs win on duplicate doc_id (upsert semantics, I1)."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("run_id")
        parts = []
        for _, row in pdf.iterrows():
            ids, tfs, dls = unpack_segment(row)
            parts.append(
                pd.DataFrame(
                    {"doc_id": ids, "tf": tfs, "doclen": dls,
                     "run_id": row["run_id"]}
                )
            )
        allp = pd.concat(parts, ignore_index=True)
        # last run wins per doc_id (MERGE/upsert)
        allp = allp.sort_values(["doc_id", "run_id"]).drop_duplicates(
            "doc_id", keep="last"
        )
        allp["term"] = pdf["term"].iloc[0]
        allp["shard"] = pdf["shard"].iloc[0]
        # df from the HIGHEST run deterministically (after sort) - an
        # arbitrary row could pick a delta run's fillna(1) placeholder
        # over the base-exact df and change block-max scores run-to-run
        allp["df"] = pdf["df"].iloc[-1]
        return _pack_group(allp, n_docs, avgdl, run_id)

    return segments.groupBy("term", "shard").applyInPandas(
        _merge, schema=INDEX_SEGMENTS_SCHEMA
    )
