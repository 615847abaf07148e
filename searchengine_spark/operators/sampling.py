"""Dataset assembly operators for training pipelines: deterministic
splits, stratified samples, and sequence packing.

A pretraining pipeline ends by turning the cleaned corpus into actual
training inputs; these are the three operations that step needs, each
expressed scale-first and each reproducible bit-for-bit by a DuckDB
oracle (all randomness is the shared md5-derived h32 hash —
functions/hashing.py — so "random" choices are pure functions of the
data):

  hash_split         — train/val/test assignment by hashed id against
                       fixed integer thresholds. Map-only: no shuffle,
                       no state, stable under corpus growth (a doc's
                       split never changes when other docs arrive —
                       the property per-split row_number sampling
                       lacks).
  stratified_sample  — n docs per stratum, chosen as the n smallest
                       (h32(id), id) pairs per group. Same bounded
                       per-partition-heap shape as sketches.kmv_distinct:
                       every partition emits ≤ groups·n candidates, the
                       merge sees ≤ partitions·n rows per group — no
                       per-group window, no billion-row reducer.
  pack_sequences     — concatenate docs in a deterministic order and
                       cut into fixed token-budget context windows:
                       chunk_id = floor(global_token_offset / budget).
                       The global running offset is a DISTRIBUTED
                       PREFIX SUM (ordered range buckets → per-bucket
                       local cumsum → driver-side bucket offsets, P
                       scalars → map-side add), never a global
                       single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h32

H_SPACE = 1 << 32  # h32 range


def split_thresholds(weights: list[tuple[str, float]]) -> list[tuple[str, int]]:
    """(name, weight) list → (name, exclusive upper hash bound) with
    exact integer bounds on the h32 space; the last split absorbs the
    rounding remainder. Shared with the oracle so both engines compare
    against identical literals."""
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for i, (name, w) in enumerate(weights):
        acc += w
        hi = H_SPACE if i == len(weights) - 1 else int(acc * H_SPACE)
        bounds.append((name, hi))
    return bounds


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: list[tuple[str, float]],
) -> DataFrame:
    """(…, split): deterministic split assignment — h32(id) landed in
    fixed integer intervals of the hash space. Map-only (the split
    column is a pure function of the id), so membership is stable under
    any growth, reordering, or partitioning of the corpus."""
    bounds = split_thresholds(weights)
    h = h32(F.col(id_col).cast("string"))
    expr = F.lit(bounds[-1][0])
    for name, hi in reversed(bounds[:-1]):
        expr = F.when(h < hi, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """(group, id, h): a deterministic n-per-group sample — the n
    smallest (h32(id), id) pairs of each group. The hash makes the
    choice pseudo-random; the (h, id) total order makes it unique.

    Plan: one shuffle on group (the merge); before it, a bounded
    per-partition partial keeps only each group's n best candidates per
    partition (mapInPandas heap — the kmv_distinct shape), so no
    reducer ever sees a group's full membership."""
    import numpy as np
    import pandas as pd

    grp_type = df.schema[group_col].dataType.simpleString()
    id_type = df.schema[id_col].dataType.simpleString()
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("sid"),
        h32(F.col(id_col).cast("string")).alias("h"),
    )

    def _partial(batches):
        best: dict = {}
        for pdf in batches:
            for g, sub in pdf.groupby("grp", sort=False, dropna=False):
                cand = np.rec.fromarrays(
                    [sub["h"].to_numpy(), sub["sid"].to_numpy()],
                    names="h,sid",
                )
                cur = best.get(g)
                allc = cand if cur is None else np.concatenate([cur, cand])
                allc.sort(order=("h", "sid"))
                best[g] = allc[:n]
        if best:
            keys = list(best)
            yield pd.DataFrame(
                {
                    "grp": keys,
                    "cand": [
                        [(int(r.h), r.sid.item() if hasattr(r.sid, "item")
                          else r.sid) for r in best[g]]
                        for g in keys
                    ],
                }
            )

    partial = base.mapInPandas(
        _partial,
        schema=(
            f"grp {grp_type}, "
            f"cand array<struct<h: long, sid: {id_type}>>"
        ),
    )
    # merge ≤ partitions·n candidates per group; array_sort on structs
    # orders by (h, sid) — the same total order the partial used
    merged = partial.groupBy("grp").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("cand"))), 1, n
        ).alias("top")
    )
    return merged.select(
        F.col("grp").alias(group_col),
        F.explode("top").alias("e"),
    ).select(
        group_col,
        F.col("e.sid").alias(id_col),
        F.col("e.h").alias("h"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_buckets: int = 64,
) -> DataFrame:
    """(id, n_tokens, global_start, chunk_id): concatenate docs in
    ascending id order and cut the stream into `budget`-token context
    windows; a doc belongs to the window its FIRST token falls in
    (chunk_id = floor(global_start / budget)).

    The global running offset is computed as a distributed prefix sum:

      1. ordered buckets: bucket = floor(id / ceil((max_id+1)/B)) — a
         deterministic range partitioning derived from one metadata
         agg (no sampled RangePartitioner: resilient to re-runs);
      2. per-bucket local cumsum inside applyInPandas (each kernel
         sorts and scans only its bucket);
      3. bucket base offsets = the B per-bucket totals, collected to
         the driver (B scalars) and added back map-side.

    Never a global Window.orderBy — the single-partition running-total
    plan dies at corpus scale. The oracle IS that global window (DuckDB
    scans one node anyway), which checks the distributed formulation
    against the sequential spec exactly."""
    import pandas as pd

    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("sid").cast("long"),
        F.col(tokens_col).alias("n_tokens").cast("long"),
    )
    lo_hi = base.agg(
        F.min("sid").alias("lo"), F.max("sid").alias("hi")
    ).collect()[0]
    if lo_hi["lo"] is None:
        return spark.createDataFrame(
            [], f"{id_col} long, n_tokens long, global_start long, chunk_id long"
        )
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    width = max(1, -(-(hi - lo + 1) // n_buckets))
    # exact integer division in DECIMAL(38,0): ids can be
    # xxhash64-sized, so (sid - lo) overflows int64 when the id range
    # spans more than 2^63 (ANSI mode raises) and float division would
    # reintroduce boundary rounding; decimal holds the full range
    bucketed = base.withColumn(
        "bucket",
        F.expr(
            f"cast((cast(sid as decimal(38,0)) "
            f"- cast('{lo}' as decimal(38,0))) div {width} as bigint)"
        ),
    )

    # per-bucket totals → base offsets (B scalars on the driver)
    totals = {
        int(r["bucket"]): int(r["s"])
        for r in bucketed.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    offsets = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b]

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("sid")
        csum = pdf["n_tokens"].cumsum()
        start = offsets[int(pdf["bucket"].iloc[0])] + csum - pdf["n_tokens"]
        return pd.DataFrame(
            {
                "sid": pdf["sid"],
                "n_tokens": pdf["n_tokens"],
                "global_start": start,
                "chunk_id": start // budget,
            }
        )

    out = bucketed.groupBy("bucket").applyInPandas(
        _local,
        schema="sid long, n_tokens long, global_start long, chunk_id long",
    )
    return out.withColumnRenamed("sid", id_col)


def mixture_params(w: float) -> tuple[int, int]:
    """weight → (whole copies, exclusive h32 bound for the fractional
    extra copy). Shared with the oracle so both engines compare the
    hash against the identical integer literal."""
    whole = int(w)
    return whole, int((w - whole) * H_SPACE)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, group, copy): deterministic mixture reweighting — the data
    -mixing step that turns a cleaned corpus into a training mixture
    (e.g. en×2.5, es×0.25). A doc in group g appears floor(w_g) times,
    plus one more iff h32(id ∥ '#mix') lands under the fractional
    remainder's integer bound, giving E[copies] = w_g exactly while
    every choice stays a pure function of the doc id:

      * epoch-stable and growth-stable (a doc's copy count never
        changes when other docs arrive) — the property sampleBy /
        rand()-based resampling lacks;
      * map-only: weight lookup is a literal CASE over group values,
        duplication is an in-row sequence explode — NO shuffle at any
        size; downsampling (w<1) is a pushdown-friendly filter.
      * '#mix' salt decorrelates the fractional choice from
        hash_split's h32(id) so split assignment and mixture
        membership are independent.

    Groups absent from `weights` get weight 0 (dropped) — mixtures are
    explicit, silence is not a pass-through."""
    gc = F.col(group_col)
    whole = F.lit(0)
    fbound = F.lit(0)
    for g, w in sorted(weights.items()):
        wh, fb = mixture_params(w)
        whole = F.when(gc == g, F.lit(wh)).otherwise(whole)
        fbound = F.when(gc == g, F.lit(fb)).otherwise(fbound)
    h = h32(F.concat(F.col(id_col).cast("string"), F.lit("#mix")))
    n = (whole + F.when(h < fbound, 1).otherwise(0)).alias("n")
    return (
        df.select(
            F.col(id_col), gc.alias(group_col), n,
        )
        .filter(F.col("n") > 0)
        .select(
            id_col, group_col,
            F.explode(F.sequence(F.lit(0), F.col("n") - 1)).alias("copy"),
        )
        .withColumn("copy", F.col("copy").cast("long"))
    )
