#!/usr/bin/env python
"""spark-submit entry point: compact accumulated segment runs.

Incremental ingestion (streaming/ingest.py or scripts/build_index.py
deltas) appends one run per batch; queries merge runs at read time
(last-run-wins), which costs decode work proportional to run count.
This maintenance pass k-way merges every (term, shard)'s runs into a
single fresh run (index/segments.py:merge_runs) and atomically swaps
the segments directory.

    python scripts/compact.py --index <build root> [--run-id N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--run-id", type=int, default=None,
                    help="run id for the compacted output (default max+1)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from searchengine_spark.index.segments import merge_runs
    from searchengine_spark.operators.postings import read_index
    from searchengine_spark.operators.search import corpus_constants
    from searchengine_spark.session import get_spark

    spark = get_spark("compact")
    idx = read_index(spark, f"{args.index}/idx")
    n_docs, avgdl = corpus_constants(idx.doc_stats)
    seg_path = f"{args.index}/segments"
    segments = spark.read.parquet(seg_path)
    n_runs = segments.select("run_id").distinct().count()
    if n_runs <= 1:
        print(f"nothing to compact ({n_runs} run)")
        return
    run_id = args.run_id
    if run_id is None:
        run_id = segments.agg(F.max("run_id")).collect()[0][0] + 1

    t0 = time.time()
    compacted = merge_runs(segments, n_docs, avgdl, run_id=run_id)
    tmp_path = f"{seg_path}.compacting"
    (
        compacted.repartition("shard")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(tmp_path)
    )
    # atomic-ish swap (rename); on object stores use a catalog pointer
    # or Iceberg snapshot replace instead
    old = f"{seg_path}.old"
    os.rename(seg_path, old)
    os.rename(tmp_path, seg_path)
    import shutil

    shutil.rmtree(old, ignore_errors=True)
    n_seg = spark.read.parquet(seg_path).count()
    print(f"compacted {n_runs} runs -> 1 ({n_seg} segments) "
          f"in {time.time() - t0:.1f}s at {seg_path}")


if __name__ == "__main__":
    main()
