#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: ≥0.8 throughput
scaling efficiency between N and 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] and local[32] — on the SAME pre-generated
input, each in a fresh process (fresh JVM, core count enforced by the
local master). Reported:

    efficiency = (T_8 / T_32) / (32 / 8)

i.e. the fraction of ideal 4× speedup achieved. Session startup is
excluded; corpus generation is excluded (input is shared); the measured
job is extract→tokenize→index→pack (build) and the BM25 WAND query set
(query).

    python scripts/scaling.py [--docs 40000] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(cores: int, docs_path: str) -> None:
    """Runs in a fresh process: measured build + query at local[cores]."""
    sys.path.insert(0, REPO)
    from searchengine_spark.index.segments import build_segments, write_segments
    from searchengine_spark.index.wand import search_packed
    from searchengine_spark.operators.postings import (
        build_index, read_index, write_index,
    )
    from searchengine_spark.operators.search import corpus_constants
    from searchengine_spark.session import get_spark
    from tests.queries import QUERIES

    spark = get_spark(f"scale{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
    docs = spark.read.parquet(docs_path)
    n_web = docs.count()  # warm the scan; excluded from timing

    with tempfile.TemporaryDirectory(prefix=f"scale{cores}_") as tmp:
        t0 = time.monotonic()
        idx = build_index(docs, use_html=True)
        write_index(idx, f"{tmp}/idx")
        idx = read_index(spark, f"{tmp}/idx")
        n_docs, avgdl = corpus_constants(idx.doc_stats)
        segs = build_segments(idx, n_docs, avgdl)
        write_segments(segs, f"{tmp}/segments")
        t_build = time.monotonic() - t0

        segments = spark.read.parquet(f"{tmp}/segments").cache()
        segments.count()
        lat = []
        t0 = time.monotonic()
        for _, qtext, site, offset, limit, mode, conj in QUERIES:
            if mode != "bm25" or site is not None or offset:
                continue
            tq = time.monotonic()
            search_packed(spark, segments, idx.term_stats, n_docs, avgdl,
                          qtext, k=limit, conjunctive=conj).collect()
            lat.append(time.monotonic() - tq)
        t_query = time.monotonic() - t0

    print(json.dumps({
        "cores": cores, "n_docs": n_web, "t_build": round(t_build, 3),
        "build_docs_per_sec": round(n_web / t_build, 1),
        "t_query": round(t_query, 3), "n_queries": len(lat),
        "query_p95": round(sorted(lat)[int(0.95 * (len(lat) - 1))], 4),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--cores", type=int, default=None,
                    help="(internal) run the worker at this core count")
    ap.add_argument("--docs-path", default=None)
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cores:
        worker(args.cores, args.docs_path)
        return

    # parent: generate the shared input once, then one fresh process per level
    sys.path.insert(0, REPO)
    tmp = tempfile.mkdtemp(prefix="scaling_corpus_")
    docs_path = f"{tmp}/docs"
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.corpus import write_corpus

    spark = get_spark("scaling_gen")
    write_corpus(spark, args.docs, docs_path)
    spark.stop()

    levels = [int(x) for x in args.levels.split(",")]
    results = {}
    for cores in levels:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cores", str(cores), "--docs-path", docs_path],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(p.stdout, p.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"worker local[{cores}] failed")
        results[cores] = json.loads(line[-1])

    lo, hi = min(levels), max(levels)
    ideal = hi / lo
    eff_build = (results[lo]["t_build"] / results[hi]["t_build"]) / ideal
    eff_query = (results[lo]["t_query"] / results[hi]["t_query"]) / ideal
    out = {
        "docs": args.docs,
        "levels": results,
        "ideal_speedup": ideal,
        "build_speedup": round(results[lo]["t_build"] / results[hi]["t_build"], 3),
        "build_scaling_efficiency": round(eff_build, 3),
        "query_speedup": round(results[lo]["t_query"] / results[hi]["t_query"], 3),
        "query_scaling_efficiency": round(eff_query, 3),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
