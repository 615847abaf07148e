#!/usr/bin/env python
"""spark-submit entry point: resumable packed-index build.

Cluster usage (north rule: "ships via spark-submit --py-files to
multi-executor clusters"):

    cd /root/repo && zip -r /tmp/engine.zip searchengine_spark
    spark-submit --master <yarn|k8s|spark://...> \
        --py-files /tmp/engine.zip \
        scripts/build_index.py --input <docs parquet/Iceberg path> \
        --output <build root> [--n-groups 64] [--resume]

Sandbox usage (local[N]):

    python scripts/build_index.py --synthetic 20000 --output /tmp/idx

The build is idempotent and resumable: re-running with the same
--output skips shard groups already recorded 'done' in
<output>/build_manifest (see searchengine_spark/index/manifest.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="docs parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of --input")
    ap.add_argument("--output", required=True, help="build root directory")
    ap.add_argument("--n-groups", type=int, default=8)
    ap.add_argument("--n-shards", type=int, default=0)
    ap.add_argument("--use-html", action="store_true", default=True,
                    help="extract text from the html column (default)")
    ap.add_argument("--fail-after-group", type=int, default=None,
                    help="inject a crash (for resume testing)")
    ap.add_argument("--positional", action="store_true",
                    help="also build positional runs (<output>/possegs)"
                         " for phrase/proximity queries")
    ap.add_argument("--static-rank", action="store_true",
                    help="also build the PageRank static-rank table"
                         " (<output>/staticrank) for blended ranking")
    ap.add_argument("--pr-iters", type=int, default=3)
    ap.add_argument("--anchors", type=int, default=0, metavar="W",
                    help="index inbound anchor text with weight W"
                         " (virtual-document model; 0 = off)")
    args = ap.parse_args()

    from searchengine_spark.index.manifest import build_packed_resumable
    from searchengine_spark.operators.postings import materialize_index
    from searchengine_spark.operators.search import corpus_constants
    from searchengine_spark.session import get_spark
    from searchengine_spark.sources.corpus import corpus_df

    spark = get_spark("build_index")
    t0 = time.time()
    if args.synthetic:
        docs = corpus_df(spark, args.synthetic)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    prepared = None
    if args.anchors:
        from searchengine_spark.operators.linkgraph import (
            prepared_with_anchors,
        )

        prepared = prepared_with_anchors(
            docs, weight=args.anchors, use_html=args.use_html
        )
    idx = materialize_index(spark, docs, f"{args.output}/idx",
                            use_html=args.use_html, prepared=prepared)
    n_docs, avgdl = corpus_constants(idx.doc_stats)
    build_packed_resumable(
        spark, idx, args.output, n_docs, avgdl,
        n_shards=args.n_shards or None, n_groups=args.n_groups,
        fail_after_group=args.fail_after_group,
    )
    if args.positional:
        from searchengine_spark.index.positional import (
            build_positional_segments,
            write_positional_segments,
        )
        from searchengine_spark.index.segments import n_shards_for
        from searchengine_spark.operators.postings import prepare_docs

        prepared = prepare_docs(docs, use_html=args.use_html).select(
            "doc_id", "lemmas"
        )
        par = spark.sparkContext.defaultParallelism
        shards = args.n_shards or n_shards_for(
            n_docs, min_parallelism=par
        )
        write_positional_segments(
            build_positional_segments(prepared, shards),
            f"{args.output}/possegs",
        )
    if args.static_rank:
        from searchengine_spark.operators.linkgraph import (
            build_static_rank,
            write_static_rank,
        )

        write_static_rank(
            build_static_rank(docs, n_iter=args.pr_iters), args.output
        )
    dt = time.time() - t0
    print(f"built index for {n_docs} docs in {dt:.1f}s "
          f"({n_docs / dt:.1f} docs/sec) at {args.output}")


if __name__ == "__main__":
    main()
