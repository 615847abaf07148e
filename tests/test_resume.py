"""Kill/resume test (SURVEY.md §5.2 item 6): crash the checkpointed
packed-index build mid-way, restart, and assert (a) completed groups
are skipped, (b) the final segments equal a non-checkpointed build,
(c) the manifest has exactly one 'done' row per group with sane
metrics."""

import numpy as np
import pytest

from searchengine_spark.index.manifest import (
    build_packed_resumable,
    completed_groups,
    read_manifest,
)
from searchengine_spark.index.segments import build_segments
from searchengine_spark.operators.postings import build_index
from searchengine_spark.operators.search import corpus_constants
from searchengine_spark.sources.corpus import corpus_df

N_DOCS = 300
N_SHARDS = 8
N_GROUPS = 4


@pytest.fixture(scope="module")
def index(spark):
    idx = build_index(corpus_df(spark, N_DOCS), use_html=True)
    idx.postings.cache().count()
    idx.term_stats.cache().count()
    idx.doc_stats.cache().count()
    return idx


def _canon_segments(df):
    rows = df.select(
        "term", "shard", "n_docs", "df", "doc_ids", "tfs", "doclens"
    ).collect()
    return sorted(
        (r["term"], r["shard"], r["n_docs"], r["df"],
         bytes(r["doc_ids"]).hex(), bytes(r["tfs"]).hex(),
         bytes(r["doclens"]).hex())
        for r in rows
    )


def test_kill_resume_identical_index(spark, tmp_path):
    idx = build_index(corpus_df(spark, N_DOCS), use_html=True)
    n, avgdl = corpus_constants(idx.doc_stats)
    base = str(tmp_path / "build")

    # pass 1: crash after group 1
    with pytest.raises(RuntimeError, match="injected failure"):
        build_packed_resumable(
            spark, idx, base, n, avgdl, n_shards=N_SHARDS,
            n_groups=N_GROUPS, fail_after_group=1,
        )
    done = completed_groups(spark, base, "pack_segments")
    assert done == {0, 1}

    # pass 2: resume — only groups 2..3 rebuild
    segs = build_packed_resumable(
        spark, idx, base, n, avgdl, n_shards=N_SHARDS, n_groups=N_GROUPS
    )

    manifest = read_manifest(spark, base)
    rows = manifest.filter(manifest.status == "done").collect()
    assert sorted(r["group_id"] for r in rows) == list(range(N_GROUPS))
    assert all(r["n_segments"] > 0 for r in rows)
    assert all(r["n_postings"] > 0 for r in rows)
    assert all(r["bytes_written"] > 0 for r in rows)
    assert all(r["finished_at"] >= r["started_at"] for r in rows)

    # identical to a one-shot build
    oneshot = build_segments(idx, n, avgdl, n_shards=N_SHARDS)
    assert _canon_segments(segs) == _canon_segments(oneshot)

    # total postings accounted for exactly once
    total = sum(r["n_postings"] for r in rows)
    assert total == idx.postings.count()


def test_resume_is_noop_when_complete(spark, tmp_path, index):
    n, avgdl = corpus_constants(index.doc_stats)
    base = str(tmp_path / "b2")
    build_packed_resumable(
        spark, index, base, n, avgdl, n_shards=N_SHARDS, n_groups=N_GROUPS
    )
    m1 = read_manifest(spark, base).count()
    build_packed_resumable(
        spark, index, base, n, avgdl, n_shards=N_SHARDS, n_groups=N_GROUPS
    )
    m2 = read_manifest(spark, base).count()
    assert m1 == m2 == N_GROUPS


def test_read_manifest_resolves_uri_paths(spark, index, tmp_path):
    """ADVICE r2: manifest existence must resolve through the Hadoop
    FileSystem API — a file:-scheme base (any URI base) with a real
    manifest must NOT read as empty, or the shard-mapping resume guard
    is silently bypassed exactly where clusters run."""
    n, avgdl = corpus_constants(index.doc_stats)
    base = str(tmp_path / "uri_build")
    build_packed_resumable(
        spark, index, base, n, avgdl, n_shards=N_SHARDS, n_groups=2,
    )
    plain = read_manifest(spark, base)
    via_uri = read_manifest(spark, f"file:{base}")
    assert plain.count() == via_uri.count() > 0
    # and a genuinely absent URI base still reads as empty, not an error
    assert read_manifest(spark, f"file:{tmp_path}/nope").count() == 0
