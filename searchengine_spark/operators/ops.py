"""Operational surface: start/stop/status for index builds.

Reference analog (SURVEY §2.9 I2/I3): GET /api/startIndexing spawns the
indexing thread, GET /api/stopIndexing flips an AtomicBoolean and
shutdownNow()s the pool, the dashboard reads site.status rows
(services/IndexingService.java:55-69,97-119; IndexingTask.java:21-27;
StatisticsServiceImpl.java:29-78). Spark-first equivalents:

  * a build runs under a named job group → `cancel_build` maps to
    SparkContext.cancelJobGroup (tasks are interrupted cluster-wide);
  * because the build checkpoints per shard group
    (index.manifest.build_packed_resumable), a cancelled build resumes
    from the last completed group on restart — cancel is cheap, not
    destructive;
  * status/dashboard reads come from the build_manifest table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..index.manifest import read_manifest

BUILD_JOB_GROUP = "searchengine-build"


def run_cancellable(spark: SparkSession, fn, job_group: str = BUILD_JOB_GROUP,
                    description: str = "index build"):
    """Run `fn()` (any driver-side build function issuing Spark jobs)
    under a job group so it can be cancelled from another thread."""
    sc = spark.sparkContext
    sc.setJobGroup(job_group, description, interruptOnCancel=True)
    try:
        return fn()
    finally:
        sc.setJobGroup("", "")


def cancel_build(spark: SparkSession, job_group: str = BUILD_JOB_GROUP) -> None:
    """I2: stop a running build. Safe to call at any time; the next
    run resumes from the manifest (completed groups are skipped)."""
    spark.sparkContext.cancelJobGroup(job_group)


def build_status(spark: SparkSession, base: str):
    """I3/dashboard: per-stage progress + metric totals from the
    lineage manifest → list of rows (stage, n_done, n_groups,
    n_postings, bytes_written, started_at, finished_at)."""
    m = read_manifest(spark, base)
    return (
        m.filter(F.col("status") == "done")
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_done"),
            F.max("n_groups").alias("n_groups"),
            F.sum("n_postings").alias("n_postings"),
            F.sum("bytes_written").alias("bytes_written"),
            F.min("started_at").alias("started_at"),
            F.max("finished_at").alias("finished_at"),
        )
        # Str11: human-readable timestamps, reference format
        # yyyy-MM-dd HH:mm:ss (utils/SqlUtils.java:9)
        .withColumn(
            "started_fmt",
            F.date_format(
                F.timestamp_seconds("started_at"), "yyyy-MM-dd HH:mm:ss"
            ),
        )
        .withColumn(
            "finished_fmt",
            F.date_format(
                F.timestamp_seconds("finished_at"), "yyyy-MM-dd HH:mm:ss"
            ),
        )
        .collect()
    )
