"""Watermarked windowed aggregation: the streaming (file-source,
append-mode) result over the events table must equal the batch
GROUP BY oracle, with late-data semantics bounded by the watermark."""

import datetime as dt

from pyspark.sql import functions as F

from searchengine_spark.streaming.windows import (
    start_windowed_stream,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.01"


def _batch_oracle(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            F.col("event_type").alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).alias(
                "value_cents"
            ),
        )
        .collect()
    )


def _canon(rows):
    return sorted(
        (r["window_start"], r["key"], r["n"], r["value_cents"]) for r in rows
    )


def test_batch_equals_groupby_oracle(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got = windowed_counts(ev).drop("window_end").collect()
    assert _canon(got) == _canon(_batch_oracle(spark))


def test_streaming_append_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "agg_out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.write.mode("overwrite").parquet(src)
    # a final event far past every window end advances the watermark so
    # append mode can emit all real windows
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [(10**9, max_ts + dt.timedelta(days=2), 0, "__flush__", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    flush.write.mode("append").parquet(src)

    q = start_windowed_stream(spark, src, out, ckpt, available_now=True)
    q.awaitTermination(180)

    got = spark.read.parquet(out).filter(F.col("key") != "__flush__")
    assert _canon(got.drop("window_end").collect()) == _canon(
        _batch_oracle(spark)
    )
