"""Event-time windowed aggregation with watermarked late-data handling.

No reference analog (the reference has zero streaming — SURVEY §2.5,
§2.9); this is the training-pipeline operator a live crawl feed needs:
per-window ingest/quality metrics that tolerate late-arriving events.

Semantics: hourly tumbling windows keyed by an arbitrary column;
watermark `late_threshold` bounds state — events later than the
watermark are dropped, windows finalize (append mode emits once per
window) when the watermark passes window end. State size is
O(open windows × keys), independent of stream length — the property
that lets this run forever at crawl-feed rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    late_threshold: str = "30 minutes",
) -> DataFrame:
    """Streaming (or batch — same expression) windowed aggregate:
    (window_start, window_end, key, n, value_sum). On a streaming
    input the watermark enables append-mode finalization; on a batch
    input `withWatermark` is a no-op and the result equals the
    GROUP BY date_trunc oracle (q_events_hourly)."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(
            F.window(F.col(ts_col), window_len).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100.0).cast("long")).alias(
                "value_cents"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "n",
            "value_cents",
        )
    )


def start_windowed_stream(
    spark,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
    available_now: bool = True,
):
    """File-source streaming deployment of windowed_counts: append-mode
    parquet sink (each window row written exactly once after the
    watermark closes it)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_counts(stream)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("windowed-events")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
