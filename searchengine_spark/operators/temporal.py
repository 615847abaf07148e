"""Temporal joins Spark lacks as built-ins: as-of join and range join.

No reference analog (the reference has no event-time queries at all);
these are the two temporal operators a training-data/event pipeline
reaches for constantly, each expressed as the SCALABLE composition of
built-in DataFrame ops rather than a naive inequality join:

  * as-of join — "for each left event, the user's most recent strictly
    prior right event" — via the tagged-union + running-last-value
    window (the merge-join formulation): ONE shuffle on the key, each
    partition processed in time order; never a per-key cross product.
  * range join — "right events within (t, t+W] of each left event" —
    via time-bin bucketing: a W-sized window spans at most two W-bins,
    so joining on (key, bin) ∪ (key, bin+1) plus an exact range filter
    bounds the join fan-out to the events of two bins, independent of
    per-key history length.

All time arithmetic is exact integer epoch-microseconds and all money
is e4/cents fixed-point, so the DuckDB oracles (native ASOF JOIN and a
plain inequality join) match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col="ts"):
    # parquet ts is TIMESTAMP_NTZ; the session TZ is UTC so the cast is
    # the identity instant (matches DuckDB's naive epoch_us)
    return F.unix_micros(F.col(col).cast("timestamp"))


def _cents(col="value"):
    return F.floor(F.col(col) * F.lit(100.0) + F.lit(0.5)).cast("long")


def asof_join_events(
    events: DataFrame, left_type: str, right_type: str
) -> DataFrame:
    """(user_id, event_id, prior_cents): for each `left_type` event,
    the cents-value of the same user's most recent STRICTLY earlier
    `right_type` event (null when none exists).

    Tagged union + running last_value(ignorenulls) over
    (ts, tag)-ordered rows: left rows sort BEFORE right rows at equal
    timestamps, so an equal-time right event is excluded (strict <).
    The right side is pre-aggregated to unique (user, ts) keys
    (max cents on a tie) — with duplicate timestamps, 'the most recent
    prior event' is otherwise ill-defined and every engine (this
    window, DuckDB's ASOF JOIN) would pick its own arbitrary row."""
    x = events.filter(F.col("event_type") == left_type).select(
        "user_id",
        "event_id",
        _us().alias("us"),
        F.lit(None).cast("long").alias("y_cents"),
        F.lit(0).alias("tag"),
    )
    y = (
        events.filter(F.col("event_type") == right_type)
        .select("user_id", _us().alias("us"), _cents().alias("c"))
        .groupBy("user_id", "us")
        .agg(F.max("c").alias("y_cents"))
        .select(
            "user_id",
            F.lit(None).cast("long").alias("event_id"),
            "us",
            "y_cents",
            F.lit(1).alias("tag"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "tag")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        x.unionByName(y)
        .withColumn("prior_cents", F.last("y_cents", ignorenulls=True).over(w))
        .filter(F.col("tag") == 0)
        .select("user_id", "event_id", "prior_cents")
    )


def range_join_counts(
    events: DataFrame,
    left_type: str,
    right_type: str,
    window_s: int = 300,
) -> DataFrame:
    """(user_id, event_id, n_follow, follow_cents): count and exact
    cents-sum of the same user's `right_type` events within
    (t, t + window_s] of each `left_type` event; zero-match left
    events kept with (0, 0).

    Bin-bucketed: right events land in floor(us/W) bins; a left
    event's window spans at most bins b and b+1, so the join carries
    each left row twice and each right row once — the fan-out is two
    bins of events per key, never the full per-key history."""
    w_us = int(window_s) * 1_000_000
    a = events.filter(F.col("event_type") == left_type).select(
        "user_id", "event_id", _us().alias("us")
    )
    b = events.filter(F.col("event_type") == right_type).select(
        "user_id", _us().alias("b_us"), _cents().alias("cents")
    )
    a2 = a.withColumn(
        "bin",
        F.explode(
            F.array(
                F.floor(F.col("us") / w_us),
                F.floor(F.col("us") / w_us) + 1,
            )
        ),
    )
    b2 = b.withColumn("bin", F.floor(F.col("b_us") / w_us))
    matched = (
        a2.join(b2, ["user_id", "bin"])
        .filter(
            (F.col("b_us") > F.col("us")) & (F.col("b_us") <= F.col("us") + w_us)
        )
        .groupBy("user_id", "event_id")
        .agg(
            F.count(F.lit(1)).alias("n_follow"),
            F.sum("cents").alias("follow_cents"),
        )
    )
    return (
        a.select("user_id", "event_id")
        .join(matched, ["user_id", "event_id"], "left")
        .fillna(0, subset=["n_follow", "follow_cents"])
    )
