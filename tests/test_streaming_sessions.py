"""Stateful streaming sessionization (applyInPandasWithState):
gap-closed sessions emit in-batch; the final open session of each
user closes by event-time timeout once the watermark passes; counts
match the batch sessionization oracle."""

import datetime as dt

from pyspark.sql import functions as F

from searchengine_spark.streaming.sessions import sessionize_stream

GAP_S = 1800
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _mk_events():
    """Users 1..3: multiple gap-separated sessions, all ending on day 1.
    User 50: one event on day 3 (keeps a session open at stream end).
    Sentinel user 99 on day 13 lands in a SECOND file → second
    micro-batch, whose start-of-batch watermark (from batch 1's max ts,
    day 3) fires the timeouts for users 1..3."""
    rows = []
    eid = 0

    def add(user, minutes):
        nonlocal eid
        rows.append((eid, T0 + dt.timedelta(minutes=minutes), user, 1.0))
        eid += 1

    for user in (1, 2, 3):
        base = user * 10
        # session A: 3 events 5 min apart
        for m in (base, base + 5, base + 10):
            add(user, m)
        # gap > 30 min → session B: 2 events
        for m in (base + 60, base + 70):
            add(user, m)
        if user == 3:
            # third session, single event
            add(user, base + 150)
    add(50, 3 * 24 * 60)  # day 3
    flush = [(eid, T0 + dt.timedelta(days=13), 99, 0.0)]
    return rows, flush


def test_stateful_sessionization(spark, tmp_path):
    src = str(tmp_path / "events_in")
    out = str(tmp_path / "sessions_out")
    ckpt = str(tmp_path / "ckpt")
    rows, flush = _mk_events()
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(flush, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP_S)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    by_user: dict[int, list] = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)

    # users 1..3 fully sessionized (gap-closed + timeout-closed final)
    assert sorted(len(v) for u, v in by_user.items() if u in (1, 2, 3)) == [2, 2, 3]
    # session event counts as constructed
    u1 = sorted(by_user[1], key=lambda r: r["session_start"])
    assert [r["n_events"] for r in u1] == [3, 2]
    u3 = sorted(by_user[3], key=lambda r: r["session_start"])
    assert [r["n_events"] for r in u3] == [3, 2, 1]
    # duration of the first session = 10 minutes
    assert (u1[0]["session_end"] - u1[0]["session_start"]) == dt.timedelta(
        minutes=10
    )
    # user 50's lone session closes by timeout once batch 2's watermark
    # (day 13 − 30 min) passes it
    assert [r["n_events"] for r in by_user[50]] == [1]
    # the sentinel user's session stays open — the watermark never
    # passes the stream's latest event
    assert 99 not in by_user
