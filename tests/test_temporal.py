"""As-of and range joins (operators/temporal.py): boundary semantics
on constructed frames. Cross-engine value identity is covered by the
q_asof_join / q_range_join DuckDB-oracle entries."""

from __future__ import annotations

import datetime as dt

from searchengine_spark.operators.temporal import (
    asof_join_events,
    range_join_counts,
)

BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_offset, value)."""
    data = [
        (eid, BASE + dt.timedelta(seconds=s), uid, et, float(v), "{}")
        for eid, uid, et, s, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )


def test_asof_strictly_prior(spark):
    ev = _events(
        spark,
        [
            (1, 7, "purchase", 0, 1.00),   # prior
            (2, 7, "purchase", 10, 2.00),  # most recent prior for eid=4
            (3, 7, "purchase", 20, 3.00),  # EQUAL ts to the click → excluded
            (4, 7, "click", 20, 0.0),
            (5, 7, "click", 5, 0.0),       # only eid=1 is prior
            (6, 8, "click", 50, 0.0),      # user with no purchases → null
        ],
    )
    got = {
        r["event_id"]: r["prior_cents"]
        for r in asof_join_events(ev, "click", "purchase").collect()
    }
    assert got == {4: 200, 5: 100, 6: None}


def test_range_join_boundaries(spark):
    ev = _events(
        spark,
        [
            (1, 7, "click", 0, 0.0),
            (2, 7, "view", 0, 1.00),     # not > t → excluded
            (3, 7, "view", 1, 2.00),     # in (t, t+300]
            (4, 7, "view", 300, 3.00),   # == t+300 → included
            (5, 7, "view", 301, 4.00),   # > t+300 → excluded
            (6, 8, "click", 0, 0.0),     # no views → (0, 0)
            # window spanning a bin boundary: click at 299s, views in
            # the NEXT 300s bin must still match
            (7, 9, "click", 299, 0.0),
            (8, 9, "view", 550, 5.00),
        ],
    )
    got = {
        r["event_id"]: (r["n_follow"], r["follow_cents"])
        for r in range_join_counts(ev, "click", "view", window_s=300).collect()
    }
    assert got == {1: (2, 500), 6: (0, 0), 7: (1, 500)}


def test_asof_tied_right_timestamps_deterministic(spark):
    """Duplicate right-side (user, ts): the max-cents pre-aggregation
    makes 'the most recent prior' well-defined on both engines."""
    ev = _events(
        spark,
        [
            (1, 7, "purchase", 10, 1.00),
            (2, 7, "purchase", 10, 9.00),  # tied ts → max wins
            (3, 7, "click", 20, 0.0),
        ],
    )
    got = asof_join_events(ev, "click", "purchase").collect()
    assert got[0]["prior_cents"] == 900
