"""Event-stream operators: tumbling window agg, gap sessionization, as-of
join — hand-computed expectations on a small constructed stream."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

US = 1_000_000
MIN = 60 * US
BASE = 1_700_000_000 * US  # arbitrary epoch anchor


@pytest.fixture(scope="module")
def events_ds():
    # user 1: events at t=0, 10min (click), 50min  -> 30min gap splits 2|1
    # user 2: single event at t=5min (click)
    rows = [
        (0, BASE + 0 * MIN, 1, "view", 10.00),
        (1, BASE + 10 * MIN, 1, "click", 5.25),
        (2, BASE + 50 * MIN, 1, "view", 1.50),
        (3, BASE + 5 * MIN, 2, "click", 2.00),
        (4, BASE + 65 * MIN, 1, "view", 3.00),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(t)


def test_window_agg(events_ds):
    from elasticsearch_ray.ops.events import window_agg

    out = {
        (r["window_us"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in window_agg(events_ds, window_minutes=60).take_all()
    }
    HOUR = 60 * MIN
    w0 = (BASE // HOUR) * HOUR
    w1 = ((BASE + 50 * MIN) // HOUR) * HOUR
    # BASE sits 800s into its hour, so +50min and +65min roll into w1
    assert w1 == w0 + HOUR
    assert out[(w0, "view")] == (1, 1000)
    assert out[(w0, "click")] == (2, 525 + 200)
    assert out[(w1, "view")] == (2, 150 + 300)
    assert len(out) == 3


def test_sessionize(events_ds):
    from elasticsearch_ray.ops.events import sessionize

    out = sorted(
        (
            (r["user_id"], r["session_seq"], r["n_events"], r["start_us"], r["end_us"])
            for r in sessionize(events_ds, gap_minutes=30).take_all()
        )
    )
    assert out == [
        (1, 1, 2, BASE, BASE + 10 * MIN),
        (1, 2, 2, BASE + 50 * MIN, BASE + 65 * MIN),
        (2, 1, 1, BASE + 5 * MIN, BASE + 5 * MIN),
    ]


def test_range_join_events_to_sessions(events_ds):
    from elasticsearch_ray.ops.events import range_join, sessionize

    sess = sessionize(events_ds, gap_minutes=30)

    def prep(b):
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts_us": b.column("ts").cast(pa.int64()),
                "event_id": b.column("event_id"),
            }
        )

    left = events_ds.map_batches(prep, batch_format="pyarrow")
    out = {
        r["event_id"]: r["session_seq"]
        for r in range_join(
            left, sess, key_col="user_id", value_col="ts_us",
            lo_col="start_us", hi_col="end_us",
            left_id="event_id", right_id="session_seq",
        ).take_all()
    }
    # user 1 sessions: [0,10min] seq1, [50,65min] seq2; user 2: seq1
    assert out == {0: 1, 1: 1, 2: 2, 4: 2, 3: 1}


def test_asof_join(events_ds):
    from elasticsearch_ray.ops.events import asof_join

    out = {
        r["event_id"]: (r["ref_event_id"], r["lag_us"])
        for r in asof_join(events_ds, ref_type="click").take_all()
    }
    assert out[0] == (-1, -1)  # before any click
    assert out[1] == (1, 0)  # a click matches itself (inclusive)
    assert out[2] == (1, 40 * MIN)
    assert out[4] == (1, 55 * MIN)
    assert out[3] == (3, 0)  # user 2's click
