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


def test_events_random_vs_python_reference():
    """Randomized stream vs brute-force Python references for all three
    keyed operators (ties, singleton users, ref-free users included)."""
    import random

    from elasticsearch_ray.ops.events import asof_join, range_join, sessionize

    rng = random.Random(7)
    n = 400
    rows = []
    for i in range(n):
        uid = rng.randint(1, 12)
        ts = BASE + rng.randint(0, 3_000) * 30 * US  # 30s grid -> ts ties happen
        et = rng.choice(["view", "click", "error"])
        rows.append((i, ts, uid, et))
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    GAP = 10 * 60 * US

    # --- sessionize reference ---
    by_user: dict[int, list[tuple]] = {}
    for i, ts, uid, et in rows:
        by_user.setdefault(uid, []).append((ts, i, et))
    exp_sessions = []
    for uid, evs in by_user.items():
        tss = sorted(ts for ts, _, _ in evs)
        seq, start, prev, cnt = 1, tss[0], tss[0], 1
        for ts in tss[1:]:
            if ts - prev > GAP:
                exp_sessions.append((uid, seq, cnt, start, prev))
                seq, start, cnt = seq + 1, ts, 0
            cnt += 1
            prev = ts
        exp_sessions.append((uid, seq, cnt, start, prev))
    got_sessions = sorted(
        (r["user_id"], r["session_seq"], r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(ds, gap_minutes=10).take_all()
    )
    assert got_sessions == sorted(exp_sessions)

    # --- asof reference (inclusive, max event_id on ts ties) ---
    exp_asof = {}
    for uid, evs in by_user.items():
        refs = sorted(((ts, i) for ts, i, et in evs if et == "click"))
        for ts, i, et in evs:
            cand = [(rts, ri) for rts, ri in refs if rts <= ts]
            if cand:
                rts, ri = max(cand)
                exp_asof[i] = (ri, ts - rts)
            else:
                exp_asof[i] = (-1, -1)
    got_asof = {
        r["event_id"]: (r["ref_event_id"], r["lag_us"])
        for r in asof_join(ds, ref_type="click").take_all()
    }
    assert got_asof == exp_asof

    # --- range join back to sessions: every event lands in its session ---
    sess = sessionize(ds, gap_minutes=10)

    def prep(b):
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "ts_us": b.column("ts").cast(pa.int64()),
                "event_id": b.column("event_id"),
            }
        )

    got_rj = {
        r["event_id"]: r["session_seq"]
        for r in range_join(
            ds.map_batches(prep, batch_format="pyarrow"), sess,
            key_col="user_id", value_col="ts_us",
            lo_col="start_us", hi_col="end_us",
            left_id="event_id", right_id="session_seq",
        ).take_all()
    }
    exp_rj = {}
    for uid, seq, cnt, start, end in exp_sessions:
        for ts, i, _ in by_user[uid]:
            if start <= ts <= end:
                exp_rj[i] = seq
    assert got_rj == exp_rj
    assert len(got_rj) == n  # every event falls in exactly one session


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


def test_date_histogram_calendar_intervals():
    """Calendar bucketing vs a pandas dt.floor/period reference on a
    randomized stream spanning month/week/day boundaries (incl. a Sunday
    -> Monday week edge: weeks must start Monday, matching ES/DuckDB)."""
    import pandas as pd

    from elasticsearch_ray.ops.events import date_histogram

    rng = np.random.default_rng(7)
    ts = pd.to_datetime("2023-12-25") + pd.to_timedelta(
        rng.integers(0, 40 * 24 * 3600, size=500), unit="s"
    )
    vals = rng.uniform(-5, 5, size=500).round(3)
    t = pa.table({
        "ts": pa.array(ts.astype("datetime64[us]")),
        "value": pa.array(vals, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(5)
    df = pd.DataFrame({"ts": ts, "value": vals})
    df["cents"] = np.floor(df["value"] * 100 + 0.5).astype(np.int64)
    for iv, freq in (("day", "D"), ("week", "W-MON"), ("month", "MS")):
        got = (
            date_histogram(ds, interval=iv).to_pandas()
            .sort_values("bucket_us").reset_index(drop=True)
        )
        if freq == "W-MON":
            # pandas W-MON labels the week END; floor to the Monday start
            key = df["ts"] - pd.to_timedelta(
                (df["ts"].dt.dayofweek), unit="D"
            )
            key = key.dt.normalize()
        elif freq == "MS":
            key = df["ts"].dt.to_period("M").dt.start_time
        else:
            key = df["ts"].dt.normalize()
        ref = (
            df.groupby(key.astype("datetime64[us]"))
            .agg(n=("value", "size"), sum_cents=("cents", "sum"))
            .reset_index()
        )
        ref["bucket_us"] = ref.iloc[:, 0].astype(np.int64)
        ref = ref.sort_values("bucket_us").reset_index(drop=True)
        assert got["bucket_us"].tolist() == ref["bucket_us"].tolist(), iv
        assert got["n"].tolist() == ref["n"].tolist(), iv
        assert got["sum_cents"].tolist() == ref["sum_cents"].tolist(), iv


def test_date_histogram_rejects_unknown_interval():
    from elasticsearch_ray.ops.events import date_histogram

    t = pa.table({
        "ts": pa.array([0], pa.timestamp("us")),
        "value": pa.array([1.0], pa.float64()),
    })
    with pytest.raises(ValueError):
        date_histogram(ray.data.from_arrow(t), interval="fortnight")


def test_rate_agg_actual_bucket_length():
    """rate: calendar buckets divide by their ACTUAL length in the unit
    (a January month bucket divides by 744 hours, February by 696)."""
    import datetime as dt

    import numpy as np

    from elasticsearch_ray.ops.events import rate_agg

    rows = []
    for month, n in ((1, 10), (2, 4)):
        for i in range(n):
            rows.append({
                "ts": dt.datetime(2024, month, 1 + i, 6, 0, 0),
                "value": 10.0,
            })
    ds = ray.data.from_items(rows)
    out = {r["bucket_us"]: r for r in
           rate_agg(ds, interval="month", unit="hour").take_all()}
    jan = out[int(dt.datetime(2024, 1, 1,
                              tzinfo=dt.timezone.utc).timestamp() * 1e6)]
    feb = out[int(dt.datetime(2024, 2, 1,
                              tzinfo=dt.timezone.utc).timestamp() * 1e6)]
    assert jan["n"] == 10 and feb["n"] == 4
    assert jan["rate_u"] == int(np.floor(10_000 * 1e6 / 744.0 + 0.5))
    assert feb["rate_u"] == int(np.floor(4_000 * 1e6 / 696.0 + 0.5))
    with pytest.raises(ValueError):
        rate_agg(ds, unit="fortnight")


def test_date_range_agg_open_ends_and_empty():
    import datetime as dt

    from elasticsearch_ray.ops.events import date_range_agg

    rows = [{"ts": dt.datetime(2024, 1, d, 12), "value": float(d)}
            for d in (1, 5, 10, 20)]
    ds = ray.data.from_items(rows)
    out = date_range_agg(ds, [
        (None, "2024-01-05T00:00:00"),          # d=1
        ("2024-01-05T00:00:00", "2024-01-11T00:00:00"),  # d=5,10
        ("2024-02-01T00:00:00", None),          # empty
    ])
    assert [r["doc_count"] for r in out] == [1, 2, 0]
    assert [r["sum_cents"] for r in out] == [100, 1500, 0]
    # boundary: 'to' is exclusive, 'from' inclusive
    out2 = date_range_agg(ds, [("2024-01-05T12:00:00",
                                "2024-01-10T12:00:00")])
    assert out2[0]["doc_count"] == 1  # d=5 included, d=10 excluded


def test_moving_percentiles_trailing_window():
    import datetime as dt

    from elasticsearch_ray.ops.events import moving_percentiles

    rows = []
    for day, vals in ((1, [1.00, 2.00, 3.00]), (2, [10.00]),
                      (3, [4.00, 4.00]), (4, [7.00])):
        for v in vals:
            rows.append({"ts": dt.datetime(2024, 1, day, 6),
                         "value": v})
    ds = ray.data.from_items(rows)
    out = moving_percentiles(ds, window=2, percents=(50.0, 100.0),
                             interval="day")
    assert len(out) == 4
    # day 1: empty preceding window -> nulls (ES first-bucket behavior)
    assert out[0]["p50_cents"] is None and out[0]["p100_cents"] is None
    # day 2: window {100,200,300}; nearest-rank p50 = 200, max = 300
    assert (out[1]["p50_cents"], out[1]["p100_cents"]) == (200, 300)
    # day 3: window d1+d2 {100,200,300,1000}; p50 rank ceil(2)=2 -> 200
    assert (out[2]["p50_cents"], out[2]["p100_cents"]) == (200, 1000)
    # day 4: window d2+d3 {1000, 400, 400}; p50 -> 400
    assert (out[3]["p50_cents"], out[3]["p100_cents"]) == (400, 1000)
    with pytest.raises(ValueError):
        moving_percentiles(ds, window=0)


def test_ip_range_agg():
    import datetime as dt

    from elasticsearch_ray.ops.events import derive_ips, ip_range_agg

    rows = [{"ts": dt.datetime(2024, 1, 1), "user_id": u, "value": 1.0}
            for u in range(1, 40)]
    ds = ray.data.from_items(rows)
    ips = (np.arange(1, 40, dtype=np.int64) * 2654435761) % (1 << 32)

    def u32(s):
        a, b, c, d = (int(x) for x in s.split("."))
        return (a << 24) | (b << 16) | (c << 8) | d

    ranges = [
        {"from": "0.0.0.0", "to": "128.0.0.0"},
        {"from": "128.0.0.0", "to": None},
        {"mask": "192.0.0.0/2"},
        {"from": None, "to": "10.0.0.0"},
    ]
    out = ip_range_agg(ds, ranges)
    assert out[0]["doc_count"] == int((ips < u32("128.0.0.0")).sum())
    assert out[1]["doc_count"] == int((ips >= u32("128.0.0.0")).sum())
    lo = u32("192.0.0.0")
    assert out[2]["from_u32"] == lo and out[2]["to_u32"] == lo + (1 << 30)
    assert out[2]["doc_count"] == int(((ips >= lo) &
                                       (ips < lo + (1 << 30))).sum())
    assert out[3]["doc_count"] == int((ips < u32("10.0.0.0")).sum())
    # overlapping ranges count independently
    assert out[0]["doc_count"] + out[1]["doc_count"] == 39
    import pytest as _pt
    with _pt.raises(ValueError):
        ip_range_agg(ds, [{"mask": "1.2.3.4/40"}])
    with _pt.raises(ValueError):
        ip_range_agg(ds, [{"from": "1.2.3"}])


def test_change_point():
    import datetime as dt

    from elasticsearch_ray.ops.events import change_point

    rows = []
    # 6 low days then 4 high days -> change point at day 7
    for d in range(1, 11):
        v = 1.00 if d <= 6 else 50.00
        for _ in range(3):
            rows.append({"ts": dt.datetime(2024, 1, d, 9), "value": v})
    ds = ray.data.from_items(rows)
    out = change_point(ds, interval="day")
    want_bucket = int(dt.datetime(2024, 1, 7,
                                  tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert out["bucket_us"] == want_bucket
    # left mean = 3 events x 100 cents per bucket = 300 cents/bucket
    assert out["left_mean_u"] == 300 * 1_000_000
    assert out["right_mean_u"] == 15_000 * 1_000_000
    assert out["shift_u"] == (15_000 - 300) * 1_000_000
    # degenerate: single bucket -> nulls
    one = ray.data.from_items(
        [{"ts": dt.datetime(2024, 1, 1), "value": 2.0}])
    assert change_point(one)["bucket_us"] is None


def test_date_histogram_fixed_offset():
    import datetime as dt

    from elasticsearch_ray.ops.events import date_histogram_fixed

    rows = []
    for h in (0, 5, 11, 12, 13, 23):
        rows.append({"ts": dt.datetime(2024, 1, 1, h), "value": 1.0})
    ds = ray.data.from_items(rows)
    hour = 3_600 * US
    # 12h buckets with +3h offset: boundaries at 03:00 and 15:00
    out = {r["bucket_us"]: r["n"] for r in
           date_histogram_fixed(ds, 12 * hour, offset_us=3 * hour)
           .take_all()}
    base = int(dt.datetime(2024, 1, 1,
                           tzinfo=dt.timezone.utc).timestamp() * 1e6)
    assert out == {
        base - 9 * hour: 1,          # 00:00 -> prev day's 15:00 bucket
        base + 3 * hour: 4,          # 05..13 -> 03:00 bucket
        base + 15 * hour: 1,         # 23:00 -> 15:00 bucket
    }
    with pytest.raises(ValueError):
        date_histogram_fixed(ds, 0)


def test_percentiles_bucket():
    import pyarrow as pa

    from elasticsearch_ray.ops.pipeline_aggs import percentiles_bucket

    b = pa.table({"m": pa.array([10.0, 40.0, 20.0, 30.0, None],
                                pa.float64())})
    out = percentiles_bucket(b, "m", percents=(25.0, 50.0, 100.0))
    # sorted non-null [10,20,30,40]; ranks ceil(1)=1, ceil(2)=2, 4
    assert out == {"p25": 10.0, "p50": 20.0, "p100": 40.0}
    empty = pa.table({"m": pa.array([], pa.float64())})
    assert percentiles_bucket(empty, "m") == {"p50": None, "p95": None}
