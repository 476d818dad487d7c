"""Event-stream operators over a (event_id, ts, user_id, event_type, value)
table: tumbling-window aggregation, gap sessionization, and a per-key as-of
join — the streaming-window custom operators Ray Data lacks natively,
expressed as map_batches + native groupby aggregates (window_agg) or a
coarse hash-partition shuffle with a SEGMENTED numpy kernel (sessionize /
asof_join / range_join): one Python call resolves every key in a partition
via sort + run boundaries + per-key-reset scans, instead of a per-key
``map_groups`` dispatch that would cost 10^9 interpreter calls at
10^9-user scale (see ops/partition.py).

Partitioning assumption (documented per the custom-operator contract): for
sessionize / asof_join / range_join one partition's events must fit a
single task — the shuffle is hash-partitioned by ``user_id`` into
``num_partitions`` ~= cluster cores x 2-4 slices, the natural key a real
pipeline already co-locates on.  window_agg has no such constraint
(pre-aggregation happens inside map_batches via the native groupby
combiner).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_US = 1_000_000


def _ts_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    # normalize to microseconds FIRST — a bare int64 cast yields the
    # column's native unit (ns for pandas-written tables) and would silently
    # scale every window/gap/lag computation by 1000
    return batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()


def _bucket_cents_prep(batch: pa.Table, ts_col: str, value_col: str):
    """Shared null-safe prep of every date-histogram variant:
    (ts timestamp[us] Arrow column, cents int64 numpy) over the rows
    with a NON-NULL timestamp — ES drops docs missing the date field; a
    null value still counts in its bucket but contributes 0 to the sum
    (ES sum sub-aggs skip missing values, the SQL twins' sum() does the
    same).  A nullable column's bare to_numpy() would drift to
    float64 + NaN and cast to INT64_MIN-scale garbage — verified to
    corrupt sum_cents before this helper existed.  floor(x*100 + 0.5),
    not np.round: half-to-even would diverge from the twins' round()."""
    ts = batch.column(ts_col).cast(pa.timestamp("us"))
    valid = pc.is_valid(ts)
    if not pc.all(valid).as_py():
        batch = batch.filter(valid)
        ts = batch.column(ts_col).cast(pa.timestamp("us"))
    vals = pc.fill_null(
        batch.column(value_col).cast(pa.float64()), 0.0
    ).to_numpy(zero_copy_only=False)
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    return ts, cents


def window_agg(
    ds: ray.data.Dataset,
    window_minutes: int = 60,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Tumbling-window aggregate: per (window_start, key) -> count and
    sum(value in integer cents, exact + order-independent).

    Equivalent SQL: ``SELECT date_trunc(...), key, count(*),
    sum(floor(value*100 + 0.5)) GROUP BY 1, 2``.
    """
    from ray.data.aggregate import Count, Sum

    win_us = window_minutes * 60 * _US

    def prep(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch, ts_col)
        win = (ts // win_us) * win_us
        # floor(x+0.5), not np.round: half-to-even would diverge from the
        # SQL twin's half-away round() on exact .5 cent boundaries
        cents = np.floor(
            np.asarray(batch.column(value_col).to_numpy(), dtype=np.float64) * 100
            + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "window_us": pa.array(win),
                key_col: batch.column(key_col),
                "cents": pa.array(cents),
            }
        )

    agg = ds.map_batches(prep, batch_format="pyarrow").groupby(
        ["window_us", key_col]
    ).aggregate(Count(), Sum("cents"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_us": batch.column("window_us"),
                key_col: batch.column(key_col),
                "n": batch.column("count()"),
                "sum_cents": batch.column("sum(cents)"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(
    ds: ray.data.Dataset,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Gap sessionization: a user's events sorted by time split into
    sessions wherever the gap exceeds ``gap_minutes``.

    Emits (user_id, session_seq starting at 1, n_events, start_us, end_us).
    Segmented kernel over coarse hash partitions of user_id: one Python
    call resolves EVERY user in a partition (lexsort + run boundaries +
    diff/cumsum) — no per-user kernel dispatch at 10^9-user scale.
    """
    from .partition import hash_partition_apply

    gap_us = gap_minutes * 60 * _US

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col),
                "ts_us": pa.array(_ts_us(batch, ts_col)),
            }
        )

    def per_part(tbl: pa.Table) -> pa.Table:
        uid = tbl.column(user_col).to_numpy()
        ts = tbl.column("ts_us").to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        n = ts.size
        new_user = np.empty(n, dtype=bool)
        new_sess = np.empty(n, dtype=bool)
        if n:
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
            new_sess[0] = True
            new_sess[1:] = new_user[1:] | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        nev = np.diff(np.append(starts, n))
        # session_seq restarts per user: sessions are contiguous per user
        su = np.flatnonzero(new_user[starts])  # first-session index per user
        idx = np.arange(starts.size)
        seq = idx - np.repeat(su, np.diff(np.append(su, starts.size))) + 1
        return pa.table(
            {
                user_col: pa.array(uid[starts], pa.int64()),
                "session_seq": pa.array(seq.astype(np.int64)),
                "n_events": pa.array(nev.astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(ts[ends]),
            }
        )

    return hash_partition_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        [user_col],
        per_part,
        num_partitions=num_partitions,
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
    value_col: str,
    lo_col: str,
    hi_col: str,
    left_id: str,
    right_id: str,
) -> ray.data.Dataset:
    """Per-key interval (range) join: a left row matches the right interval
    of the same key with lo <= value <= hi.

    Custom-operator composition: tag both sides, union into ONE dataset,
    hash-partition by key (``groupby(key)``), and resolve each group with a
    vectorized searchsorted — no all-pairs comparison.  Requires the right
    side's intervals to be NON-OVERLAPPING per key (at most one match; e.g.
    sessions); the assumption is asserted per group.  Same partitioning
    assumption as sessionize: one key's rows fit a task.

    Emits (left_id, right_id) for matched rows only.
    """

    def tag_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                key_col: batch.column(key_col),
                "v_lo": batch.column(value_col).cast(pa.int64()),
                "v_hi": pa.array(np.zeros(n, dtype=np.int64)),
                "rid": pa.array(np.zeros(n, dtype=np.int64)),
                "lid": batch.column(left_id).cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                key_col: batch.column(key_col),
                "v_lo": batch.column(lo_col).cast(pa.int64()),
                "v_hi": batch.column(hi_col).cast(pa.int64()),
                "rid": batch.column(right_id).cast(pa.int64()),
                "lid": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    from .partition import hash_partition_apply, start_index_of_row

    def per_part(tbl: pa.Table) -> pa.Table:
        # segmented per-key resolve, every key in one Python call: sort by
        # (key, value, rights-first-on-ties); a per-key-reset running max of
        # right positions gives each left row the latest interval with
        # lo <= v (ties included since rights sort first); then verify
        # v <= hi of that interval.
        key = tbl.column(key_col).to_numpy()
        vlo = tbl.column("v_lo").to_numpy()
        vhi = tbl.column("v_hi").to_numpy()
        rid = tbl.column("rid").to_numpy()
        lid = tbl.column("lid").to_numpy()
        side = tbl.column("side").to_numpy()
        order = np.lexsort((1 - side, vlo, key))  # rights (side=1) first
        key, vlo, vhi = key[order], vlo[order], vhi[order]
        rid, lid, side = rid[order], lid[order], side[order]
        n = key.size
        starts = np.zeros(n, dtype=bool)
        if n:
            starts[0] = True
            starts[1:] = key[1:] != key[:-1]
        seg_of = start_index_of_row(starts)
        is_r = side == 1
        # non-overlap contract per key (not assert: survives python -O)
        rpos = np.flatnonzero(is_r)
        if rpos.size > 1:
            same = seg_of[rpos[1:]] == seg_of[rpos[:-1]]
            if not (~same | (vhi[rpos[:-1]] < vlo[rpos[1:]])).all():
                raise ValueError(
                    "range_join requires non-overlapping intervals per key"
                )
        lr = np.maximum.accumulate(np.where(is_r, np.arange(n), -1))
        lr = np.where(lr >= seg_of, lr, -1)  # reset across key boundaries
        lmask = ~is_r
        cand = lr[lmask]
        safe = np.maximum(cand, 0)
        ok = (cand >= 0) & (vlo[lmask] <= vhi[safe])
        return pa.table(
            {
                left_id: pa.array(lid[lmask][ok].astype(np.int64)),
                right_id: pa.array(rid[safe][ok].astype(np.int64)),
            }
        )

    return hash_partition_apply(tagged, [key_col], per_part)


def asof_join(
    ds: ray.data.Dataset,
    ref_type: str = "click",
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-user as-of join: each event matched to the latest ``ref_type``
    event of the same user with ref.ts <= event.ts (inclusive, DuckDB
    ``ASOF JOIN ... ON e.ts >= r.ts`` semantics).

    Emits (event_id, ref_event_id, lag_us); events with no prior reference
    get -1 sentinels (keeps the columns int64 end-to-end).  Per-group
    kernel: sort + searchsorted, fully vectorized.
    """

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col),
                id_col: batch.column(id_col),
                "ts_us": pa.array(_ts_us(batch, ts_col)),
                "is_ref": pa.array(
                    np.asarray(
                        pa.compute.equal(batch.column(type_col), ref_type)
                    ).astype(bool)
                ),
            }
        )

    from .partition import hash_partition_apply, start_index_of_row

    def per_part(tbl: pa.Table) -> pa.Table:
        # segmented as-of: sort by (user, ts, id); per-user-reset running max
        # of reference positions, read at each (user, ts) RUN's last row so
        # equal-ts references later in the run still count (the original
        # per-user searchsorted side='right' semantics: ref.ts <= ev.ts,
        # equal-ts ties resolve to the max ref event_id).
        uid = tbl.column(user_col).to_numpy()
        ids = tbl.column(id_col).to_numpy()
        ts = tbl.column("ts_us").to_numpy()
        is_ref = tbl.column("is_ref").to_numpy()
        order = np.lexsort((ids, ts, uid))
        uid, ids, ts, is_ref = uid[order], ids[order], ts[order], is_ref[order]
        n = uid.size
        seg_starts = np.zeros(n, dtype=bool)
        run_starts = np.zeros(n, dtype=bool)
        if n:
            seg_starts[0] = run_starts[0] = True
            seg_starts[1:] = uid[1:] != uid[:-1]
            run_starts[1:] = seg_starts[1:] | (ts[1:] != ts[:-1])
        seg_of = start_index_of_row(seg_starts)
        rs = np.flatnonzero(run_starts)
        run_end = np.repeat(np.append(rs[1:], n) - 1, np.diff(np.append(rs, n)))
        lr = np.maximum.accumulate(np.where(is_ref, np.arange(n), -1))
        lr = np.where(lr >= seg_of, lr, -1)  # reset across user boundaries
        match = lr[run_end]
        has = match >= 0
        safe = np.maximum(match, 0)
        ref_ids = np.where(has, ids[safe], -1)
        lags = np.where(has, ts - ts[safe], -1)
        return pa.table(
            {
                id_col: pa.array(ids),
                "ref_event_id": pa.array(ref_ids.astype(np.int64)),
                "lag_us": pa.array(lags.astype(np.int64)),
            }
        )

    return hash_partition_apply(
        ds.map_batches(prep, batch_format="pyarrow"), [user_col], per_part
    )


def date_histogram(
    ds: ray.data.Dataset,
    interval: str = "day",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """ES ``date_histogram`` with ``calendar_interval`` semantics
    (hour/day/week/month/quarter/year; week starts Monday, matching both
    ES and DuckDB ``date_trunc``): per calendar bucket -> event count and
    exact sum(value) in integer cents.

    Scale shape: the bucket key is computed with one Arrow
    ``floor_temporal`` kernel per batch and each batch is pre-aggregated
    map-side (Arrow hash group-by), so the shuffle moves one row per
    (batch, bucket) — O(batches x buckets), never the event stream.

    Equivalent SQL: ``SELECT date_trunc('<interval>', ts), count(*),
    sum(floor(value*100 + 0.5)) GROUP BY 1``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    allowed = {"hour", "day", "week", "month", "quarter", "year"}
    if interval not in allowed:
        raise ValueError(f"interval {interval!r} not in {sorted(allowed)}")

    def prep(batch: pa.Table) -> pa.Table:
        ts, cents = _bucket_cents_prep(batch, ts_col, value_col)
        bucket = pc.floor_temporal(ts, unit=interval).cast(pa.int64())
        part = pa.table({"bucket_us": bucket, "cents": pa.array(cents)})
        g = part.group_by("bucket_us").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table(
            {
                "bucket_us": g.column("bucket_us"),
                "cents_part": g.column("cents_sum"),
                "n_part": g.column("cents_count").cast(pa.int64()),
            }
        )

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket_us")
        .aggregate(Sum("n_part"), Sum("cents_part"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bucket_us": batch.column("bucket_us"),
                "n": batch.column("sum(n_part)"),
                "sum_cents": batch.column("sum(cents_part)"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ES auto_date_histogram rounding ladder (second..12h..7d fixed, then
# calendar month/quarter/year like ES's DateHistogramInterval ladder).
# Fixed rungs bucket by UTC epoch floor; calendar rungs by date_trunc.
_AUTO_LADDER: list[tuple[str, str | int]] = [
    ("1s", 1_000_000), ("5s", 5_000_000), ("10s", 10_000_000),
    ("30s", 30_000_000),
    ("1m", 60_000_000), ("5m", 300_000_000), ("10m", 600_000_000),
    ("30m", 1_800_000_000),
    ("1h", 3_600_000_000), ("3h", 10_800_000_000),
    ("12h", 43_200_000_000),
    ("1d", 86_400_000_000), ("7d", 604_800_000_000),
    ("1M", "month"), ("3M", "quarter"), ("1y", "year"),
]


def auto_date_histogram(
    ds: ray.data.Dataset,
    target_buckets: int = 10,
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """ES ``auto_date_histogram``: pick the smallest rounding from the
    ES interval ladder whose bucket span fits ``target_buckets``, then
    bucket like ``date_histogram``.  Like ES, the choice is span-based
    (ES widens the rounding whenever the key range would exceed the
    target, so sparse interiors don't shrink the interval).

    Deviation vs ES, documented: fixed rungs (1s..7d) floor on the UTC
    epoch (ES 7d rounding is calendar-anchored); month/quarter/year are
    calendar date_trunc like ES.  The SQL twin uses the identical
    arithmetic, so results are exact for the twin.

    Scale shape: pass 1 is a min/max aggregate over the timestamp column
    only; pass 2 is the same map-side pre-aggregated groupby as
    ``date_histogram`` — the shuffle never moves the event stream.  The
    result carries the chosen rung in an ``interval`` column.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")

    def tsu(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"us": batch.column(ts_col).cast(pa.timestamp("us"))
                .cast(pa.int64())}
        )

    mm = ds.map_batches(tsu, batch_format="pyarrow").aggregate(
        Min("us"), Max("us")
    )
    lo, hi = mm["min(us)"], mm["max(us)"]
    if lo is None:
        return ray.data.from_arrow(pa.table({
            "interval": pa.array([], pa.string()),
            "bucket_us": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sum_cents": pa.array([], pa.int64()),
        }))

    import datetime as _dt

    def _cal_parts(us: int) -> tuple[int, int]:
        d = _dt.datetime.fromtimestamp(us / 1e6, _dt.timezone.utc)
        return d.year, d.month

    label = _AUTO_LADDER[-1][0]
    for lab, width in _AUTO_LADDER:
        if isinstance(width, int):
            span = hi // width - lo // width + 1
        else:
            (y0, m0), (y1, m1) = _cal_parts(lo), _cal_parts(hi)
            months = (y1 - y0) * 12 + (m1 - m0)
            per = {"month": 1, "quarter": 3, "year": 12}[width]
            span = (
                ((y1 * 12 + m1 - 1) // per) - ((y0 * 12 + m0 - 1) // per) + 1
            )
        if span <= target_buckets:
            label = lab
            break
    width = dict(_AUTO_LADDER)[label]
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table) -> pa.Table:
        ts, cents = _bucket_cents_prep(batch, ts_col, value_col)
        if isinstance(width, int):
            us = ts.cast(pa.int64())
            bucket = pc.multiply(pc.divide(us, width), width)
        else:
            bucket = pc.floor_temporal(ts, unit=width).cast(pa.int64())
        part = pa.table({"bucket_us": bucket, "cents": pa.array(cents)})
        g = part.group_by("bucket_us").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table({
            "bucket_us": g.column("bucket_us"),
            "cents_part": g.column("cents_sum"),
            "n_part": g.column("cents_count").cast(pa.int64()),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket_us")
        .aggregate(Sum("n_part"), Sum("cents_part"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "interval": pa.array([label] * batch.num_rows, pa.string()),
            "bucket_us": batch.column("bucket_us"),
            "n": batch.column("sum(n_part)"),
            "sum_cents": batch.column("sum(cents_part)"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


_UNIT_US = {
    "second": _US,
    "minute": 60 * _US,
    "hour": 3600 * _US,
    "day": 86_400 * _US,
}


def rate_agg(
    ds: ray.data.Dataset,
    interval: str = "day",
    unit: str = "hour",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """ES ``rate`` aggregation inside a date_histogram: per calendar
    bucket, ``sum(value) / (bucket length in ``unit``)`` — like ES,
    calendar buckets use their ACTUAL length (a 31-day month divides by
    744 hours), so the scaling is computed from each bucket's real span.

    Distribution: reuses :func:`date_histogram`'s map-side pre-aggregated
    sums (shuffle moves one row per batch x bucket); the per-bucket
    length and division happen on the bucket table (O(buckets)).  Rates
    are returned in integer micro-cents-per-unit
    (``floor(sum_cents * 1e6 / length + 0.5)``) for exact twinning.
    """
    if unit not in _UNIT_US:
        raise ValueError(f"unit {unit!r} not in {sorted(_UNIT_US)}")
    unit_us = _UNIT_US[unit]
    buckets = date_histogram(ds, interval=interval, ts_col=ts_col,
                             value_col=value_col)

    def finish(batch: pa.Table) -> pa.Table:
        # actual bucket length: next calendar boundary minus this one
        # (month/quarter/year lengths vary — O(buckets) python, not rows)
        s_us = batch.column("bucket_us").cast(pa.int64()).to_numpy()
        import datetime as _dt

        ends = np.empty(s_us.size, dtype=np.int64)
        utc = _dt.timezone.utc
        for i, us in enumerate(s_us):
            d = _dt.datetime.fromtimestamp(int(us) / _US, tz=utc)
            if interval == "hour":
                e = d + _dt.timedelta(hours=1)
            elif interval == "day":
                e = d + _dt.timedelta(days=1)
            elif interval == "week":
                e = d + _dt.timedelta(days=7)
            elif interval == "month":
                e = (d.replace(day=1) + _dt.timedelta(days=32)).replace(
                    day=1)
            elif interval == "quarter":
                m = d.month + 3
                e = d.replace(year=d.year + (m - 1) // 12,
                              month=(m - 1) % 12 + 1, day=1)
            else:  # year
                e = d.replace(year=d.year + 1)
            ends[i] = int(e.timestamp() * _US)
        length_units = (ends - s_us) / unit_us
        cents = batch.column("sum_cents").to_numpy().astype(np.float64)
        rate_u = np.floor(cents * 1e6 / length_units + 0.5).astype(np.int64)
        return pa.table({
            "bucket_us": batch.column("bucket_us"),
            "n": batch.column("n"),
            "sum_cents": batch.column("sum_cents"),
            "rate_u": pa.array(rate_u),
        })

    return buckets.map_batches(finish, batch_format="pyarrow")


def date_range_agg(
    ds: ray.data.Dataset,
    ranges: list[tuple[str | None, str | None]],
    ts_col: str = "ts",
    value_col: str = "value",
) -> list[dict]:
    """ES ``date_range`` aggregation: per [from, to) ISO-timestamp range
    (either end open; ES convention — from inclusive, to EXCLUSIVE),
    event count and exact sum(value) in integer cents.

    Map-side: one boolean mask per range per batch feeding integer
    partials; the driver sums O(ranges) numbers per batch — no shuffle,
    the event stream never moves."""
    import datetime as _dt

    def us(iso):
        if iso is None:
            return None
        d = _dt.datetime.fromisoformat(iso)
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        return int(d.timestamp() * _US)

    bounds = [(us(a), us(b)) for a, b in ranges]

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch, ts_col)
        cents = np.floor(
            np.asarray(batch.column(value_col).to_numpy(), np.float64) * 100
            + 0.5
        ).astype(np.int64)
        ns, sums = [], []
        for lo, hi in bounds:
            m = np.ones(ts.size, dtype=bool)
            if lo is not None:
                m &= ts >= lo
            if hi is not None:
                m &= ts < hi
            ns.append(int(m.sum()))
            sums.append(int(cents[m].sum()))
        return pa.table({
            "ri": pa.array(range(len(bounds)), pa.int64()),
            "n_part": pa.array(ns, pa.int64()),
            "cents_part": pa.array(sums, pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ri")
        .aggregate(Sum("n_part"), Sum("cents_part"))
        .take_all()
    )  # O(ranges) rows — bounded driver materialization
    by_ri = {int(r["ri"]): r for r in agg}
    out = []
    for i, (a, b) in enumerate(ranges):
        r = by_ri.get(i)
        out.append({
            "from": a, "to": b,
            "doc_count": int(r["sum(n_part)"]) if r else 0,
            "sum_cents": int(r["sum(cents_part)"]) if r else 0,
        })
    return out


def moving_percentiles(
    ds: ray.data.Dataset,
    window: int = 7,
    percents: tuple = (50.0, 95.0),
    interval: str = "day",
    ts_col: str = "ts",
    value_col: str = "value",
) -> list[dict]:
    """ES ``moving_percentiles`` pipeline aggregation: per calendar
    bucket, percentiles of the value distribution over the ``window``
    PRECEDING buckets (moving_fn shift=0 semantics — the current bucket
    is excluded; an empty window yields nulls, like ES's first bucket).

    ES merges per-bucket TDigests; this is the EXACT equivalent over
    integer-cents value counts (nearest-rank / percentile_disc
    convention, same as the boxplot/MAD aggs): phase 1 distributes —
    per batch an Arrow group-by emits (bucket, cents, n) partials, the
    shuffle carries one row per (batch, bucket, distinct value); the
    driver holds only the deduplicated (bucket, value) histogram
    (O(buckets x distinct cents) rows — exact-path bound; swap the
    per-bucket maps for ``functions/sketches.py`` centroid digests when
    value cardinality outgrows it, the same exact->sketch routing the
    percentile aggregations use).  The O(buckets x window) merge runs
    driver-side like every pipeline agg (ES reduces them on the
    coordinating node)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if window < 1:
        raise ValueError("window must be >= 1")

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us"))
        bucket = pc.floor_temporal(ts, unit=interval).cast(pa.int64())
        cents = np.floor(
            np.asarray(batch.column(value_col).to_numpy(), np.float64) * 100
            + 0.5
        ).astype(np.int64)
        part = pa.table({"bucket_us": bucket, "cents": pa.array(cents)})
        g = part.group_by(["bucket_us", "cents"]).aggregate(
            [("cents", "count")]
        )
        return pa.table({
            "bucket_us": g.column("bucket_us"),
            "cents": g.column("cents"),
            "n_part": g.column("cents_count").cast(pa.int64()),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["bucket_us", "cents"])
        .aggregate(Sum("n_part"))
        .take_all()
    )  # exact-path bound: O(buckets x distinct cents), see docstring
    per_bucket: dict[int, dict[int, int]] = {}
    for r in rows:
        per_bucket.setdefault(int(r["bucket_us"]), {})[int(r["cents"])] = \
            int(r["sum(n_part)"])
    buckets = sorted(per_bucket)
    out = []
    for i, b in enumerate(buckets):
        lo = max(0, i - window)
        merged: dict[int, int] = {}
        for j in range(lo, i):
            for v, n in per_bucket[buckets[j]].items():
                merged[v] = merged.get(v, 0) + n
        row = {"bucket_us": b}
        if not merged:
            for p in percents:
                row[f"p{p:g}_cents"] = None
        else:
            vals = sorted(merged)
            cum = np.cumsum([merged[v] for v in vals])
            total = int(cum[-1])
            for p in percents:
                rank = math.ceil(p / 100.0 * total)
                idx = int(np.searchsorted(cum, max(rank, 1)))
                row[f"p{p:g}_cents"] = int(vals[idx])
        out.append(row)
    return out


def cumulative_cardinality(
    ds: ray.data.Dataset,
    interval: str = "day",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> ray.data.Dataset:
    """ES ``cumulative_cardinality`` pipeline aggregation over a
    date_histogram: per calendar bucket, the number of DISTINCT keys
    seen in that bucket or any earlier one, plus the bucket's new-key
    count.  Exact at any scale without per-bucket key sets: a key's
    contribution to every cumulative count is fully determined by its
    FIRST bucket, so the plan is (1) map-side (bucket, key) dedupe,
    (2) ``groupby(key).min(bucket)`` — the one wide exchange, keyed on
    the same column a real pipeline already co-locates on, (3) a tiny
    per-first-bucket count joined onto the bucket list with a driver
    cumsum over O(buckets) rows.  (ES itself computes this from merged
    per-bucket HLL sketches — approximately; this plan is exact.)"""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    allowed = {"hour", "day", "week", "month", "quarter", "year"}
    if interval not in allowed:
        raise ValueError(f"interval {interval!r} not in {sorted(allowed)}")

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us"))
        bucket = pc.floor_temporal(ts, unit=interval).cast(pa.int64())
        part = pa.table({
            "bucket_us": bucket,
            key_col: batch.column(key_col),
        })
        # batch-local dedupe: the shuffle moves one row per (batch,
        # bucket, key), never the event stream
        return part.group_by(["bucket_us", key_col]).aggregate([])

    dedup = ds.map_batches(prep, batch_format="pyarrow")
    firsts = dedup.groupby(key_col).aggregate(Min("bucket_us"))

    def count_new(batch: pa.Table) -> pa.Table:
        g = batch.group_by("min(bucket_us)").aggregate(
            [("min(bucket_us)", "count")]
        )
        return pa.table({
            "bucket_us": g.column("min(bucket_us)"),
            "new_part": g.column("min(bucket_us)_count").cast(pa.int64()),
        })

    from ray.data.aggregate import Sum

    new_counts = (
        firsts.map_batches(count_new, batch_format="pyarrow")
        .groupby("bucket_us").aggregate(Sum("new_part"))
        .to_pandas()
    )
    buckets = sorted(
        r["bucket_us"]
        for r in dedup.groupby("bucket_us").count().take_all()
    )
    new_by_bucket = dict(
        zip(new_counts["bucket_us"], new_counts["sum(new_part)"])
    )
    new = [int(new_by_bucket.get(b, 0)) for b in buckets]
    cum = np.cumsum(new, dtype=np.int64) if new else np.empty(0, np.int64)
    return ray.data.from_arrow(pa.table({
        "bucket_us": pa.array(buckets, pa.int64()),
        "new_keys": pa.array(new, pa.int64()),
        "cum_cardinality": pa.array(cum, pa.int64()),
    }))


def derive_ips(batch: pa.Table, key_col: str = "user_id") -> np.ndarray:
    """Deterministic synthetic IPv4 per row (the corpus has no IP
    column): Knuth multiplicative hash of the integer key, truncated to
    u32 — integer multiply/mod every engine computes identically."""
    k = batch.column(key_col).to_numpy().astype(np.int64)
    return (k * 2654435761) % (1 << 32)


def _ip_to_u32(s: str) -> int:
    parts = s.split(".")
    if len(parts) != 4:
        raise ValueError(f"bad IPv4 literal {s!r}")
    v = 0
    for p in parts:
        b = int(p)
        if not (0 <= b <= 255):
            raise ValueError(f"bad IPv4 octet in {s!r}")
        v = (v << 8) | b
    return v


def ip_bounds(ranges: list[dict]) -> list[tuple[int, int]]:
    """ES ip_range range specs -> [lo, hi) u32 bounds.  Each spec is
    either ``{"from": "a.b.c.d", "to": "a.b.c.d"}`` (from inclusive,
    to EXCLUSIVE, either end open) or ``{"mask": "a.b.c.d/n"}`` (CIDR
    block).  Shared by the aggregation and its SQL twin so the parsing
    can never diverge."""
    bounds: list[tuple[int, int]] = []
    for r in ranges:
        if "mask" in r:
            base, _, nbits = r["mask"].partition("/")
            n = int(nbits)
            if not (0 <= n <= 32):
                raise ValueError(f"bad CIDR width in {r['mask']!r}")
            lo = _ip_to_u32(base) & ~((1 << (32 - n)) - 1) \
                if n else 0
            bounds.append((lo, lo + (1 << (32 - n))))
        else:
            lo = _ip_to_u32(r["from"]) if r.get("from") else 0
            hi = _ip_to_u32(r["to"]) if r.get("to") else 1 << 32
            bounds.append((lo, hi))
    return bounds


def ip_range_agg(
    ds: ray.data.Dataset,
    ranges: list[dict],
    key_col: str = "user_id",
) -> list[dict]:
    """ES ``ip_range`` aggregation over the derived IPv4 column: per
    range (see :func:`ip_bounds` for the from/to/CIDR shapes), the doc
    count.  Ranges may overlap; each is an independent boolean mask
    (map-side integer partials, one row per range per batch)."""
    bounds = ip_bounds(ranges)

    def partial(batch: pa.Table) -> pa.Table:
        ip = derive_ips(batch, key_col)
        counts = [int(((ip >= lo) & (ip < hi)).sum())
                  for lo, hi in bounds]
        return pa.table({
            "ri": pa.array(range(len(bounds)), pa.int64()),
            "n_part": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ri").aggregate(Sum("n_part")).take_all()
    )  # O(ranges) rows
    by_ri = {int(r["ri"]): int(r["sum(n_part)"]) for r in rows}
    out = []
    for i, (lo, hi) in enumerate(bounds):
        out.append({
            "from_u32": lo,
            "to_u32": hi,
            "doc_count": by_ri.get(i, 0),
        })
    return out


def change_point(
    ds: ray.data.Dataset,
    interval: str = "day",
    ts_col: str = "ts",
    value_col: str = "value",
) -> dict:
    """ES ``change_point`` aggregation, deterministic variant: over the
    calendar-bucketed integer-cents sums, the split k (1 <= k < m
    buckets on the left) that maximizes the absolute mean shift
    |mean(left) - mean(right)| — means in floor'd micro-cents so the
    argmax is integer-exact and engine-independent (ES fits p-values
    with an ML test; the documented surrogate keeps the same "largest
    step change" answer on clean shifts).  Ties break toward the
    smallest k.  Returns the first bucket of the RIGHT segment (ES
    reports the change point's bucket) plus both segment means and the
    shift.

    Distributed phase: the same map-side (bucket, cents) partials as
    ``date_histogram``; the driver scan is O(buckets)."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us"))
        bucket = pc.floor_temporal(ts, unit=interval).cast(pa.int64())
        cents = np.floor(
            np.asarray(batch.column(value_col).to_numpy(), np.float64)
            * 100 + 0.5
        ).astype(np.int64)
        part = pa.table({"bucket_us": bucket, "cents": pa.array(cents)})
        g = part.group_by("bucket_us").aggregate([("cents", "sum")])
        return pa.table({
            "bucket_us": g.column("bucket_us"),
            "s_part": g.column("cents_sum").cast(pa.int64()),
        })

    rows = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket_us")
        .aggregate(Sum("s_part")).take_all()
    )  # O(buckets) rows
    rows.sort(key=lambda r: int(r["bucket_us"]))
    if len(rows) < 2:
        return {"bucket_us": None, "left_mean_u": None,
                "right_mean_u": None, "shift_u": None}
    buckets = [int(r["bucket_us"]) for r in rows]
    # per-bucket SUMS are the observed series (one observation per
    # bucket, like ES's per-bucket metric values) — pinned by the SQL
    # twin; don't "fix" this to per-event means
    vals = [int(r["sum(s_part)"]) for r in rows]
    m = len(vals)
    total = sum(vals)
    best = None
    cs = 0
    for k in range(1, m):
        cs += vals[k - 1]
        lm = math.floor(cs * 1_000_000.0 / k)
        rm = math.floor((total - cs) * 1_000_000.0 / (m - k))
        shift = abs(lm - rm)
        if best is None or shift > best[0]:
            best = (shift, k, lm, rm)
    shift, k, lm, rm = best
    return {"bucket_us": buckets[k], "left_mean_u": lm,
            "right_mean_u": rm, "shift_u": shift}


def date_histogram_fixed(
    ds: ray.data.Dataset,
    interval_us: int,
    offset_us: int = 0,
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """ES ``date_histogram`` with ``fixed_interval`` + ``offset``
    semantics: bucket = ``floor((ts - offset) / interval) * interval +
    offset`` in epoch microseconds (ES shifts the grid by the offset;
    negative timestamps floor correctly).  Same map-side pre-aggregated
    shape as the calendar :func:`date_histogram` — one row per
    (batch, bucket) rides the shuffle.  Emits (bucket_us, n,
    sum_cents)."""
    from ray.data.aggregate import Sum

    if interval_us <= 0:
        raise ValueError("interval_us must be > 0")

    def prep(batch: pa.Table) -> pa.Table:
        ts_col_a, cents = _bucket_cents_prep(batch, ts_col, value_col)
        ts = ts_col_a.cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = ((ts - offset_us) // interval_us) * interval_us \
            + offset_us
        part = pa.table({
            "bucket_us": pa.array(bucket),
            "cents": pa.array(cents),
        })
        # map-side combiner: the shuffle carries one row per
        # (batch, bucket), like the calendar date_histogram
        g = part.group_by("bucket_us").aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table({
            "bucket_us": g.column("bucket_us"),
            "s_part": g.column("cents_sum").cast(pa.int64()),
            "n_part": g.column("cents_count").cast(pa.int64()),
        })

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket_us").aggregate(Sum("n_part"), Sum("s_part"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket_us": batch.column("bucket_us"),
            "n": batch.column("sum(n_part)").cast(pa.int64()),
            "sum_cents": batch.column("sum(s_part)").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
