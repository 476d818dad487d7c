"""Event-stream operators over a (event_id, ts, user_id, event_type, value)
table: tumbling-window aggregation, gap sessionization, and a per-key as-of
join — the streaming-window custom operators Ray Data lacks natively,
expressed as map_batches + native groupby aggregates (window_agg) or a
keyed ``groupby(user).map_groups`` with a fully vectorized per-group kernel
(sessionize / asof_join).

Partitioning assumption (documented per the custom-operator contract): for
sessionize / asof_join one key's events must fit a single task — the shuffle
is hash-partitioned by ``user_id``, the natural key a real pipeline already
co-locates on.  window_agg has no such constraint (pre-aggregation happens
inside map_batches via the native groupby combiner).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_US = 1_000_000


def _ts_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    # normalize to microseconds FIRST — a bare int64 cast yields the
    # column's native unit (ns for pandas-written tables) and would silently
    # scale every window/gap/lag computation by 1000
    return batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()


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
) -> ray.data.Dataset:
    """Gap sessionization: a user's events sorted by time split into
    sessions wherever the gap exceeds ``gap_minutes``.

    Emits (user_id, session_seq starting at 1, n_events, start_us, end_us).
    The per-group kernel is pure numpy (sort, diff, cumsum, reduceat).
    """
    gap_us = gap_minutes * 60 * _US

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                user_col: batch.column(user_col),
                "ts_us": pa.array(_ts_us(batch, ts_col)),
            }
        )

    def per_user(batch: pa.Table) -> pa.Table:
        ts = np.sort(batch.column("ts_us").to_numpy())
        uid = batch.column(user_col)[0].as_py()
        new = np.empty(ts.size, dtype=bool)
        new[0] = True
        np.greater(np.diff(ts), gap_us, out=new[1:])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], ts.size) - 1
        n = np.diff(np.append(starts, ts.size))
        return pa.table(
            {
                user_col: pa.array(np.full(starts.size, uid), pa.int64()),
                "session_seq": pa.array(
                    np.arange(1, starts.size + 1, dtype=np.int64)
                ),
                "n_events": pa.array(n.astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(ts[ends]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(per_user, batch_format="pyarrow")
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

    def per_key(batch: pa.Table) -> pa.Table:
        side = batch.column("side").to_numpy()
        empty = pa.table(
            {
                left_id: pa.array([], pa.int64()),
                right_id: pa.array([], pa.int64()),
            }
        )
        l_mask = side == 0
        r_mask = ~l_mask
        if not l_mask.any() or not r_mask.any():
            return empty
        vals = batch.column("v_lo").to_numpy()
        lids = batch.column("lid").to_numpy()[l_mask]
        lvals = vals[l_mask]
        los = vals[r_mask]
        his = batch.column("v_hi").to_numpy()[r_mask]
        rids = batch.column("rid").to_numpy()[r_mask]
        order = np.argsort(los)
        los, his, rids = los[order], his[order], rids[order]
        if not (his[:-1] < los[1:]).all():  # not assert: survives python -O
            raise ValueError("range_join requires non-overlapping intervals per key")
        pos = np.searchsorted(los, lvals, side="right") - 1
        ok = (pos >= 0) & (lvals <= his[np.maximum(pos, 0)])
        return pa.table(
            {
                left_id: pa.array(lids[ok].astype(np.int64)),
                right_id: pa.array(rids[np.maximum(pos, 0)][ok].astype(np.int64)),
            }
        )

    return tagged.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


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

    def per_user(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        ts = batch.column("ts_us").to_numpy()
        is_ref = batch.column("is_ref").to_numpy()
        order = np.lexsort((ids, ts))
        ids, ts, is_ref = ids[order], ts[order], is_ref[order]
        ref_idx = np.flatnonzero(is_ref)
        if ref_idx.size == 0:
            match = np.full(ids.size, -1, dtype=np.int64)
        else:
            # latest ref position with ts <= event ts; sorted by (ts, id) so
            # equal-ts references resolve to the max event_id deterministically
            pos = np.searchsorted(ts[ref_idx], ts, side="right") - 1
            match = np.where(pos >= 0, ref_idx[np.maximum(pos, 0)], -1)
        has = match >= 0
        ref_ids = np.where(has, ids[np.maximum(match, 0)], -1)
        lags = np.where(has, ts - ts[np.maximum(match, 0)], -1)
        return pa.table(
            {
                id_col: pa.array(ids),
                "ref_event_id": pa.array(ref_ids.astype(np.int64)),
                "lag_us": pa.array(lags.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(per_user, batch_format="pyarrow")
    )
