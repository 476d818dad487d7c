"""ES pipeline aggregations over bucketed results.

ES layers a second family of aggregations over the buckets another
aggregation produced (``derivative``, ``cumulative_sum``, ``moving_fn``,
``bucket_sort``, and the sibling ``*_bucket`` metrics).  Buckets are the
OUTPUT of the distributed stage — a small, already-reduced table — so
pipeline aggs are deliberately driver-side numpy over O(buckets) rows,
never another shuffle (same shape ES uses: pipeline aggs run on the
coordinating node during reduce).

All functions take and return a ``pyarrow.Table`` sorted by the parent
bucket key (date_histogram / histogram order), matching ES's requirement
that parent buckets be a histogram for the sequential aggs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _metric(buckets: pa.Table, path: str) -> np.ndarray:
    if path not in buckets.column_names:
        raise KeyError(f"buckets_path {path!r} not in {buckets.column_names}")
    return buckets.column(path).to_numpy(zero_copy_only=False)


def derivative(buckets: pa.Table, buckets_path: str,
               out_col: str | None = None) -> pa.Table:
    """ES ``derivative``: metric minus the previous bucket's metric; the
    first bucket has NO derivative (null), exactly like ES omitting the
    key from the first bucket."""
    m = _metric(buckets, buckets_path).astype(np.float64)
    d = np.empty(len(m), dtype=np.float64)
    if len(m):
        d[0] = np.nan
        d[1:] = m[1:] - m[:-1]
    vals = pa.array(
        [None if np.isnan(x) else x for x in d], pa.float64()
    )
    return buckets.append_column(out_col or f"{buckets_path}_deriv", vals)


def cumulative_sum(buckets: pa.Table, buckets_path: str,
                   out_col: str | None = None) -> pa.Table:
    """ES ``cumulative_sum``: running total of the metric."""
    m = _metric(buckets, buckets_path)
    return buckets.append_column(
        out_col or f"{buckets_path}_cumsum",
        pa.array(np.cumsum(m.astype(np.int64))
                 if np.issubdtype(m.dtype, np.integer)
                 else np.cumsum(m.astype(np.float64))),
    )


def moving_avg(buckets: pa.Table, buckets_path: str, window: int,
               shift: int = 0, out_col: str | None = None) -> pa.Table:
    """ES ``moving_fn`` with the unweighted-average function: for bucket
    ``i`` the window is the ``window`` buckets ending at ``i - 1 + shift``
    (ES default ``shift=0`` EXCLUDES the current bucket; ``shift=1``
    includes it).  Buckets whose window is empty get null, like ES."""
    m = _metric(buckets, buckets_path).astype(np.float64)
    n = len(m)
    csum = np.concatenate([[0.0], np.cumsum(m)])
    out: list[float | None] = []
    for i in range(n):
        hi = min(max(i + shift, 0), n)          # exclusive
        lo = min(max(hi - window, 0), n)
        if hi <= lo:
            out.append(None)
        else:
            out.append((csum[hi] - csum[lo]) / (hi - lo))
    return buckets.append_column(
        out_col or f"{buckets_path}_movavg", pa.array(out, pa.float64())
    )


def bucket_sort(buckets: pa.Table, sort: list[tuple[str, str]],
                from_: int = 0, size: int | None = None) -> pa.Table:
    """ES ``bucket_sort``: reorder (and truncate) the parent's buckets by
    metric values; ``sort`` is [(column, 'asc'|'desc'), ...]."""
    idx = np.arange(buckets.num_rows)
    # stable sorts applied last-key-first == lexicographic multi-key
    for col, order in reversed(sort):
        vals = _metric(buckets, col)
        key = np.argsort(vals[idx], kind="stable")
        if order == "desc":
            key = key[::-1]
            # keep stability under reversal: reverse EQUAL runs back
            sv = vals[idx][key]
            starts = np.flatnonzero(
                np.concatenate([[True], sv[1:] != sv[:-1]])
            )
            ends = np.concatenate([starts[1:], [len(sv)]])
            key = np.concatenate(
                [key[s:e][::-1] for s, e in zip(starts, ends)]
            )
        elif order != "asc":
            raise ValueError(f"order {order!r} must be 'asc' or 'desc'")
        idx = idx[key]
    stop = None if size is None else from_ + size
    return buckets.take(pa.array(idx[from_:stop]))


def sibling_stats(buckets: pa.Table, buckets_path: str) -> dict:
    """ES sibling pipeline metrics in one pass: ``avg_bucket`` /
    ``sum_bucket`` / ``min_bucket`` / ``max_bucket`` / ``stats_bucket``
    over the parent's buckets."""
    m = _metric(buckets, buckets_path).astype(np.float64)
    if not len(m):
        return {"count": 0, "min": None, "max": None, "avg": None,
                "sum": 0.0}
    return {
        "count": int(len(m)),
        "min": float(m.min()),
        "max": float(m.max()),
        "avg": float(m.mean()),
        "sum": float(m.sum()),
    }


def serial_diff(buckets: pa.Table, buckets_path: str, lag: int = 1,
                out_col: str | None = None) -> pa.Table:
    """ES ``serial_diff``: metric minus the metric ``lag`` buckets back;
    the first ``lag`` buckets have no value (null), like ES omitting
    them."""
    if lag < 1:
        raise ValueError("lag must be >= 1")
    m = _metric(buckets, buckets_path).astype(np.float64)
    out = np.full(len(m), np.nan)
    if len(m) > lag:
        out[lag:] = m[lag:] - m[:-lag]
    return buckets.append_column(
        out_col or f"{buckets_path}_diff_{lag}",
        pa.array([None if np.isnan(v) else float(v) for v in out],
                 pa.float64()),
    )


def bucket_script(buckets: pa.Table, paths: dict[str, str], fn,
                  out_col: str) -> pa.Table:
    """ES ``bucket_script``: a per-bucket value computed from several
    metric paths.  ``paths`` maps script variable names to bucket
    columns; ``fn(**vars)`` receives float64 numpy arrays and must
    return one array (vectorized — the ES Painless script, expressed as
    a numpy expression)."""
    args = {
        name: _metric(buckets, col).astype(np.float64)
        for name, col in paths.items()
    }
    out = np.asarray(fn(**args), dtype=np.float64)
    if out.shape != (buckets.num_rows,):
        raise ValueError("bucket_script must return one value per bucket")
    return buckets.append_column(out_col, pa.array(out, pa.float64()))


def bucket_selector(buckets: pa.Table, paths: dict[str, str], fn) -> pa.Table:
    """ES ``bucket_selector``: keep only buckets where the predicate over
    the named metric paths is true.  ``fn(**vars)`` receives float64
    numpy arrays and returns a boolean mask."""
    args = {
        name: _metric(buckets, col).astype(np.float64)
        for name, col in paths.items()
    }
    mask = np.asarray(fn(**args), dtype=bool)
    if mask.shape != (buckets.num_rows,):
        raise ValueError("bucket_selector must return one bool per bucket")
    return buckets.filter(pa.array(mask))


def extremum_bucket(buckets: pa.Table, buckets_path: str,
                    key_col: str, kind: str = "max") -> dict:
    """ES ``max_bucket`` / ``min_bucket``: the extremum of the metric
    across the parent's buckets PLUS the list of bucket keys attaining
    it (ES returns ``keys`` as a list — several buckets can tie)."""
    if kind not in ("max", "min"):
        raise ValueError("kind must be 'max' or 'min'")
    m = _metric(buckets, buckets_path).astype(np.float64)
    if not len(m):
        return {"value": None, "keys": []}
    v = float(m.max() if kind == "max" else m.min())
    keys = buckets.column(key_col).to_numpy(zero_copy_only=False)[m == v]
    return {"value": v, "keys": [k.item() if hasattr(k, "item") else k
                                 for k in keys]}


def normalize(buckets: pa.Table, buckets_path: str, method: str,
              out_col: str | None = None) -> pa.Table:
    """ES ``normalize`` pipeline aggregation: rescale the metric across
    the parent's buckets.  Methods (ES names): ``percent_of_sum``,
    ``rescale_0_1``, ``rescale_0_100``, ``mean`` (x - avg), ``z-score``
    ((x - avg) / stddev, population stddev like ES), ``softmax``.
    Degenerate spans (max == min, stddev == 0, sum == 0) yield null for
    every bucket, matching ES skipping the value."""
    m = _metric(buckets, buckets_path).astype(np.float64)
    n = len(m)
    out = np.full(n, np.nan)
    if n:
        if method == "percent_of_sum":
            s = m.sum()
            if s != 0.0:
                out = m / s
        elif method in ("rescale_0_1", "rescale_0_100"):
            lo, hi = m.min(), m.max()
            if hi != lo:
                out = (m - lo) / (hi - lo)
                if method == "rescale_0_100":
                    out = out * 100.0
        elif method == "mean":
            out = m - m.mean()
        elif method == "z-score":
            sd = m.std()  # population, like ES
            if sd != 0.0:
                out = (m - m.mean()) / sd
        elif method == "softmax":
            e = np.exp(m - m.max())  # stable; ES uses plain exp(x)/sum
            out = e / e.sum()
        else:
            raise ValueError(f"unknown normalize method {method!r}")
    return buckets.append_column(
        out_col or f"{buckets_path}_{method}",
        pa.array([None if np.isnan(v) else float(v) for v in out],
                 pa.float64()),
    )


def percentiles_bucket(buckets: pa.Table, buckets_path: str,
                       percents: tuple = (50.0, 95.0)) -> dict:
    """ES ``percentiles_bucket`` sibling aggregation: nearest-rank
    percentiles (``percentile_disc``: the value at cumulative rank
    ``ceil(p/100 * n)``, same convention as the metric percentiles) of
    a metric across ALL buckets.  Null metrics are skipped (ES's
    default skip gap policy); an empty series yields nulls."""
    import math

    vals = _metric(buckets, buckets_path)
    vals = vals[~np.isnan(vals)]
    out: dict[str, float | None] = {}
    if not vals.size:
        return {f"p{p:g}": None for p in percents}
    vals = np.sort(vals)
    for p in percents:
        rank = max(math.ceil(p / 100.0 * vals.size), 1)
        out[f"p{p:g}"] = float(vals[min(rank, vals.size) - 1])
    return out
