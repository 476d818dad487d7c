"""Geo query/aggregation family over point columns — ES's geo_point
surface re-expressed as vectorized Ray Data batch transforms:

* :func:`geo_bounding_box` — ES ``geo_bounding_box`` query (pure
  comparisons, exact).
* :func:`geo_distance_filter` — ES ``geo_distance`` query (haversine,
  vectorized numpy; one boolean mask per batch).
* :func:`geo_distance_agg` — ES ``geo_distance`` aggregation (distance
  ring buckets, map-side integer partials — the event stream never
  moves).
* :func:`geotile_grid` — ES ``geotile_grid`` aggregation (web-mercator
  z/x/y tiles, map-side partial counts per tile).

The corpus has no geo columns, so callers derive deterministic
coordinates with :func:`derive_points` (integer arithmetic + one IEEE
division — bit-identical in numpy and any SQL engine, keeping DuckDB
twins exact).  Haversine uses the mean earth radius 6 371 000 m
(documented: ES/Lucene use 6 371 008.7714 m; the formula is otherwise
the standard half-versine both systems compute).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data

EARTH_RADIUS_M = 6_371_000.0


def derive_points(batch: pa.Table, lat_key: str = "user_id",
                  lon_key: str = "event_id") -> tuple[np.ndarray, np.ndarray]:
    """Deterministic synthetic geo_point: a centidegree grid from integer
    key columns — integer multiply/mod, then one IEEE division /
    subtraction / addition chain every engine computes bit-identically.
    Latitudes stay in (-60, 60) (mercator singularities and the geotile
    +-85.05 cut are unreachable) and the +0.005 half-cell offset keeps
    every point strictly off tile/box boundaries (verified margins at the
    test scales: >= 1e-4 degrees/meters vs ~1e-9 cross-libm jitter)."""
    a = batch.column(lat_key).to_numpy().astype(np.int64)
    b = batch.column(lon_key).to_numpy().astype(np.int64)
    lat = ((a * 37) % 12000) / 100.0 - 60.0 + 0.005
    lon = ((b * 73) % 36000) / 100.0 - 180.0 + 0.005
    return lat, lon


def haversine_m(lat: np.ndarray, lon: np.ndarray,
                clat: float, clon: float) -> np.ndarray:
    """Vectorized haversine distance in meters to a fixed center."""
    rlat = np.radians(lat)
    rlon = np.radians(lon)
    rclat = math.radians(clat)
    rclon = math.radians(clon)
    dlat = rlat - rclat
    dlon = rlon - rclon
    h = (np.sin(dlat / 2.0) ** 2
         + np.cos(rclat) * np.cos(rlat) * np.sin(dlon / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))


def geo_bounding_box(
    ds: ray.data.Dataset,
    top: float, left: float, bottom: float, right: float,
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """ES ``geo_bounding_box`` query: ids of rows whose derived point
    falls inside [bottom, top] x [left, right] (inclusive edges, no
    dateline wrapping — boxes here don't cross +-180).  Exact: nothing
    but comparisons."""

    def f(batch: pa.Table) -> pa.Table:
        lat, lon = derive_points(batch)
        m = (lat <= top) & (lat >= bottom) & (lon >= left) & (lon <= right)
        return pa.table({id_col: batch.column(id_col).filter(pa.array(m))})

    return ds.map_batches(f, batch_format="pyarrow")


def geo_distance_filter(
    ds: ray.data.Dataset,
    center_lat: float, center_lon: float, radius_m: float,
    id_col: str = "event_id",
) -> ray.data.Dataset:
    """ES ``geo_distance`` query: ids + floor(distance in meters) of rows
    within ``radius_m`` of the center (haversine, vectorized)."""

    def f(batch: pa.Table) -> pa.Table:
        lat, lon = derive_points(batch)
        d = haversine_m(lat, lon, center_lat, center_lon)
        m = d <= radius_m
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(m)),
            "dist_m": pa.array(np.floor(d[m]).astype(np.int64)),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def geo_distance_agg(
    ds: ray.data.Dataset,
    center_lat: float, center_lon: float,
    edges_m: list[float],
) -> list[dict]:
    """ES ``geo_distance`` aggregation: doc counts per distance ring
    [from, to) around the center (first ring starts at 0, last is
    open-ended — the ES ranges convention).  Map-side ``searchsorted``
    into the ring edges feeding integer partials; traffic is
    O(rings) per batch."""
    edges = np.asarray(sorted(edges_m), dtype=np.float64)
    nb = edges.size + 1

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = derive_points(batch)
        d = haversine_m(lat, lon, center_lat, center_lon)
        # ES ranges are [from, to): d == edges[i] lands in the ring
        # STARTING at edges[i] (side='right': first edge strictly > d)
        ring = np.searchsorted(edges, d, side="right")
        counts = np.bincount(ring, minlength=nb)
        return pa.table({
            "ring": pa.array(range(nb), pa.int64()),
            "n_part": pa.array(counts.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ring").aggregate(Sum("n_part")).take_all()
    )  # O(rings) rows
    by_ring = {int(r["ring"]): int(r["sum(n_part)"]) for r in rows}
    out = []
    for i in range(nb):
        out.append({
            "from": 0.0 if i == 0 else float(edges[i - 1]),
            "to": float(edges[i]) if i < edges.size else None,
            "doc_count": by_ring.get(i, 0),
        })
    return out


def geotile_grid(
    ds: ray.data.Dataset,
    zoom: int = 4,
    size: int = 10,
) -> list[dict]:
    """ES ``geotile_grid`` aggregation: doc counts per web-mercator tile
    ``zoom/x/y`` at the given zoom, top ``size`` tiles by (count desc,
    key asc).  x = floor((lon+180)/360 * 2^z); y from the standard
    mercator projection, clamped to the valid tile range (ES clamps at
    the +-85.05 mercator cut).  Map-side Arrow/numpy partials grouped by
    tile key — traffic is O(distinct tiles per batch)."""
    if not (0 <= zoom <= 29):
        raise ValueError("zoom must be in [0, 29]")
    n = 1 << zoom

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = derive_points(batch)
        x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
        rlat = np.radians(lat)
        y_f = (1.0 - np.log(np.tan(rlat) + 1.0 / np.cos(rlat)) / math.pi) \
            / 2.0 * n
        y = np.clip(np.floor(y_f), 0, n - 1).astype(np.int64)
        x = np.clip(x, 0, n - 1)
        key = x * n + y
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "tile": pa.array(u),
            "n_part": pa.array(c.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tile").aggregate(Sum("n_part")).take_all()
    )  # O(tiles at zoom) rows — bounded by 4^zoom, use small zooms
    buckets = sorted(
        ((int(r["sum(n_part)"]), int(r["tile"])) for r in rows),
        key=lambda t: (-t[0], t[1]),
    )[:size]
    return [
        {"key": f"{zoom}/{t // n}/{t % n}", "doc_count": c}
        for c, t in buckets
    ]


# Integer milli-degree twins of derive_points: lat = (k*10 - 59995)/1000,
# lon = (m*10 - 179995)/1000 — the derived grid is exact in units of
# 0.001 degrees, so centroid/bounds aggregations can run on int64 sums
# (order-independent, bit-exact across engines) instead of float sums.
def derive_points_milli(batch: pa.Table, lat_key: str = "user_id",
                        lon_key: str = "event_id"
                        ) -> tuple[np.ndarray, np.ndarray]:
    a = batch.column(lat_key).to_numpy().astype(np.int64)
    b = batch.column(lon_key).to_numpy().astype(np.int64)
    lat_m = ((a * 37) % 12000) * 10 - 59995
    lon_m = ((b * 73) % 36000) * 10 - 179995
    return lat_m, lon_m


def geo_summary(ds: ray.data.Dataset) -> dict:
    """One-pass ES ``geo_centroid`` + ``geo_bounds``: per batch ONE row
    of (lat/lon milli-degree sums, count, extrema) partials, one
    driver-side reduce.  Sums/extrema run in exact integer
    milli-degrees (order-independent, bit-exact across engines); the
    centroid ships as ``floor(sum_milli * 1000 / n)`` micro-degrees —
    one IEEE multiply+divide+floor any engine reproduces bit-identically
    (the products stay < 2^53).  An empty dataset yields count 0 and
    all-null coordinates, like ES's empty hit set."""

    def partial(batch: pa.Table) -> pa.Table:
        lat_m, lon_m = derive_points_milli(batch)
        if not lat_m.size:
            return pa.table({k: pa.array([], pa.int64()) for k in (
                "sum_lat_milli", "sum_lon_milli", "n", "top_milli",
                "bottom_milli", "left_milli", "right_milli",
            )})
        return pa.table({
            "sum_lat_milli": pa.array([int(lat_m.sum())], pa.int64()),
            "sum_lon_milli": pa.array([int(lon_m.sum())], pa.int64()),
            "n": pa.array([len(lat_m)], pa.int64()),
            "top_milli": pa.array([int(lat_m.max())], pa.int64()),
            "bottom_milli": pa.array([int(lat_m.min())], pa.int64()),
            "left_milli": pa.array([int(lon_m.min())], pa.int64()),
            "right_milli": pa.array([int(lon_m.max())], pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum

    row = (
        ds.map_batches(partial, batch_format="pyarrow")
        .aggregate(Sum("sum_lat_milli"), Sum("sum_lon_milli"), Sum("n"),
                   Max("top_milli"), Min("bottom_milli"),
                   Min("left_milli"), Max("right_milli"))
    )
    row = row or {}  # a fully-empty dataset can yield no row at all
    n = int(row.get("sum(n)") or 0)  # empty input -> None-valued fields
    if n == 0:
        return {"count": 0, "lat_u": None, "lon_u": None,
                "top_milli": None, "bottom_milli": None,
                "left_milli": None, "right_milli": None}
    return {
        "count": n,
        "lat_u": math.floor(int(row["sum(sum_lat_milli)"]) * 1000.0 / n),
        "lon_u": math.floor(int(row["sum(sum_lon_milli)"]) * 1000.0 / n),
        "top_milli": int(row["max(top_milli)"]),
        "bottom_milli": int(row["min(bottom_milli)"]),
        "left_milli": int(row["min(left_milli)"]),
        "right_milli": int(row["max(right_milli)"]),
    }


def geo_centroid(ds: ray.data.Dataset) -> dict:
    """ES ``geo_centroid`` aggregation — see :func:`geo_summary` (the
    shared one-pass kernel)."""
    s = geo_summary(ds)
    return {"count": s["count"], "lat_u": s["lat_u"],
            "lon_u": s["lon_u"]}


def geo_bounds(ds: ray.data.Dataset) -> dict:
    """ES ``geo_bounds`` aggregation: the smallest box containing every
    point — top_left (max lat, min lon) and bottom_right (min lat,
    max lon); null bounds on an empty dataset.  See
    :func:`geo_summary`."""
    s = geo_summary(ds)
    return {k: s[k] for k in ("top_milli", "bottom_milli",
                              "left_milli", "right_milli")}


def geo_line_agg(
    ds: ray.data.Dataset,
    group_key: str = "user_id",
    sort_key: str = "ts",
    size: int = 10,
) -> pa.Table:
    """ES ``geo_line`` aggregation: per bucket (one per ``group_key``
    value) the track of derived points ordered ascending by
    ``sort_key``, truncated to the FIRST ``size`` points, with ES's
    ``complete`` flag (false when the bucket held more points than
    ``size``).  Equal sort keys tie-break on event_id (deterministic;
    ES leaves ties unspecified).

    Scale shape: the map side pre-truncates — each batch ships at most
    ``size`` rows per group (lexsort + run-boundary rank, no Python
    loop) plus the per-(batch, group) total count carried on the first
    kept row, so the single ``groupby().map_groups`` shuffle moves
    O(groups x size) rows regardless of input skew; the merge re-sorts
    only the <= size x num_batches survivors per group.  Returns one
    row per kept point: (group, seq, lat_m, lon_m, complete)."""
    if size < 1:
        raise ValueError("geo_line size must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        lat_m, lon_m = derive_points_milli(batch)
        grp = batch.column(group_key).to_numpy().astype(np.int64)
        if not grp.size:  # empty block (e.g. a fully-filtered batch)
            return pa.table({
                group_key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "lat_m": pa.array([], pa.int64()),
                "lon_m": pa.array([], pa.int64()),
                "grp_count": pa.array([], pa.int64()),
            })
        ts = batch.column(sort_key).to_numpy()
        if ts.dtype.kind == "M":
            ts = ts.astype("datetime64[us]").view(np.int64)
        else:
            ts = ts.astype(np.int64)
        eid = batch.column("event_id").to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, grp))
        sg = grp[order]
        starts = np.flatnonzero(np.r_[True, sg[1:] != sg[:-1]])
        counts = np.diff(np.r_[starts, sg.size])
        rank = np.arange(sg.size) - np.repeat(starts, counts)
        gcnt = np.zeros(sg.size, dtype=np.int64)
        gcnt[starts] = counts  # rank 0 is always kept
        keep = rank < size
        ko = order[keep]
        return pa.table({
            group_key: pa.array(sg[keep]),
            "ts_us": pa.array(ts[ko]),
            "event_id": pa.array(eid[ko]),
            "lat_m": pa.array(lat_m[ko]),
            "lon_m": pa.array(lon_m[ko]),
            "grp_count": pa.array(gcnt[keep]),
        })

    def merge(df):
        import pandas as pd

        df = df.sort_values(["ts_us", "event_id"]).reset_index(drop=True)
        total = int(df["grp_count"].sum())
        kept = df.head(size)
        return pd.DataFrame({
            group_key: kept[group_key],
            "seq": np.arange(len(kept), dtype=np.int64),
            "lat_m": kept["lat_m"].to_numpy(),
            "lon_m": kept["lon_m"].to_numpy(),
            "complete": np.full(len(kept), total <= size, dtype=bool),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_key)
        .map_groups(merge, batch_format="pandas")
    )
    tbl = pa.Table.from_pandas(
        out.to_pandas(), preserve_index=False
    )
    if tbl.num_rows == 0:  # empty input: keep the documented schema
        return pa.table({
            group_key: pa.array([], pa.int64()),
            "seq": pa.array([], pa.int64()),
            "lat_m": pa.array([], pa.int64()),
            "lon_m": pa.array([], pa.int64()),
            "complete": pa.array([], pa.bool_()),
        })
    return tbl.sort_by([(group_key, "ascending"), ("seq", "ascending")])


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_cell_bits(precision: int) -> tuple[int, int, int]:
    """(total_bits, lon_bits, lat_bits) of a geohash at ``precision``
    characters: 5 bits per char, alternating lon/lat starting with lon,
    so lon gets the extra bit at odd precisions."""
    total = 5 * precision
    return total, (total + 1) // 2, total // 2


def geohash_interleave(gx: np.ndarray, gy: np.ndarray,
                       precision: int) -> np.ndarray:
    """Vectorized MSB-first interleave of cell coords into the geohash
    bit key (lon bit first — the base32 string is the 5-bit grouping of
    this key, so integer order == geohash string order)."""
    total, lon_bits, lat_bits = geohash_cell_bits(precision)
    key = np.zeros_like(gx)
    xi, yi = lon_bits, lat_bits
    for j in range(total):
        if j % 2 == 0:
            xi -= 1
            bit = (gx >> xi) & 1
        else:
            yi -= 1
            bit = (gy >> yi) & 1
        key = (key << 1) | bit
    return key


def geohash_key_string(key: int, precision: int) -> str:
    """Base32 string of an interleaved geohash bit key (5-bit groups,
    MSB first)."""
    return "".join(
        GEOHASH_ALPHABET[(key >> (5 * (precision - 1 - i))) & 31]
        for i in range(precision)
    )


def geohash_encode(lat: float, lon: float, precision: int) -> str:
    """Standard geohash of a point (floor-of-scaled-coordinate form of
    the usual bisection loop) — pinned against published vectors in
    tests.  Cell indices clamp to the last cell so the boundary points
    lat=90 / lon=180 encode like ES/Lucene (all-ones cell), not as an
    off-grid overflow."""
    _, lon_bits, lat_bits = geohash_cell_bits(precision)
    gx = np.int64(min(math.floor((lon + 180.0) / 360.0 * (1 << lon_bits)),
                      (1 << lon_bits) - 1))
    gy = np.int64(min(math.floor((lat + 90.0) / 180.0 * (1 << lat_bits)),
                      (1 << lat_bits) - 1))
    key = int(geohash_interleave(gx, gy, precision))
    return geohash_key_string(key, precision)


def geohash_grid(
    ds: ray.data.Dataset,
    precision: int = 2,
    size: int = 10,
) -> list[dict]:
    """ES ``geohash_grid`` aggregation: doc counts per geohash cell at
    ``precision`` chars, top ``size`` cells by (count desc, key asc) —
    key order is the base32 string order, i.e. the interleaved bit key.
    Map-side partials grouped on (cell_x, cell_y); traffic is
    O(distinct cells per batch), driver holds O(cells at precision)
    rows — use small precisions (<= 4) or pre-filter, like ES's
    ``geohash_grid`` doc warns."""
    if not (1 <= precision <= 8):
        raise ValueError("precision must be in [1, 8]")
    _, lon_bits, lat_bits = geohash_cell_bits(precision)
    nx, ny = 1 << lon_bits, 1 << lat_bits

    def partial(batch: pa.Table) -> pa.Table:
        lat, lon = derive_points(batch)
        gx = np.floor((lon + 180.0) / 360.0 * nx).astype(np.int64)
        gy = np.floor((lat + 90.0) / 180.0 * ny).astype(np.int64)
        # derived points sit strictly inside (-180,180)x(-60,60) so the
        # floors are already in range — no clamp, keeping the SQL twin
        # expression-identical
        cell = gx * ny + gy
        u, c = np.unique(cell, return_counts=True)
        return pa.table({
            "gx": pa.array(u // ny),
            "gy": pa.array(u % ny),
            "n_part": pa.array(c.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["gx", "gy"]).aggregate(Sum("n_part")).take_all()
    )  # O(cells at precision) rows
    gx = np.array([int(r["gx"]) for r in rows], dtype=np.int64)
    gy = np.array([int(r["gy"]) for r in rows], dtype=np.int64)
    n = np.array([int(r["sum(n_part)"]) for r in rows], dtype=np.int64)
    keys = geohash_interleave(gx, gy, precision)
    order = np.lexsort((keys, -n))[:size]
    out = []
    for i in order:
        key = int(keys[i])
        out.append({
            "key": geohash_key_string(key, precision),
            "gx": int(gx[i]),
            "gy": int(gy[i]),
            "hash_key": key,
            "doc_count": int(n[i]),
        })
    return out
