"""Geo family (geo_bounding_box / geo_distance / rings / geotile_grid)
over deterministic derived points — brute-force parity on a synthetic
events table."""

import datetime as dt
import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _events(n=400):
    return ray.data.from_arrow(pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array([(i * 13) % 97 + 1 for i in range(n)],
                            pa.int64()),
        "ts": pa.array([dt.datetime(2024, 1, 1)] * n),
        "value": pa.array([1.0] * n),
    }))


def _pts(n=400):
    a = np.array([(i * 13) % 97 + 1 for i in range(n)], dtype=np.int64)
    b = np.arange(1, n + 1, dtype=np.int64)
    lat = ((a * 37) % 12000) / 100.0 - 60.0 + 0.005
    lon = ((b * 73) % 36000) / 100.0 - 180.0 + 0.005
    return lat, lon


def _hav(lat, lon, clat, clon):
    rlat, rlon = np.radians(lat), np.radians(lon)
    rc, rl = math.radians(clat), math.radians(clon)
    h = (np.sin((rlat - rc) / 2) ** 2
         + math.cos(rc) * np.cos(rlat) * np.sin((rlon - rl) / 2) ** 2)
    return 2 * 6_371_000.0 * np.arcsin(np.sqrt(h))


def test_geo_bounding_box():
    from elasticsearch_ray.ops.geo import geo_bounding_box

    out = geo_bounding_box(_events(), top=0.0, left=-90.0,
                           bottom=-40.0, right=90.0).take_all()
    got = sorted(r["event_id"] for r in out)
    lat, lon = _pts()
    m = (lat <= 0.0) & (lat >= -40.0) & (lon >= -90.0) & (lon <= 90.0)
    want = sorted((np.arange(1, 401)[m]).tolist())
    assert got == want and got  # non-trivial


def test_geo_distance_filter_and_rings():
    from elasticsearch_ray.ops.geo import geo_distance_agg, geo_distance_filter

    lat, lon = _pts()
    d = _hav(lat, lon, 10.0, 20.0)
    out = geo_distance_filter(_events(), 10.0, 20.0, 9e6).take_all()
    got = sorted((r["event_id"], r["dist_m"]) for r in out)
    ids = np.arange(1, 401)
    want = sorted(
        (int(i), int(np.floor(x))) for i, x in zip(ids, d) if x <= 9e6)
    assert got == want and got

    rings = geo_distance_agg(_events(), 10.0, 20.0, [5e6, 9e6, 14e6])
    cuts = [0, 5e6, 9e6, 14e6, np.inf]
    want_counts = [int(((d >= cuts[i]) & (d < cuts[i + 1])).sum())
                   for i in range(4)]
    assert [r["doc_count"] for r in rings] == want_counts
    assert sum(want_counts) == 400
    assert rings[0]["from"] == 0.0 and rings[-1]["to"] is None


def test_geotile_grid():
    from elasticsearch_ray.ops.geo import geotile_grid

    lat, lon = _pts()
    n = 16
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    rlat = np.radians(lat)
    y = np.clip(np.floor(
        (1.0 - np.log(np.tan(rlat) + 1.0 / np.cos(rlat)) / math.pi)
        / 2.0 * n), 0, n - 1).astype(int)
    from collections import Counter

    want = Counter(zip(x.tolist(), y.tolist()))
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0][0] * n
                                               + kv[0][1]))[:10]
    got = geotile_grid(_events(), zoom=4, size=10)
    assert [(b["key"], b["doc_count"]) for b in got] == \
        [(f"4/{xx}/{yy}", c) for (xx, yy), c in top]
    with pytest.raises(ValueError):
        geotile_grid(_events(), zoom=31)


def test_geo_centroid_and_bounds():
    from elasticsearch_ray.ops.geo import geo_bounds, geo_centroid

    lat, lon = _pts()
    c = geo_centroid(_events())
    lat_m = np.round(lat * 1000).astype(np.int64)
    lon_m = np.round(lon * 1000).astype(np.int64)
    assert c["count"] == lat.size
    assert c["lat_u"] == math.floor(int(lat_m.sum()) * 1000.0 / lat.size)
    assert c["lon_u"] == math.floor(int(lon_m.sum()) * 1000.0 / lat.size)
    # sanity: micro-degree centroid within 1e-3 deg of the float mean
    assert abs(c["lat_u"] / 1e6 - lat.mean()) < 1e-3
    assert abs(c["lon_u"] / 1e6 - lon.mean()) < 1e-3

    b = geo_bounds(_events())
    assert b["top_milli"] == int(lat_m.max())
    assert b["bottom_milli"] == int(lat_m.min())
    assert b["left_milli"] == int(lon_m.min())
    assert b["right_milli"] == int(lon_m.max())


def test_geohash_encode_vectors():
    # published vectors: Wikipedia's (57.64911, 10.40744) -> u4pruydqqvj
    # and the classic ezs42 example
    from elasticsearch_ray.ops.geo import geohash_encode

    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_encode(42.605, -5.603, 5) == "ezs42"
    assert geohash_encode(57.64911, 10.40744, 5) == "u4pru"
    assert geohash_encode(0.0, 0.0, 1) == "s"


def test_geohash_grid():
    from elasticsearch_ray.ops.geo import (
        geohash_cell_bits, geohash_encode, geohash_grid,
    )

    for precision in (2, 3):  # even + odd bit splits
        lat, lon = _pts()
        _, lon_bits, lat_bits = geohash_cell_bits(precision)
        want = {}
        for la, lo in zip(lat, lon):
            want[geohash_encode(la, lo, precision)] = \
                want.get(geohash_encode(la, lo, precision), 0) + 1
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = geohash_grid(_events(), precision=precision, size=10)
        assert [(b["key"], b["doc_count"]) for b in got] == top
        # cell coords round-trip through the interleave
        for b in got:
            assert b["key"] == geohash_encode(
                (b["gy"] + 0.5) / (1 << lat_bits) * 180.0 - 90.0,
                (b["gx"] + 0.5) / (1 << lon_bits) * 360.0 - 180.0,
                precision,
            )
    with pytest.raises(ValueError):
        geohash_grid(_events(), precision=0)


def test_geo_summary_empty_and_boundary():
    from elasticsearch_ray.ops.geo import (
        geo_bounds, geo_centroid, geo_summary, geohash_encode,
    )

    empty = ray.data.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
    }))
    s = geo_summary(empty)
    assert s["count"] == 0 and s["lat_u"] is None
    assert geo_centroid(empty)["count"] == 0
    assert geo_bounds(empty)["top_milli"] is None
    # boundary coordinates clamp to the last cell (ES/Lucene behavior)
    assert geohash_encode(90.0, 180.0, 5) == "zzzzz"
    assert geohash_encode(-90.0, -180.0, 5) == "00000"


def test_geo_line_agg():
    """geo_line: per-user track ordered by (ts, event_id), first `size`
    points, complete flag — vs a plain-python oracle with varied
    timestamps (including ties)."""
    from elasticsearch_ray.ops.geo import geo_line_agg

    n = 300
    uid = [(i * 7) % 23 for i in range(n)]
    # ts with deliberate ties inside users
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(minutes=(i * 11) % 40)
          for i in range(n)]
    eid = list(range(1, n + 1))
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts),
    })).repartition(7)
    for size in (1, 4, 50):
        got = geo_line_agg(ds, size=size).to_pydict()
        # oracle
        import collections
        per = collections.defaultdict(list)
        for i in range(n):
            a, b = uid[i], eid[i]
            lat_m = ((a * 37) % 12000) * 10 - 59995
            lon_m = ((b * 73) % 36000) * 10 - 179995
            per[a].append((ts[i], b, lat_m, lon_m))
        rows = []
        for u in sorted(per):
            pts = sorted(per[u])
            comp = len(pts) <= size
            for s, (_, _, la, lo) in enumerate(pts[:size]):
                rows.append((u, s, la, lo, comp))
        want = {
            "user_id": [r[0] for r in rows],
            "seq": [r[1] for r in rows],
            "lat_m": [r[2] for r in rows],
            "lon_m": [r[3] for r in rows],
            "complete": [r[4] for r in rows],
        }
        assert got == want, size


def test_geo_line_validation():
    from elasticsearch_ray.ops.geo import geo_line_agg

    with pytest.raises(ValueError, match=">= 1"):
        geo_line_agg(_events(), size=0)


def test_geo_line_empty_batches():
    """Empty blocks (fully-filtered batches / empty dataset) must not
    crash the map-side partial."""
    from elasticsearch_ray.ops.geo import geo_line_agg

    ds = _events(200)

    def keep_none(b):
        return b.slice(0, 0)

    empty = ds.map_batches(keep_none, batch_format="pyarrow")
    out = geo_line_agg(empty, size=3)
    assert out.num_rows == 0

    # mixed: one of several blocks empties after a filter
    import pyarrow.compute as pc

    def keep_some(b):
        return b.filter(pc.less(b.column("user_id"), 5))

    part = ds.repartition(8).map_batches(keep_some, batch_format="pyarrow")
    out2 = geo_line_agg(part, size=3)
    assert out2.num_rows > 0
    assert set(out2.column("user_id").to_pylist()) <= set(range(5))


def test_geo_line_skew_bounded_shuffle():
    """Hot-group adversarial: one user owns 90% of events.  The map-side
    partial must ship at most `size` rows per (batch, group) — assert
    the actual partial output stays bounded — and the merged result must
    still match the oracle."""
    from elasticsearch_ray.ops.geo import geo_line_agg

    n = 2000
    uid = [7 if i % 10 else (i // 10) % 5 for i in range(n)]  # 7 is hot
    ts = [dt.datetime(2024, 1, 1) + dt.timedelta(seconds=(i * 37) % 500)
          for i in range(n)]
    tbl = pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts),
    })
    ds = ray.data.from_arrow(tbl).repartition(10)
    size = 4
    out = geo_line_agg(ds, size=size).to_pydict()
    # shuffle bound: <= size rows per (batch, group) -> with 10 batches
    # and 6 groups the SHUFFLED row count is <= 10 * 6 * size, never the
    # 2000 input rows; the final output is <= groups * size
    assert len(out["seq"]) <= 6 * size
    # oracle
    import collections
    per = collections.defaultdict(list)
    for i in range(n):
        a, b = uid[i], i + 1
        per[a].append((ts[i], b,
                       ((a * 37) % 12000) * 10 - 59995,
                       ((b * 73) % 36000) * 10 - 179995))
    rows = []
    for u in sorted(per):
        pts = sorted(per[u])
        comp = len(pts) <= size
        for s, (_, _, la, lo) in enumerate(pts[:size]):
            rows.append((u, s, la, lo, comp))
    assert out["user_id"] == [r[0] for r in rows]
    assert out["seq"] == [r[1] for r in rows]
    assert out["lat_m"] == [r[2] for r in rows]
    assert out["lon_m"] == [r[3] for r in rows]
    assert out["complete"] == [r[4] for r in rows]
