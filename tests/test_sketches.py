"""Sketch path for high-cardinality aggregations (round-4): HLL
cardinality and centroid-digest percentiles — fixed per-searcher payload,
bounded error, associative merge; exact paths untouched."""

import math
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from elasticsearch_ray.functions.sketches import (
    centroid_percentile,
    centroids_from_counts,
    centroids_merge,
    hash64,
    hll_add_hashes,
    hll_empty,
    hll_estimate,
    hll_merge,
)


def test_hll_million_distinct():
    """1e6-distinct stream: estimate within 2%, merge == union sketch,
    and the sketch size stays 2^p bytes."""
    rng = np.random.default_rng(17)
    vals = np.unique(
        rng.integers(-(2**62), 2**62, size=1_200_000, dtype=np.int64)
    )[:1_000_000]
    regs = hll_empty()
    hll_add_hashes(regs, hash64(vals))
    assert regs.nbytes == 1 << 14
    est = hll_estimate(regs)
    assert abs(est - 1e6) / 1e6 < 0.02
    # associative merge: sketch(A) | sketch(B) == sketch(A ∪ B), overlap ok
    a, b = hll_empty(), hll_empty()
    hll_add_hashes(a, hash64(vals[:700_000]))
    hll_add_hashes(b, hash64(vals[400_000:]))
    assert np.array_equal(hll_merge(a, b), regs)
    # duplicates never move the estimate
    regs2 = hll_empty()
    hll_add_hashes(regs2, hash64(np.concatenate([vals, vals[:500_000]])))
    assert np.array_equal(regs2, regs)


def test_centroid_digest_rank_error():
    """Skewed 1e6-row stream with ~10^5 distinct values: every requested
    percentile's rank error stays under 2/k after a two-level
    (per-shard compress -> merge -> re-compress) pipeline."""
    rng = np.random.default_rng(5)
    data = (
        rng.zipf(1.25, size=1_000_000).astype(np.int64) * 997
        + rng.integers(0, 997, 1_000_000)
    )
    k = 4096
    # two-level merge mimicking 4 searchers
    parts = []
    for shard in np.array_split(data, 4):
        u, c = np.unique(shard, return_counts=True)
        parts.append(centroids_from_counts(u, c, k))
    vals, wts = centroids_merge(parts, k)
    assert vals.size <= k
    assert int(wts.sum()) == data.size
    srt = np.sort(data)
    for p in (1, 25, 50, 75, 95, 99, 99.9):
        approx = centroid_percentile(vals, wts, p)
        rank_a = int(np.searchsorted(srt, approx, side="right"))
        rank_e = max(1, math.ceil(p / 100.0 * srt.size))
        assert abs(rank_a - rank_e) / srt.size < 2.0 / k, p


def test_engine_approx_aggs(tmp_path):
    """Engine integration: approx cardinality within 2% of exact and
    approx percentiles within rank tolerance, distributed (2 searchers,
    exercising the register / centroid merge) and embedded; exact
    aggregations unchanged."""
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index
    from elasticsearch_ray.pipelines.query import QueryEngine

    rng = random.Random(23)
    vocab = ["merge", "hash", "scan", "join", "other"]
    n = 3_000
    rows = [
        {
            "doc_id": i,
            "text": " ".join(rng.choice(vocab) for _ in range(6)),
            # high-cardinality numeric doc-value: nearly all distinct
            "ts_us": rng.randrange(10**12, 10**13),
            "source": f"s{i % 7}",
        }
        for i in range(n)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]}),
        str(src / "p.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(
        [str(src / "p.parquet")], idx,
        BuildConfig(analyzer="plain", url_column=None, lang_column=None,
                    facet_columns=("ts_us", "source"),
                    docs_per_segment=800, target_partition_rows=500),
    )
    for eng in (QueryEngine(idx, num_searchers=2),
                QueryEngine(idx, num_searchers=0)):
        try:
            for q in ("merge", "merge AND hash"):
                exact = eng.search_cardinality(q, "ts_us")["cardinality"]
                approx = eng.search_cardinality_approx(q, "ts_us")
                assert abs(approx["cardinality"] - exact) / exact < 0.02, q
                # categorical field too (hashes the dictionary)
                exact_s = eng.search_cardinality(q, "source")["cardinality"]
                approx_s = eng.search_cardinality_approx(q, "source")
                assert abs(approx_s["cardinality"] - exact_s) <= max(
                    1, 0.02 * exact_s
                ), q

                pe = eng.search_percentiles(q, "ts_us")
                pa_ = eng.search_percentiles_approx(q, "ts_us")
                assert pa_["count"] == pe["count"]
                # rank-tolerance: approx value's rank within 2*n/k of the
                # target rank among the hit set's values
                merged = eng._merged_value_counts(q, "ts_us")
                srt = np.sort(np.repeat(
                    np.fromiter(merged.keys(), dtype=np.int64,
                                count=len(merged)),
                    np.fromiter(merged.values(), dtype=np.int64,
                                count=len(merged)),
                ))
                for p in (25.0, 50.0, 75.0, 95.0, 99.0):
                    av = pa_["values"][f"p{p:g}"]
                    rank_a = int(np.searchsorted(srt, av, side="right"))
                    rank_e = max(1, math.ceil(p / 100.0 * srt.size))
                    assert abs(rank_a - rank_e) <= max(
                        2, 2.0 * srt.size / 4096
                    ), (q, p)
        finally:
            eng.close()


def test_hll_rho_exact_for_all_ones_suffix():
    """float64 log2 rounds 2^k-1 UP for k >= 49, which would drop the
    register update for an all-ones hash suffix; the integer bit-length
    path must record rho = 1 exactly."""
    from elasticsearch_ray.functions.sketches import HLL_P, hll_add_hashes

    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    idx = 3
    low = np.uint64((1 << (64 - HLL_P)) - 1)  # all-ones suffix
    h = np.array([(np.uint64(idx) << np.uint64(64 - HLL_P)) | low],
                 dtype=np.uint64)
    hll_add_hashes(regs, h)
    assert regs[idx] == 1
    # and a one-leading-zero suffix gives rho = 2
    regs2 = np.zeros(1 << HLL_P, dtype=np.uint8)
    h2 = np.array([(np.uint64(idx) << np.uint64(64 - HLL_P)) | (low >> np.uint64(1))],
                  dtype=np.uint64)
    hll_add_hashes(regs2, h2)
    assert regs2[idx] == 2


def test_centroid_percentile_validates_percent():
    from elasticsearch_ray.functions.sketches import centroid_percentile

    vals = np.array([1.0, 2.0, 3.0])
    wts = np.array([1, 1, 1], dtype=np.int64)
    assert centroid_percentile(vals, wts, 100.0) == 3.0
    with pytest.raises(ValueError):
        centroid_percentile(vals, wts, 101.0)
