"""Mergeable sketches for high-cardinality aggregations.

The exact percentiles / cardinality path (``Searcher.value_counts_agg``)
ships one (value -> count) map per searcher — exact and cheap for bounded
doc-value domains, but O(distinct values) of actor->driver traffic on an
unbounded field (a microsecond timestamp at 100 TB has ~10^11 distinct
values).  These sketches cap the per-searcher payload at a fixed size and
merge associatively at the same fanout point:

* **HyperLogLog** (plain HLL with the linear-counting small-range
  correction; ES's cardinality agg uses HLL++): 2^p one-byte registers
  (p=14 -> 16 KB), relative standard error ~1.04/sqrt(2^p) ≈ 0.8%.
  Plain HLL carries the known systematic bias hump just above the
  linear-counting cutover (n ≈ 2.5m..5m, i.e. ~40k-80k at p=14):
  estimates there run ~+1.5-2.5% — HLL++'s empirical bias tables are
  deliberately not reimplemented; size tolerances off the bias band,
  not the 0.8% figure, in that range.  Merge = elementwise max.  All
  register updates are vectorized (``np.maximum.at``).
* **Centroid digest** (a deterministic 1-D t-digest variant over integer
  doc-values): each searcher compresses its exact ``np.unique`` value
  counts into <= k (mean value, weight) centroids by equal-weight
  cumulative bucketing; the driver concatenates, re-compresses, and reads
  quantiles off the cumulative weights.  Rank error <= n/k per side
  PER COMPRESSION STAGE — the full pipeline compresses up to three
  times (reader, searcher merge, driver merge), so the end-to-end
  bound is O(c * n/k) with c <= 3.

Both are pure numpy — no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np

HLL_P = 14  # 16384 registers; ~0.8% standard error


def hash64(values: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int64/uint64 array — the
    avalanche permutation used for HLL register assignment (public-domain
    constants from the splitmix64 reference)."""
    x = values.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def hash64_strings(strings: list[str]) -> np.ndarray:
    """64-bit content hashes of strings (blake2b-8); one Python call per
    DISTINCT category, so cost is bounded by the dictionary, not rows.
    Delegates to the one shared blake2b-8 helper in ops.dedup so the
    two modules can never drift on the stable content-hash contract."""
    from ..ops.dedup import _text_hash64

    return _text_hash64(strings)


def hll_empty(p: int = HLL_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(regs: np.ndarray, hashes: np.ndarray, p: int = HLL_P) -> None:
    """Fold a batch of 64-bit hashes into the register array in place."""
    if hashes.size == 0:
        return
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    # low 64-p bits in one mask (the former shift-left/shift-right pair
    # allocated an extra full-size temporary per batch)
    wv_mask = np.uint64((1 << (64 - p)) - 1)
    # rho = (64-p) - floor(log2(wv)) for wv > 0.  Computed with an exact
    # integer bit-length (6 vectorized shift/compare steps): float64
    # log2 is NOT exact here — log2(2^49-1) rounds UP to 49, making
    # floor(log2) off by one for all-ones patterns >= 49 bits.
    wv = hashes & wv_mask
    v = wv.copy()
    bl = np.zeros(v.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        v[m] >>= np.uint64(s)
    bl += (v != 0).astype(np.int64)  # bit_length; 0 for wv == 0
    rho = np.where(wv > 0, (64 - p) - (bl - 1), 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected harmonic-mean estimate with the linear-counting
    small-range correction (Flajolet et al. 2007)."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        return m * float(np.log(m / zeros))
    return est


# --- centroid digest --------------------------------------------------------

def centroids_from_counts(
    values: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compress sorted (value, count) pairs to <= k (mean, weight)
    centroids by equal-weight cumulative bucketing (weighted means stay
    order-preserving because input values are sorted)."""
    if np.any(counts <= 0):
        # a zero count makes its bucket id -1 and divides 0/0 into a
        # NaN centroid that silently poisons every later percentile —
        # internal callers (np.unique counts, merged weights) never
        # pass zeros, so make the contract loud for external ones
        raise ValueError("centroids_from_counts: counts must be > 0")
    if values.size <= k:
        return values.astype(np.float64), counts.astype(np.int64)
    cw = np.cumsum(counts, dtype=np.int64)
    total = int(cw[-1])
    # equal-weight bucketing: cumulative weight c lands in bucket
    # ((c-1)*k)//total — a monotone <= k-way partition whose boundary
    # buckets absorb the rounding when k does not divide total
    bucket = np.minimum(((cw - 1) * k) // total, k - 1)
    starts = np.concatenate(
        ([0], np.flatnonzero(bucket[1:] != bucket[:-1]) + 1)
    )
    wsum = np.add.reduceat(counts.astype(np.int64), starts)
    vsum = np.add.reduceat(values.astype(np.float64) * counts, starts)
    return vsum / wsum, wsum


def centroids_merge(
    parts: list[tuple[np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    vals = np.concatenate([p[0] for p in parts]) if parts else np.empty(0)
    wts = (
        np.concatenate([p[1] for p in parts])
        if parts
        else np.empty(0, dtype=np.int64)
    )
    if not vals.size:
        return vals, wts.astype(np.int64)
    order = np.argsort(vals, kind="stable")
    return centroids_from_counts(vals[order], wts[order].astype(np.int64), k)


def centroid_percentile(
    vals: np.ndarray, wts: np.ndarray, percent: float
) -> float | None:
    """Nearest-rank read over the cumulative centroid weights (the approx
    analogue of SQL ``percentile_disc``)."""
    if not (0.0 <= percent <= 100.0):
        raise ValueError(f"percent must be in [0, 100], got {percent}")
    if not vals.size:
        return None
    import math

    cw = np.cumsum(wts, dtype=np.int64)
    rank = max(1, math.ceil(percent / 100.0 * int(cw[-1])))
    return float(vals[min(np.searchsorted(cw, rank), cw.size - 1)])
