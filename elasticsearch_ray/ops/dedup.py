"""Deduplication operators for training-data pipelines.

All operators stream over a ``ray.data.Dataset`` of documents and return a
Dataset; none materializes the corpus driver-side.  Scale notes per operator:

* exact:   hash-partition on a 128-bit content hash (``groupby`` shuffle
           moves only (h1, h2, doc_id) after an early projection), then
           NATIVE min/count aggregates — no per-group Python, no text in
           the shuffle (collision math in ``_text_hash128``).
* minhash: shingles -> k permuted min-hashes -> banded LSH buckets ->
           ``groupby(band, key)``; a doc is a duplicate iff some bucket
           contains a smaller doc_id (deterministic, no union-find round).
* simhash: 64-bit weighted fingerprint, banded into 4x16-bit chunks; docs
           sharing a chunk are compared by Hamming distance.
* ngram-jaccard: exact Jaccard verification over LSH candidate pairs.
* embedding-cosine: near-dup by cosine >= threshold against a smaller vec_id
  sharing a centroid bucket — multi-probe centroid assignment (broadcast
  centroids) -> per-bucket chunked matmul -> native min-aggregate collapse.
  The all-pairs kernel survives as the test oracle
  (``embedding_cosine_dedup_bruteforce``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .partition import list_to_matrix

# Mersenne prime 2^31-1 for the minhash universal hash: with a, b, x < 2^31
# the product a*x <= ~2^62 fits int64 EXACTLY and still wraps p many times,
# so (a*x + b) % p is the genuine universal family.  (A 2^61-1 prime with
# 64-bit inputs overflows int64 before the modulo; and if a*x+b < p the
# modulo never wraps, making every "permutation" order-identical — both
# silently destroy min-wise independence.)
_MERSENNE = (1 << 31) - 1


def _text_hash64(texts: list[str]) -> np.ndarray:
    """Stable 64-bit content hash (blake2b) per text — the ONE shared
    implementation (functions.sketches imports it too; a drifting copy
    would silently desynchronize dedup and sketch hashing)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = np.frombuffer(
            hashlib.blake2b((t or "").encode(), digest_size=8).digest(), dtype=np.uint64
        )[0]
    return out


def _text_hash128(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Stable 128-bit content hash as two int64 columns.  64 bits collide at
    1e12-doc scale (~N^2/2^65 ≈ tens of thousands of expected collisions);
    128 bits keep the whole-corpus collision probability ~1e-15, so no
    bucket-side text verification is needed and the shuffle carries 16 bytes
    per row instead of the document text."""
    h1 = np.empty(len(texts), dtype=np.int64)
    h2 = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        d = hashlib.blake2b((t or "").encode(), digest_size=16).digest()
        v = np.frombuffer(d, dtype=np.int64)
        h1[i], h2[i] = v[0], v[1]
    return h1, h2


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One representative row (min id) per distinct text.

    Returns (doc_id, dupes).  Equivalent SQL:
    ``SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dupes FROM t GROUP BY text``.

    Scale shape: early projection to (h1, h2, id) — the groupby shuffle never
    carries text — then NATIVE vectorized aggregates (min, count), no
    per-group Python.  128-bit content hash stands in for text equality (see
    :func:`_text_hash128` for the collision math).
    """
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = _text_hash128(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    agg = hashed.groupby(["h1", "h2"]).aggregate(Min(id_col), Count())

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: batch.column(f"min({id_col})"),
                "dupes": batch.column("count()"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def exact_dup_groups(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Only the content-hash groups that actually have duplicates:
    (h1, h2, rep, dupes) with dupes >= 2, rep = min id of the group.

    Same shuffle shape as :func:`exact_dedup` (16-byte hash projection,
    native Min/Count aggregates), but the output is the DUP-GROUP table —
    proportional to the corpus's duplicate rate, not its size.  At a
    realistic web-crawl dup rate this is the small side that
    :func:`~elasticsearch_ray.ops.curation.curate` can broadcast instead of
    paying a representative semi-join over every row.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h1, h2 = _text_hash128(batch.column(text_col).to_pylist())
        return pa.table(
            {
                id_col: batch.column(id_col),
                "h1": pa.array(h1),
                "h2": pa.array(h2),
            }
        )

    agg = (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min(id_col), Count())
    )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch.column("count()"), 1))
        return pa.table(
            {
                "h1": t.column("h1"),
                "h2": t.column("h2"),
                "rep": t.column(f"min({id_col})"),
                "dupes": t.column("count()"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def _minhash_params(num_perm: int, seed: int = 42):
    # see _MERSENNE note: a, b drawn over [*, p) with p = 2^31-1.  31-bit
    # shingle ids distort a pair's Jaccard estimate by ~|shingles|^2/2^32 —
    # ~1e-3 at 1k-shingle documents — far below LSH banding noise.
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


# per-worker-process token-hash memo (Zipf head dominates, so the hit
# rate is high); bounded so a huge vocabulary can't grow the heap
_TOKEN_MEMO: dict = {}
_TOKEN_MEMO_CAP = 1_000_000
_FNV_BASIS = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _token_ids(tokens: list[str]) -> np.ndarray:
    memo = _TOKEN_MEMO
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        v = memo.get(t)
        if v is None:
            v = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"
            )
            if len(memo) < _TOKEN_MEMO_CAP:
                memo[t] = v
        out[i] = v
    return out


def _shingle_hashes(tokens: list[str], shingle: int) -> np.ndarray:
    """31-bit shingle ids: one memoized blake2b per DISTINCT token + a
    vectorized FNV-style polynomial fold over the k-token window.  Tokens
    come from ``str.split`` (space-free), so window equality is exactly
    the old " ".join-gram equality; collision mass at 31 bits is the same
    as before (see the ``_minhash_params`` note)."""
    if not tokens:
        return np.empty(0, dtype=np.int64)
    ids = _token_ids(tokens)
    mask = np.uint64((1 << 31) - 1)
    if len(tokens) < shingle:  # single gram over the whole (short) doc
        # 1-element array fold: scalar np.uint64 multiply warns on
        # overflow, the array form wraps silently (C semantics)
        acc1 = np.full(1, _FNV_BASIS, dtype=np.uint64)
        for j in range(ids.size):
            acc1 = (acc1 * _FNV_PRIME) ^ ids[j : j + 1]
        return (acc1 & mask).astype(np.int64)
    n = ids.size - shingle + 1
    acc = np.full(n, _FNV_BASIS, dtype=np.uint64)
    for j in range(shingle):
        acc = (acc * _FNV_PRIME) ^ ids[j : j + n]
    return (acc & mask).astype(np.int64)


def minhash_signatures(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle: int = 3,
    seed: int = 42,
) -> ray.data.Dataset:
    """(doc_id, sig: list<int64>[num_perm]) per doc, vectorized per batch."""
    a, b = _minhash_params(num_perm, seed)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        sigs = np.empty((len(texts), num_perm), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes((t or "").split(), shingle)
            if sh.size == 0:
                sigs[i] = 0
            else:
                # (a*x + b) mod p for all perms x all shingles, then min
                vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
                sigs[i] = vals.min(axis=1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "sig": pa.array(list(sigs), pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def minhash_band_rows(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    carry_sig: bool = False,
) -> ray.data.Dataset:
    """Exploded LSH band rows (band, key, doc_id [, sig]) — the shuffle
    input of :func:`minhash_lsh_dedup`, exposed so the bucket-join logic can
    be verified externally (e.g. an SQL twin over a parquet side-output)."""
    if num_perm % bands != 0:  # not assert: survives python -O
        raise ValueError(f"num_perm={num_perm} must be divisible by bands={bands}")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle, seed)

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sig = list_to_matrix(batch.column("sig"), np.int64)
        n = ids.size
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, bands)
        keys = np.empty(n * bands, dtype=np.int64)
        view = sig.reshape(n, bands, rows_per_band).astype(np.uint64)
        # band key = FNV fold over the band's minhash rows (the same
        # vectorized fold _gram_hashes64 uses) — bands x rows_per_band
        # numpy ops per batch; the former per-(doc, band) hashlib call
        # was 1.6e9 interpreter-level digests at 1e8 docs x 16 bands.
        # Two docs collide iff their band rows are equal (modulo a
        # ~2^-64 hash collision), the same contract as the old digest.
        for bnd in range(bands):
            acc = np.full(n, _FNV_BASIS, dtype=np.uint64)
            for j in range(rows_per_band):
                acc = (acc * _FNV_PRIME) ^ view[:, bnd, j]
            keys[bnd::bands] = acc.view(np.int64)
        out = {
            "band": pa.array(band_ids),
            "key": pa.array(keys),
            id_col: pa.array(doc_rep, pa.int64()),
        }
        if carry_sig:
            out["sig"] = pa.array(
                [list(s) for s in np.repeat(sig, bands, axis=0)],
                pa.list_(pa.int64()),
            )
        return pa.table(out)

    return sigs.map_batches(explode_bands, batch_format="pyarrow")


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    verify_jaccard: float | None = None,
    num_partitions: int = 64,
    driver_band_limit: int = 30_000_000,
) -> ray.data.Dataset:
    """MinHash+LSH near-duplicate marking.

    Emits (doc_id, is_dup): ``is_dup`` iff the doc shares an LSH band bucket
    with a smaller doc_id.  Pipeline: signature map -> flat band explode ->
    coarse hash-partition shuffle on (band, key) -> segmented per-bucket
    resolve (one Python call per PARTITION, every bucket via numpy segment
    boundaries — bucket count is ~N x bands, far too many for a per-group
    kernel dispatch) -> per-doc any().  ``num_partitions`` ~= cluster cores
    x 2-4.

    ``verify_jaccard``: if set, bucket candidates are verified against the
    bucket representative with the MinHash Jaccard ESTIMATE (fraction of
    agreeing signature components — the classical LSH false-positive
    filter, no text needed bucket-side); only candidates whose estimate
    reaches the threshold are marked.  The exact n-gram kernel
    (:func:`ngram_jaccard`) remains available for final pair verification.
    """
    from .partition import hash_partition_apply, segment_starts, start_index_of_row

    carry_sig = verify_jaccard is not None
    exploded = minhash_band_rows(
        ds, text_col, id_col, num_perm, bands, shingle, seed,
        carry_sig=carry_sig,
    )

    def per_part(tbl: pa.Table) -> pa.Table:
        # segmented bucket resolve: ONE Python call handles every (band, key)
        # bucket in the partition — sort, segment boundaries, gather the
        # per-bucket min-id representative; no per-bucket dispatch
        ids = tbl.column(id_col).to_numpy()
        band = tbl.column("band").to_numpy()
        key = tbl.column("key").to_numpy()
        order = np.lexsort((ids, key, band))
        ids, band, key = ids[order], band[order], key[order]
        starts = segment_starts(band, key)
        mask = ~starts  # bucket min = first row of its segment
        if ids.size:
            # dedupe equal ids (adjacent after the sort; covers repeats of
            # the min id too — original kernel's np.unique(dup))
            mask[1:] &= ids[1:] != ids[:-1]
        if carry_sig:
            sig = list_to_matrix(tbl.column("sig"), np.int64)[order]
            rep = start_index_of_row(starts)
            est = (sig == sig[rep]).mean(axis=1)
            mask &= est >= verify_jaccard
        return pa.table({id_col: pa.array(ids[mask], pa.int64())})

    # size probe on the MATERIALIZED exploded table (count is then free
    # and no upstream pipeline re-executes, even for derived inputs) —
    # under the limit the SAME per-partition kernel runs once driver-side
    # over all band rows, skipping the bucket shuffle entirely; above it
    # the distributed coarse-hash-partition path consumes the same
    # materialized blocks.  carry_sig rows are ~num_perm int64s wide, so
    # the row budget scales down accordingly (driver memory, not rows).
    exploded = exploded.materialize()
    row_limit = driver_band_limit // (num_perm if carry_sig else 1)
    if exploded.count() == 0:
        # an empty corpus yields schema-less blocks; return the
        # documented empty shape instead of a KeyError in per_part
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "is_dup": pa.array([], pa.bool_()),
        }))
    if exploded.count() <= row_limit:
        whole = pa.concat_tables(ray.get(exploded.to_arrow_refs()))
        uids = np.unique(per_part(whole).column(id_col).to_numpy())
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array(uids, pa.int64()),
                    "is_dup": pa.array(np.ones(uids.size, dtype=bool)),
                }
            )
        )

    dup_ids = hash_partition_apply(
        exploded, ["band", "key"], per_part, num_partitions=num_partitions
    )

    # distinct doc ids via a NATIVE count aggregate (vectorized) — a
    # per-doc map_groups lambda would be a Python call per marked doc
    distinct = dup_ids.groupby(id_col).count()
    return distinct.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "is_dup": pa.array([True] * b.num_rows),
            }
        ),
        batch_format="pyarrow",
    )


def lsh_candidate_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    num_partitions: int = 64,
    driver_band_limit: int = 30_000_000,
) -> ray.data.Dataset:
    """Distinct LSH candidate pairs (a = bucket-min representative, b =
    other member, a != b) — the verification work-list for exact
    :func:`ngram_jaccard`.  Same segmented bucket resolve (and the same
    size-aware driver fast path, same kernel both ways) as
    :func:`minhash_lsh_dedup`; pair volume is duplicate-rate-proportional,
    never all-pairs."""
    from .partition import hash_partition_apply, segment_starts, start_index_of_row

    exploded = minhash_band_rows(
        ds, text_col, id_col, num_perm, bands, shingle, seed
    )

    def per_part(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy()
        band = tbl.column("band").to_numpy()
        key = tbl.column("key").to_numpy()
        order = np.lexsort((ids, key, band))
        ids, band, key = ids[order], band[order], key[order]
        starts = segment_starts(band, key)
        rep_ids = ids[start_index_of_row(starts)]
        mask = ~starts & (ids != rep_ids)
        return pa.table(
            {
                "a": pa.array(rep_ids[mask], pa.int64()),
                "b": pa.array(ids[mask], pa.int64()),
            }
        )

    exploded = exploded.materialize()
    if exploded.count() == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
        }))
    if exploded.count() <= driver_band_limit:
        whole = pa.concat_tables(ray.get(exploded.to_arrow_refs()))
        pt = per_part(whole)
        a = pt.column("a").to_numpy()
        b = pt.column("b").to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.ones(a.size, dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array(a[keep], pa.int64()),
                    "b": pa.array(b[keep], pa.int64()),
                }
            )
        )

    pairs = hash_partition_apply(
        exploded, ["band", "key"], per_part, num_partitions=num_partitions
    )
    distinct = pairs.groupby(["a", "b"]).count()
    return distinct.select_columns(["a", "b"])


def shingle_rows(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
) -> ray.data.Dataset:
    """(doc_id, sh) — the DISTINCT 31-bit shingle hashes of each doc, the
    exact-Jaccard ground set (docs with no tokens emit no rows)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        parts = [
            np.unique(_shingle_hashes((t or "").split(), shingle))
            for t in texts
        ]
        counts = np.fromiter((p.size for p in parts), np.int64, len(parts))
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, counts), pa.int64()),
                "sh": pa.array(
                    np.concatenate(parts) if parts else
                    np.empty(0, dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def simhash64(tokens: list[str]) -> int:
    """Weighted 64-bit SimHash over token hashes (tf weights)."""
    from collections import Counter

    if not tokens:
        return 0
    counts = Counter(tokens)
    hs = _text_hash64(list(counts.keys()))
    w = np.array(list(counts.values()), dtype=np.int64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
    return int(
        np.bitwise_or.reduce(
            np.where(acc > 0, 1, 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        )
    )


def simhash_band_rows(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exploded SimHash chunk rows (chunk, key, doc_id, sim) — the shuffle
    input of :func:`simhash_dedup`, exposed for external verification."""

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        sh = np.array([simhash64((t or "").split()) for t in texts], dtype=np.uint64)
        out = {
            id_col: pa.array(ids, pa.int64()),
            "sim": pa.array(sh.astype(np.int64)),
        }
        for c in range(4):
            out[f"c{c}"] = pa.array(
                ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int32)
            )
        return pa.table(out)

    sigs = ds.map_batches(sig, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tables = []
        for c in range(4):
            tables.append(
                pa.table(
                    {
                        "chunk": pa.array(np.full(n, c, dtype=np.int32)),
                        "key": batch.column(f"c{c}"),
                        id_col: batch.column(id_col),
                        "sim": batch.column("sim"),
                    }
                )
            )
        return pa.concat_tables(tables)

    return sigs.map_batches(explode, batch_format="pyarrow")


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_partitions: int = 64,
    driver_band_limit: int = 30_000_000,
) -> ray.data.Dataset:
    """SimHash near-dup marking: 4x16-bit banding, Hamming<=k within buckets.
    Emits (doc_id, is_dup, near_of).  Bucket resolve is a segmented kernel
    over coarse hash partitions of (chunk, key) — one Python call per
    partition, vectorized popcount Hamming against each bucket's min-id
    representative.  Size-aware like :func:`minhash_lsh_dedup`: the
    exploded table is exactly 4 rows per doc, so under
    ``driver_band_limit`` the same kernel runs once driver-side (no
    shuffle)."""
    from .partition import (
        hash_partition_apply,
        popcount64,
        segment_starts,
        start_index_of_row,
    )

    exploded = simhash_band_rows(ds, text_col, id_col)

    def per_part(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy()
        chunk = tbl.column("chunk").to_numpy()
        key = tbl.column("key").to_numpy()
        sims = tbl.column("sim").to_numpy().astype(np.uint64)
        order = np.lexsort((ids, key, chunk))
        ids, chunk, key, sims = ids[order], chunk[order], key[order], sims[order]
        starts = segment_starts(chunk, key)
        rep = start_index_of_row(starts)  # bucket representative = min id
        ham = popcount64(sims ^ sims[rep])
        mask = (ids != ids[rep]) & (ham <= max_hamming)
        return pa.table(
            {
                id_col: pa.array(ids[mask], pa.int64()),
                "near_of": pa.array(ids[rep][mask], pa.int64()),
            }
        )

    exploded = exploded.materialize()
    if exploded.count() == 0:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "is_dup": pa.array([], pa.bool_()),
            "near_of": pa.array([], pa.int64()),
        }))
    if exploded.count() <= driver_band_limit:
        whole = pa.concat_tables(ray.get(exploded.to_arrow_refs()))
        pt = per_part(whole)
        cid = pt.column(id_col).to_numpy()
        near = pt.column("near_of").to_numpy()
        order = np.lexsort((near, cid))
        cid, near = cid[order], near[order]
        keep = np.ones(cid.size, dtype=bool)
        keep[1:] = cid[1:] != cid[:-1]  # per-doc min near_of
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array(cid[keep], pa.int64()),
                    "is_dup": pa.array(np.ones(int(keep.sum()), dtype=bool)),
                    "near_of": pa.array(near[keep], pa.int64()),
                }
            )
        )

    cands = hash_partition_apply(
        exploded, ["chunk", "key"], per_part, num_partitions=num_partitions
    )
    # collapse per doc with a NATIVE min aggregate (vectorized), not a
    # per-doc map_groups lambda
    collapsed = cands.groupby(id_col).min("near_of")
    return collapsed.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "is_dup": pa.array([True] * b.num_rows),
                "near_of": b.column("min(near_of)"),
            }
        ),
        batch_format="pyarrow",
    )


def ngram_jaccard(a_tokens: list[str], b_tokens: list[str], n: int = 3) -> float:
    """Exact n-gram Jaccard similarity (verification kernel for LSH pairs)."""
    def grams(toks):
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a_tokens), grams(b_tokens)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)


def embedding_bucket_rows(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    probes: int = 2,
    sample_size: int = 4096,
    seed: int = 42,
) -> ray.data.Dataset | None:
    """Multi-probe centroid assignment rows (cid, vec_id, vecn: normalized
    float32) — the bucket input of :func:`embedding_cosine_dedup`, exposed
    for external verification.  Returns None for an empty dataset."""
    from .ann import _normalize, kmeans_fit

    sample = np.array(
        [r[vec_col] for r in ds.randomize_block_order(seed=seed)
         .limit(sample_size).take_all()], dtype=np.float32
    )
    if sample.size == 0:
        return None
    cent = _normalize(kmeans_fit(_normalize(sample), n_clusters, seed=seed))
    cref = ray.put(cent)
    p = min(probes, cent.shape[0])

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        ids = batch.column(id_col).to_numpy()
        if not ids.size:  # empty block: (0,0) matmul would crash
            return pa.table({
                "cid": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "vecn": pa.array([], pa.list_(pa.float32())),
            })
        mat = _normalize(list_to_matrix(batch.column(vec_col), np.float32))
        sims = mat @ cm.T
        if p < cm.shape[0]:
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
        else:
            top = np.tile(np.arange(cm.shape[0]), (ids.size, 1))
        return pa.table(
            {
                "cid": pa.array(top.ravel().astype(np.int32)),
                id_col: pa.array(np.repeat(ids, p), pa.int64()),
                "vecn": pa.array(
                    list(np.repeat(mat, p, axis=0)), pa.list_(pa.float32())
                ),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_clusters: int = 16,
    probes: int = 2,
    sample_size: int = 4096,
    seed: int = 42,
) -> ray.data.Dataset:
    """Centroid-bucketed near-dup marking: cosine >= threshold to a
    smaller-id vector *in a shared centroid bucket*.

    Scale shape: k-means centroids are fit on a driver-side SAMPLE, broadcast
    once (``ray.put``); every vector is assigned to its ``probes`` nearest
    centroids (multi-probe catches pairs straddling a centroid boundary);
    cosine verification runs only WITHIN buckets (chunked matmul), then a
    native min-aggregate collapses per-doc marks.  Nothing materializes the
    corpus driver-side, and the all-pairs cost drops to sum of bucket^2.

    Partitioning assumption (documented per the custom-operator contract):
    near-duplicate pairs at high thresholds (0.95 -> angle <= 18 deg) share a
    nearest centroid with overwhelming probability; ``probes=2`` covers
    boundary pairs.  Bucket size ~ probes*N/n_clusters must fit one task —
    pick ``n_clusters ~ sqrt(N)`` at scale.  Recall < 1 by design; tested
    against :func:`embedding_cosine_dedup_bruteforce`.

    Emits (vec_id, is_dup, near_of); ``near_of`` is the SMALLEST qualifying
    bucket-mate id.
    """
    assigned = embedding_bucket_rows(
        ds, vec_col, id_col, n_clusters, probes, sample_size, seed
    )
    if assigned is None:
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "is_dup": pa.array([], pa.bool_()),
                    "near_of": pa.array([], pa.int64()),
                }
            )
        )

    def per_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "near_of": pa.array([], pa.int64()),
            }
        )
        if ids.size < 2:
            return empty
        mat = list_to_matrix(batch.column("vecn"), np.float32)
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        out_id: list[int] = []
        out_near: list[int] = []
        CH = 1024  # chunk rows so memory stays O(CH * bucket)
        col_idx = np.arange(ids.size)[None, :]
        for s in range(1, ids.size, CH):
            rows = np.arange(s, min(s + CH, ids.size))
            sims = mat[rows] @ mat.T  # (chunk, bucket)
            mask = (sims >= threshold) & (col_idx < rows[:, None])
            has = mask.any(axis=1)
            # ids ascend, so the first qualifying column IS the min id
            first = np.argmax(mask, axis=1)
            out_id.extend(ids[rows[has]].tolist())
            out_near.extend(ids[first[has]].tolist())
        if not out_id:
            return empty
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "near_of": pa.array(out_near, pa.int64()),
            }
        )

    cands = assigned.groupby("cid").map_groups(per_bucket, batch_format="pyarrow")
    collapsed = cands.groupby(id_col).min("near_of")
    return collapsed.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "is_dup": pa.array([True] * b.num_rows),
                "near_of": b.column("min(near_of)"),
            }
        ),
        batch_format="pyarrow",
    )


def embedding_cosine_dedup_bruteforce(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> ray.data.Dataset:
    """All-pairs oracle for :func:`embedding_cosine_dedup` — TEST SCALE ONLY
    (materializes the whole embedding table driver-side; the bucketed
    operator is the one that ships).  Emits (vec_id, is_dup, near_of) with
    ``near_of`` the best (argmax-cos) smaller id.
    """
    full = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in full], dtype=np.int64)
    mat = np.array([r[vec_col] for r in full], dtype=np.float32)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms
    ref = ray.put((ids, matn))

    def fn(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = batch.column(id_col).to_numpy()
        bmat = list_to_matrix(batch.column(vec_col), np.float32)
        bn = np.linalg.norm(bmat, axis=1, keepdims=True)
        bn[bn == 0] = 1.0
        bmat = bmat / bn
        sims = bmat @ all_mat.T  # (batch, N)
        out_id, out_near = [], []
        for i, bid in enumerate(bids):
            smaller = all_ids < bid
            if not smaller.any():
                continue
            s = sims[i][smaller]
            j = int(np.argmax(s))
            if s[j] >= threshold:
                out_id.append(int(bid))
                out_near.append(int(all_ids[smaller][j]))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "is_dup": pa.array([True] * len(out_id)),
                "near_of": pa.array(out_near, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256)


def _ren(cols: dict):
    """Column-rename map_batches factory shared by the join pipelines."""
    def f(t: pa.Table) -> pa.Table:
        return t.rename_columns([cols.get(c, c) for c in t.column_names])
    return f


def verified_dup_edges(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    num_partitions: int = 16,
    driver_pair_limit: int = 4_000_000,
    driver_shingle_limit: int = 20_000_000,
) -> ray.data.Dataset:
    """Near-duplicate graph EDGES: LSH candidate pairs verified by exact
    shingle-Jaccard >= ``threshold``, entirely with hash joins — no
    corpus materialization.  |A∩B| = one (pair JOIN shingles-of-a JOIN
    shingles-of-b-on-same-shingle) count; |A|/|B| from per-doc shingle
    counts.  Every intermediate is duplicate-rate-bounded (pairs x
    per-doc shingles), never all-pairs.

    Size-aware, two tiers: the pair list is duplicate-rate-bounded, so
    when it fits the driver (<= ``driver_pair_limit``) the involved
    doc-id set is broadcast (`ray.put`, sorted array) and the shingle
    scan keeps only involved docs; if those docs' shingle rows also fit
    (<= ``driver_shingle_limit``, ~160 MB) each pair is verified with a
    vectorized sorted-array intersection on the driver — no join
    operators at all.  Otherwise the join path runs over the (filtered
    or, above the pair limit, unfiltered) shingle table."""
    pairs = lsh_candidate_pairs(
        ds, text_col, id_col, num_perm, bands, shingle, seed,
        num_partitions,
    ).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
        )
    if n_pairs <= driver_pair_limit:
        pdf = pairs.to_pandas()
        involved = np.unique(
            np.concatenate(
                [pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)]
            )
        )
        inv_ref = ray.put(involved)

        def only_involved(t: pa.Table) -> pa.Table:
            inv = ray.get(inv_ref)
            ids = t.column(id_col).to_numpy()
            idx = np.searchsorted(inv, ids)
            idx[idx == inv.size] = 0
            return t.filter(pa.array(inv[idx] == ids))

        ds = ds.map_batches(only_involved, batch_format="pyarrow")
        sh_small = shingle_rows(ds, text_col, id_col, shingle).materialize()
        # involved docs' shingles fit the driver in the common case —
        # verify each pair with one vectorized sorted-array intersection
        # instead of paying four Ray join operators' fixed costs.  The
        # join path below remains the scale fallback (identical keeps).
        if sh_small.count() <= driver_shingle_limit:
            sdf = sh_small.to_pandas()
            sid = sdf[id_col].to_numpy(np.int64)
            sval = sdf["sh"].to_numpy(np.int64)
            order = np.lexsort((sval, sid))
            sid, sval = sid[order], sval[order]
            uids, starts = np.unique(sid, return_index=True)
            bounds = np.append(starts, sid.size)
            if uids.size == 0:  # every involved doc tokenless
                return ray.data.from_arrow(
                    pa.table({"a": pa.array([], pa.int64()),
                              "b": pa.array([], pa.int64())})
                )
            a_arr = pdf["a"].to_numpy(np.int64)
            b_arr = pdf["b"].to_numpy(np.int64)
            ia = np.searchsorted(uids, a_arr)
            ib = np.searchsorted(uids, b_arr)
            ok = (
                (uids[np.minimum(ia, uids.size - 1)] == a_arr)
                & (uids[np.minimum(ib, uids.size - 1)] == b_arr)
            )  # tokenless doc: inner joins drop the pair
            a_arr, b_arr = a_arr[ok], b_arr[ok]
            ia, ib = ia[ok], ib[ok]
            len_a = bounds[ia + 1] - bounds[ia]
            len_b = bounds[ib + 1] - bounds[ib]
            # Vectorized per-pair intersection counts, chunked so the
            # expanded (pair, shingle) array stays bounded: each pair's
            # two UNIQUE sorted lists concatenate under one pair id; after
            # a (pid, value) lexsort every value shared by the pair is an
            # adjacent duplicate (a value appears at most twice per pair),
            # so intersection size = bincount of adjacent-equal positions.
            # Replaces a per-pair Python loop (3 numpy dispatches x up to
            # driver_pair_limit pairs) with O(M log M) C kernels.
            csum = np.concatenate(
                [[0], np.cumsum(len_a + len_b)]
            )
            keep_a, keep_b = [], []
            lo = 0
            chunk_rows = 1 << 23
            while lo < a_arr.size:
                hi = int(np.searchsorted(csum, csum[lo] + chunk_rows))
                hi = min(max(hi, lo + 1), a_arr.size)
                n = hi - lo
                seg_starts = np.empty(2 * n, np.int64)
                seg_starts[0::2] = bounds[ia[lo:hi]]
                seg_starts[1::2] = bounds[ib[lo:hi]]
                seg_lens = np.empty(2 * n, np.int64)
                seg_lens[0::2] = len_a[lo:hi]
                seg_lens[1::2] = len_b[lo:hi]
                ends = np.cumsum(seg_lens)
                m = int(ends[-1]) if n else 0
                idx = (
                    np.repeat(seg_starts - (ends - seg_lens), seg_lens)
                    + np.arange(m)
                )
                vals = sval[idx]
                pid = np.repeat(
                    np.repeat(np.arange(n), 2), seg_lens
                )
                order = np.lexsort((vals, pid))
                pv, vv = pid[order], vals[order]
                dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
                inter = np.bincount(pv[1:][dup], minlength=n)
                union = len_a[lo:hi] + len_b[lo:hi] - inter
                # inter > 0 mirrors the join tier, whose inner join on
                # shared shingles drops zero-intersection pairs even at
                # threshold <= 0 — the tiers must keep identical pairs
                sel = (inter > 0) & (inter / union >= threshold)
                keep_a.append(a_arr[lo:hi][sel])
                keep_b.append(b_arr[lo:hi][sel])
                lo = hi
            out_a = (
                np.concatenate(keep_a) if keep_a
                else np.empty(0, np.int64)
            )
            out_b = (
                np.concatenate(keep_b) if keep_b
                else np.empty(0, np.int64)
            )
            return ray.data.from_arrow(
                pa.table({"a": pa.array(out_a, pa.int64()),
                          "b": pa.array(out_b, pa.int64())})
            )
        sh = sh_small
    else:
        # materialize: sh feeds THREE independent consumers below
        # (sh_a join, sh_b join, the sizes groupby) — unmaterialized,
        # each would re-run tokenization + shingle hashing over the
        # whole corpus, tripling the dominant cost of the largest tier
        sh = shingle_rows(ds, text_col, id_col, shingle).materialize()

    sh_a = sh.map_batches(_ren({id_col: "a"}), batch_format="pyarrow")
    sh_b = sh.map_batches(_ren({id_col: "b"}), batch_format="pyarrow")
    inter = (
        pairs.join(sh_a, "inner", num_partitions, on=("a",))
        .join(sh_b, "inner", num_partitions, on=("b", "sh"))
        .groupby(["a", "b"]).count()
        .map_batches(_ren({"count()": "i"}), batch_format="pyarrow")
    )
    sizes = sh.groupby(id_col).count()
    sz_a = sizes.map_batches(
        _ren({id_col: "a", "count()": "na"}), batch_format="pyarrow"
    )
    sz_b = sizes.map_batches(
        _ren({id_col: "b", "count()": "nb"}), batch_format="pyarrow"
    )
    joined = (
        inter.join(sz_a, "inner", num_partitions, on=("a",))
        .join(sz_b, "inner", num_partitions, on=("b",))
    )

    def keep(t: pa.Table) -> pa.Table:
        i = t.column("i").to_numpy().astype(np.float64)
        na = t.column("na").to_numpy().astype(np.float64)
        nb = t.column("nb").to_numpy().astype(np.float64)
        j = i / (na + nb - i)
        m = j >= threshold
        return pa.table(
            {
                "a": pa.array(t.column("a").to_numpy()[m], pa.int64()),
                "b": pa.array(t.column("b").to_numpy()[m], pa.int64()),
            }
        )

    return joined.map_batches(keep, batch_format="pyarrow")


def dup_clusters(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    num_partitions: int = 16,
    max_rounds: int = 50,
    edges: ray.data.Dataset | None = None,
    driver_edge_limit: int = 4_000_000,
) -> ray.data.Dataset:
    """Connected components over the verified near-duplicate graph
    (canonicalization: every duplicated doc labeled with its component's
    min doc_id).  Size-aware, like curation's keep path: the edge table is
    duplicate-rate-bounded, so when it fits the driver
    (<= ``driver_edge_limit`` rows, ~64 MB of int64 pairs at the default)
    we collect it and run a vectorized numpy min-label/pointer-doubling
    pass — one `np.minimum.at` sweep per round, O(log diameter) rounds,
    no shuffle.  Above the limit (billions of dup pairs at 100 TB) we fall
    back to distributed min-label propagation — the standard map-reduce
    CC: each round is (edges JOIN labels -> per-node neighbor min ->
    merge), O(component diameter) rounds; near-dup components are shallow
    so this converges in a few rounds.  Labels/edges stay
    duplicate-rate-bounded Datasets; each round materializes the (small)
    label table to keep lineage flat.  Both paths emit identical labels.
    Docs in no edge are omitted (singleton clusters are implicit)."""
    if edges is None:
        edges = verified_dup_edges(
            ds, text_col, id_col, threshold, num_perm, bands, shingle,
            seed, num_partitions,
        )

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= driver_edge_limit:
        if n_edges == 0:
            return ray.data.from_arrow(
                pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "cluster": pa.array([], pa.int64())}
                )
            )
        ab = edges.to_pandas()
        nodes, inv = np.unique(
            np.concatenate(
                [ab["a"].to_numpy(np.int64), ab["b"].to_numpy(np.int64)]
            ),
            return_inverse=True,
        )
        m = len(ab)
        src, dst = inv[:m], inv[m:]
        # labels are node INDICES; np.unique sorts, so index order == doc_id
        # order and the final root index maps to the component's min doc_id
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            prev = lab.copy()
            np.minimum.at(lab, src, lab[dst])
            np.minimum.at(lab, dst, lab[src])
            lab = np.minimum(lab, lab[lab])  # pointer doubling
            if np.array_equal(lab, prev):
                break
        while True:  # compress to roots
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        return ray.data.from_arrow(
            pa.table(
                {id_col: pa.array(nodes, pa.int64()),
                 "cluster": pa.array(nodes[lab], pa.int64())}
            )
        )

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow").materialize()
    labels = (
        sym_edges.groupby("src").count()
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("src"),
                    "label": t.column("src"),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    for _ in range(max_rounds):
        lab_src = labels.map_batches(
            _ren({"node": "src"}), batch_format="pyarrow"
        )
        neigh = (
            sym_edges.join(lab_src, "inner", num_partitions, on=("src",))
            .groupby("dst").min("label")
            .map_batches(
                _ren({"dst": "node", "min(label)": "nmin"}),
                batch_format="pyarrow",
            )
        )
        merged = labels.join(neigh, "inner", num_partitions, on=("node",))

        def upd(t: pa.Table) -> pa.Table:
            lab = t.column("label").to_numpy()
            nm = t.column("nmin").to_numpy()
            new = np.minimum(lab, nm)
            return pa.table(
                {
                    "node": t.column("node"),
                    "label": pa.array(new, pa.int64()),
                    "chg": pa.array((new != lab).astype(np.int64)),
                }
            )

        upd_ds = merged.map_batches(upd, batch_format="pyarrow").materialize()
        changed = upd_ds.sum("chg")
        labels = upd_ds.drop_columns(["chg"]).materialize()

        # pointer jumping: label <- min(label, label-of-label).  The
        # edge round alone advances one hop per round (O(diameter)
        # shuffles — a 10k-doc boilerplate chain would need 10k rounds);
        # shortcutting through the label table halves the remaining
        # distance-to-root each round, so convergence is O(log diameter)
        # and max_rounds=50 covers any physically possible component.
        short = labels.map_batches(
            _ren({"node": "label", "label": "l2"}), batch_format="pyarrow"
        )
        merged2 = labels.join(short, "inner", num_partitions, on=("label",))

        def jump(t: pa.Table) -> pa.Table:
            lab = t.column("label").to_numpy()
            l2 = t.column("l2").to_numpy()
            new = np.minimum(lab, l2)
            return pa.table(
                {
                    "node": t.column("node"),
                    "label": pa.array(new, pa.int64()),
                    "chg": pa.array((new != lab).astype(np.int64)),
                }
            )

        jmp_ds = merged2.map_batches(jump, batch_format="pyarrow").materialize()
        changed += jmp_ds.sum("chg")
        labels = jmp_ds.drop_columns(["chg"]).materialize()
        if not changed:
            break
    else:
        # silent unconverged labels would contradict the 'both paths emit
        # identical labels' contract — with pointer jumping this bound is
        # unreachable for any real input, so treat it as a hard error
        raise RuntimeError(
            f"dup_clusters: min-label propagation did not converge in "
            f"{max_rounds} rounds")
    return labels.map_batches(
        _ren({"node": id_col, "label": "cluster"}), batch_format="pyarrow"
    )


def _gram_hashes64(tokens: list[str], n: int) -> np.ndarray:
    """64-bit hash per n-token window (one memoized blake2b per distinct
    token + an FNV fold, like ``_shingle_hashes`` but full-width — gram
    identity must be collision-free enough to stand in for the gram
    STRING).  Docs shorter than ``n`` emit NO grams (no whole-doc
    fallback: span detection has no use for a sub-n gram and the SQL
    twin's lead()-window NULLs drop them too)."""
    ids = _token_ids(tokens)
    if ids.size < n:
        return np.empty(0, dtype=np.int64)
    m = ids.size - n + 1
    acc = np.full(m, _FNV_BASIS, dtype=np.uint64)
    for j in range(n):
        acc = (acc * _FNV_PRIME) ^ ids[j : j + m]
    return acc.view(np.int64)



def _gram_prep(batch: pa.Table, text_col: str, id_col: str,
               n: int) -> pa.Table:
    """Shared phase-1 kernel of the span-dedup pair: one row per n-gram
    window start — (gram hash, doc, 0-based token position).  Tokens
    split on SINGLE SPACES (``text.split(" ")``), matching the ops'
    DuckDB ``string_split(text, ' ')`` twins AND the Arrow
    ``split_pattern`` stream the rewrite phase re-tokenizes with — a
    whitespace-class split here would silently misalign positions on
    texts with newlines/tabs/double spaces."""
    ids = batch.column(id_col).to_numpy()
    texts = batch.column(text_col).to_pylist()
    parts = [_gram_hashes64((t or "").split(" "), n) for t in texts]
    counts = np.fromiter((p.size for p in parts), np.int64, len(parts))
    pos = (np.concatenate([np.arange(c, dtype=np.int64) for c in counts])
           if len(counts) else np.empty(0, dtype=np.int64))
    return pa.table({
        "gram": pa.array(
            np.concatenate(parts) if parts
            else np.empty(0, dtype=np.int64), pa.int64()),
        id_col: pa.array(np.repeat(ids, counts), pa.int64()),
        "pos": pa.array(pos, pa.int64()),
    })


def _dup_start_rows(tbl: pa.Table, id_col: str,
                    with_txt: bool = False) -> pa.Table:
    """Shared phase-2 kernel: keep (doc, pos) rows of grams appearing in
    >= 2 distinct docs within this gram-partition (partitioning is BY
    GRAM, so a gram's whole corpus run is local).  ``with_txt`` adds the
    empty ``txt`` column remove_dup_spans' text-unioned rewrite
    exchange needs."""
    gram = tbl.column("gram").to_numpy()
    doc = tbl.column(id_col).to_numpy()
    pos = tbl.column("pos").to_numpy()
    order = np.lexsort((doc, gram))
    gram, doc, pos = gram[order], doc[order], pos[order]
    m = gram.size
    if not m:
        cols = {id_col: pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64())}
        if with_txt:
            cols["txt"] = pa.array([], pa.large_string())
        return pa.table(cols)
    new_gram = np.empty(m, dtype=bool)
    new_gram[0] = True
    new_gram[1:] = gram[1:] != gram[:-1]
    new_pair = new_gram.copy()
    new_pair[1:] |= doc[1:] != doc[:-1]
    run_id = np.cumsum(new_gram) - 1
    ndocs = np.bincount(run_id[new_pair])
    keep = ndocs[run_id] >= 2
    cols = {id_col: pa.array(doc[keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int64())}
    if with_txt:
        # large_string: ONE fixed txt type for the text-unioned rewrite
        # exchange (a small-string input corpus would otherwise diverge
        # from a large_string one and break the union's schema), and no
        # int32 offset ceiling on >2 GB text partitions
        cols["txt"] = pa.array([""] * int(keep.sum()), pa.large_string())
    return pa.table(cols)


def dup_ngram_spans(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Duplicate n-gram span detection (the span-level dedup signal of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better", 2022 — their ExactSubstr at fixed gram length): an n-token
    window is DUPLICATED when it occurs in >= 2 distinct docs; a doc's
    ``dup_tokens`` is the number of its token positions covered by the
    union of its duplicated windows.  Emits (doc_id, dup_tokens) for
    docs with any covered span.

    Scale shape: two coarse hash-partition exchanges of the token
    stream — (1) by gram hash: a segmented kernel keeps grams whose run
    spans >= 2 distinct docs (never a Python loop per gram), (2) by
    doc: a segmented interval-union kernel turns surviving window
    starts into covered-token counts.  This op's exchange volume is
    O(corpus tokens) by nature (the published algorithm sorts the full
    suffix stream; fixed-length grams already cut that to one row per
    position); partials shrink nothing because every position matters.
    Gram identity is a 64-bit hash (Lee et al. hash too); collisions
    over-mark ~N^2/2^64 spans, negligible below ~1e9 distinct grams."""
    from .partition import hash_partition_apply

    if n < 2:
        raise ValueError("n must be >= 2")

    def prep(batch: pa.Table) -> pa.Table:
        return _gram_prep(batch, text_col, id_col, n)

    def dup_starts(tbl: pa.Table) -> pa.Table:
        return _dup_start_rows(tbl, id_col)

    def coverage(tbl: pa.Table) -> pa.Table:
        """Union-of-intervals [pos, pos+n-1] per doc: covered tokens =
        sum over sorted starts of min(next_start - start, n), last
        start of each doc contributing n."""
        doc = tbl.column(id_col).to_numpy()
        pos = tbl.column("pos").to_numpy()
        order = np.lexsort((pos, doc))
        doc, pos = doc[order], pos[order]
        m = doc.size
        if not m:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dup_tokens": pa.array([], pa.int64())})
        last = np.empty(m, dtype=bool)  # last start of its doc
        last[:-1] = doc[1:] != doc[:-1]
        last[-1] = True
        gaps = np.empty(m, dtype=np.int64)
        gaps[:-1] = np.minimum(pos[1:] - pos[:-1], n)
        gaps[last] = n
        new_doc = np.empty(m, dtype=bool)
        new_doc[0] = True
        new_doc[1:] = last[:-1]
        run_id = np.cumsum(new_doc) - 1
        covered = np.bincount(run_id, weights=gaps).astype(np.int64)
        return pa.table({
            id_col: pa.array(doc[new_doc], pa.int64()),
            "dup_tokens": pa.array(covered, pa.int64()),
        })

    starts = hash_partition_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["gram"], dup_starts, num_partitions=num_partitions,
    )
    return hash_partition_apply(
        starts, [id_col], coverage, num_partitions=num_partitions,
    )


def remove_dup_spans(
    ds: ray.data.Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """The ACTION half of Lee et al. span-level dedup: rewrite each doc
    with every duplicated n-gram window (one occurring in >= 2 distinct
    docs — the same signal :func:`dup_ngram_spans` counts) excised,
    emitting (doc_id, clean_text, removed_tokens).  Docs with no
    duplicated span pass through verbatim; a fully-covered doc emits
    clean_text ''.

    Scale shape: the same two coarse hash exchanges as
    ``dup_ngram_spans`` — by gram hash for the duplicate test, then by
    DOC with the original text unioned in, so each partition rewrites
    its docs with one segmented kernel: interval union via a +-1 diff
    array over the partition's flat token stream, one Arrow
    filter + list rebuild + binary_join for the reassembly — no
    per-doc Python string work."""
    from .partition import hash_partition_apply

    if n < 2:
        raise ValueError("n must be >= 2")

    def prep(batch: pa.Table) -> pa.Table:
        return _gram_prep(batch, text_col, id_col, n)

    def dup_starts(tbl: pa.Table) -> pa.Table:
        return _dup_start_rows(tbl, id_col, with_txt=True)

    def tag_text(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "pos": pa.array(
                np.full(batch.num_rows, -1, dtype=np.int64)),
            # cast to ONE fixed type: string vs large_string inputs must
            # not diverge from _dup_start_rows' txt column in the union,
            # and large offsets remove the 2 GB partition ceiling
            "txt": pc.coalesce(
                batch.column(text_col).cast(pa.large_string()), ""),
        })

    def rewrite(tbl: pa.Table) -> pa.Table:
        pos = tbl.column("pos").to_numpy()
        doc = tbl.column(id_col).to_numpy()
        is_text = pos < 0
        tdoc = doc[is_text]
        torder = np.argsort(tdoc, kind="stable")
        tdoc = tdoc[torder]
        texts = tbl.column("txt").take(
            pa.array(np.flatnonzero(is_text)[torder])
        )
        split = pc.split_pattern(texts.combine_chunks()
                                 if isinstance(texts, pa.ChunkedArray)
                                 else texts, " ")
        counts = pc.list_value_length(split).to_numpy().astype(np.int64)
        off = np.zeros(counts.size + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        total = int(off[-1])
        # duplicated starts -> +-1 diff array over the flat token stream
        sdoc = doc[~is_text]
        spos = pos[~is_text]
        di = np.searchsorted(tdoc, sdoc)  # starts' doc row (tdoc sorted)
        delta = np.zeros(total + 1, dtype=np.int64)
        if sdoc.size:
            g0 = off[di] + spos
            g1 = off[di] + np.minimum(spos + n, counts[di])
            np.add.at(delta, g0, 1)
            np.add.at(delta, g1, -1)
        covered = np.cumsum(delta[:total]) > 0
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = ~covered
        cum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
        kept_counts = cum[off[1:]] - cum[off[:-1]]
        new_off = np.zeros(counts.size + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=new_off[1:])
        # int64 offsets end-to-end: string arrays cap combined chunks at
        # 2 GB and ListArray offsets at 2^31 tokens; the large variants
        # carry a >2 GB-of-text partition without ArrowCapacityError
        clean = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(new_off, pa.int64()),
                flat.filter(pa.array(keep)).cast(pa.large_string()),
            ),
            pa.scalar(" ", pa.large_string()),
        )
        return pa.table({
            id_col: pa.array(tdoc, pa.int64()),
            "clean_text": clean,
            "removed_tokens": pa.array(counts - kept_counts, pa.int64()),
        })

    starts = hash_partition_apply(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["gram"], dup_starts, num_partitions=num_partitions,
    )
    tagged = ds.map_batches(tag_text, batch_format="pyarrow").union(starts)
    return hash_partition_apply(
        tagged, [id_col], rewrite, num_partitions=num_partitions,
    )
