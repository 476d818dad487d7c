"""Approximate/exact nearest-neighbour search over an embedding column.

* ``brute_force_topk`` — exact cosine top-k: the (few) query vectors are
  broadcast once with ``ray.put``; every batch does one matmul (numpy SIMD)
  and emits its local top-k; the driver merges k*num_blocks candidate rows.
  This is the baseline and the verification oracle for the ANN variants.
* ``ivf_build`` / ``ivf_query`` — real IVF with a PERSISTED inverted file:
  deterministic k-means (seeded, few Lloyd iterations over a driver-side
  sample) -> per-vector nearest-centroid assignment (map_batches) -> one
  Parquet partition per centroid bucket (+ centroids.npy).  Queries read
  ONLY the ``nprobe`` probed bucket partitions, so query I/O and compute
  scale with buckets probed, not corpus size.  Recall < 1 by design; tested
  against brute force for overlap.  ``ivf_topk`` is the build+query
  convenience wrapper (transient index) used by the test harness.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .partition import list_to_matrix


def _topk_block(ids: np.ndarray, s: np.ndarray, kk: int) -> np.ndarray:
    """Deterministic block-local top-k indices under the (-cos, vec_id)
    order: argpartition prunes to the score boundary, then every tie AT
    the boundary resolves by vec_id — a bare argpartition keeps an
    arbitrary member of a boundary tie, so a duplicate vector with the
    lower id could be dropped before the merge and the documented
    oracle tie-break silently violated."""
    if ids.size <= kk:
        return np.arange(ids.size)
    part = np.argpartition(-s, kk - 1)
    kth = s[part[kk - 1]]
    cand = np.flatnonzero(s >= kth)
    order = np.lexsort((ids[cand], -s[cand]))[:kk]
    return cand[order]


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def brute_force_topk(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dtype=np.float32,  # float32 at scale; float64 for oracle-exact checks
) -> pa.Table:
    """Exact cosine top-k for each query vector.

    Returns a table (query_id, rank, vec_id, cos) with the deterministic
    tie-break (-cos, vec_id).
    """
    q = _normalize(np.asarray(query_vecs, dtype=dtype))
    qref = ray.put(q)
    nq = q.shape[0]

    def fn(batch: pa.Table) -> pa.Table:
        qm = ray.get(qref)
        ids = batch.column(id_col).to_numpy()
        if not ids.size:  # empty block: (0,0) matmul would crash
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            })
        mat = _normalize(list_to_matrix(batch.column(vec_col), dtype))
        sims = mat @ qm.T  # (n, nq)
        out_q, out_id, out_cos = [], [], []
        kk = min(k, ids.size)
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            idx = _topk_block(ids, s, kk)
            out_q.extend([qi] * idx.size)
            out_id.extend(ids[idx].tolist())
            out_cos.extend(s[idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )

    # distributed per-query merge: candidates shuffle by query_id and
    # each group reduces to its top-k INSIDE the cluster, so the driver
    # collects exactly k x n_queries rows — bounded regardless of block
    # count (round-4 verdict: the old take_all() of per-batch candidates
    # grew with the number of blocks)
    def merge_group(g: pa.Table) -> pa.Table:
        v = g.column(id_col).to_numpy()
        c = g.column("cos").to_numpy()
        order = np.lexsort((v, -c))[:k]
        return pa.table(
            {
                "query_id": pa.array(
                    [g.column("query_id")[0].as_py()] * order.size,
                    pa.int64(),
                ),
                "rank": pa.array(
                    np.arange(1, order.size + 1, dtype=np.int32), pa.int32()
                ),
                id_col: pa.array(v[order], pa.int64()),
                "cos": pa.array(c[order], pa.float64()),
            }
        )

    merged = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_group, batch_format="pyarrow")
        .take_all()
    )
    merged.sort(key=lambda r: (r["query_id"], r["rank"]))
    return pa.table(
        {
            "query_id": pa.array([r["query_id"] for r in merged], pa.int64()),
            "rank": pa.array([r["rank"] for r in merged], pa.int32()),
            id_col: pa.array([r[id_col] for r in merged], pa.int64()),
            "cos": pa.array([r["cos"] for r in merged], pa.float64()),
        }
    )


def kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    idx = rng.choice(sample.shape[0], size=min(n_clusters, sample.shape[0]),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(0)
    return cent


def ivf_build(
    ds: ray.data.Dataset,
    index_dir: str,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 42,
) -> dict:
    """Build a persisted IVF index: centroids + one Parquet partition per
    centroid bucket.

    The inverted file is the ``buckets/cid=<c>/`` partition layout — a query
    later reads ONLY its probed buckets (sublinear I/O).  Vectors are stored
    L2-normalized float32 so the query-side dot product IS the cosine.
    A rebuild into the same ``index_dir`` replaces the buckets (Ray's
    write_parquet APPENDS into existing dirs, which would serve every
    vector twice after a crashed or repeated build).
    """
    import shutil

    sample = np.array(
        [r[vec_col] for r in ds.randomize_block_order(seed=seed)
         .limit(sample_size).take_all()], dtype=np.float32
    )
    if sample.size == 0:
        raise ValueError("cannot build an IVF index over an empty dataset")
    cent = _normalize(kmeans_fit(_normalize(sample), n_clusters, seed=seed))
    os.makedirs(index_dir, exist_ok=True)
    # meta.json is written LAST (build-finished marker); a dir without it is
    # a crashed build — clear any partial/stale buckets before writing
    shutil.rmtree(os.path.join(index_dir, "buckets"), ignore_errors=True)
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        os.remove(meta_path)
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        cm = ray.get(cref)
        ids = batch.column(id_col).to_numpy()
        if not ids.size:  # empty block: (0,0) matmul would crash
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "embn": pa.array([], pa.list_(pa.float32())),
                "cid": pa.array([], pa.int32()),
                "bucket": pa.array([], pa.int32()),
            })
        mat = _normalize(list_to_matrix(batch.column(vec_col), np.float32))
        cid = (mat @ cm.T).argmax(1).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "embn": pa.array(list(mat), pa.list_(pa.float32())),
                "cid": pa.array(cid),
                # 'cid' becomes the hive partition path; 'bucket' stays a
                # stored column so file-list reads keep the bucket id
                "bucket": pa.array(cid),
            }
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["cid"]
    )
    # corpus identity (row count): ivf_topk refuses to serve a persisted
    # index built over a different-sized dataset.  Footer-only count over
    # the bucket files just written — NOT ds.count(), which would pay a
    # second full pass over the corpus.
    import pyarrow.dataset as pads

    num_vectors = pads.dataset(
        os.path.join(index_dir, "buckets"), format="parquet",
        partitioning="hive",
    ).count_rows()
    with open(meta_path, "w") as f:
        json.dump(
            {
                "n_clusters": int(cent.shape[0]),
                "id_col": id_col,
                "vec_col": vec_col,
                "seed": seed,
                "sample_size": sample_size,
                "num_vectors": num_vectors,
            },
            f,
        )
    return {"n_clusters": int(cent.shape[0]), "index_dir": index_dir}


def ivf_query(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> pa.Table:
    """Query a persisted IVF index; reads only the probed bucket partitions.

    Returns (query_id, rank, vec_id, cos) with the (-cos, vec_id) tie-break.
    """
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("kind", "ivf") != "ivf":
        # the reciprocal of ivfpq_query's guard: pointed at an IVF-PQ
        # dir this would crash on the missing 'embn' column deep in a
        # Ray task instead of failing intelligibly
        raise ValueError(f"{index_dir!r} is not a plain IVF index "
                         f"(kind={meta.get('kind')!r}); use ivfpq_query")
    id_col = meta["id_col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vecs, dtype=np.float32))
    nprobe = min(nprobe, cent.shape[0])
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    needed = np.unique(probes)
    paths = [
        p
        for c in needed
        if os.path.isdir(p := os.path.join(index_dir, "buckets", f"cid={int(c)}"))
    ]
    if not paths:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
    qref = ray.put((q, probes))

    def fn(batch: pa.Table) -> pa.Table:
        qm, pr = ray.get(qref)
        ids = batch.column(id_col).to_numpy()
        cids = batch.column("bucket").to_numpy()
        mat = list_to_matrix(batch.column("embn"), np.float32)
        out_q, out_id, out_cos = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(cids, pr[qi])
            if not mask.any():
                continue
            s = mat[mask] @ qm[qi]
            sub_ids = ids[mask]
            idx = _topk_block(sub_ids, s, min(k, sub_ids.size))
            out_q.extend([qi] * idx.size)
            out_id.extend(sub_ids[idx].tolist())
            out_cos.extend(s[idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )

    # glob the probed buckets' FILES into one read (read_parquet rejects a
    # list of hive dirs, and a union of per-dir reads pays per-dataset
    # overhead); the stored 'bucket' column survives file-list reads
    import glob as _glob

    files = [f for p in paths for f in sorted(_glob.glob(os.path.join(p, "*.parquet")))]

    # distributed per-query merge (same bounded pattern as
    # brute_force_topk): candidates shuffle by query_id and reduce to
    # top-k INSIDE the cluster — the old take_all() of per-batch
    # candidates grew with probed-bucket block count, the exact driver
    # bottleneck the round-4 fix removed from the brute path
    def merge_group(g: pa.Table) -> pa.Table:
        v = g.column(id_col).to_numpy()
        c = g.column("cos").to_numpy()
        order = np.lexsort((v, -c))[:k]
        return pa.table(
            {
                "query_id": pa.array(
                    [g.column("query_id")[0].as_py()] * order.size,
                    pa.int64(),
                ),
                "rank": pa.array(
                    np.arange(1, order.size + 1, dtype=np.int32),
                    pa.int32(),
                ),
                id_col: pa.array(v[order], pa.int64()),
                "cos": pa.array(c[order], pa.float64()),
            }
        )

    merged = (
        ray.data.read_parquet(files)
        .map_batches(fn, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(merge_group, batch_format="pyarrow")
        .take_all()
    )
    merged.sort(key=lambda r: (r["query_id"], r["rank"]))
    return pa.table(
        {
            "query_id": pa.array(
                [r["query_id"] for r in merged], pa.int64()),
            "rank": pa.array([r["rank"] for r in merged], pa.int32()),
            id_col: pa.array([r[id_col] for r in merged], pa.int64()),
            "cos": pa.array([r["cos"] for r in merged], pa.float64()),
        }
    )


def ivf_probe_pairs(
    index_dir: str,
    query_vecs: np.ndarray,
    nprobe: int = 4,
) -> pa.Table:
    """The (query_id, vec_id) candidate pairs an IVF query actually probes.

    Verification side-output (pattern of ``minhash_band_rows``): the probe
    decision — which buckets each query visits — depends on the float32
    centroid model, so it is not SQL-expressible; emitting the probed pairs
    lets a DuckDB twin recompute the cosine ranking in float64 over exactly
    this candidate set.  Bounded by nprobe bucket sizes per query; intended
    for test-scale gates, not the 100 TB serving path (which keeps
    candidates distributed, see ``ivf_query``).
    """
    import glob as _glob

    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    q = _normalize(np.asarray(query_vecs, dtype=np.float32))
    nprobe = min(nprobe, cent.shape[0])
    probes = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    needed = np.unique(probes)
    ids_by_bucket: dict[int, np.ndarray] = {}
    for c in needed:
        p = os.path.join(index_dir, "buckets", f"cid={int(c)}")
        if not os.path.isdir(p):
            continue
        files = sorted(_glob.glob(os.path.join(p, "*.parquet")))
        if files:
            t = pq.read_table(files, columns=[id_col])
            ids_by_bucket[int(c)] = t.column(id_col).to_numpy()
    out_q, out_v = [], []
    for qi in range(q.shape[0]):
        for c in probes[qi]:
            ids = ids_by_bucket.get(int(c))
            if ids is not None and ids.size:
                out_q.append(np.full(ids.size, qi, dtype=np.int64))
                out_v.append(ids.astype(np.int64))
    if out_q:
        qa, va = np.concatenate(out_q), np.concatenate(out_v)
    else:
        qa = va = np.array([], dtype=np.int64)
    return pa.table(
        {"query_id": pa.array(qa, pa.int64()), "vec_id": pa.array(va, pa.int64())}
    )


def ivf_query_rescore(
    index_dir: str,
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_pairs: pa.Table | None = None,
) -> pa.Table:
    """IVF query with an exact float64 re-rank over the probed candidates.

    Standard IVF + exact-rerank shape: the float32 index decides WHICH
    vectors to consider (``ivf_probe_pairs``); the final ranking recomputes
    cosine in float64 from the RAW base vectors so it is bit-comparable to
    a SQL oracle using ``list_cosine_similarity(CAST(... AS DOUBLE[]))``
    over the same pairs.  Candidate membership is broadcast once
    (``ray.put``); scoring streams over the base table in ``map_batches``
    with per-block local top-k, so only k·blocks rows reach the driver.
    Returns (query_id, rank, vec_id, cos) with the (-cos, vec_id) tie-break.
    """
    if probe_pairs is None:
        probe_pairs = ivf_probe_pairs(index_dir, query_vecs, nprobe=nprobe)
    qraw = np.asarray(query_vecs, dtype=np.float64)
    qn = _normalize(qraw)
    nq = qn.shape[0]
    pq_ids = probe_pairs.column("query_id").to_numpy()
    pv_ids = probe_pairs.column("vec_id").to_numpy()
    members = {qi: np.unique(pv_ids[pq_ids == qi]) for qi in range(nq)}
    bref = ray.put((qn, members))

    def fn(batch: pa.Table) -> pa.Table:
        qm, mem = ray.get(bref)
        ids = batch.column(id_col).to_numpy()
        mat = _normalize(list_to_matrix(batch.column(vec_col), np.float64))
        out_q, out_id, out_cos = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(ids, mem[qi])
            if not mask.any():
                continue
            s = mat[mask] @ qm[qi]
            sub_ids = ids[mask]
            idx = _topk_block(sub_ids, s, min(k, sub_ids.size))
            out_q.extend([qi] * idx.size)
            out_id.extend(sub_ids[idx].tolist())
            out_cos.extend(s[idx].astype(np.float64).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "cos": pa.array(out_cos, pa.float64()),
            }
        )

    cand = ds.map_batches(fn, batch_format="pyarrow").take_all()
    qids = np.array([r["query_id"] for r in cand], dtype=np.int64)
    vids = np.array([r[id_col] for r in cand], dtype=np.int64)
    coss = np.array([r["cos"] for r in cand], dtype=np.float64)
    rows_q, rows_r, rows_v, rows_c = [], [], [], []
    for qi in range(nq):
        m = qids == qi
        v, c = vids[m], coss[m]
        order = np.lexsort((v, -c))[:k]
        rows_q.extend([qi] * order.size)
        rows_r.extend(range(1, order.size + 1))
        rows_v.extend(v[order].tolist())
        rows_c.extend(c[order].tolist())
    return pa.table(
        {
            "query_id": pa.array(rows_q, pa.int64()),
            "rank": pa.array(rows_r, pa.int32()),
            id_col: pa.array(rows_v, pa.int64()),
            "cos": pa.array(rows_c, pa.float64()),
        }
    )


def ivf_topk(
    ds: ray.data.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 42,
    index_dir: str | None = None,
) -> pa.Table:
    """Build a (transient unless ``index_dir`` given) IVF index, then query
    it via the persisted-bucket path.  The real 100 TB shape is ``ivf_build``
    once + ``ivf_query`` many."""
    import shutil
    import tempfile

    transient = index_dir is None
    if transient:
        index_dir = tempfile.mkdtemp(prefix="esray_ivf_")
    try:
        meta_path = os.path.join(index_dir, "meta.json")
        if os.path.exists(meta_path):
            # refuse to silently serve an index built with other parameters
            with open(meta_path) as f:
                meta = json.load(f)
            want = {
                "n_clusters": n_clusters, "id_col": id_col,
                "vec_col": vec_col, "seed": seed, "sample_size": sample_size,
                "num_vectors": ds.count(),
            }
            mismatched = {
                key: (meta.get(key), val)
                for key, val in want.items()
                if meta.get(key) != val
            }
            if mismatched:
                raise ValueError(
                    f"persisted IVF index at {index_dir} was built with "
                    f"different parameters: {mismatched}; rebuild with "
                    f"ivf_build or pass matching arguments"
                )
        else:
            ivf_build(
                ds, index_dir, n_clusters=n_clusters, vec_col=vec_col,
                id_col=id_col, sample_size=sample_size, seed=seed,
            )
        return ivf_query(index_dir, query_vecs, k=k, nprobe=nprobe)
    finally:
        if transient:
            shutil.rmtree(index_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization on top of the IVF bucket layout
# ---------------------------------------------------------------------------

def pq_train(sample: np.ndarray, m: int = 8, pq_k: int = 256,
             iters: int = 10, seed: int = 42) -> np.ndarray:
    """Train product-quantizer codebooks: split the dimension into ``m``
    contiguous subspaces and run the deterministic seeded k-means in
    each (FAISS IndexPQ's layout; sub-seed = seed + subspace index so
    every codebook is independently reproducible).  Returns float32
    ``(m, pq_k, d/m)``."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    pq_k = min(pq_k, n)
    dsub = d // m
    books = np.empty((m, pq_k, dsub), dtype=np.float32)
    for j in range(m):
        sub = np.ascontiguousarray(sample[:, j * dsub:(j + 1) * dsub],
                                   dtype=np.float32)
        books[j] = kmeans_fit(sub, pq_k, iters=iters, seed=seed + j)
    return books


def pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """uint8/uint16 codes ``(n, m)``: per subspace the nearest codeword
    (argmin L2, ties to the lowest index — numpy argmin semantics,
    deterministic)."""
    m, pq_k, dsub = books.shape
    codes = np.empty((mat.shape[0], m),
                     dtype=np.uint8 if pq_k <= 256 else np.uint16)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub].astype(np.float32)
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
        d2 = (books[j] ** 2).sum(1)[None, :] - 2.0 * (sub @ books[j].T)
        codes[:, j] = d2.argmin(1)
    return codes


def ivfpq_build(
    ds: ray.data.Dataset,
    index_dir: str,
    n_clusters: int = 16,
    m: int = 8,
    pq_k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2048,
    seed: int = 42,
) -> dict:
    """IVF-PQ: the IVF bucket layout of :func:`ivf_build`, but buckets
    store ``m``-byte PQ codes instead of full vectors — memory/IO per
    vector drops from ``4*d`` to ``m`` bytes (the 100 TB memory path;
    FAISS IndexIVFPQ with ``by_residual=False``: codes quantize the
    normalized vector itself, so the ADC dot product below decomposes
    exactly over subspaces).  Codebooks/centroids train driver-side on
    a bounded sample; assignment + encoding stream map-side."""
    import shutil

    sample = np.array(
        [r[vec_col] for r in ds.randomize_block_order(seed=seed)
         .limit(sample_size).take_all()],
        dtype=np.float32,
    )
    if sample.size == 0:
        raise ValueError(
            "cannot build an IVF-PQ index over an empty dataset")
    sample = _normalize(sample)
    cent = _normalize(kmeans_fit(sample, n_clusters, seed=seed))
    books = pq_train(sample, m=m, pq_k=pq_k, seed=seed)
    os.makedirs(index_dir, exist_ok=True)
    shutil.rmtree(os.path.join(index_dir, "buckets"), ignore_errors=True)
    meta_path = os.path.join(index_dir, "meta.json")
    if os.path.exists(meta_path):
        os.remove(meta_path)
    np.save(os.path.join(index_dir, "centroids.npy"), cent)
    np.save(os.path.join(index_dir, "codebooks.npy"), books)
    cref = ray.put((cent, books))

    # codes stay at their native width (uint8 for pq_k <= 256, uint16
    # above) — widening to int32 quadrupled the per-vector footprint the
    # PQ exists to shrink
    code_type = pa.uint8() if books.shape[1] <= 256 else pa.uint16()

    def assign(batch: pa.Table) -> pa.Table:
        cm, bk = ray.get(cref)
        ids = batch.column(id_col).to_numpy()
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "code": pa.array([], pa.list_(code_type)),
            "cid": pa.array([], pa.int32()),
            "bucket": pa.array([], pa.int32()),
        })
        if not ids.size:
            return empty
        mat = _normalize(list_to_matrix(batch.column(vec_col), np.float32))
        cid = (mat @ cm.T).argmax(1).astype(np.int32)
        codes = pq_encode(mat, bk)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "code": pa.array(list(codes), pa.list_(code_type)),
            "cid": pa.array(cid),
            "bucket": pa.array(cid),
        })

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "buckets"), partition_cols=["cid"]
    )
    import pyarrow.dataset as pads

    num_vectors = pads.dataset(
        os.path.join(index_dir, "buckets"), format="parquet",
        partitioning="hive",
    ).count_rows()
    with open(meta_path, "w") as f:
        json.dump({
            "kind": "ivfpq", "n_clusters": int(cent.shape[0]),
            "m": int(m), "pq_k": int(books.shape[1]),
            "id_col": id_col, "vec_col": vec_col, "seed": seed,
            "num_vectors": num_vectors,
        }, f)
    return {"n_clusters": int(cent.shape[0]), "m": m,
            "pq_k": int(books.shape[1]), "index_dir": index_dir}


def ivfpq_query(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
) -> list[dict]:
    """ADC search over the probed buckets: per query an ``(m, pq_k)``
    lookup table of query-subvector dot codewords; a candidate's
    approximate cosine is the sum of its codes' table entries (exact
    for the quantized vector — the dot product separates across
    subspaces).  I/O = the ``nprobe`` bucket partitions only; top-k by
    (-sim, id) with sims in floor'd micro-units for deterministic
    ordering."""
    import pyarrow.dataset as pads

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("kind") != "ivfpq":
        raise ValueError("not an IVF-PQ index (use ivf_query)")
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    books = np.load(os.path.join(index_dir, "codebooks.npy"))
    m, pq_k, dsub = books.shape
    q = _normalize(np.asarray(query_vecs, dtype=np.float32))
    out = []
    id_col = meta["id_col"]
    # decode each probed bucket ONCE across all queries (the former
    # per-query read repeated identical parquet I/O + decoding up to
    # nq times; ivf_probe_pairs already used this bucket-dict pattern)
    all_probes = {
        int(c)
        for qi in range(q.shape[0])
        for c in np.argsort(-(cent @ q[qi]))[:nprobe]
    }
    bucket_data: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for cid in sorted(all_probes):
        part = os.path.join(index_dir, "buckets", f"cid={cid}")
        if not os.path.isdir(part):
            continue
        t = pads.dataset(part, format="parquet").to_table(
            columns=[id_col, "code"]
        )
        if not t.num_rows:
            continue
        # vectorized list-column decode (no per-row Python np.asarray)
        codes = list_to_matrix(t.column("code"), np.int64)
        bucket_data[cid] = (t.column(id_col).to_numpy(), codes)
    for qi in range(q.shape[0]):
        probes = np.argsort(-(cent @ q[qi]))[:nprobe]
        lut = np.empty((m, pq_k), dtype=np.float64)
        for j in range(m):
            lut[j] = books[j] @ q[qi, j * dsub:(j + 1) * dsub]
        cand_ids: list[np.ndarray] = []
        cand_sim: list[np.ndarray] = []
        for cid in probes:
            got = bucket_data.get(int(cid))
            if got is None:
                continue
            ids_b, codes = got
            sims = lut[np.arange(m)[None, :], codes].sum(1)
            cand_ids.append(ids_b)
            cand_sim.append(sims)
        if not cand_ids:
            out.append({"query_id": qi, "ids": [], "sims_u": []})
            continue
        ids = np.concatenate(cand_ids)
        sims = np.concatenate(cand_sim)
        sims_u = np.floor(sims * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((ids, -sims_u))[:k]
        out.append({
            "query_id": qi,
            "ids": ids[order].astype(np.int64).tolist(),
            "sims_u": sims_u[order].tolist(),
        })
    return out
