"""Corpus-level curation ops for LLM training-data pipelines: n-gram
statistics (contamination / memorization checks), per-domain quotas, and
deterministic hash-based train/val splits.

All three are shuffle-light by construction:

- :func:`bigram_counts` pre-aggregates INSIDE each batch (map-side
  combiner), so the ``groupby`` exchange moves one row per distinct bigram
  per batch — not one row per corpus token.
- :func:`source_quota` routes rows through the coarse
  :func:`~.partition.hash_partition_apply` exchange (one kernel call per
  partition, segmented numpy per key) — never one Python call per domain.
- :func:`hash_split` is embarrassingly parallel (a pure map), with the
  split decision derived from a content hash so it is deterministic across
  runs, cluster sizes, and row order.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _space_split(batch_texts: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    """``string_split(text, ' ')`` semantics (NOT whitespace-class split):
    empty pieces between consecutive spaces are preserved, matching
    DuckDB's ``string_split`` exactly so the twins compare bit-for-bit."""
    arr = batch_texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return pc.split_pattern(arr, pattern=" ")


def bigram_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    top_k: int = 50,
) -> ray.data.Dataset:
    """Top-k within-document adjacent word pairs across the corpus.

    Per batch: Arrow split -> flat token array -> dictionary-encode ->
    adjacent (code_i, code_(i+1)) pairs masked to same-document -> one
    ``np.unique`` over packed 64-bit pair keys = the batch-local partial
    count.  The shuffle then sums partials per bigram string — rows moved
    are distinct-bigrams-per-batch, not corpus tokens.
    """

    def partial(batch: pa.Table) -> pa.Table:
        split = _space_split(batch.column(text_col))
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        ntok = len(flat)
        if ntok < 2:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                }
            )
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # adjacency mask: pair (i, i+1) valid unless i+1 starts a new doc
        doc_first = np.zeros(ntok, dtype=bool)
        doc_first[np.cumsum(lens[:-1])] = True
        valid = ~doc_first[1:]
        left = codes[:-1][valid]
        right = codes[1:][valid]
        keys = (left << 32) | right
        uniq, counts = np.unique(keys, return_counts=True)
        lcode = (uniq >> 32).astype(np.int64)
        rcode = (uniq & 0xFFFFFFFF).astype(np.int64)
        d = denc.dictionary
        bigrams = pc.binary_join_element_wise(
            d.take(pa.array(lcode)), d.take(pa.array(rcode)), " "
        )
        return pa.table(
            {"bigram": bigrams.cast(pa.string()), "n": pa.array(counts)}
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "bigram": batch.column("bigram"),
                "n": batch.column("sum(n)").cast(pa.int64()),
            }
        )

    out = agg.map_batches(rename, batch_format="pyarrow")
    return out.sort(["n", "bigram"], descending=[True, False]).limit(top_k)


def source_quota(
    ds: ray.data.Dataset,
    key_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    n_per_key: int = 5,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Per-domain quota: keep the top ``n_per_key`` rows of each key by
    ``(order_col DESC, id_col ASC)`` — the standard "cap any one domain's
    contribution" curation step.

    Scale shape: the string key is hashed to int64 once per UNIQUE value
    per batch (dictionary encode), rows ride ONE coarse hash exchange
    (:func:`hash_partition_apply`), and the kernel ranks every key in its
    partition with a single ``np.lexsort`` — no per-key Python dispatch.
    """
    from .partition import hash_partition_apply

    def add_key_hash(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        denc = col.dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        hv = np.empty(len(uniq), dtype=np.int64)
        for i, u in enumerate(uniq):
            hv[i] = int.from_bytes(
                hashlib.blake2b(
                    (u or "").encode(), digest_size=8
                ).digest(),
                "little",
                signed=True,
            )
        codes = denc.indices.to_numpy(zero_copy_only=False)
        return batch.append_column("__kh", pa.array(hv[codes]))

    def rank_kernel(tbl: pa.Table) -> pa.Table:
        kh = tbl.column("__kh").to_numpy()
        order_v = tbl.column(order_col).to_numpy()
        ids = tbl.column(id_col).to_numpy()
        # sort: key, then order desc, then id asc
        perm = np.lexsort((ids, -order_v, kh))
        kh_s = kh[perm]
        starts = np.zeros(len(kh_s), dtype=bool)
        if len(kh_s):
            starts[0] = True
            starts[1:] = kh_s[1:] != kh_s[:-1]
        seg_first = np.repeat(
            np.flatnonzero(starts),
            np.diff(np.append(np.flatnonzero(starts), len(kh_s))),
        )
        rank = np.arange(len(kh_s)) - seg_first
        keep = perm[rank < n_per_key]
        return tbl.take(pa.array(np.sort(keep))).drop_columns(["__kh"])

    with_kh = ds.map_batches(add_key_hash, batch_format="pyarrow")
    return hash_partition_apply(
        with_kh, ["__kh"], rank_kernel, num_partitions=num_partitions
    )


_SPLITS = (("train", 0, 950), ("val", 950, 975), ("test", 975, 1000))


def hash_split(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Deterministic content-hash split: bucket = first 8 hex chars of
    ``md5(text)`` mod 1000 -> train/val/test at 95/2.5/2.5.

    Content-keyed (not id- or position-keyed) so the assignment survives
    re-sharding, re-ordering, and incremental re-runs; md5 keeps the twin
    exact (DuckDB's ``md5()`` matches hashlib byte-for-byte).  Pure map —
    no shuffle at all; the per-row md5 is C-speed (hashlib) over docs,
    not tokens.
    """

    def assign(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        buckets = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            h = hashlib.md5((t or "").encode()).hexdigest()
            buckets[i] = int(h[:8], 16) % 1000
        split = np.full(len(texts), "train", dtype=object)
        for name, lo, hi in _SPLITS:
            split[(buckets >= lo) & (buckets < hi)] = name
        return pa.table(
            {
                id_col: batch.column(id_col),
                "split": pa.array(split.tolist(), pa.string()),
                "bucket": pa.array(buckets),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def hash_split_counts(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(split, n_docs) summary of :func:`hash_split` — the checkable twin
    surface (exact md5 parity with DuckDB)."""
    assigned = hash_split(ds, text_col=text_col, id_col=id_col)
    agg = assigned.groupby("split").count()

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": batch.column("split"),
                "n_docs": batch.column("count()").cast(pa.int64()),
            }
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def composite_buckets(
    ds: ray.data.Dataset,
    keys: list[str] = ("source", "lang"),
    size: int = 10,
    after: tuple | None = None,
):
    """One page of an ES ``composite`` aggregation: the first ``size``
    composite-key buckets in strict key order STRICTLY AFTER ``after``
    (the previous page's last key tuple), each with its doc count.
    Returns ``(table, after_key)`` where ``after_key`` is the tuple to
    pass for the next page (None when this page wasn't full — ES's
    end-of-stream signal).

    Scale shape (the reason composite exists in ES): each page re-scans
    the source but the ``after`` filter is pushed MAP-SIDE before any
    shuffle, batches are pre-aggregated with one Arrow hash group-by
    (shuffle carries one row per (batch, live bucket)), and the final
    sort/limit runs over the bucket table, never the rows.  Memory per
    page is O(size + live buckets), independent of corpus rows.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    keys = list(keys)

    def prep(batch: pa.Table) -> pa.Table:
        if after is not None:
            # vectorized lexicographic (k1,...,kn) > after: OR over
            # prefix-equal & strictly-greater-at-i
            gt = pa.array(np.zeros(batch.num_rows, dtype=bool))
            eq = pa.array(np.ones(batch.num_rows, dtype=bool))
            for col_name, a_val in zip(keys, after):
                col = batch.column(col_name)
                gt = pc.or_(gt, pc.and_(eq, pc.greater(col, a_val)))
                eq = pc.and_(eq, pc.equal(col, a_val))
            batch = batch.filter(gt)
        part = batch.select(keys)
        g = part.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["n_part"])

    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("n_part"))
        .sort(keys)
        .limit(size)
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in keys}
        cols["doc_count"] = batch.column("sum(n_part)").cast(pa.int64())
        return pa.table(cols)

    df = agg.to_pandas()
    if not len(df):
        # past-the-end page (caller paged exactly to the last bucket):
        # empty table with the page schema, end-of-stream signal
        empty = {k: pa.array([], pa.string()) for k in keys}
        empty["doc_count"] = pa.array([], pa.int64())
        return pa.table(empty), None
    page = finish(
        pa.Table.from_pandas(df, preserve_index=False)
        .select(keys + ["sum(n_part)"])
    )
    after_key = (
        tuple(page.column(k)[-1].as_py() for k in keys)
        if page.num_rows == size
        else None
    )
    return page, after_key


def frequent_item_sets(
    ds: ray.data.Dataset,
    top_items: int = 20,
    min_support: int = 2,
    size: int = 20,
    text_col: str = "text",
) -> list[dict]:
    """ES ``frequent_item_sets`` aggregation (2-item sets over the
    document's distinct tokens): the ``size`` token PAIRS that co-occur
    in the most documents, ordered (support desc, item_a asc, item_b
    asc), restricted to pairs of the ``top_items`` highest-document-
    frequency tokens — the standard apriori candidate pruning (ES's
    eclat miner prunes by min support; a fixed frequent-item universe
    makes the result deterministic and the pair space M^2-bounded).

    Two bounded passes:
    1. document frequency per token — per batch an Arrow distinct
       (doc, token) group-by, shuffle carries one row per (batch,
       distinct token); driver keeps the top-M by (df desc, token asc).
    2. pair supports — per batch a boolean docs-x-M membership matrix
       (``pc.index_in`` against the broadcast item list) and one
       M x M matmul; the shuffle carries <= M^2 partial rows per batch.
    """
    if top_items < 2:
        raise ValueError("top_items must be >= 2")
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        split = _space_split(batch.column(text_col))
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        rows = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        dt = pa.table({"r": pa.array(rows), "tok": flat})
        distinct = dt.group_by(["r", "tok"]).aggregate([])
        g = distinct.group_by("tok").aggregate([("r", "count")])
        return pa.table({
            "tok": g.column("tok"),
            "df_part": g.column("r_count").cast(pa.int64()),
        })

    df_rows = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("df_part")).take_all()
    )  # O(vocabulary) rows — token vocab, not corpus tokens
    ranked = sorted(
        ((int(r["sum(df_part)"]), str(r["tok"])) for r in df_rows),
        key=lambda t: (-t[0], t[1]),
    )[:top_items]
    items = [t for _, t in ranked]
    if not items:
        return []
    item_arr = pa.array(items, pa.string())
    m = len(items)

    def pair_partial(batch: pa.Table) -> pa.Table:
        split = _space_split(batch.column(text_col))
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        rows = np.repeat(np.arange(lens.size, dtype=np.int64), lens)
        idx = pc.index_in(flat, value_set=item_arr)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        r = rows[valid]
        c = idx.drop_null().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = np.zeros((lens.size, m), dtype=np.float32)
        mat[r, c] = 1.0
        co = (mat.T @ mat).astype(np.int64)
        iu, ju = np.triu_indices(m, k=1)
        n = co[iu, ju]
        keep = n > 0
        return pa.table({
            "ia": pa.array(iu[keep].astype(np.int64)),
            "ib": pa.array(ju[keep].astype(np.int64)),
            "n_part": pa.array(n[keep]),
        })

    pair_rows = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["ia", "ib"]).aggregate(Sum("n_part")).take_all()
    )  # <= M^2 rows
    out = []
    for r in pair_rows:
        s = int(r["sum(n_part)"])
        if s >= min_support:
            # indices are df-ranked; emit the pair lexicographically
            ta, tb = items[int(r["ia"])], items[int(r["ib"])]
            if ta > tb:
                ta, tb = tb, ta
            out.append({"item_a": ta, "item_b": tb, "support": s})
    out.sort(key=lambda d: (-d["support"], d["item_a"], d["item_b"]))
    return out[:size]


def lm_perplexity(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_vocab: int | None = None,
) -> ray.data.Dataset:
    """CCNet-style LM quality scoring with an in-corpus bigram model:
    each doc's average negative log-likelihood under an interpolated
    bigram LM trained on the corpus itself (CCNet filters on KenLM
    perplexity; the self-trained variant needs no external model and
    flags the same low-likelihood outliers).

    Per within-doc adjacent pair (a, b):
        P(b|a) = 0.9 * c(ab)/c(a) + 0.1 * (c(b) + 1)/(N + V)
    (interpolated with add-one-smoothed unigrams; OOV tokens — outside
    the ``top_vocab`` pruning — take the unigram term only with
    c(b) = 0).  Each pair contributes the INTEGER micro-nat cost
    ``floor(-ln P * 1e6 + 0.5)``, so per-doc sums are order-independent
    and engine-exact; emits (doc_id, n_pairs, sum_nl_u, avg_nl_u) with
    n_pairs = 0 and null costs for docs under two tokens.

    Scale shape: unigram/bigram counts come from the same map-side
    partial + groupby exchanges as ``bigram_counts``; the model tables
    broadcast once via ``ray.put`` (``top_vocab`` bounds them the way
    CCNet's pretrained KenLM binary is bounded); scoring is one
    dictionary-encode + two searchsorted lookups per batch."""
    from ray.data.aggregate import Sum

    def uni_partial(batch: pa.Table) -> pa.Table:
        split = _space_split(pc.coalesce(batch.column(text_col), ""))
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        g = pa.table({"tok": flat}).group_by("tok").aggregate(
            [("tok", "count")]
        )
        return pa.table({
            "tok": g.column("tok"),
            "c_part": g.column("tok_count").cast(pa.int64()),
        })

    uni_rows = (
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("c_part")).take_all()
    )  # O(vocabulary) rows
    uni = sorted(((int(r["sum(c_part)"]), str(r["tok"]))
                  for r in uni_rows), key=lambda t: (-t[0], t[1]))
    total_n = sum(c for c, _ in uni)
    vocab_v = len(uni)
    if top_vocab is not None:
        uni = uni[:top_vocab]
    vocab = np.array(sorted(t for _, t in uni))
    counts_by_tok = dict((t, c) for c, t in uni)
    uni_counts = np.array([counts_by_tok[t] for t in vocab],
                          dtype=np.int64)
    vocab_arr = pa.array(vocab, pa.string())

    def bi_partial(batch: pa.Table) -> pa.Table:
        split = _space_split(pc.coalesce(batch.column(text_col), ""))
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        code = pc.index_in(flat, value_set=vocab_arr)
        codes = np.where(
            code.is_valid().to_numpy(zero_copy_only=False),
            code.fill_null(0).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            -1,
        )
        ntok = codes.size
        if ntok < 2:
            return pa.table({"key": pa.array([], pa.int64()),
                             "c_part": pa.array([], pa.int64())})
        doc_first = np.zeros(ntok, dtype=bool)
        doc_first[0] = True
        doc_first[np.cumsum(lens[:-1])] = True
        a, b = codes[:-1], codes[1:]
        m = ~doc_first[1:] & (a >= 0) & (b >= 0)
        key = a[m] * vocab.size + b[m]
        u, c = np.unique(key, return_counts=True)
        return pa.table({"key": pa.array(u),
                         "c_part": pa.array(c.astype(np.int64))})

    bi_rows = (
        ds.map_batches(bi_partial, batch_format="pyarrow")
        .groupby("key").aggregate(Sum("c_part")).take_all()
    )  # O(distinct in-vocab bigrams) rows
    bi_keys = np.array([int(r["key"]) for r in bi_rows], dtype=np.int64)
    bi_counts = np.array([int(r["sum(c_part)"]) for r in bi_rows],
                         dtype=np.int64)
    order = np.argsort(bi_keys)
    bi_keys, bi_counts = bi_keys[order], bi_counts[order]
    model = ray.put((vocab_arr, uni_counts, bi_keys, bi_counts,
                     total_n, vocab_v))

    def score(batch: pa.Table) -> pa.Table:
        voc, uc, bk, bc, n_tot, v_tot = ray.get(model)
        split = _space_split(pc.coalesce(batch.column(text_col), ""))
        lens = pc.list_value_length(split).to_numpy().astype(np.int64)
        flat = pc.list_flatten(split)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        code = pc.index_in(flat, value_set=voc)
        codes = np.where(
            code.is_valid().to_numpy(zero_copy_only=False),
            code.fill_null(0).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            -1,
        )
        ntok = codes.size
        nv = len(voc)
        if ntok:
            doc_first = np.zeros(ntok, dtype=bool)
            doc_first[0] = True
            doc_first[np.cumsum(lens[:-1])] = True
            a, b = codes[:-1], codes[1:]
            pair = ~doc_first[1:]
            ca = np.where(a >= 0, uc[np.maximum(a, 0)], 0).astype(
                np.float64)
            cb = np.where(b >= 0, uc[np.maximum(b, 0)], 0).astype(
                np.float64)
            key = np.maximum(a, 0) * nv + np.maximum(b, 0)
            idx = np.searchsorted(bk, key)
            idx_c = np.minimum(idx, max(bk.size - 1, 0))
            c2 = np.where(
                (bk.size > 0) & (a >= 0) & (b >= 0)
                & (bk[idx_c] == key) if bk.size else False,
                bc[idx_c] if bk.size else 0, 0,
            ).astype(np.float64)
            # EXACT operation order of the SQL twin:
            # 0.9*c2/ca + 0.1*(cb+1)/(n+v); c2>0 implies ca>0
            prob = np.where(ca > 0, 0.9 * c2 / np.maximum(ca, 1.0), 0.0) \
                + 0.1 * (cb + 1.0) / (n_tot + v_tot)
            nl = np.floor(-np.log(prob) * 1e6 + 0.5).astype(np.int64)
            nl = np.where(pair, nl, 0)
            # per-doc pair sums via the doc offsets
            offs = np.zeros(lens.size + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            cs = np.concatenate([[0], np.cumsum(nl)])
            # pairs of doc i live at flat indices offs[i]..offs[i+1]-2
            sum_nl = cs[np.maximum(offs[1:] - 1, 0)] - cs[
                np.minimum(offs[:-1], ntok - 1)]
            npairs = np.maximum(lens - 1, 0)
        else:
            sum_nl = np.zeros(lens.size, dtype=np.int64)
            npairs = np.zeros(lens.size, dtype=np.int64)
        avg = np.where(
            npairs > 0,
            np.floor(sum_nl / np.maximum(npairs, 1)).astype(np.int64),
            -1,
        )
        return pa.table({
            id_col: batch.column(id_col).cast(pa.int64()),
            "n_pairs": pa.array(npairs.astype(np.int64)),
            "sum_nl_u": pa.array(np.where(npairs > 0, sum_nl, 0)
                                 .astype(np.int64)),
            "avg_nl_u": pa.array(avg.astype(np.int64)),
        })

    return ds.map_batches(score, batch_format="pyarrow")
