"""Sequence-packing manifest for LLM training data: the GPT-style packing
layout (concatenate every doc's token stream in doc_id order, slice into
fixed-length training sequences, documents split across sequence
boundaries) WITHOUT materializing any tokens — the op emits, per doc, its
global token offset and the [first, last] training sequence it lands in.

Scale shape — a distributed exclusive prefix scan (the classic two-phase
form):

1. bucket docs by ``doc_id // bucket_rows``; one ``groupby(bucket).sum``
   yields per-bucket token totals (tiny: #buckets rows),
2. the driver prefix-sums the bucket totals (bounded work) and broadcasts
   the bucket base offsets,
3. one partition-parallel pass computes each doc's offset = bucket base +
   intra-bucket exclusive cumsum (segmented numpy, whole buckets per
   task).

No stage ever holds more than a bucket of rows; the only driver-side
state is one row per bucket.  Token counts use the whitespace-split
convention of the documents table (single-spaced text), matching the
quality/token-count ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .partition import hash_partition_apply


def _tok_counts(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    import pyarrow.compute as pc

    col = pc.coalesce(batch.column(text_col), "")
    # python str.split() semantics exactly: tokens = \S+ matches (0 for
    # empty / whitespace-only text)
    n = pc.count_substring_regex(col, r"\S+").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_tok": pa.array(n, pa.int64()),
        }
    )


def pack_manifest(
    ds: ray.data.Dataset,
    seq_len: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_rows: int = 1_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Returns (doc_id, n_tok, tok_start, seq_start, seq_end): the packed
    position of every doc in the doc_id-ordered global token stream sliced
    into ``seq_len``-token training sequences.  Zero-token docs get
    seq_start = seq_end = -1 (they occupy no sequence)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be > 0")
    counts = ds.map_batches(
        lambda b: _tok_counts(b, text_col, id_col),
        batch_format="pyarrow",
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy()
        return b.append_column(
            "bucket", pa.array(ids // bucket_rows, pa.int64())
        )

    counts = counts.map_batches(add_bucket, batch_format="pyarrow")
    # phase 1+2: per-bucket totals -> driver prefix (one row per bucket)
    totals = counts.groupby("bucket").sum("n_tok").take_all()
    totals.sort(key=lambda r: r["bucket"])
    base: dict[int, int] = {}
    acc = 0
    for r in totals:
        base[r["bucket"]] = acc
        acc += int(r["sum(n_tok)"])
    base_ref = ray.put(base)

    # phase 3: whole buckets per task, segmented exclusive cumsum
    def per_bucket(tbl: pa.Table) -> pa.Table:
        bases = ray.get(base_ref)
        ids = tbl.column(id_col).to_numpy()
        n = tbl.column("n_tok").to_numpy()
        bk = tbl.column("bucket").to_numpy()
        order = np.lexsort((ids, bk))
        ids, n, bk = ids[order], n[order], bk[order]
        starts = np.flatnonzero(np.r_[True, bk[1:] != bk[:-1]])
        cum = np.cumsum(n) - n  # global exclusive cumsum over this table
        # reset per bucket segment, then add the bucket's base offset
        seg_base = np.repeat(cum[starts], np.diff(np.r_[starts, bk.size]))
        off = cum - seg_base + np.array(
            [bases[int(b)] for b in bk[starts]], dtype=np.int64
        ).repeat(np.diff(np.r_[starts, bk.size]))
        seq_start = np.where(n > 0, off // seq_len, -1)
        seq_end = np.where(n > 0, (off + n - 1) // seq_len, -1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tok": pa.array(n, pa.int64()),
                "tok_start": pa.array(off, pa.int64()),
                "seq_start": pa.array(seq_start, pa.int64()),
                "seq_end": pa.array(seq_end, pa.int64()),
            }
        )

    return hash_partition_apply(
        counts, ["bucket"], per_bucket, num_partitions=num_partitions
    )
