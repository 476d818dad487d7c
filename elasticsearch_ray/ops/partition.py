"""Coarse hash-partition group apply — the scale-safe replacement for
``groupby(keys).map_groups(fn)`` when the number of distinct keys is
unbounded.

``map_groups`` invokes its Python kernel once PER KEY: at 10^9 users /
LSH buckets that is 10^9 interpreter dispatches (each with table slicing and
pa.table construction overhead) even when the kernel itself is vectorized.
:func:`hash_partition_apply` groups by a COARSE partition id
(``mix(keys) % num_partitions``) instead, so Ray dispatches the kernel once
per PARTITION; the kernel handles every key in its partition with segmented
numpy (sort + run boundaries + cumsum) in a single call.

Contract: the caller's kernel must group by the real keys itself (sort +
segment boundaries — see :func:`segment_starts`).  The per-key co-location
assumption is unchanged from map_groups (one key's rows fit one task);
``num_partitions`` should be ~= cluster cores x 2-4 so one partition is a
bounded slice of the shuffle, and hot single keys are no worse off than
under map_groups.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray.data

_PART_COL = "__part"
_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio multiplier (splitmix64)


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h * _MIX
    h ^= h >> np.uint64(29)
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(32)
    return h


def hash_partition_apply(
    ds: ray.data.Dataset,
    key_cols: list[str],
    kernel: Callable[[pa.Table], pa.Table],
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Apply ``kernel`` once per coarse hash partition of ``key_cols``.

    ``kernel`` receives a pa.Table holding ALL rows whose mixed key hash
    lands in one partition (whole key-groups, arbitrary row order) and must
    do its own per-key segmentation.  Integer key columns only (the ops
    here key on int ids / hash values); extend with a string hash if ever
    needed.
    """
    np_parts = np.uint64(num_partitions)

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for kc in key_cols:
            if not pa.types.is_integer(batch.schema.field(kc).type):
                raise TypeError(
                    f"hash_partition_apply needs integer keys; {kc} is "
                    f"{batch.schema.field(kc).type}"
                )
            v = batch.column(kc).to_numpy().astype(np.int64).view(np.uint64)
            h = _mix64(h ^ _mix64(v))
        part = (h % np_parts).view(np.int64)
        return batch.append_column(_PART_COL, pa.array(part, pa.int64()))

    def run(batch: pa.Table) -> pa.Table:
        return kernel(batch.drop_columns([_PART_COL]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby(_PART_COL)
        .map_groups(run, batch_format="pyarrow")
    )


def list_to_matrix(col, dtype) -> np.ndarray:
    """(n, d) matrix from an Arrow list column (uniform row lengths, no
    nulls — embeddings / minhash signatures).  Flatten-based: one
    near-zero-copy buffer view instead of ``to_pylist()``'s per-row
    Python list materialization (~100x on 50k x 64 float32 rows).
    Raggedness and nulls are validated explicitly — flatten() drops
    nulls and a divisible total would otherwise reshape into silently
    shifted rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if arr.null_count:
        raise ValueError("list_to_matrix: column has null rows")
    lens = pc.list_value_length(arr).to_numpy()
    if (lens != lens[0]).any():
        raise ValueError(
            f"list_to_matrix: ragged list column (lengths "
            f"{int(lens.min())}..{int(lens.max())})"
        )
    flat = np.asarray(
        arr.flatten().to_numpy(zero_copy_only=False), dtype=dtype
    )
    return flat.reshape(n, flat.size // n)


def segment_starts(*sorted_key_arrays: np.ndarray) -> np.ndarray:
    """Boolean mask of group starts over pre-sorted parallel key arrays."""
    n = sorted_key_arrays[0].size
    starts = np.zeros(n, dtype=bool)
    if n:
        starts[0] = True
        for arr in sorted_key_arrays:
            starts[1:] |= arr[1:] != arr[:-1]
    return starts


def start_index_of_row(starts_mask: np.ndarray) -> np.ndarray:
    """For each row, the index of its segment's first row (gather helper)."""
    idx = np.flatnonzero(starts_mask)
    n = starts_mask.size
    return np.repeat(idx, np.diff(np.append(idx, n)))


def popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return (
        np.unpackbits(np.ascontiguousarray(a, dtype=np.uint64).view(np.uint8))
        .reshape(-1, 64)
        .sum(axis=1)
        .astype(np.int64)
    )
