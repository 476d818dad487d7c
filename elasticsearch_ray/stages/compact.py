"""Segment compaction: rewrite one segment without its tombstoned docs.

The deletion lifecycle (beyond the reference, whose ``update_index`` is a
stub): ``add_tombstones`` hides docs immediately at query time;
``compact_index`` later makes deletions physical — postings filtered, block
metadata rebuilt, stats re-finalized — segment by segment, in parallel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.vbyte import vbyte_decode, vbyte_encode_with_lengths
from ..state.manifest import read_json, segment_manifest_path
from ..state.segment import SegmentReader


def compact_segment(
    index_dir: str,
    seg_id: int,
    tombstones: list[int],
    codec: str,
    block_size: int,
) -> dict:
    from .postings import SegmentAssembler

    manifest = read_json(segment_manifest_path(index_dir, seg_id))
    reader = SegmentReader(index_dir, seg_id)
    base = reader.doc_id_base
    tomb = np.asarray(sorted(tombstones), dtype=np.int64) - base
    tomb = tomb[(tomb >= 0) & (tomb < reader.num_docs)]
    if tomb.size == 0:
        return {"seg_id": seg_id, "removed_docs": 0}

    # One whole-segment batch decode + global masks — no per-term Python
    # loop (same vectorization as the merge path; a 5M-term segment pays
    # a handful of numpy passes, not 5M iterations).
    slots_all, tfs_all, row_starts = reader.decode_all_postings()
    nrows = reader.num_terms
    df_all = np.diff(row_starts)
    keep_post = ~np.isin(slots_all, tomb)  # per-posting keep mask
    kept_per_row = (
        np.add.reduceat(keep_post.astype(np.int64), row_starts[:-1])
        if slots_all.size
        else np.zeros(nrows, dtype=np.int64)
    )
    kept_per_row[df_all == 0] = 0  # reduceat repeats on empty rows
    rows_kept = kept_per_row > 0
    out_df = kept_per_row[rows_kept]
    tstarts = np.zeros(out_df.size, dtype=np.int64)
    if out_df.size:
        np.cumsum(out_df[:-1], out=tstarts[1:])
    keep_terms = reader._terms.filter(pa.array(rows_kept)).combine_chunks()
    slots_f = slots_all[keep_post]
    tfs_f = tfs_all[keep_post]

    pos_cells: list[bytes] | None = None
    if reader.has_positions:
        # layout v2: deltas only, per-doc count == tf.  Dropping a doc
        # removes its contiguous delta chunk; surviving chunks are
        # unchanged (each starts with an absolute in-doc position), so the
        # filter is one global ragged mask, and ONE batch re-encode is
        # split into per-term cells by summing bytes-per-value per row.
        poff, pdata = reader._cells["positions"]
        deltas_all = vbyte_decode(pdata[poff[0]:poff[-1]])
        kept_val_mask = np.repeat(keep_post, tfs_all)
        deltas_kept = deltas_all[kept_val_mask]
        enc, val_lens = vbyte_encode_with_lengths(deltas_kept)
        row_of_post = np.repeat(np.arange(nrows), df_all)
        row_of_kept_val = np.repeat(
            row_of_post[keep_post], tfs_all[keep_post]
        )
        bytes_per_row = np.bincount(
            row_of_kept_val, weights=val_lens, minlength=nrows
        ).astype(np.int64)[rows_kept]
        cell_ends = np.cumsum(bytes_per_row)
        cell_starts = cell_ends - bytes_per_row
        pos_cells = [
            enc[s:e] for s, e in zip(cell_starts.tolist(), cell_ends.tolist())
        ]
    slots_all, tfs_all = slots_f, tfs_f

    doclens = reader.doc_lens.copy()
    doclens[tomb] = -1

    info = {
        "doc_id_base": base,
        "num_docs": reader.num_docs,
        "part_ids": manifest.get("part_ids", []),
        "lineage": manifest.get("lineage", []),
    }
    asm = SegmentAssembler(index_dir, {seg_id: info}, codec, block_size)
    asm._write_segment(
        seg_id,
        info,
        doclens,
        keep_terms.cast(pa.large_string()),
        out_df,
        tstarts,
        slots_all,
        tfs_all,
        pos_cells=pos_cells,
    )
    return {"seg_id": seg_id, "removed_docs": int(tomb.size)}
