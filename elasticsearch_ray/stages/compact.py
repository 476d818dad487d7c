"""Segment compaction: rewrite one segment without its tombstoned docs.

The deletion lifecycle (beyond the reference, whose ``update_index`` is a
stub): ``add_tombstones`` hides docs immediately at query time;
``compact_index`` later makes deletions physical — postings filtered, block
metadata rebuilt, stats re-finalized — segment by segment, in parallel.
"""

from __future__ import annotations

import numpy as np

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

    keep_terms: list[str] = []
    slot_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    pos_cells: list[bytes] | None = [] if reader.has_positions else None
    dfs: list[int] = []
    for row in range(reader.num_terms):
        slots, tfs = reader.postings_slots_by_row(row)
        mask = ~np.isin(slots, tomb, assume_unique=True)
        if not mask.any():
            continue
        keep_terms.append(reader._terms[row].as_py())
        slot_parts.append(slots[mask])
        tf_parts.append(tfs[mask])
        dfs.append(int(mask.sum()))
        if pos_cells is not None:
            # layout v2: deltas only, per-doc count == tf.  Dropping a doc
            # removes its contiguous delta chunk; surviving chunks are
            # unchanged (each starts with an absolute in-doc position), so
            # the filter is one vectorized ragged gather.
            deltas = vbyte_decode(reader._cell("positions", row))
            offsets = np.zeros(tfs.size + 1, dtype=np.int64)
            np.cumsum(tfs, out=offsets[1:])
            sel_off = offsets[:-1][mask]
            sel_cnt = tfs[mask].astype(np.int64, copy=False)
            total_kept = int(sel_cnt.sum())
            dst0 = np.zeros(sel_cnt.size, dtype=np.int64)
            if sel_cnt.size:
                np.cumsum(sel_cnt[:-1], out=dst0[1:])
            gather = (
                np.repeat(sel_off - dst0, sel_cnt)
                + np.arange(total_kept, dtype=np.int64)
            )
            pos_cells.append(
                vbyte_encode_with_lengths(deltas[gather])[0]
            )

    out_df = np.asarray(dfs, dtype=np.int64)
    tstarts = np.zeros(out_df.size, dtype=np.int64)
    if out_df.size:
        np.cumsum(out_df[:-1], out=tstarts[1:])
        slots_all = np.concatenate(slot_parts)
        tfs_all = np.concatenate(tf_parts)
    else:
        slots_all = tfs_all = np.empty(0, dtype=np.int64)

    doclens = reader.doc_lens.copy()
    doclens[tomb] = -1

    info = {
        "doc_id_base": base,
        "num_docs": reader.num_docs,
        "part_ids": manifest.get("part_ids", []),
        "lineage": manifest.get("lineage", []),
    }
    asm = SegmentAssembler(index_dir, {seg_id: info}, codec, block_size)
    import pyarrow as pa

    asm._write_segment(
        seg_id,
        info,
        doclens,
        pa.array(keep_terms, pa.large_string()),
        out_df,
        tstarts,
        slots_all,
        tfs_all,
        pos_cells=pos_cells,
    )
    return {"seg_id": seg_id, "removed_docs": int(tomb.size)}
