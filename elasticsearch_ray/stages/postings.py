"""Posting-list construction: run encoding + segment assembly.

The wide shuffle (SURVEY.md §2.5 A5, §7.3) is a sort by
``(seg, term, doc_id)``.  Skew handling: because ``doc_id`` is part of the
range-partitioning key, a Zipf head term whose postings exceed one block is
automatically split across consecutive sorted blocks into doc-range-disjoint
sub-runs — ordered salting by doc-id range.  ``encode_runs_block`` encodes
each (seg, term) run in a block; ``SegmentAssembler`` (a ``groupby('seg')
.map_groups`` stage) merges the sub-runs of head terms back into one posting
list per term and writes the immutable segment + its lineage manifest.

Everything is vectorized: per-block run encoding is two VByte passes over the
whole block (no per-run Python encoding), and block-max metadata is computed
with ``np.maximum/minimum.reduceat`` over the full decoded segment.
"""

from __future__ import annotations

import os
import time
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.vbyte import (
    decode_postings,
    decode_tfs,
    vbyte_decode,
    vbyte_encode_with_lengths,
    zlib_decode_postings,
)
from ..state.manifest import atomic_write_json, segment_manifest_path
from ..state.segment import (
    BLOCK_SIZE,
    doclen_path,
    segment_path,
    write_ipc_atomic,
)

RUN_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("term", pa.large_string()),
        ("first_doc", pa.int64()),
        ("df", pa.int64()),
        ("postings", pa.large_binary()),
        ("tfs", pa.large_binary()),
    ]
)


def _binary_from_slices(data: bytes, cell_byte_lens: np.ndarray) -> pa.LargeBinaryArray:
    """Zero-copy LargeBinary array over `data` split at cumulative lengths."""
    offsets = np.zeros(cell_byte_lens.size + 1, dtype=np.int64)
    np.cumsum(cell_byte_lens, out=offsets[1:])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        cell_byte_lens.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )


def encode_runs_block(
    batch: pa.Table, codec: str = "vbyte", seg_bases: np.ndarray | None = None
) -> pa.Table:
    """One sorted block of triples -> one row per (seg, term) run.

    Doc ids are encoded as segment-local slots (``doc_id - seg_base``),
    mirroring the reference's dense ``doc_idx`` postings
    (``selfindex_q_daat.py:94-110``): first element absolute-within-segment,
    the rest deltas.  ``seg_bases[seg_id]`` gives each segment's base.
    """
    n = batch.num_rows
    if n == 0:
        return RUN_SCHEMA.empty_table()
    seg = batch.column("seg").to_numpy()
    doc = batch.column("doc_id").to_numpy()
    tf = batch.column("tf").to_numpy().astype(np.int64)
    term = batch.column("term")
    if isinstance(term, pa.ChunkedArray):
        term = term.combine_chunks()

    # Run boundaries: term or seg changes between adjacent rows.
    if n == 1:
        change = np.zeros(0, dtype=bool)
    else:
        term_eq = pc.equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        change = (~term_eq) | (seg[1:] != seg[:-1])
    starts = np.empty(1 + int(change.sum()), dtype=np.int64)
    starts[0] = 0
    starts[1:] = np.flatnonzero(change) + 1
    run_lens = np.empty_like(starts)
    run_lens[:-1] = starts[1:] - starts[:-1]
    run_lens[-1] = n - starts[-1]

    # Per-run delta encoding with absolute-within-segment first element,
    # all runs at once.
    deltas = np.empty(n, dtype=np.int64)
    deltas[1:] = doc[1:] - doc[:-1]
    if seg_bases is None:
        deltas[starts] = doc[starts]
    else:
        deltas[starts] = doc[starts] - seg_bases[seg[starts]]

    if codec == "zlib":
        post_cells = []
        for s, ln in zip(starts, run_lens):
            post_cells.append(zlib.compress(deltas[s : s + ln].astype("<u4").tobytes(), 9))
        postings_arr = pa.array(post_cells, pa.large_binary())
    else:
        data, vlens = vbyte_encode_with_lengths(deltas)
        byte_lens = np.add.reduceat(vlens, starts)
        postings_arr = _binary_from_slices(data, byte_lens)

    tf_data, tf_vlens = vbyte_encode_with_lengths(tf)
    tf_byte_lens = np.add.reduceat(tf_vlens, starts)
    tfs_arr = _binary_from_slices(tf_data, tf_byte_lens)

    return pa.table(
        {
            "seg": pa.array(seg[starts]),
            "term": term.take(starts),
            "first_doc": pa.array(doc[starts]),
            "df": pa.array(run_lens),
            "postings": postings_arr,
            "tfs": tfs_arr,
        },
        schema=RUN_SCHEMA,
    )


class SegmentAssembler:
    """``groupby('seg').map_groups`` callable: runs-of-one-segment -> segment
    files + manifest.  Returns a one-row stats table per segment."""

    def __init__(self, index_dir: str, seg_infos: dict[int, dict], codec: str,
                 block_size: int = BLOCK_SIZE):
        self.index_dir = index_dir
        self.seg_infos = seg_infos  # seg_id -> {doc_id_base,num_docs,part_ids,...}
        self.codec = codec
        self.block_size = block_size

    # -- helpers -----------------------------------------------------------

    def _load_doclens(self, info: dict) -> np.ndarray:
        base, num = info["doc_id_base"], info["num_docs"]
        arr = np.full(num, -1, dtype=np.int32)
        for pid in info["part_ids"]:
            path = os.path.join(self.index_dir, "docmap", f"part-{pid:06d}.parquet")
            t = pq.read_table(path, columns=["doc_id", "doc_len"])
            ids = t.column("doc_id").to_numpy() - base
            arr[ids] = t.column("doc_len").to_numpy()
        return arr

    def _decode_cell(self, raw: bytes) -> np.ndarray:
        if self.codec == "zlib":
            return zlib_decode_postings(raw)
        return decode_postings(raw)

    def _encode_ids(self, ids: np.ndarray) -> bytes:
        deltas = np.empty_like(ids)
        deltas[0] = ids[0]
        deltas[1:] = ids[1:] - ids[:-1]
        if self.codec == "zlib":
            return zlib.compress(deltas.astype("<u4").tobytes(), 9)
        return vbyte_encode_with_lengths(deltas)[0]

    # -- main --------------------------------------------------------------

    def __call__(self, runs: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        seg_id = int(runs.column("seg")[0].as_py())
        info = self.seg_infos[seg_id]
        doclens = self._load_doclens(info)

        runs = runs.sort_by([("term", "ascending"), ("first_doc", "ascending")])
        term = runs.column("term").combine_chunks()
        df = runs.column("df").to_numpy()
        postings_col = runs.column("postings").combine_chunks()
        tfs_col = runs.column("tfs").combine_chunks()
        nruns = runs.num_rows

        # Group runs by term.
        if nruns > 1:
            eq = pc.equal(term.slice(1), term.slice(0, nruns - 1)).to_numpy(
                zero_copy_only=False
            )
            tstarts = np.concatenate(([0], np.flatnonzero(~eq) + 1))
        else:
            tstarts = np.zeros(1, dtype=np.int64)
        tlens = np.empty_like(tstarts)
        tlens[:-1] = tstarts[1:] - tstarts[:-1]
        tlens[-1] = nruns - tstarts[-1]

        # Merge multi-run terms; reuse single-run cells as-is (their run
        # encoding is already the final posting-list encoding).
        out_terms: list[str] = []
        out_df = np.empty(tstarts.size, dtype=np.int64)
        post_cells: list[bytes] = []
        tf_cells: list[bytes] = []
        merged = 0
        term_py = term.to_pylist()
        for k, (s, ln) in enumerate(zip(tstarts, tlens)):
            out_terms.append(term_py[s])
            if ln == 1:
                out_df[k] = df[s]
                post_cells.append(postings_col[s].as_py())
                tf_cells.append(tfs_col[s].as_py())
            else:
                merged += 1
                ids = np.concatenate(
                    [self._decode_cell(postings_col[s + j].as_py()) for j in range(ln)]
                )
                tfs = np.concatenate(
                    [decode_tfs(tfs_col[s + j].as_py()) for j in range(ln)]
                )
                order = np.argsort(ids, kind="stable")
                ids = ids[order]
                tfs = tfs[order]
                out_df[k] = ids.size
                post_cells.append(self._encode_ids(ids))
                tf_cells.append(vbyte_encode_with_lengths(tfs)[0])

        stats = self._write_segment(
            seg_id, info, doclens, out_terms, out_df, post_cells, tf_cells
        )
        stats["merged_terms"] = merged
        stats["assemble_sec"] = time.perf_counter() - t0
        return pa.table({k: [v] for k, v in stats.items()})

    def _block_meta_all(
        self,
        out_df: np.ndarray,
        post_cells: list[bytes],
        tf_cells: list[bytes],
        doclens: np.ndarray,
    ):
        """Vectorized block-max metadata for every term at once."""
        nterms = out_df.size
        total = int(out_df.sum())
        tstarts = np.zeros(nterms, dtype=np.int64)
        np.cumsum(out_df[:-1], out=tstarts[1:])

        if self.codec == "zlib":
            ids = np.concatenate([self._decode_cell(c) for c in post_cells])
        else:
            # one global decode: per-term deltas -> slots via segmented cumsum
            deltas = vbyte_decode(b"".join(post_cells))
            cs = np.cumsum(deltas)
            prev = np.zeros(nterms, dtype=np.int64)
            prev[1:] = cs[tstarts[1:] - 1]
            ids = cs - np.repeat(prev, out_df)
        tfs = vbyte_decode(b"".join(tf_cells))
        dls = doclens[ids]  # ids are segment-local slots

        rel = np.arange(total, dtype=np.int64) - np.repeat(tstarts, out_df)
        bstart_mask = (rel % self.block_size) == 0
        bstarts = np.flatnonzero(bstart_mask)
        bends = np.empty_like(bstarts)
        bends[:-1] = bstarts[1:] - 1
        bends[-1] = total - 1
        blk_last = ids[bends].astype("<i8")  # segment-local slots
        blk_maxtf = np.maximum.reduceat(tfs, bstarts).astype("<i4")
        blk_mindl = np.minimum.reduceat(dls, bstarts).astype("<i4")
        blocks_per_term = (out_df + self.block_size - 1) // self.block_size

        return (
            _binary_from_slices(blk_last.tobytes(), blocks_per_term * 8),
            _binary_from_slices(blk_maxtf.tobytes(), blocks_per_term * 4),
            _binary_from_slices(blk_mindl.tobytes(), blocks_per_term * 4),
        )

    def _write_segment(
        self, seg_id, info, doclens, out_terms, out_df, post_cells, tf_cells
    ) -> dict:
        base = info["doc_id_base"]
        if out_df.size:
            blk_last, blk_maxtf, blk_mindl = self._block_meta_all(
                out_df, post_cells, tf_cells, doclens
            )
        else:
            empty = pa.array([], pa.large_binary())
            blk_last = blk_maxtf = blk_mindl = empty

        meta = {
            "seg_id": str(seg_id),
            "doc_id_base": str(base),
            "num_docs": str(info["num_docs"]),
            "codec": self.codec,
            "block_size": str(self.block_size),
        }
        seg_table = pa.table(
            {
                "term": pa.array(out_terms, pa.large_string()),
                "df": pa.array(out_df),
                "postings": pa.array(post_cells, pa.large_binary()),
                "tfs": pa.array(tf_cells, pa.large_binary()),
                "blk_last": blk_last,
                "blk_maxtf": blk_maxtf,
                "blk_mindl": blk_mindl,
            }
        ).replace_schema_metadata(meta)

        seg_file = segment_path(self.index_dir, seg_id)
        seg_bytes = write_ipc_atomic(seg_file, seg_table)

        dl_table = pa.table({"doc_len": pa.array(doclens, pa.int32())})
        dl_file = doclen_path(self.index_dir, seg_id)
        write_ipc_atomic(dl_file, dl_table)

        # Local df part for the dedicated global-stats aggregate pass.
        df_dir = os.path.join(self.index_dir, "df")
        os.makedirs(df_dir, exist_ok=True)
        df_file = os.path.join(df_dir, f"seg-{seg_id:05d}.parquet")
        tmp = df_file + ".tmp"
        pq.write_table(
            pa.table(
                {"term": pa.array(out_terms, pa.string()), "df": pa.array(out_df)}
            ),
            tmp,
        )
        os.replace(tmp, df_file)

        kept = int((doclens >= 0).sum())
        total_tokens = int(doclens[doclens > 0].sum())
        n_postings = int(out_df.sum())
        stats = {
            "seg_id": seg_id,
            "doc_id_base": base,
            "num_docs": info["num_docs"],
            "kept_docs": kept,
            "total_tokens": total_tokens,
            "n_terms": len(out_terms),
            "n_postings": n_postings,
            "segment_bytes": seg_bytes,
            "postings_bytes": sum(len(c) for c in post_cells),
            "uncompressed_postings_bytes": n_postings * 8,
        }
        manifest = dict(stats)
        manifest["part_ids"] = info["part_ids"]
        manifest["lineage"] = info.get("lineage", [])
        manifest["files"] = [
            os.path.relpath(p, self.index_dir) for p in (seg_file, dl_file, df_file)
        ]
        atomic_write_json(segment_manifest_path(self.index_dir, seg_id), manifest)
        return stats
