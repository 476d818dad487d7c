"""Posting-list construction: run encoding + segment assembly.

The wide shuffle (SURVEY.md §2.5 A5, §7.3) is a sort by
``(th, doc_id)`` — th a stable 64-bit term hash (numeric keys sort
faster and move fewer bytes than term strings; seg derives from doc-id
ranges).  Skew handling: because ``doc_id`` is part of the
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
        # per-doc position streams, layout v2: [p0, dp1, ...] — deltas
        # ONLY, the per-doc count is the tf already in the tfs cell
        # (empty when the build does not store positions); doc order ==
        # postings order, so run merge is plain byte concatenation
        ("positions", pa.large_binary()),
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


def _concat_binary_cells(col: pa.LargeBinaryArray) -> np.ndarray:
    """Concatenation of every cell of a LargeBinary array as ONE uint8 view.

    Valid because the array's value buffer stores cells back-to-back in
    array order (true for freshly built/taken arrays, e.g. after a sort_by);
    honors a non-zero array offset.  Returns an empty view for all-empty
    cells.
    """
    bufs = col.buffers()
    if bufs[2] is None:
        return np.empty(0, dtype=np.uint8)
    offsets = np.frombuffer(
        bufs[1], dtype=np.int64, count=col.offset + len(col) + 1
    )[col.offset :]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data[offsets[0] : offsets[-1]]


def encode_runs_block(
    batch: pa.Table, seg_bases: np.ndarray | None = None
) -> pa.Table:
    """One sorted block of triples -> one row per (seg, term) run.

    The block arrives sorted by (th, doc_id).  Segment membership is derived
    from the doc id against the segment base offsets; runs split where the
    term hash, the segment, OR the term STRING changes — the last one is the
    th-collision guard: two terms with equal 64-bit hashes interleave by
    doc, so splitting on the string yields correctly-labeled mini-runs whose
    per-term doc ranges stay disjoint and ascending (the assembler's
    (term, first_doc) sort then concatenates them; its d>0 invariant check
    would catch any violation).

    Doc ids are encoded as segment-local slots (``doc_id - seg_base``),
    mirroring the reference's dense ``doc_idx`` postings
    (``selfindex_q_daat.py:94-110``): first element absolute-within-segment,
    the rest deltas.  ``seg_bases[seg_id]`` gives each segment's base
    (ascending, so ``searchsorted`` maps doc -> seg).

    Runs are a TRANSPORT format and always delta+VByte; the segment codec
    (vbyte/zlib) applies when cells are written in the assembler.
    """
    n = batch.num_rows
    if n == 0:
        return RUN_SCHEMA.empty_table()
    th = batch.column("th").to_numpy()
    doc = batch.column("doc_id").to_numpy()
    tf = batch.column("tf").to_numpy().astype(np.int64)
    term = batch.column("term")
    if isinstance(term, pa.ChunkedArray):
        term = term.combine_chunks()
    if seg_bases is None:
        seg_bases = np.zeros(1, dtype=np.int64)
    seg = (np.searchsorted(seg_bases, doc, side="right") - 1).astype(np.int32)

    # Run boundaries: term hash, seg, or term string changes between rows.
    if n == 1:
        change = np.zeros(0, dtype=bool)
    else:
        term_neq = ~pc.equal(term.slice(1), term.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        change = (th[1:] != th[:-1]) | (seg[1:] != seg[:-1]) | term_neq
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
    deltas[starts] = doc[starts] - seg_bases[seg[starts]]

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
            "positions": _binary_from_slices(
                b"", np.zeros(starts.size, dtype=np.int64)
            ),
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
            if ids.size and (ids.min() < 0 or ids.max() >= num):
                # a negative index would WRAP and silently overwrite the
                # tail of the array (wrong stats + block-max bounds);
                # ids above num already raise — make below-base loud too
                raise ValueError(
                    f"docmap part {pid} holds doc_ids outside segment "
                    f"range [{base}, {base + num})")
            arr[ids] = t.column("doc_len").to_numpy()
        return arr

    def _decode_cell(self, raw: bytes) -> np.ndarray:
        if self.codec == "zlib":
            return zlib_decode_postings(raw)
        return decode_postings(raw)

    # -- one-pass raw-triple path (shuffle='segment') ----------------------

    def assemble_raw_group(self, triples: pa.Table) -> pa.Table:
        """One segment's RAW (th, term, doc_id, tf) triples -> segment files.

        Used by the 'segment' shuffle mode: a single ``groupby('seg')``
        moves each triple exactly once; the inversion itself is a local
        ``np.lexsort`` over numeric keys.  Task memory is O(segment triples),
        so ``docs_per_segment`` bounds it explicitly.
        """
        t0 = time.perf_counter()
        seg_id = int(triples.column("seg")[0].as_py())
        info = self.seg_infos[seg_id]
        doclens = self._load_doclens(info)
        base = info["doc_id_base"]

        doc = triples.column("doc_id").to_numpy()
        tf = triples.column("tf").to_numpy().astype(np.int64)
        term = triples.column("term")
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()

        # group and ORDER by the real term string (dictionary-encode ->
        # rank of each distinct string in sorted order -> lexsort on
        # (rank, doc)): the written dictionary must be term-sorted — the
        # reader's prefix/wildcard/regexp bisection assumes it, and the
        # previous (doc, th) hash-order sort silently broke every such
        # query on 'segment'-shuffle indexes.  Grouping by the actual
        # string also retires the th-collision guard wholesale.
        denc = term.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dict_arr = denc.dictionary
        sort_idx = pc.sort_indices(dict_arr).to_numpy().astype(np.int64)
        rank = np.empty(sort_idx.size, dtype=np.int64)
        rank[sort_idx] = np.arange(sort_idx.size, dtype=np.int64)
        key = rank[codes]
        order = np.lexsort((doc, key))
        k_s = key[order]
        slots = doc[order] - base
        tfs = tf[order]

        n = k_s.size
        if n > 1:
            change = k_s[1:] != k_s[:-1]
            tstarts = np.concatenate(([0], np.flatnonzero(change) + 1))
        else:
            tstarts = np.zeros(1 if n else 0, dtype=np.int64)
        out_terms = (
            dict_arr.take(pa.array(sort_idx[k_s[tstarts]]))
            if n
            else dict_arr.slice(0, 0)
        )

        out_df = np.empty(tstarts.size, dtype=np.int64)
        if tstarts.size:
            out_df[:-1] = tstarts[1:] - tstarts[:-1]
            out_df[-1] = n - tstarts[-1]
        # posting-order invariant (the runs path asserts the same in
        # __call__): within each term, slots must strictly ascend — a
        # violation here would vbyte-encode a negative delta as a huge
        # uint64 and persist corrupt postings silently
        if n > 1:
            d = np.diff(slots)
            d[tstarts[1:] - 1] = 1  # group boundaries exempt
            assert (d > 0).all(), "segment assembler: non-ascending slots"
        stats = self._write_segment(
            seg_id, info, doclens, out_terms, out_df, tstarts, slots, tfs
        )
        stats["merged_terms"] = 0
        stats["assemble_sec"] = time.perf_counter() - t0
        return pa.table({k: [v] for k, v in stats.items()})

    # -- main --------------------------------------------------------------

    def __call__(self, runs: pa.Table, seg_id: int | None = None) -> pa.Table:
        t0 = time.perf_counter()
        if seg_id is None:
            seg_id = int(runs.column("seg")[0].as_py())
        info = self.seg_infos[seg_id]
        doclens = self._load_doclens(info)
        if runs.num_rows == 0:
            # a segment whose docs produced no tokens still needs its files
            # (doclens, empty term table) so queries and stats can load it
            stats = self._write_segment(
                seg_id, info, doclens,
                pa.array([], pa.large_string()),
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64),
            )
            stats["merged_terms"] = 0
            stats["assemble_sec"] = time.perf_counter() - t0
            return pa.table({k: [v] for k, v in stats.items()})

        runs = runs.sort_by([("term", "ascending"), ("first_doc", "ascending")])
        term = runs.column("term").combine_chunks()
        run_lens = runs.column("df").to_numpy().astype(np.int64)
        postings_col = runs.column("postings").combine_chunks()
        tfs_col = runs.column("tfs").combine_chunks()
        nruns = runs.num_rows

        # Concatenated decode of every run (vectorized segmented cumsum).
        total = int(run_lens.sum())
        rstarts = np.zeros(nruns, dtype=np.int64)
        np.cumsum(run_lens[:-1], out=rstarts[1:])
        # runs arrive in the VByte transport format regardless of the
        # segment codec (which is applied in _write_segment).  After the
        # sort_by above the binary cells sit contiguously in run order, so
        # the concatenation is a zero-copy buffer slice, not a Python-bytes
        # rejoin of the whole compressed payload.
        deltas = vbyte_decode(_concat_binary_cells(postings_col))
        cs = np.cumsum(deltas)
        prev = np.zeros(nruns, dtype=np.int64)
        prev[1:] = cs[rstarts[1:] - 1]
        slots = cs - np.repeat(prev, run_lens)
        tfs = vbyte_decode(_concat_binary_cells(tfs_col))

        # Group runs by term -> per-term posting spans.  Sub-runs of one term
        # come from the doc-ordered sort split, so their concatenation is
        # already ascending (asserted below).
        if nruns > 1:
            eq = pc.equal(term.slice(1), term.slice(0, nruns - 1)).to_numpy(
                zero_copy_only=False
            )
            trun_starts = np.concatenate(([0], np.flatnonzero(~eq) + 1))
        else:
            trun_starts = np.zeros(1, dtype=np.int64)
        tstarts = rstarts[trun_starts]  # term start in posting space
        nterms = tstarts.size
        out_df = np.empty(nterms, dtype=np.int64)
        out_df[:-1] = tstarts[1:] - tstarts[:-1]
        out_df[-1] = total - tstarts[-1]
        merged = int(nruns - nterms)

        d = np.empty(total, dtype=np.int64)
        d[0] = 1
        d[1:] = slots[1:] - slots[:-1]
        d[tstarts] = 1
        if not (d > 0).all():
            raise AssertionError(
                f"seg {seg_id}: posting sub-runs overlap — sort invariant broken"
            )

        # positions: doc order == postings order, so a term's cell is the
        # byte concatenation of its runs' cells (already first_doc-ordered)
        pos_col = runs.column("positions").combine_chunks()
        pos_cells: list[bytes] | None = None
        if (pc.sum(pc.binary_length(pos_col)).as_py() or 0) > 0:
            # same zero-copy regroup as postings/tfs above: one flat
            # byte buffer + per-term lengths via reduceat — the old
            # to_pylist() + per-term b''.join materialized every run
            # cell as a Python bytes object (positions are usually the
            # segment's largest payload) and doubled assembler peak
            run_lens = pc.binary_length(pos_col).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            pos_cells = _binary_from_slices(
                _concat_binary_cells(pos_col).tobytes(),
                np.add.reduceat(run_lens, trun_starts),
            )

        out_terms = term.take(trun_starts)
        stats = self._write_segment(
            seg_id, info, doclens, out_terms, out_df, tstarts, slots, tfs,
            pos_cells=pos_cells,
        )
        stats["merged_terms"] = merged
        stats["assemble_sec"] = time.perf_counter() - t0
        return pa.table({k: [v] for k, v in stats.items()})

    def _write_segment(
        self,
        seg_id: int,
        info: dict,
        doclens: np.ndarray,
        out_terms,
        out_df: np.ndarray,
        tstarts: np.ndarray,
        slots: np.ndarray,
        tfs: np.ndarray,
        pos_cells: list[bytes] | None = None,
    ) -> dict:
        """Encode per-term posting cells with block-reset deltas + per-block
        byte offsets (lazy block decode for block-max WAND), compute block-max
        metadata, and write the segment files + lineage manifest."""
        base = info["doc_id_base"]
        nterms = out_df.size
        total = int(out_df.sum())
        bs = self.block_size

        if nterms:
            # Block starts: every position whose rank within its term is a
            # multiple of block_size (term starts included by construction).
            rel = np.arange(total, dtype=np.int64) - np.repeat(tstarts, out_df)
            bstarts = np.flatnonzero(rel % bs == 0)
            bends = np.empty_like(bstarts)
            bends[:-1] = bstarts[1:] - 1
            bends[-1] = total - 1
            blocks_per_term = (out_df + bs - 1) // bs

            # Delta encoding with reset (absolute slot) at each block start.
            d = np.empty(total, dtype=np.int64)
            d[1:] = slots[1:] - slots[:-1]
            d[bstarts] = slots[bstarts]

            if self.codec == "zlib":
                # comparison codec: whole-list cells, no lazy block decode.
                # '<u4' pack mirrors the reference struct '<I'; deltas are
                # bounded by the max segment-local slot, so guard that once
                # (a silent cast would corrupt postings, reference raises).
                if total and int(slots.max()) >= 2**32:
                    raise OverflowError(
                        "zlib codec slot >= 2**32; use the vbyte codec"
                    )
                post_cells = []
                for k in range(nterms):
                    s, ln = tstarts[k], out_df[k]
                    seg_s = slots[s : s + ln]
                    dseg = np.empty(ln, dtype=np.int64)
                    dseg[0] = seg_s[0]
                    dseg[1:] = seg_s[1:] - seg_s[:-1]
                    post_cells.append(zlib.compress(dseg.astype("<u4").tobytes(), 9))
                postings_arr = pa.array(post_cells, pa.large_binary())
                blk_poff = blk_tfoff = _binary_from_slices(
                    b"", np.zeros(nterms, dtype=np.int64)
                )
                postings_bytes = sum(len(c) for c in post_cells)
                tf_data, tf_vlens = vbyte_encode_with_lengths(tfs)
                tfs_arr = _binary_from_slices(
                    tf_data, np.add.reduceat(tf_vlens, tstarts)
                )
            else:
                data, vlens = vbyte_encode_with_lengths(d)
                term_byte_lens = np.add.reduceat(vlens, tstarts)
                postings_arr = _binary_from_slices(data, term_byte_lens)
                postings_bytes = len(data)

                tf_data, tf_vlens = vbyte_encode_with_lengths(tfs)
                term_tf_byte_lens = np.add.reduceat(tf_vlens, tstarts)
                tfs_arr = _binary_from_slices(tf_data, term_tf_byte_lens)

                # Per-block byte offsets within each term's cell (int32 LE).
                blk_byte_lens = np.add.reduceat(vlens, bstarts)
                excl = np.cumsum(blk_byte_lens) - blk_byte_lens
                term_first_block = np.zeros(nterms, dtype=np.int64)
                np.cumsum(blocks_per_term[:-1], out=term_first_block[1:])
                poff = excl - np.repeat(excl[term_first_block], blocks_per_term)
                if poff.size and poff.max() >= (1 << 31):
                    # same loud-failure policy as the zlib branch and
                    # vbyte.py: a silent int32 wrap would make
                    # decode_block read garbage offsets
                    raise OverflowError(
                        "per-term postings cell exceeds int32 offsets")
                blk_poff = _binary_from_slices(
                    poff.astype("<i4").tobytes(), blocks_per_term * 4
                )
                blk_tf_lens = np.add.reduceat(tf_vlens, bstarts)
                texcl = np.cumsum(blk_tf_lens) - blk_tf_lens
                tfoff = texcl - np.repeat(texcl[term_first_block], blocks_per_term)
                blk_tfoff = _binary_from_slices(
                    tfoff.astype("<i4").tobytes(), blocks_per_term * 4
                )

            dls = doclens[slots]
            if slots.size and slots.max() >= (1 << 31):
                raise OverflowError(
                    "segment slot ids exceed int32 block metadata "
                    "(docs_per_segment too large)")
            blk_last = slots[bends].astype("<i4")
            blk_maxtf = np.maximum.reduceat(tfs, bstarts).astype("<i4")
            blk_mindl = np.minimum.reduceat(dls, bstarts).astype("<i4")
            blk_last = _binary_from_slices(blk_last.tobytes(), blocks_per_term * 4)
            blk_maxtf = _binary_from_slices(blk_maxtf.tobytes(), blocks_per_term * 4)
            blk_mindl = _binary_from_slices(blk_mindl.tobytes(), blocks_per_term * 4)
        else:
            empty = pa.array([], pa.large_binary())
            postings_arr = tfs_arr = empty
            blk_last = blk_maxtf = blk_mindl = blk_poff = blk_tfoff = empty
            postings_bytes = 0

        meta = {
            "seg_id": str(seg_id),
            "doc_id_base": str(base),
            "num_docs": str(info["num_docs"]),
            "codec": self.codec,
            "block_size": str(self.block_size),
        }
        term_arr = (
            out_terms
            if isinstance(out_terms, (pa.Array, pa.ChunkedArray))
            else pa.array(out_terms, pa.large_string())
        )
        if isinstance(term_arr, pa.ChunkedArray):
            term_arr = term_arr.combine_chunks()
        term_arr = term_arr.cast(pa.large_string())
        if isinstance(pos_cells, pa.Array):
            positions_col = pos_cells  # pre-built LargeBinary cells
        elif pos_cells is not None:
            positions_col = pa.array(pos_cells, pa.large_binary())
        else:
            positions_col = _binary_from_slices(
                b"", np.zeros(nterms, dtype=np.int64)
            )
        seg_table = pa.table(
            {
                "term": term_arr,
                "df": pa.array(out_df),
                "postings": postings_arr,
                "tfs": tfs_arr,
                "positions": positions_col,
                "blk_last": blk_last,
                "blk_maxtf": blk_maxtf,
                "blk_mindl": blk_mindl,
                "blk_poff": blk_poff,
                "blk_tfoff": blk_tfoff,
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
            pa.table({"term": term_arr.cast(pa.string()), "df": pa.array(out_df)}),
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
            "postings_bytes": postings_bytes,
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
