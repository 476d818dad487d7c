"""Immutable segment files (Arrow IPC, mmap-able) — the index datastore.

Replaces the reference's monolithic pickle (``selfindex_q_daat.py:127-144``)
with per-segment columnar files:

``seg-XXXXX.arrow``   one row per term, terms sorted ascending::

    term:      large_string
    df:        int64         local document frequency
    postings:  large_binary  delta+VByte segment-local slot ids (ascending),
                             reference z=1 byte layout per value
                             (``selfindex_z1_simple_compression.py:18-83``)
                             with the delta RESET (absolute slot) at every
                             ``block_size``-th posting so single blocks are
                             independently decodable — or whole-list
                             delta+zlib when codec='zlib'
    tfs:       large_binary  VByte term frequencies, parallel to postings
    blk_last:  large_binary  int32 LE array — last slot per 128-posting
                             block (block-max WAND skip structure; subsumes
                             the reference's skip pointers,
                             ``selfindex_i1_skip_pointers.py:28-56``)
    blk_maxtf: large_binary  int32 LE array — max tf per block
    blk_mindl: large_binary  int32 LE array — min doc length per block
    blk_poff:  large_binary  int32 LE array — byte offset of each block
                             inside the postings cell (lazy block decode)
    blk_tfoff: large_binary  int32 LE array — same for the tfs cell

    (block upper bound for BM25 at query time:
     idf * (maxtf*(k1+1)) / (maxtf + k1*(1-b+b*mindl/avgdl)) — score is
     increasing in tf and decreasing in dl, so (maxtf, mindl) bounds it.)

``seg-XXXXX.doclen.arrow``  one row per doc slot in the segment's dense
    doc-id range [doc_id_base, doc_id_base+num_docs): ``doc_len:int32``
    (-1 for docs dropped by filters — absent from the corpus; 0 for kept
    docs whose every token was filtered out, which the reference keeps in
    the boolean NOT universe via ``all_docs``,
    ``measure_latency_datastores.py:70``).

Schema metadata carries seg_id / doc_id_base / num_docs / total_tokens /
codec / block_size.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc

from ..functions.vbyte import decode_tfs, vbyte_decode, zlib_decode_postings


class _ScratchPool:
    """Grow-only per-thread temp buffers for position-stream hot paths.

    This host charges a large first-touch cost on fresh pages, so numpy
    temporaries over Zipf-head position streams (~10 MB per op) cost ~8x
    the arithmetic itself; reusing warmed buffers via ``out=`` makes the
    adjacency walk bandwidth-bound again.  Callers must copy anything they
    keep across calls (every consumer boolean/fancy-indexes out of the
    views, which copies)."""

    __slots__ = ("i64", "b1")

    def __init__(self):
        self.i64 = np.empty(0, dtype=np.int64)
        self.b1 = np.empty(0, dtype=bool)

    def i64_buf(self, n: int) -> np.ndarray:
        if self.i64.size < n:
            self.i64 = np.empty(max(n, 2 * self.i64.size), dtype=np.int64)
        return self.i64[:n]

    def bool_buf(self, n: int) -> np.ndarray:
        if self.b1.size < n:
            self.b1 = np.empty(max(n, 2 * self.b1.size), dtype=bool)
        return self.b1[:n]


_scratch_tls = None


def scratch_pool() -> _ScratchPool:
    """The per-thread scratch pool (shared by segment + scoring paths)."""
    global _scratch_tls
    if _scratch_tls is None:
        import threading

        _scratch_tls = threading.local()
    pool = getattr(_scratch_tls, "pool", None)
    if pool is None:
        pool = _ScratchPool()
        _scratch_tls.pool = pool
    return pool

BLOCK_SIZE = 128


def segment_path(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "segments", f"seg-{seg_id:05d}.arrow")


def doclen_path(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "segments", f"seg-{seg_id:05d}.doclen.arrow")


def write_ipc_atomic(path: str, table: pa.Table) -> int:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with pa.OSFile(tmp, "wb") as sink:
        with ipc.new_file(sink, table.schema) as writer:
            writer.write_table(table)
    # fsync before the rename: the manifest that will reference this
    # file IS fsynced (state/manifest.py), so a power loss must not
    # leave a durable manifest pointing at never-flushed segment pages
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, path)
    return os.path.getsize(path)


def _has_toplevel_alternation(pattern: str) -> bool:
    """True when an unescaped ``|`` sits at paren depth 0 outside a
    character class — the pattern is a union of branches, so a literal
    prefix extracted from the FIRST branch cannot narrow the dictionary
    scan range ('abc|xyz' must also scan the xyz range)."""
    depth = 0
    in_class = False
    esc = False
    for ch in pattern:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
            continue
        if in_class:
            if ch == "]":
                in_class = False
            continue
        if ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return True
    return False


def read_ipc_mmap(path: str) -> pa.Table:
    with pa.memory_map(path) as source:
        return ipc.open_file(source).read_all()


class SegmentReader:
    """Query-time view of one segment: mmap'd table + term lookup dict +
    dense doc_len array.  Lives inside a segment actor (one load per actor,
    SURVEY.md §2.3 T2)."""

    def __init__(self, index_dir: str, seg_id: int,
                 tombstones: list[int] | None = None):
        self.seg_id = seg_id
        self.table = read_ipc_mmap(segment_path(index_dir, seg_id))
        meta = {
            k.decode(): v.decode() for k, v in (self.table.schema.metadata or {}).items()
        }
        self.doc_id_base = int(meta["doc_id_base"])
        self.num_docs = int(meta["num_docs"])
        self.codec = meta.get("codec", "vbyte")
        self.block_size = int(meta.get("block_size", BLOCK_SIZE))
        dl_table = read_ipc_mmap(doclen_path(index_dir, seg_id))
        self.doc_lens = dl_table.column("doc_len").to_numpy()  # dense by slot
        if tombstones:
            # copy-on-write: deleted docs get doc_len -1, which removes them
            # from the doc universe and from every scorer's results
            slots = (
                np.asarray(sorted(tombstones), dtype=np.int64) - self.doc_id_base
            )
            slots = slots[(slots >= 0) & (slots < self.num_docs)]
            if slots.size:
                self.doc_lens = self.doc_lens.copy()
                self.doc_lens[slots] = -1
        self._terms = self.table.column("term")
        self._df = self.table.column("df").to_numpy()
        # decoded-positions LRU (see positions_flat); ~64 MB of int64 values
        from collections import OrderedDict

        self._pos_cache: OrderedDict[int, tuple] = OrderedDict()
        self._pos_cache_vals = 0
        self._POS_CACHE_BUDGET = 8_000_000
        # decoded-postings LRU (ES query-cache analogue): hot Zipf-head
        # terms dominate decode cost (~1/3 of warm TAAT latency), and the
        # decoded form is ~13x the encoded bytes, so cache decoded
        # (slots, tfs) per term row under a value budget (~32 MB int64 per
        # reader).  Entries are READ-ONLY views — scorers never mutate
        # postings, and the flag turns an accidental in-place op into an
        # error instead of cache corruption.  Tombstones don't invalidate
        # this cache (liveness is applied via doc_lens, never postings).
        self._post_cache: OrderedDict[int, tuple] = OrderedDict()
        self._post_cache_vals = 0
        self._POST_CACHE_BUDGET = 2_000_000
        # composite phrase-key LRU (see positions_keys_by_row)
        self._pkey_cache: OrderedDict[int, np.ndarray] = OrderedDict()
        self._pkey_cache_vals = 0
        self._PKEY_CACHE_BUDGET = 4_000_000
        # adjacent-bigram-docs LRU (see adjacent_docs_by_rows): ES
        # query-cache analogue for phrase filters — the match set of a pure
        # two-term phrase is query-independent per segment
        self._adj_cache: OrderedDict[tuple, np.ndarray] = OrderedDict()
        self._adj_cache_vals = 0
        self._ADJ_CACHE_BUDGET = 1_000_000
        # Zero-copy views over the mmap'd binary columns: per-cell access is
        # a numpy slice, no bytes copy (hot path for every query term).
        self._cells = {}
        names = [
            "postings", "tfs", "blk_last", "blk_maxtf", "blk_mindl",
            "blk_poff", "blk_tfoff",
        ]
        if "positions" in self.table.column_names:
            names.append("positions")
        for name in names:
            arr = self.table.column(name).combine_chunks()
            bufs = arr.buffers()
            offsets = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1)
            data = (
                np.frombuffer(bufs[2], dtype=np.uint8)
                if bufs[2] is not None
                else np.empty(0, dtype=np.uint8)
            )
            self._cells[name] = (offsets, data)
        # term -> row dict; ~tens of MB for 1M terms, built once per actor.
        self._term_list = self._terms.to_pylist()
        self._term_row = {t: i for i, t in enumerate(self._term_list)}
        self._term_lens: np.ndarray | None = None  # lazy (fuzzy only)

    def apply_tombstones(self, tombstones: list[int]) -> None:
        """Copy-on-write tombstone refresh (NRT delete visibility without
        re-mmapping the segment): same semantics as the constructor path."""
        slots = (
            np.asarray(sorted(tombstones), dtype=np.int64) - self.doc_id_base
        )
        slots = slots[(slots >= 0) & (slots < self.num_docs)]
        if slots.size:
            self.doc_lens = self.doc_lens.copy()
            self.doc_lens[slots] = -1

    def _cell(self, name: str, row: int) -> np.ndarray:
        offsets, data = self._cells[name]
        return data[offsets[row] : offsets[row + 1]]

    @property
    def num_terms(self) -> int:
        return len(self._term_row)

    def df(self, term: str) -> int:
        row = self._term_row.get(term)
        return int(self._df[row]) if row is not None else 0

    def df_by_row(self, row: int) -> int:
        return int(self._df[row])

    def term_by_row(self, row: int) -> str:
        return self._term_list[row]

    def _prefix_row_range(self, prefix: str) -> tuple[int, int]:
        """Binary-searched [lo, hi) row range of dictionary terms starting
        with ``prefix`` (sorted-term assembler invariant); the whole
        dictionary when prefix is empty.  The upper bound bisects on the
        monotone predicate ``term[:len(prefix)] <= prefix`` — exact for
        every unicode term, unlike a ``prefix + U+10FFFF`` sentinel
        (which silently excluded terms containing U+10FFFF right after
        the prefix).  Searches the plain Python term list built at init
        (no per-probe Arrow scalar boxing)."""
        import bisect

        tl = self._term_list
        lo = bisect.bisect_left(tl, prefix)
        if not prefix:
            return 0, len(tl)
        k = len(prefix)
        lo2, hi2 = lo, len(tl)
        while lo2 < hi2:
            mid = (lo2 + hi2) // 2
            if tl[mid][:k] <= prefix:
                lo2 = mid + 1
            else:
                hi2 = mid
        return lo, lo2

    def term_rows_matching(
        self, pattern: str, max_expansions: int | None = None
    ) -> list[int]:
        """Rows whose term matches a glob pattern (``*``/``?`` — the ES
        wildcard-query surface).  The term column is sorted (assembler
        invariant), so the literal prefix before the first wildcard narrows
        to a binary-searched row range; only that slice is regex-scanned.
        A leading-wildcard pattern degrades to a full dictionary scan of
        THIS segment (documented ES behavior for ``*foo`` too)."""
        import fnmatch
        import re

        prefix = re.split(r"[*?]", pattern, maxsplit=1)[0]
        if prefix == pattern:  # no wildcard: exact lookup, no range scan
            row = self._term_row.get(pattern)
            return [row] if row is not None else []
        lo, hi = self._prefix_row_range(prefix)
        # ES wildcard treats ONLY * and ? as special; escape fnmatch's
        # [class] syntax so a literal '[' in the pattern stays literal
        rx = re.compile(
            fnmatch.translate(pattern.replace("[", "[[]"))
        )
        out: list[int] = []
        # the init-time Python term list: no per-query re-materialization
        # of the dictionary slice (a leading wildcard spans ALL terms)
        span = self._term_list[lo:hi]
        for off, t in enumerate(span):
            if rx.match(t):
                out.append(lo + off)
                if max_expansions is not None and len(out) >= max_expansions:
                    break
        return out

    def term_rows_regexp(
        self, pattern: str, max_expansions: int | None = None
    ) -> list[int]:
        """Rows whose term FULLY matches an RE2 regexp (the ES regexp-query
        surface — Lucene regexps are anchored, the pattern must consume the
        whole term).  A literal leading prefix narrows to a binary-searched
        row range of the sorted dictionary; the slice is scanned with
        Arrow's vectorized re2 kernel (no per-term Python loop)."""
        import re as _re

        import pyarrow.compute as pc

        m = _re.match(r"[a-z0-9]*", pattern)
        prefix = m.group(0) if m else ""
        if prefix and len(prefix) < len(pattern) and (
            pattern[len(prefix)] in "*+?{"
        ):
            # the prefix's last literal binds to the quantifier: 'merge?'
            # can match 'merg', so only 'merg' is a safe range prefix
            prefix = prefix[:-1]
        if prefix and _has_toplevel_alternation(pattern):
            # 'abc|xyz' matches terms that share NO prefix with the first
            # branch; range narrowing would drop every 'xyz' match
            prefix = ""
        terms = self._terms
        lo, hi = self._prefix_row_range(prefix)
        if hi <= lo:
            return []
        span = terms.slice(lo, hi - lo)
        mask = pc.match_substring_regex(
            span, f"^(?:{pattern})$"
        ).to_numpy(zero_copy_only=False)
        rows = (np.flatnonzero(mask) + lo).tolist()
        if max_expansions is not None:
            rows = rows[:max_expansions]
        return rows

    def term_rows_fuzzy(
        self, term: str, max_edits: int,
        max_expansions: int | None = None,
        with_dist: bool = False,
    ):
        """Rows whose term is within Levenshtein distance ``max_edits`` of
        ``term`` (ES fuzzy-query surface, ``transpositions=false`` so the
        metric matches SQL ``levenshtein()`` exactly).  Vectorized DP: one
        (candidates x query_len) numpy table advanced a character column at
        a time over the length-prefiltered dictionary slice — no
        per-candidate Python loop.  ``with_dist=True`` returns
        ``(rows, dists)`` (suggester surface) instead of ``rows``."""
        if max_edits <= 0:
            row = self._term_row.get(term)
            rows = [row] if row is not None else []
            return (rows, [0] * len(rows)) if with_dist else rows
        if self._term_lens is None:
            self._term_lens = np.array(
                [len(t) for t in self._term_list], dtype=np.int32
            )
        m = len(term)
        cand = np.flatnonzero(np.abs(self._term_lens - m) <= max_edits)
        if cand.size == 0:
            return ([], []) if with_dist else []
        lens = self._term_lens[cand]
        lmax = int(lens.max())
        # candidate chars as one padded codepoint matrix: Arrow take+rpad,
        # a single utf-32 encode of the joined slab — no per-term loop
        import pyarrow.compute as pc

        padded = pc.utf8_rpad(
            pc.take(self._terms, pa.array(cand)), lmax, "\x00"
        )
        slab = "".join(padded.to_pylist())  # C-level join, one pass
        chars = np.frombuffer(
            slab.encode("utf-32-le"), dtype=np.uint32
        ).reshape(cand.size, lmax)
        q = np.frombuffer(term.encode("utf-32-le"), dtype=np.uint32)
        n = cand.size
        prev = np.broadcast_to(
            np.arange(m + 1, dtype=np.int32), (n, m + 1)
        ).copy()
        final = np.full(n, np.iinfo(np.int32).max, dtype=np.int32)
        alive = np.ones(n, dtype=bool)
        for j in range(lmax):
            cur = np.empty_like(prev)
            cur[:, 0] = j + 1
            cj = chars[:, j]
            for k in range(1, m + 1):
                sub = prev[:, k - 1] + (cj != q[k - 1])
                cur[:, k] = np.minimum(
                    np.minimum(prev[:, k] + 1, cur[:, k - 1] + 1), sub
                )
            done = lens == j + 1
            if done.any():
                final[done] = cur[done, m]
            alive &= ~done
            if not alive.any():
                break
            prev = cur
        ok = final <= max_edits
        hits = cand[ok]
        out = [int(r) for r in hits]
        if max_expansions is not None:
            out = out[:max_expansions]
        if with_dist:
            dists = [int(d) for d in final[ok][: len(out)]]
            return out, dists
        return out

    def _slots_from_deltas(self, deltas: np.ndarray) -> np.ndarray:
        """Reconstruct slots from block-reset deltas (absolute value at every
        ``block_size``-th position, plain delta elsewhere)."""
        n = deltas.size
        cs = np.cumsum(deltas)
        if n <= self.block_size:
            return cs
        starts = np.arange(0, n, self.block_size)
        lens = np.diff(np.append(starts, n))
        prev = np.empty(starts.size, dtype=np.int64)
        prev[0] = 0
        prev[1:] = cs[starts[1:] - 1]
        return cs - np.repeat(prev, lens)

    def postings_slots(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(segment-local slot ids ascending, tfs) or None if absent.

        Postings are stored slot-based (dense local ids, mirroring the
        reference's ``doc_idx``); global doc_id = slot + doc_id_base.
        """
        row = self._term_row.get(term)
        if row is None:
            return None
        return self.postings_slots_by_row(row)

    def postings_slots_by_row(self, row: int) -> tuple[np.ndarray, np.ndarray]:
        cached = self._post_cache.get(row)
        if cached is not None:
            self._post_cache.move_to_end(row)
            return cached
        raw = self._cell("postings", row)
        if self.codec == "zlib":
            slots = zlib_decode_postings(raw.tobytes())
        else:
            slots = self._slots_from_deltas(vbyte_decode(raw))
        tfs = decode_tfs(self._cell("tfs", row))
        slots.setflags(write=False)
        tfs.setflags(write=False)
        self._post_cache[row] = (slots, tfs)
        self._post_cache_vals += slots.size + tfs.size
        while (
            self._post_cache_vals > self._POST_CACHE_BUDGET
            and len(self._post_cache) > 1
        ):
            _, (s_, t_) = self._post_cache.popitem(last=False)
            self._post_cache_vals -= s_.size + t_.size
        return slots, tfs

    def term_row(self, term: str) -> int | None:
        return self._term_row.get(term)

    def decode_all_postings(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch-decode EVERY term's postings in one vectorized pass:
        ``(slots_flat, tfs_flat, row_starts)`` with row i's postings at
        ``slots_flat[row_starts[i]:row_starts[i+1]]`` (exactly df[i]
        values).  One vbyte decode over the whole mmap'd column instead of
        ``num_terms`` per-row Python calls — the segment-merge path's
        decoder (a 5M-term merge pays 1 call, not 5M)."""
        return self.decode_rows(0, self.num_terms)

    def decode_rows(
        self, lo: int, hi: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch-decode the CONTIGUOUS term-row range [lo, hi): same shape
        as :meth:`decode_all_postings` but ``row_starts`` is local to the
        slice (``row_starts[0] == 0``, length ``hi-lo+1``).  Rows are
        byte-contiguous in the mmap'd column, so a range decode reads and
        decodes only its own bytes — the datastore exporters' term-range
        tasks scale with their slice, not the segment.  Block resets
        (absolute slot at every ``block_size``-th posting of a row) are
        undone with one segmented cumsum correction."""
        df = self._df[lo:hi].astype(np.int64)
        row_starts = np.concatenate(([0], np.cumsum(df)))
        n = int(row_starts[-1])
        offsets, tdata = self._cells["tfs"]
        if n == 0:
            empty = np.empty(0, dtype=np.int64)
            return empty, empty, row_starts
        if self.codec == "zlib":
            # zlib streams are not self-delimiting: per-row decompress
            slots = np.concatenate([
                zlib_decode_postings(self._cell("postings", r).tobytes())
                for r in range(lo, hi)
            ])
        else:
            poffsets, pdata = self._cells["postings"]
            deltas = vbyte_decode(pdata[poffsets[lo]:poffsets[hi]])
            bs = self.block_size
            nblk = (df + bs - 1) // bs
            blk_starts = np.concatenate(([0], np.cumsum(nblk)))
            row_of_blk = np.repeat(np.arange(df.size), nblk)
            blk_idx = np.arange(int(blk_starts[-1])) - blk_starts[row_of_blk]
            reset = row_starts[row_of_blk] + bs * blk_idx
            cs = np.cumsum(deltas)
            prev = np.zeros(reset.size, dtype=np.int64)
            nz = reset > 0
            prev[nz] = cs[reset[nz] - 1]
            blk_len = np.minimum(bs, df[row_of_blk] - bs * blk_idx)
            slots = cs - np.repeat(prev, blk_len)
        tfs = decode_tfs(tdata[offsets[lo]:offsets[hi]])  # tfs always vbyte
        return slots, tfs, row_starts

    def decode_block(self, row: int, block: int) -> tuple[np.ndarray, np.ndarray]:
        """Lazily decode ONE 128-posting block of a term (slots, tfs) —
        the block-max WAND skip path never touches the other blocks.
        If the full row already sits in the decoded-postings LRU (a hot
        term recently scored by TAAT/boolean), slice it instead of
        re-decoding: block slots are segment-absolute (the encoder resets
        to an absolute value at each block start), so the cached slice is
        bit-identical."""
        cached = self._post_cache.get(row)
        if cached is not None:
            s, t = cached
            lo = block * self.block_size
            hi = min(lo + self.block_size, s.size)
            return s[lo:hi], t[lo:hi]
        poff = self._cell("blk_poff", row).view("<i4")
        tfoff = self._cell("blk_tfoff", row).view("<i4")
        praw = self._cell("postings", row)
        traw = self._cell("tfs", row)
        pend = poff[block + 1] if block + 1 < poff.size else len(praw)
        tend = tfoff[block + 1] if block + 1 < tfoff.size else len(traw)
        slots = np.cumsum(vbyte_decode(praw[poff[block] : pend]))
        tfs = vbyte_decode(traw[tfoff[block] : tend])
        return slots, tfs

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray] | None:
        """(global doc_ids ascending, tfs) or None if the term is absent."""
        res = self.postings_slots(term)
        if res is None:
            return None
        slots, tfs = res
        return slots + self.doc_id_base, tfs

    def block_meta_by_row(self, row: int):
        """(last_slots int32[], max_tfs int32[], min_dls int32[])."""
        last = self._cell("blk_last", row).view("<i4")
        maxtf = self._cell("blk_maxtf", row).view("<i4")
        mindl = self._cell("blk_mindl", row).view("<i4")
        return last, maxtf, mindl

    def block_meta(self, term: str):
        row = self._term_row.get(term)
        if row is None:
            return None
        return self.block_meta_by_row(row)

    @property
    def has_positions(self) -> bool:
        if "positions" not in self._cells:
            return False
        offsets, data = self._cells["positions"]
        return data.size > 0

    def positions_flat(self, term: str):
        """(slots, counts, flat_positions, offsets) or None — the fully
        vectorized positions decode (layout v2, no Python loop).

        The positions cell holds ONLY per-doc delta streams ``[p0, dp1,
        ...]`` concatenated in postings order; the per-doc count is the tf
        (positions-per-doc == term frequency by construction), so decode is
        one VByte pass + one segmented cumsum.  ``offsets`` has len df+1;
        doc i's positions are ``flat[offsets[i]:offsets[i+1]]``."""
        row = self._term_row.get(term)
        if row is None:
            return None
        return self.positions_flat_by_row(row)

    def positions_flat_by_row(self, row: int):
        """``positions_flat`` keyed by dictionary row (prefix/wildcard
        expansions resolve rows first); shares the decoded-positions LRU."""
        cached = self._pos_cache.get(row)
        if cached is not None:
            self._pos_cache.move_to_end(row)
            return cached
        if not self.has_positions:  # index built without positions
            return None
        slots, tfs = self.postings_slots_by_row(row)
        deltas = vbyte_decode(self._cell("positions", row))
        counts = tfs.astype(np.int64, copy=False)
        offsets = np.zeros(counts.size + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        cs = np.cumsum(deltas)
        if counts.size:
            starts = offsets[:-1]
            prev = np.empty(counts.size, dtype=cs.dtype if cs.size else np.int64)
            prev[0] = 0
            if counts.size > 1:
                prev[1:] = cs[starts[1:] - 1]
            flat = cs - np.repeat(prev, counts)
        else:
            flat = cs
        # read-only like the postings/pkey caches: an accidental
        # in-place op on a cached array must error, not silently corrupt
        # every later phrase/span query on this term
        for arr in (counts, flat, offsets):
            arr.setflags(write=False)
        res = (slots, counts, flat, offsets)
        # bounded decoded-positions LRU: phrase workloads are Zipf-heavy, so
        # hot terms ("the", "of") pay the big VByte decode once per actor,
        # not once per query.  Budget counts decoded int64 values.
        self._pos_cache[row] = res
        self._pos_cache_vals += flat.size + slots.size * 2
        while self._pos_cache_vals > self._POS_CACHE_BUDGET and len(self._pos_cache) > 1:
            _, old = self._pos_cache.popitem(last=False)
            self._pos_cache_vals -= old[2].size + old[0].size * 2
        return res

    def positions_keys_by_row(self, row: int) -> np.ndarray:
        """Sorted composite ``slot<<32 | position`` keys of EVERY
        occurrence of the term — the phrase-adjacency working set.  The
        full key array is query-independent (unlike its candidate-pruned
        gathers), so hot Zipf-head phrase terms build it once per actor
        instead of once per query; read-only, own LRU value budget."""
        cached = self._pkey_cache.get(row)
        if cached is not None:
            self._pkey_cache.move_to_end(row)
            return cached
        got = self.positions_flat_by_row(row)
        if got is None:  # positions-less index: clean empty, not a
            return np.empty(0, dtype=np.int64)  # NoneType unpack crash
        slots, counts, flat, _ = got
        keys = (np.repeat(slots, counts) << np.int64(32)) | flat
        keys.setflags(write=False)
        self._pkey_cache[row] = keys
        self._pkey_cache_vals += keys.size
        while (
            self._pkey_cache_vals > self._PKEY_CACHE_BUDGET
            and len(self._pkey_cache) > 1
        ):
            _, old = self._pkey_cache.popitem(last=False)
            self._pkey_cache_vals -= old.size
        return keys

    def positions_keys(self, term: str) -> np.ndarray | None:
        row = self._term_row.get(term)
        return None if row is None else self.positions_keys_by_row(row)

    def adjacent_docs_by_rows(self, row_a: int, row_b: int) -> np.ndarray:
        """Slots of docs where term ``row_a`` occurs at position ``p`` and
        term ``row_b`` at ``p+1`` — the exact match set of a pure two-term
        phrase.  Two-term phrases over Zipf-head terms are the phrase p99
        on every bench draw ("tawe tawe", "tawe run"): the generic
        key-adjacency walk rebuilds ~N-element temporaries per query
        (expensive on this host's first-touch pages), while this set is
        QUERY-INDEPENDENT per segment — ES caches phrase filters the same
        way in its segment-scoped query cache.  Computed once per actor,
        served from an LRU; tombstone liveness is NOT applied here (the
        caller intersects with its tombstone-filtered candidate set).

        The self-pair (``row_a == row_b``) avoids composite keys entirely:
        consecutive same-doc positions are adjacent in the decoded stream,
        so one segmented ``logical_or.reduceat`` over ``diff == 1`` does it.
        Cross-doc false positives are masked at the per-doc boundary pair
        indices before the reduce; docs with a single occurrence can't
        self-pair and are excluded from the reduce starts (which also keeps
        every reduceat index in bounds)."""
        key = (row_a, row_b)
        cached = self._adj_cache.get(key)
        if cached is not None:
            self._adj_cache.move_to_end(key)
            return cached
        empty = np.empty(0, dtype=np.int64)
        docs = empty
        pool = scratch_pool()
        if row_a == row_b:
            pos = self.positions_flat_by_row(row_a)
            if pos is None:
                return empty
            slots, counts, flat, offsets = pos
            n = flat.size
            if n >= 2:
                shifted = pool.i64_buf(n - 1)
                np.add(flat[:-1], 1, out=shifted)
                m = pool.bool_buf(n - 1)
                np.equal(flat[1:], shifted, out=m)
                bnd = offsets[1:-1] - 1  # pair straddling each doc boundary
                if bnd.size:
                    m[bnd] = False
                multi = counts >= 2
                starts = offsets[:-1][multi]
                if starts.size:
                    anym = np.logical_or.reduceat(m, starts)
                    docs = slots[multi][anym]
        else:
            ka = self.positions_keys_by_row(row_a)
            kb = self.positions_keys_by_row(row_b)
            if ka.size and kb.size:
                # sorted-key intersect of (ka + 1) with kb: binary-search
                # the smaller side into the larger (positions are < 2^32,
                # so +1 never carries into the slot half)
                shifted = pool.i64_buf(ka.size)
                np.add(ka, 1, out=shifted)
                a, b = (shifted, kb) if ka.size <= kb.size else (kb, shifted)
                idx = np.searchsorted(b, a)
                idx[idx == b.size] = 0
                hit = a[b[idx] == a]
                if hit.size:
                    # doc halves of sorted keys are non-decreasing: O(n)
                    # dedupe, no re-sort
                    v = pool.i64_buf(hit.size)
                    np.right_shift(hit, np.int64(32), out=v)
                    keep = pool.bool_buf(hit.size)
                    keep[0] = True
                    np.not_equal(v[1:], v[:-1], out=keep[1:])
                    docs = v[keep]
        docs = np.ascontiguousarray(docs, dtype=np.int64)
        docs.setflags(write=False)
        self._adj_cache[key] = docs
        # +32: per-entry overhead (tuple key, dict node, ndarray header)
        # in budget units — a workload of diverse never-adjacent bigrams
        # caches a 0-size array per pair, and a +1 cost would admit ~1M
        # such entries (hundreds of MB of pure overhead) before evicting
        self._adj_cache_vals += docs.size + 32
        while (
            self._adj_cache_vals > self._ADJ_CACHE_BUDGET
            and len(self._adj_cache) > 1
        ):
            _, old = self._adj_cache.popitem(last=False)
            self._adj_cache_vals -= old.size + 32
        return docs

    def positions_slots(self, term: str):
        """Compat shim: (slots, [positions array per doc]) or None."""
        res = self.positions_flat(term)
        if res is None:
            return None
        slots, _counts, flat, offsets = res
        return slots, [
            flat[offsets[i] : offsets[i + 1]] for i in range(slots.size)
        ]

    def present_doc_ids(self) -> np.ndarray:
        """Local doc universe (for boolean NOT): every kept doc, including
        zero-token ones, matching the reference's ``all_docs``."""
        slots = np.flatnonzero(self.doc_lens >= 0)
        return slots + self.doc_id_base
