"""Tokenize stage: partition spec -> (seg, term, doc_id, tf) triples.

Stateful actor-pool ``map_batches`` stage (SURVEY.md §2.2 M2/M6/M7): the
Normalizer (compiled regexes + stemmer with its Zipf-friendly cache) is built
ONCE per actor in ``__init__``; each ``__call__`` handles one partition spec.

The stage reads its own Parquet row groups with column pruning (only
url/text/lang leave storage — the ``html:binary`` column never enters the
pipeline, SURVEY.md §7.4.7), assigns deterministic doc_ids from the plan, and
emits the exploded triple table.  It also writes the partition's docmap part
``docmap/part-XXXXXX.parquet`` (doc_id, url, doc_len) — deterministic content,
so task retries are idempotent.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..normalizer import make_normalizer

# th = stable 64-bit term hash: the shuffle sorts on (th, doc_id) — numeric
# keys sort ~2-3x faster than string keys and the bytes moved shrink.  Hash
# collisions are harmless: runs are re-grouped by the actual term string in
# the segment assembler.
TRIPLE_SCHEMA = pa.schema(
    [
        ("seg", pa.int32()),
        ("th", pa.int64()),
        ("term", pa.large_string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
    ]
)


def _term_hash(term: str) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(term.encode(), digest_size=8).digest(), "little", signed=True
    )


class TokenizePartition:
    def __init__(
        self,
        index_dir: str,
        text_column: str = "text",
        url_column: str | None = "url",
        lang_column: str | None = "lang",
        lang_filter: str | None = None,
        analyzer: str = "reference",
        emit: str = "triples",  # 'triples' | 'runs' (map-side combiner)
        store_positions: bool = False,
        prefix_columns: list[str] | None = None,
        facet_columns: list[str] | None = None,
        store_source: bool = False,
        fault_inject_path: str | None = None,
        fault_inject_mode: str = "exit",
    ):
        # testing-only fault injection: the FIRST tokenize task to run
        # while this marker path does not exist creates it and either
        # hard-kills its worker (mode='exit' — drives the route
        # dispatcher's dead-actor recovery) or raises (mode='raise' —
        # a deterministic application bug, which must NOT be retried)
        if fault_inject_mode not in ("exit", "raise"):
            raise ValueError(
                f"fault_inject_mode {fault_inject_mode!r} not in "
                "('exit', 'raise')")
        if store_positions and emit == "triples":
            # the triples shuffle discards positions; accepting the
            # combination would silently build a positions-less index
            # that later rejects every phrase/span query
            raise ValueError(
                "store_positions requires emit='runs' (the triples "
                "shuffle carries no positions)")
        reserved = {"doc_id", "url", "doc_len", "source_text"} & set(
            facet_columns or [])
        if reserved:
            raise ValueError(
                f"facet_columns {sorted(reserved)} collide with core "
                "docmap columns")
        self.fault_inject_path = fault_inject_path
        self.fault_inject_mode = fault_inject_mode
        self.store_positions = store_positions
        # ES _source: keep the (concatenated) analyzed text in the docmap,
        # enabling GET-by-id and highlighting; off by default (index size)
        self.store_source = store_source
        self.prefix_columns = prefix_columns or []
        self.facet_columns = facet_columns or []
        self.normalizer = make_normalizer(analyzer)  # once per actor
        self._hash_cache: dict[str, int] = {}  # Zipf -> near-100% hit rate
        self.emit = emit
        self.index_dir = index_dir
        self.text_column = text_column
        self.url_column = url_column
        self.lang_column = lang_column
        self.lang_filter = lang_filter

    def ping(self) -> int:
        """Liveness probe for the route dispatcher's dead-actor sweep."""
        return 1

    def process_spec(self, spec: dict) -> pa.Table:
        """Tokenize ONE partition spec — the raw-actor entrypoint of the
        pipelined 'route' build (``build.py::_build_route_pipelined``), so a
        segment can assemble as soon as ITS partitions are done instead of
        behind a whole-corpus barrier."""
        if self.emit == "runs":
            return self._process_partition_runs(spec)
        return self._process_partition(spec)

    def process_specs(self, specs: list[dict]) -> pa.Table:
        """Tokenize a CHUNK of same-segment partition specs in one task —
        the route dispatcher's batching unit: driver-side submission cost
        is paid once per chunk, not once per partition (at 10^7 partitions
        one task each would make the driver the bottleneck).  The
        concatenated run table is exactly what the assembler would see
        from the chunk's individual runs (it keys runs by term + doc
        range, so intra-chunk order is immaterial)."""
        if self.fault_inject_path is not None:
            try:
                # O_CREAT|O_EXCL: exactly ONE concurrent task claims the
                # marker (exists-then-create raced when the dispatcher
                # had several chunks in flight, losing multiple workers
                # where the test contract says 'the FIRST tokenize task')
                fd = os.open(self.fault_inject_path,
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                pass
            else:
                os.close(fd)
                if self.fault_inject_mode == "raise":
                    raise ValueError("injected deterministic bug")
                os._exit(1)  # simulated node loss
        return pa.concat_tables([self.process_spec(s) for s in specs])

    def assemble_segment(
        self, seg_id: int, infos: dict, codec: str, block_size: int, *runs
    ) -> dict:
        """Assemble ONE segment from its partitions' run tables — runs on
        the SAME warm actor pool as tokenization (pipelined 'route' build):
        the worker already paid the numpy/pyarrow/engine import, so there is
        no cold-start straggler, and the driver's work-stealing dispatch
        keeps every core busy on whichever of the two kinds of work is
        ready."""
        from .postings import RUN_SCHEMA, SegmentAssembler

        parts = [r for r in runs if r.num_rows]
        tbl = pa.concat_tables(parts) if parts else RUN_SCHEMA.empty_table()
        asm = SegmentAssembler(self.index_dir, infos, codec, block_size)
        return asm(tbl, seg_id=seg_id).to_pylist()[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_tables = []
        for spec in batch.to_pylist():
            if self.emit == "runs":
                out_tables.append(self._process_partition_runs(spec))
            else:
                out_tables.append(self._process_partition(spec))
        if out_tables:
            return pa.concat_tables(out_tables)
        from .postings import RUN_SCHEMA

        return (
            RUN_SCHEMA.empty_table()
            if self.emit == "runs"
            else TRIPLE_SCHEMA.empty_table()
        )

    def _process_partition_runs(self, spec: dict) -> pa.Table:
        """Map-side combiner (MapReduce-style): invert THIS partition locally
        and emit one delta+VByte-encoded posting run per term — ~10x fewer
        shuffle rows/bytes than raw triples.  Runs from different partitions
        of a segment are doc-range disjoint, so the assembler merges them by
        ordered concatenation (SegmentAssembler.__call__)."""
        from ..functions.vbyte import vbyte_encode_with_lengths
        from .postings import RUN_SCHEMA, _binary_from_slices

        doc_id_base = spec["doc_id_base"]
        seg_base = spec.get("seg_base", 0)
        keep_rows, tok_doc, codes, term_strs, kept_lens = (
            self._prepare_partition(spec)
        )
        m = len(keep_rows)

        if len(codes) == 0:
            return RUN_SCHEMA.empty_table()

        # stable sort by term code: within a code, doc order (and position
        # order inside a doc) is preserved from the row-major token stream
        order = np.argsort(codes, kind="stable")
        c_s = codes[order]
        d_s = tok_doc[order]
        ntok = len(c_s)

        # (code, doc) groups -> one posting each; token-major boundaries
        gmask = np.empty(ntok, dtype=bool)
        gmask[0] = True
        np.logical_or(c_s[1:] != c_s[:-1], d_s[1:] != d_s[:-1], out=gmask[1:])
        gstart = np.flatnonzero(gmask)
        g_code = c_s[gstart]
        g_doc = d_s[gstart]
        tfs = np.diff(np.append(gstart, ntok))

        # per-term group ranges
        tmask = np.empty(len(g_code), dtype=bool)
        tmask[0] = True
        np.not_equal(g_code[1:], g_code[:-1], out=tmask[1:])
        tstarts = np.flatnonzero(tmask)
        nterms = len(tstarts)
        dfs = np.diff(np.append(tstarts, len(g_code)))
        terms = [term_strs[c] for c in g_code[tstarts]]

        slot_of_row = keep_rows + (doc_id_base - seg_base)
        slots = slot_of_row[g_doc]
        deltas = np.empty(len(slots), dtype=np.int64)
        deltas[1:] = slots[1:] - slots[:-1]
        deltas[tstarts] = slots[tstarts]  # absolute-in-segment first element
        data, vlens = vbyte_encode_with_lengths(deltas)
        postings_arr = _binary_from_slices(data, np.add.reduceat(vlens, tstarts))
        tf_data, tf_vlens = vbyte_encode_with_lengths(tfs)
        tfs_arr = _binary_from_slices(tf_data, np.add.reduceat(tf_vlens, tstarts))

        if self.store_positions:
            # positions cell layout v2: per doc [p0, dp1, ...] — deltas
            # ONLY; the per-doc count is the tf already in the tfs cell.
            # pos within doc = rank among that doc's kept tokens
            doc_first = np.zeros(m + 1, dtype=np.int64)
            np.cumsum(kept_lens, out=doc_first[1:])
            pos_all = np.arange(ntok, dtype=np.int64) - doc_first[tok_doc]
            p_s = pos_all[order]
            pdeltas = np.empty(ntok, dtype=np.int64)
            pdeltas[1:] = p_s[1:] - p_s[:-1]
            pdeltas[gstart] = p_s[gstart]  # absolute at each doc boundary
            # token-level term boundaries for the per-term byte slices
            tok_tstarts = gstart[tstarts]
            p_data, p_vlens = vbyte_encode_with_lengths(pdeltas)
            positions_arr = _binary_from_slices(
                p_data, np.add.reduceat(p_vlens, tok_tstarts)
            )
        else:
            positions_arr = _binary_from_slices(
                b"", np.zeros(nterms, dtype=np.int64)
            )

        return pa.table(
            {
                "seg": pa.array(
                    np.full(nterms, spec["seg_id"], dtype=np.int32)
                ),
                "term": pa.array(terms, pa.large_string()),
                "first_doc": pa.array(slots[tstarts] + seg_base),
                "df": pa.array(dfs),
                "postings": postings_arr,
                "tfs": tfs_arr,
                "positions": positions_arr,
            },
            schema=RUN_SCHEMA,
        )

    def _read_rows(self, spec: dict) -> pa.Table:
        columns = [self.text_column, *self.prefix_columns]
        if self.url_column:
            columns.append(self.url_column)
        if self.lang_column:
            columns.append(self.lang_column)
        for fc in self.facet_columns:
            if fc not in columns:
                columns.append(fc)
        pf = pq.ParquetFile(spec["path"])
        tbl = pf.read_row_groups(
            list(range(spec["row_group_start"], spec["row_group_end"])),
            columns=columns,
        )
        return tbl.slice(spec["row_offset"], spec["num_rows"])

    def _texts(self, tbl: pa.Table) -> list[str]:
        """text column, optionally prefixed (reference M3:
        ``full_text = f"{title}. {text}"``, ``preprocess_data.py:84``)."""
        texts = tbl.column(self.text_column).to_pylist()
        for col in reversed(self.prefix_columns):
            pref = tbl.column(col).to_pylist()
            texts = [f"{p or ''}. {t or ''}" for p, t in zip(pref, texts)]
        return texts

    def _aligned_columns(self, tbl: pa.Table, doc_id_base: int, n: int):
        """(texts, langs, urls) for one partition — shared by both shuffle
        modes so the lang/url fallbacks can't diverge."""
        texts = self._texts(tbl)
        langs = (
            tbl.column(self.lang_column).to_pylist()
            if self.lang_column and self.lang_column in tbl.column_names
            else [None] * n
        )
        urls = (
            tbl.column(self.url_column).to_pylist()
            if self.url_column and self.url_column in tbl.column_names
            else [f"row-{doc_id_base + i}" for i in range(n)]
        )
        return texts, langs, urls

    def _prepare_partition(self, spec: dict):
        """Shared preamble of BOTH shuffle modes — read, lang filter,
        tokenize, docmap part write (extracted so fixes can't silently
        diverge between the runs and triples paths).  Returns
        (keep_rows, tok_doc, codes, term_strs, kept_lens)."""
        from ..normalizer.tokenize import tokenize_rows_flat

        tbl = self._read_rows(spec)
        doc_id_base = spec["doc_id_base"]
        n = tbl.num_rows
        texts, langs, urls = self._aligned_columns(tbl, doc_id_base, n)
        if self.lang_filter is not None:
            if not self.lang_column or (
                n and self.lang_column not in tbl.column_names
            ):
                # pyarrow silently ignores missing columns in
                # read_row_groups — without this check a misnamed lang
                # column would filter out EVERY document and "succeed"
                # with an empty index
                raise ValueError(
                    f"lang_filter={self.lang_filter!r} needs lang column "
                    f"{self.lang_column!r}, absent from {spec['path']!r}")
            keep_rows = np.flatnonzero(
                np.asarray(langs, dtype=object) == self.lang_filter
            ).astype(np.int64)
            texts = [texts[i] for i in keep_rows]
            urls = [urls[i] for i in keep_rows]
        else:
            keep_rows = np.arange(n, dtype=np.int64)
        m = len(keep_rows)

        cleaned = self.normalizer.clean_batch(texts)  # vectorized re2 clean
        # flat token stream: no Python loop over tokens (normalizer decides
        # once per UNIQUE surface token; everything else is Arrow/numpy)
        tok_doc, codes, term_strs = tokenize_rows_flat(
            self.normalizer, cleaned
        )
        kept_lens = (
            np.bincount(tok_doc, minlength=m)
            if m
            else np.zeros(0, dtype=np.int64)
        )
        facets = {
            fc: tbl.column(fc).take(pa.array(keep_rows))
            for fc in self.facet_columns
        }
        if self.store_source:
            facets["source_text"] = pa.array(texts, pa.string())
        self._write_docmap_part(
            spec, (keep_rows + doc_id_base).tolist(), urls,
            kept_lens.tolist(), facets,
        )
        return keep_rows, tok_doc, codes, term_strs, kept_lens

    def _process_partition(self, spec: dict) -> pa.Table:
        doc_id_base = spec["doc_id_base"]
        keep_rows, tok_doc, codes, term_strs, _ = (
            self._prepare_partition(spec)
        )

        # (code, doc) tf groups from one stable sort; triple emission order
        # is irrelevant downstream (the wide shuffle sorts by (th, doc_id))
        order = np.argsort(codes, kind="stable")
        c_s = codes[order]
        d_s = tok_doc[order]
        ntok = len(c_s)
        if ntok == 0:
            g_code = np.zeros(0, dtype=np.int64)
            g_doc = np.zeros(0, dtype=np.int64)
            g_tf = np.zeros(0, dtype=np.int64)
        else:
            gmask = np.empty(ntok, dtype=bool)
            gmask[0] = True
            np.logical_or(
                c_s[1:] != c_s[:-1], d_s[1:] != d_s[:-1], out=gmask[1:]
            )
            gstart = np.flatnonzero(gmask)
            g_code = c_s[gstart]
            g_doc = d_s[gstart]
            g_tf = np.diff(np.append(gstart, ntok))

        # term hash once per unique term (memoized across partitions)
        hcache = self._hash_cache
        code_th = np.empty(len(term_strs), dtype=np.int64)
        for j, term in enumerate(term_strs):
            h = hcache.get(term)
            if h is None:
                h = _term_hash(term)
                if len(hcache) < 4_000_000:
                    hcache[term] = h
            code_th[j] = h

        terms_arr = pa.array(term_strs, pa.large_string()).take(
            pa.array(g_code)
        )
        return pa.table(
            {
                "seg": pa.array(
                    np.full(len(g_code), spec["seg_id"], dtype=np.int32)
                ),
                "th": pa.array(
                    code_th[g_code]
                    if len(g_code)
                    else np.zeros(0, dtype=np.int64)
                ),
                "term": terms_arr,
                "doc_id": pa.array(keep_rows[g_doc] + doc_id_base),
                "tf": pa.array(g_tf.astype(np.int32)),
            },
            schema=TRIPLE_SCHEMA,
        )

    def _write_docmap_part(
        self, spec, doc_ids, urls, lens, extra: dict | None = None
    ) -> None:
        part_dir = os.path.join(self.index_dir, "docmap")
        os.makedirs(part_dir, exist_ok=True)
        path = os.path.join(part_dir, f"part-{spec['part_id']:06d}.parquet")
        cols = {
            "doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64)),
            "url": pa.array(urls, pa.string()),
            "doc_len": pa.array(np.asarray(lens, dtype=np.int32)),
        }
        if extra:
            cols.update(extra)  # facet columns (doc-values for aggs)
        tbl = pa.table(cols)
        # unique tmp name: a presumed-dead-but-alive retry writing the
        # same part must not interleave with the original through one
        # shared .tmp file (manifest.py's atomic writer pattern)
        import uuid

        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
