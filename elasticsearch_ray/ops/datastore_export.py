"""PostgreSQL / Redis datastore sinks (SURVEY §2 S9/S10/T5), Ray-Data-native.

The reference's datastore-comparison experiment ships its tf-idf index
into live servers:

- PostgreSQL (``plot_a_datastore.py:165-281``): three tables —
  ``documents(doc_id VARCHAR, doc_length)``, ``terms(term_id SERIAL,
  term, doc_freq)``, ``postings(term_id, doc_id, tf_idf REAL)`` with
  ``tf_idf = (tf / doc_length) * ln(N / df)`` — batch-inserted, then
  B-tree indexes on terms(term) / postings(term_id) / postings(doc_id).
- Redis (``plot_a_datastore.py:329-416``): ``meta:num_documents`` /
  ``meta:num_terms`` keys, a ``doc_lengths`` hash (doc_id -> length) and
  one ``postings:{term}`` key per term holding a JSON dict
  ``{doc_id: tf_idf}`` in document order.

No PG/Redis server exists in this sandbox (and none is needed at build
time), so — exactly like the ES bulk sink (``sources/es_bulk.py``) —
each sink emits the datastore's own *bulk-load wire format* from Ray
tasks over an already-built index:

- PostgreSQL: tab-separated ``COPY ... FROM STDIN`` text-format data
  files (one per segment for documents/postings, one per df shard for
  terms) plus a ``load.sql`` that creates the reference DDL, ``\\copy``'s
  every part and builds the reference's indexes — ``psql -f load.sql``
  reproduces the reference's datastore.
- Redis: RESP mass-insertion files (``cat *.resp | redis-cli --pipe``),
  the protocol's documented bulk-load path.

Determinism note: the reference's SERIAL ``term_id`` is assigned in dict
iteration order (non-deterministic across runs); this exporter assigns
``term_id = 1 + rank of term in the globally sorted vocabulary`` — the
deterministic choice, computable from the range-sharded ``df_global``
directory with one parquet-footer read per shard.

Scale shape (100 TB): everything is partition-local —
- documents/postings parts are one task per segment: one vectorized
  ``decode_all_postings`` pass, global df/term_id joined by reading ONLY
  the df shards covering the segment's term range (terms within a
  segment are sorted, so the covering shards are a contiguous run).
- the Redis postings keys need a per-term GLOBAL view, so that exporter
  partitions by the df shards' term ranges instead of shuffling
  (term, doc, tf_idf) rows through the object store: an actor-pool stage
  where each actor mmap-opens every segment ONCE and each task decodes
  only its range's byte-contiguous rows (``SegmentReader.decode_rows``).
  I/O per task ∝ its range's postings bytes; cross-range reader reuse
  amortizes the per-segment open.  Partitioning assumption: the df
  shards partition the sorted vocabulary into disjoint ranges (the
  builder's ``_write_df_shard_index`` guarantees it).
- outputs are per-segment / per-range files with atomic renames, so a
  failed export resumes by skipping finished parts (``resume=True``).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa

# The reference's DDL verbatim (plot_a_datastore.py:173-196) + its
# post-load B-tree indexes (plot_a_datastore.py:272-276).
PG_SCHEMA_SQL = """\
DROP TABLE IF EXISTS postings CASCADE;
DROP TABLE IF EXISTS documents CASCADE;
DROP TABLE IF EXISTS terms CASCADE;
CREATE TABLE documents (
    doc_id VARCHAR(255) PRIMARY KEY,
    doc_length INTEGER NOT NULL
);
CREATE TABLE terms (
    term_id SERIAL PRIMARY KEY,
    term VARCHAR(255) UNIQUE NOT NULL,
    doc_freq INTEGER NOT NULL
);
CREATE TABLE postings (
    term_id INTEGER REFERENCES terms(term_id),
    doc_id VARCHAR(255) REFERENCES documents(doc_id),
    tf_idf REAL NOT NULL,
    PRIMARY KEY (term_id, doc_id)
);
"""
PG_INDEX_SQL = """\
CREATE INDEX idx_terms_term ON terms(term);
CREATE INDEX idx_postings_term ON postings(term_id);
CREATE INDEX idx_postings_doc ON postings(doc_id);
SELECT setval('terms_term_id_seq', (SELECT max(term_id) FROM terms));
"""


def _df_shard_plan(index_dir: str) -> list[dict]:
    """Term-range plan from ``df_global``: ``[{path, lo, hi, rows, base}]``
    ordered by range, where ``base`` is the cumulative term count before
    the shard (so shard term_ids are ``base+1 .. base+rows``).  Parquet
    footers only — no data read."""
    import pyarrow.parquet as pq

    dg = os.path.join(index_dir, "df_global")
    with open(os.path.join(dg, "_df_shards.json")) as f:
        shards = json.load(f)["shards"]
    plan, base = [], 0
    for s in shards:  # index is already sorted by lo
        path = os.path.join(dg, s["file"])
        rows = pq.ParquetFile(path).metadata.num_rows
        plan.append(
            {"path": path, "lo": s["lo"], "hi": s["hi"], "rows": rows,
             "base": base}
        )
        base += rows
    return plan


def _global_term_ids(
    plan: list[dict], terms: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """``(term_id, df_global)`` for an ascending-sorted term array, reading
    only the df shards whose range intersects ``[terms[0], terms[-1]]``."""
    import pyarrow.parquet as pq

    tid = np.zeros(terms.size, dtype=np.int64)
    dfg = np.zeros(terms.size, dtype=np.int64)
    if not terms.size:
        return tid, dfg
    for s in plan:
        if s["hi"] < terms[0] or s["lo"] > terms[-1]:
            continue
        # the slice of `terms` this shard owns (ranges are inclusive)
        a = int(np.searchsorted(terms, s["lo"], side="left"))
        b = int(np.searchsorted(terms, s["hi"], side="right"))
        if a == b:
            continue
        t = pq.read_table(s["path"], columns=["term", "df"])
        shard_terms = np.asarray(t.column("term").to_pylist())
        pos = np.searchsorted(shard_terms, terms[a:b])
        if (pos >= shard_terms.size).any() or (
            shard_terms[np.minimum(pos, shard_terms.size - 1)] != terms[a:b]
        ).any():
            missing = terms[a:b][
                (pos >= shard_terms.size)
                | (shard_terms[np.minimum(pos, shard_terms.size - 1)]
                   != terms[a:b])
            ]
            raise ValueError(
                f"terms absent from df_global shard {s['path']}: "
                f"{missing[:5].tolist()}"
            )
        tid[a:b] = s["base"] + 1 + pos
        dfg[a:b] = t.column("df").to_numpy()[pos]
    if (tid == 0).any():
        raise ValueError("segment terms not covered by df_global shards")
    return tid, dfg


def _ln_ratio(n_docs: int, dfg: np.ndarray) -> np.ndarray:
    """Per-term ``ln(N/df)`` with scalar libm log (see idf comment)."""
    import math

    ratios = np.float64(n_docs) / dfg.astype(np.float64)
    return np.fromiter((math.log(x) for x in ratios), np.float64, dfg.size)


def _segment_tfidf(reader, plan: list[dict], n_docs: int):
    """Decode one segment and compute the reference's tf-idf per posting:
    flat ``(term_id, doc_id, tf_idf)`` arrays — all vectorized, live
    (non-tombstoned) postings only."""
    slots, tfs, row_starts = reader.decode_all_postings()
    terms = np.asarray(reader._term_list)
    tid, dfg = _global_term_ids(plan, terms)
    per_row = np.diff(row_starts)
    tid_rep = np.repeat(tid, per_row)
    # tf = count/doc_length; idf = ln(N/df)  (plot_a_datastore.py:253-260).
    # idf via per-term math.log, NOT np.log: numpy's vectorized log is 1 ulp
    # off libm ~30% of the time; math.log bit-matches the reference (and
    # DuckDB's ln, and the query engine's own idf at query.py:1004).
    idf_rep = np.repeat(_ln_ratio(n_docs, dfg), per_row)
    dl = reader.doc_lens[slots].astype(np.float64)
    tf_idf = (tfs.astype(np.float64) / dl) * idf_rep
    doc_ids = slots + reader.doc_id_base
    live = reader.doc_lens[slots] > 0
    if not live.all():
        tid_rep, doc_ids, tf_idf = tid_rep[live], doc_ids[live], tf_idf[live]
    return tid_rep, doc_ids, tf_idf


def _write_atomic(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


# ---------------------------------------------------------------- PostgreSQL


_PG_ESCAPES = str.maketrans(
    {"\\": "\\\\", "\t": "\\t", "\n": "\\n", "\r": "\\r"}
)


def _pg_copy_lines(cols: list[np.ndarray]) -> bytes:
    """Tab-separated lines in PostgreSQL COPY *text* format.  COPY text is
    NOT csv: there is no quoting — backslash, tab, newline and CR inside a
    value must be backslash-escaped (otherwise psql splits the row, decodes
    an unintended escape, or reads a literal ``\\N`` as NULL).  Numeric
    columns are vectorized through pandas' C csv writer (no special chars
    possible); string columns get an explicit translate-based escape."""
    import io

    import pandas as pd

    if all(c.dtype.kind not in "OUS" for c in cols):
        # numeric-only (documents/postings tables): pandas' C writer emits
        # no COPY-special characters, so it is byte-equivalent to text
        # format and stays fully vectorized
        df = pd.DataFrame({str(i): c for i, c in enumerate(cols)})
        buf = io.StringIO()
        df.to_csv(buf, sep="\t", header=False, index=False)
        return buf.getvalue().encode("utf-8")
    # a string column (terms table): escape explicitly and join —
    # csv-module quoting must not touch COPY text values
    str_cols = [
        [str(v).translate(_PG_ESCAPES) for v in c]
        if c.dtype.kind in "OUS"
        else [str(v) for v in c]
        for c in cols
    ]
    lines = "\n".join("\t".join(row) for row in zip(*str_cols))
    return (lines + "\n").encode("utf-8") if lines else b""


def export_postgres(
    index_dir: str,
    out_dir: str,
    *,
    resume: bool = False,
) -> dict:
    """Export an index as a PostgreSQL bulk load: COPY-format parts for
    the reference's three tables + ``load.sql``.  One Ray task per
    segment (documents, postings) and per df shard (terms); returns a
    manifest dict (also written as ``_manifest.json``)."""
    import ray.data

    from ..state.manifest import read_json

    man = read_json(os.path.join(index_dir, "manifest.json"))
    n_docs = int(man["doc_count"])
    tombstones = list(man.get("tombstones") or [])
    plan = _df_shard_plan(index_dir)
    os.makedirs(out_dir, exist_ok=True)
    # resume is only sound against the SAME index layout: parts are named
    # by seg id / df-shard index, so a re-finalized df plan, an added
    # tombstone, or a compaction (which rewrites segments IN PLACE under
    # the same seg ids and shifts term_id bases) would alias old files to
    # different content — stale term_ids silently mismapping the
    # vocabulary.  Stamp the layout; on mismatch fall back to a full
    # rewrite (same discipline as export_redis's _ranges.json).
    layout_stamp = {
        "segments": [int(s) for s in man["segments"]],
        "tombstones": sorted(int(t) for t in tombstones),
        "doc_count": n_docs,
        "plan": [
            {"path": s["path"], "base": int(s["base"]),
             "rows": int(s["rows"])}
            for s in plan
        ],
    }
    stamp_path = os.path.join(out_dir, "_layout.json")
    if resume:
        try:
            with open(stamp_path) as f:
                if json.load(f) != layout_stamp:
                    resume = False
        except (OSError, json.JSONDecodeError):
            resume = False
    for sub in ("documents", "terms", "postings"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)
        if not resume:  # drop stale parts from a prior layout
            for p in glob.glob(os.path.join(out_dir, sub, "*.copy")):
                os.unlink(p)
    with open(stamp_path, "w") as f:
        json.dump(layout_stamp, f)

    def seg_task(row: dict) -> dict:
        from ..state.segment import SegmentReader

        seg = int(row["seg"])
        doc_path = os.path.join(out_dir, "documents", f"part-{seg:05d}.copy")
        post_path = os.path.join(out_dir, "postings", f"part-{seg:05d}.copy")
        r = SegmentReader(index_dir, seg, tombstones=tombstones)
        rows = 0
        if not (resume and os.path.exists(doc_path)):
            live = r.doc_lens >= 0  # tombstones are -1; empty docs stay
            ids = (np.nonzero(live)[0] + r.doc_id_base).astype(np.int64)
            _write_atomic(
                doc_path, _pg_copy_lines([ids, r.doc_lens[live]])
            )
        if not (resume and os.path.exists(post_path)):
            tid_rep, doc_ids, tf_idf = _segment_tfidf(r, plan, n_docs)
            _write_atomic(
                post_path, _pg_copy_lines([tid_rep, doc_ids, tf_idf])
            )
            rows = int(doc_ids.size)
        return {"part": post_path, "doc_part": doc_path, "rows": rows}

    def shard_task(row: dict) -> dict:
        import pyarrow.parquet as pq

        i, s = int(row["i"]), plan[int(row["i"])]
        path = os.path.join(out_dir, "terms", f"part-{i:05d}.copy")
        if not (resume and os.path.exists(path)):
            t = pq.read_table(s["path"], columns=["term", "df"])
            terms_arr = np.asarray(t.column("term").to_pylist())
            # the reference DDL (verbatim) declares term VARCHAR(255):
            # fail FAST here with an actionable message instead of letting
            # psql abort mid-load on an over-long token
            too_long = [w for w in terms_arr if len(w) > 255]
            if too_long:
                raise ValueError(
                    f"{len(too_long)} term(s) exceed the reference DDL's "
                    f"VARCHAR(255) (e.g. {too_long[0][:40]!r}...); filter "
                    "over-long tokens at build time or widen the DDL"
                )
            tid = s["base"] + 1 + np.arange(s["rows"], dtype=np.int64)
            _write_atomic(
                path,
                _pg_copy_lines([tid, terms_arr, t.column("df").to_numpy()]),
            )
        return {"part": path, "rows": s["rows"]}

    # one block per item: from_items defaults to a single block, which
    # would serialize the whole export through one task
    segs = ray.data.from_items(
        [{"seg": s} for s in man["segments"]],
        override_num_blocks=len(man["segments"]),
    )
    seg_parts = segs.map(seg_task).take_all()
    shards = ray.data.from_items(
        [{"i": i} for i in range(len(plan))], override_num_blocks=len(plan)
    )
    term_parts = shards.map(shard_task).take_all()

    # load.sql lists exactly THIS run's parts (never a directory glob:
    # stale parts from a prior export with a different segment layout
    # would otherwise be loaded alongside, duplicating rows)
    copies = "\n".join(
        f"\\copy {tbl} FROM '{p}'"
        for tbl, parts in (
            ("documents", sorted(p["doc_part"] for p in seg_parts)),
            ("terms (term_id, term, doc_freq)",
             sorted(p["part"] for p in term_parts)),
            ("postings", sorted(p["part"] for p in seg_parts)),
        )
        for p in parts
    )
    with open(os.path.join(out_dir, "load.sql"), "w") as f:
        f.write(PG_SCHEMA_SQL + "\n" + copies + "\n\n" + PG_INDEX_SQL)
    manifest = {
        "num_documents": n_docs,
        "num_terms": sum(s["rows"] for s in plan),
        "segment_parts": len(seg_parts),
        "term_parts": len(term_parts),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


_PG_UNESCAPES = {"\\": "\\", "t": "\t", "n": "\n", "r": "\r"}


def _pg_unescape(v: str) -> str | None:
    """Reverse ``_pg_copy_lines``'s COPY-text escaping (``\\\\`` ``\\t``
    ``\\n`` ``\\r``); a bare ``\\N`` field is SQL NULL.  Values without a
    backslash — every token the \\w+ analyzer emits — take the O(1) fast
    path."""
    if "\\" not in v:
        return v
    if v == "\\N":
        return None
    out = []
    i = 0
    while i < len(v):
        c = v[i]
        if c == "\\" and i + 1 < len(v):
            out.append(_PG_UNESCAPES.get(v[i + 1], v[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def read_postgres_copy(out_dir: str, table: str):
    """Load a COPY-format table export back as a Ray Dataset (typed per
    the reference DDL); one parse task per part file."""
    import ray.data

    schemas = {
        "documents": (("doc_id", "str"), ("doc_length", "int")),
        "terms": (("term_id", "int"), ("term", "str"), ("doc_freq", "int")),
        "postings": (("term_id", "int"), ("doc_id", "str"), ("tf_idf", "float")),
    }
    spec = schemas[table]
    paths = sorted(glob.glob(os.path.join(out_dir, table, "part-*.copy")))
    if not paths:
        raise FileNotFoundError(f"no COPY parts under {out_dir}/{table}")

    def parse(batch: pa.Table) -> pa.Table:
        cols: list[list] = [[] for _ in spec]
        for raw in batch.column("bytes").to_pylist():
            for line in raw.decode("utf-8").splitlines():
                for i, part in enumerate(line.split("\t")):
                    cols[i].append(part)
        out = {}
        for (name, typ), vals in zip(spec, cols):
            if typ == "int":
                out[name] = pa.array([int(v) for v in vals], pa.int64())
            elif typ == "float":
                out[name] = pa.array([float(v) for v in vals], pa.float64())
            else:
                out[name] = pa.array(
                    [_pg_unescape(v) for v in vals], pa.string()
                )
        return pa.table(out)

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


# -------------------------------------------------------------------- Redis


def _resp(*args: bytes) -> bytes:
    """One RESP command in mass-insertion framing (redis-cli --pipe)."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        out.append(b"$%d\r\n%s\r\n" % (len(a), a))
    return b"".join(out)


class _RespRangeExporter:
    """Actor-pool stage: one df-shard term range -> one RESP file of
    ``SET postings:{term} {json}`` commands.  Every segment is mmap-opened
    ONCE per actor (lazily, in the first call) and reused across ranges;
    each range decodes only its own byte-contiguous rows."""

    def __init__(self, index_dir: str, seg_ids: list[int], n_docs: int,
                 out_dir: str, tombstones: list[int] | None = None):
        self.index_dir = index_dir
        self.seg_ids = seg_ids
        self.n_docs = n_docs
        self.out_dir = out_dir
        self.tombstones = tombstones
        self._readers = None  # [(reader, sorted term ndarray)], lazy
        self._shard_cache: dict = {}  # path -> (term ndarray, df ndarray)

    def _open(self):
        if self._readers is None:
            from ..state.segment import SegmentReader

            self._readers = []
            for sid in self.seg_ids:
                r = SegmentReader(self.index_dir, sid,
                                  tombstones=self.tombstones)
                self._readers.append((r, np.asarray(r._term_list)))
        return self._readers

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        paths, counts = [], []
        for i, shard_path, rlo, rhi, resume in zip(
            batch.column("i").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("rlo").to_pylist(),
            batch.column("rhi").to_pylist(),
            batch.column("resume").to_pylist(),
        ):
            out = os.path.join(self.out_dir, f"postings-{int(i):05d}.resp")
            if resume and os.path.exists(out):
                paths.append(out)
                counts.append(-1)
                continue
            cached = self._shard_cache.get(shard_path)
            if cached is None:
                # one decode per actor, not per range (ranges >> shards)
                t_full = pq.read_table(shard_path, columns=["term", "df"])
                cached = (
                    np.asarray(t_full.column("term").to_pylist()),
                    t_full.column("df").to_numpy().astype(np.float64),
                )
                self._shard_cache[shard_path] = cached
            vocab = cached[0][rlo:rhi]
            dfg = cached[1][rlo:rhi]
            vidx_all, docs_all, val_all = [], [], []
            for r, seg_terms in self._open():
                a = int(np.searchsorted(seg_terms, vocab[0], side="left"))
                b = int(np.searchsorted(seg_terms, vocab[-1], side="right"))
                if a == b:
                    continue
                slots, tfs, row_starts = r.decode_rows(a, b)
                vidx = np.searchsorted(vocab, seg_terms[a:b])
                # same consistency contract as the PG path's
                # _global_term_ids: every segment term in the range must
                # exist in df_global, else postings would silently merge
                # into a lexical neighbor's key
                miss = (vidx >= vocab.size) | (
                    vocab[np.minimum(vidx, vocab.size - 1)]
                    != seg_terms[a:b]
                )
                if miss.any():
                    raise ValueError(
                        f"segment {r.seg_id}: "
                        f"{int(miss.sum())} term(s) in range missing from "
                        f"df_global (e.g. {seg_terms[a:b][miss][0]!r}) — "
                        "index df shards are stale; re-run finalize"
                    )
                per_row = np.diff(row_starts)
                dl = r.doc_lens[slots].astype(np.float64)
                tf_idf = tfs.astype(np.float64) / dl * np.repeat(
                    _ln_ratio(self.n_docs, dfg[vidx]), per_row
                )
                live = r.doc_lens[slots] > 0
                vidx_all.append(np.repeat(vidx, per_row)[live])
                docs_all.append((slots + r.doc_id_base)[live])
                val_all.append(tf_idf[live])
            cmds = []
            if vidx_all:
                vidx = np.concatenate(vidx_all)
                docs = np.concatenate(docs_all)
                vals = np.concatenate(val_all)
                order = np.lexsort((docs, vidx))
                vidx, docs, vals = vidx[order], docs[order], vals[order]
                bounds = np.searchsorted(vidx, np.arange(vocab.size + 1))
                vlist = vals.tolist()
                # vectorized int->str (5M Python str() calls otherwise
                # dominate the export at bench scale)
                dlist = docs.astype("U").tolist()
                for v in range(vocab.size):
                    lo, hi = bounds[v], bounds[v + 1]
                    if lo == hi:
                        continue  # term fully tombstoned
                    payload = json.dumps(
                        dict(zip(dlist[lo:hi], vlist[lo:hi]))
                    )
                    cmds.append(_resp(
                        b"SET", b"postings:" + vocab[v].encode(),
                        payload.encode(),
                    ))
            _write_atomic(out, b"".join(cmds))
            paths.append(out)
            counts.append(len(cmds))
        return pa.table({"part": pa.array(paths),
                         "keys": pa.array(counts, pa.int64())})


def export_redis(
    index_dir: str,
    out_dir: str,
    *,
    resume: bool = False,
    concurrency: tuple[int, int] | int = 8,  # fixed pool: the autoscaler
    # under-provisions this short bursty stage (~25% slower measured)
    target_ranges: int = 32,
) -> dict:
    """Export an index as Redis RESP mass-insertion files mirroring the
    reference's key layout: ``postings-*.resp`` (one per term range,
    SET postings:{term}), ``doclens-*.resp`` (one per segment,
    HSET doc_lengths), ``meta.resp``.  Load with
    ``cat <out_dir>/*.resp | redis-cli --pipe``.

    Term ranges start from the df shards and are row-sub-split toward
    ``target_ranges`` tasks (the shards are term-sorted, so any row range
    IS a term range) — parallelism never degrades to the shard count when
    the vocabulary fits in few shards (small corpora / heavy Zipf)."""
    import ray.data

    from ..state.manifest import read_json

    man = read_json(os.path.join(index_dir, "manifest.json"))
    n_docs = int(man["doc_count"])
    seg_ids = list(man["segments"])
    tombstones = list(man.get("tombstones") or [])
    plan = _df_shard_plan(index_dir)
    os.makedirs(out_dir, exist_ok=True)

    total_rows = sum(s["rows"] for s in plan) or 1
    rows, rid = [], 0
    for s in plan:
        k = max(1, round(target_ranges * s["rows"] / total_rows))
        splits = np.linspace(0, s["rows"], k + 1).astype(np.int64)
        for rlo, rhi in zip(splits, splits[1:]):
            if rhi > rlo:
                rows.append({"i": rid, "path": s["path"], "rlo": int(rlo),
                             "rhi": int(rhi), "resume": resume})
                rid += 1
    # resume is only sound against the SAME range layout: sequential part
    # ids denote ranges, so a changed target_ranges / shard plan would
    # alias old files to different ranges.  Stamp the layout; on mismatch
    # (or a fresh run) drop stale .resp files and rewrite everything.
    range_stamp = [
        {"path": r["path"], "rlo": r["rlo"], "rhi": r["rhi"]} for r in rows
    ]
    stamp_path = os.path.join(out_dir, "_ranges.json")
    if resume and os.path.exists(stamp_path):
        with open(stamp_path) as f:
            if json.load(f) != range_stamp:
                resume = False
    elif resume:
        resume = False
    if not resume:
        for p in glob.glob(os.path.join(out_dir, "*.resp")):
            os.unlink(p)
        for r in rows:
            r["resume"] = False
    with open(stamp_path, "w") as f:
        json.dump(range_stamp, f)
    parts = (
        ray.data.from_items(rows, override_num_blocks=len(rows))
        .map_batches(
            _RespRangeExporter,
            fn_constructor_args=(index_dir, seg_ids, n_docs, out_dir,
                                 tombstones),
            batch_size=1,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
        .take_all()
    )

    def doclen_task(row: dict) -> dict:
        from ..state.segment import SegmentReader

        seg = int(row["seg"])
        path = os.path.join(out_dir, f"doclens-{seg:05d}.resp")
        if not (resume and os.path.exists(path)):
            r = SegmentReader(index_dir, seg, tombstones=tombstones)
            live = np.nonzero(r.doc_lens >= 0)[0]
            cmds = [
                _resp(b"HSET", b"doc_lengths",
                      str(int(s + r.doc_id_base)).encode(),
                      str(int(r.doc_lens[s])).encode())
                for s in live
            ]
            _write_atomic(path, b"".join(cmds))
        return {"part": path}

    ray.data.from_items(
        [{"seg": s} for s in seg_ids], override_num_blocks=len(seg_ids)
    ).map(doclen_task).take_all()

    n_terms = sum(s["rows"] for s in plan)
    _write_atomic(
        os.path.join(out_dir, "meta.resp"),
        _resp(b"SET", b"meta:num_documents", str(n_docs).encode())
        + _resp(b"SET", b"meta:num_terms", str(n_terms).encode()),
    )
    manifest = {"num_documents": n_docs, "num_terms": n_terms,
                "postings_parts": len(parts), "doclen_parts": len(seg_ids)}
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def parse_resp(data: bytes) -> list[list[bytes]]:
    """Parse RESP mass-insertion bytes back into command argv lists —
    the exact framing a server would see."""
    cmds, pos, n = [], 0, len(data)
    while pos < n:
        assert data[pos:pos + 1] == b"*", f"bad frame at {pos}"
        eol = data.index(b"\r\n", pos)
        argc = int(data[pos + 1:eol])
        pos = eol + 2
        argv = []
        for _ in range(argc):
            assert data[pos:pos + 1] == b"$"
            eol = data.index(b"\r\n", pos)
            ln = int(data[pos + 1:eol])
            pos = eol + 2
            argv.append(data[pos:pos + ln])
            pos += ln + 2
        cmds.append(argv)
    return cmds


def read_redis_postings(resp_dir: str):
    """Load ``postings-*.resp`` back as a Ray Dataset of
    ``(term, doc_id, tf_idf)`` rows (JSON payloads parsed; one task per
    file)."""
    import ray.data

    paths = sorted(glob.glob(os.path.join(resp_dir, "postings-*.resp")))
    if not paths:
        raise FileNotFoundError(f"no postings parts under {resp_dir}")

    def parse(batch: pa.Table) -> pa.Table:
        terms, docs, vals = [], [], []
        for raw in batch.column("bytes").to_pylist():
            for argv in parse_resp(raw):
                assert argv[0] == b"SET" and argv[1].startswith(b"postings:")
                term = argv[1][len(b"postings:"):].decode()
                for d, v in json.loads(argv[2]).items():
                    terms.append(term)
                    docs.append(d)
                    vals.append(v)
        return pa.table({
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "tf_idf": pa.array(vals, pa.float64()),
        })

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


def read_redis_doclens(resp_dir: str):
    """Load ``doclens-*.resp`` back as (doc_id, doc_length) rows."""
    import ray.data

    paths = sorted(glob.glob(os.path.join(resp_dir, "doclens-*.resp")))
    if not paths:
        raise FileNotFoundError(f"no doclen parts under {resp_dir}")

    def parse(batch: pa.Table) -> pa.Table:
        docs, lens = [], []
        for raw in batch.column("bytes").to_pylist():
            for argv in parse_resp(raw):
                assert argv[0] == b"HSET" and argv[1] == b"doc_lengths"
                docs.append(argv[2].decode())
                lens.append(int(argv[3]))
        return pa.table({"doc_id": pa.array(docs, pa.string()),
                         "doc_length": pa.array(lens, pa.int64())})

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow"
    )


class RespSocketClient:
    """Live Redis client over a raw TCP socket: ``callable(argv)`` sends
    one RESP-framed command and reads the reply — the real wire protocol
    (what ``redis-cli --pipe`` speaks) without the redis-py dependency.
    The connection opens ONCE per actor (build via
    ``functools.partial(RespSocketClient, host, port)``); replies parse
    the four RESP reply types and raise on ``-ERR``."""

    def __init__(self, host: str, port: int, timeout: float = 30.0):
        import socket

        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.rf = self.sock.makefile("rb")

    def __call__(self, argv: list[bytes]):
        self.sock.sendall(_resp(*argv))
        line = self.rf.readline()
        if not line.endswith(b"\r\n"):
            raise ConnectionError("truncated RESP reply")
        kind, body = line[:1], line[1:-2]
        if kind == b"+":
            return body.decode()
        if kind == b":":
            return int(body)
        if kind == b"$":
            n = int(body)
            if n < 0:
                return None
            data = self.rf.read(n + 2)
            return data[:n]
        if kind == b"-":
            raise RuntimeError(f"redis error: {body.decode()}")
        raise ValueError(f"unexpected RESP reply type {kind!r}")

    def __del__(self):
        try:
            self.sock.close()
        except Exception:
            pass


class ValidatingRespClient:
    """Dry-run Redis 'client': accepts a command argv exactly as a server
    would and validates shape; pass the class as ``client_factory`` to
    ``post_resp`` to validate an export end-to-end with no server."""

    def __call__(self, argv: list[bytes]):
        if argv[0] == b"SET":
            if argv[1].startswith(b"postings:"):
                json.loads(argv[2])  # payload must be valid JSON
            return "OK"
        if argv[0] == b"HSET":
            int(argv[3])
            return 1
        raise ValueError(f"unexpected command {argv[0]!r}")


class _RespPoster:
    """Actor-pool RESP poster: the client is built ONCE per actor from a
    serializable factory (e.g. ``lambda: redis.Redis().execute_command``
    adapted to argv lists, or :class:`ValidatingRespClient`)."""

    def __init__(self, client_factory):
        self.client = client_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths, ncmds = [], []
        for path in batch.column("path").to_pylist():
            with open(path, "rb") as f:
                cmds = parse_resp(f.read())
            for argv in cmds:
                self.client(argv)
            paths.append(path)
            ncmds.append(len(cmds))
        return pa.table({"path": pa.array(paths),
                         "commands": pa.array(ncmds, pa.int64())})


def post_resp(resp_dir: str, client_factory, concurrency: int = 4):
    """Replay every RESP file under ``resp_dir`` through
    ``client_factory()``'s command callable from an actor pool; returns
    per-file command counts as a pandas DataFrame."""
    import ray.data

    paths = sorted(glob.glob(os.path.join(resp_dir, "*.resp")))
    return (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(
            _RespPoster, fn_constructor_args=(client_factory,),
            batch_format="pyarrow", batch_size=4, concurrency=concurrency,
        )
        .to_pandas()
    )
