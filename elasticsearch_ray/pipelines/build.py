"""Distributed index build — the flagship Ray Data pipeline.

    plan (Parquet footers only, driver)
      -> ray.data.from_items(partition specs)
      -> map_batches(TokenizePartition, actor pool)     # zero-copy Arrow out
           · column-pruned read (html never loaded)
           · docmap parts written per partition (idempotent)
      -> sort(["seg", "term", "doc_id"])                # THE wide shuffle;
           head-term skew auto-split by doc-id range (ordered salting)
      -> map_batches(encode_runs_block)                 # vectorized VByte
      -> groupby("seg").map_groups(SegmentAssembler)    # merge runs, block-max
           · immutable segment + doclen files, df part, lineage manifest
    finalize (driver):
      · dedicated aggregate pass: global df = groupby(term).sum over df parts
      · stats.json (N, avgdl, sizes), manifest.json

Resume: segments whose manifest validates are pruned from the plan before the
pipeline runs — a re-run after a crash redoes only unfinished segments.

Reference counterpart: the single-process ``create_index`` loops
(``selfindex_q_daat.py:59-125``); see SURVEY.md §3.2 / §4.3.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

import numpy as np
import ray
import ray.data

from ..stages.postings import SegmentAssembler, encode_runs_block
from ..stages.tokenizer import TokenizePartition
from ..state.manifest import (atomic_write_json, read_json,
                              segment_is_done, segment_manifest_path)
from ..state.segment import BLOCK_SIZE
from .plan import SegmentSpec, plan_partitions, plan_segments


@dataclass
class BuildConfig:
    text_column: str = "text"
    # optional extra columns concatenated BEFORE text_column with ". "
    # separators (reference M3: full_text = f"{title}. {text}",
    # ``preprocess_data.py:84``)
    prefix_columns: tuple[str, ...] = ()
    url_column: str | None = "url"
    lang_column: str | None = "lang"
    lang_filter: str | None = None
    analyzer: str = "reference"  # 'reference' (M2 pipeline) or 'plain'
    target_partition_rows: int = 2_000
    docs_per_segment: int = 25_000
    codec: str = "vbyte"  # 'vbyte' (reference z=1) or 'zlib' (z=2)
    block_size: int = BLOCK_SIZE
    # store token positions (enables quoted-"phrase" queries; positions are
    # indices in the PROCESSED token stream, the standard IR compromise).
    # Only the 'combine' and 'route' shuffles carry positions.
    store_positions: bool = False
    # metadata columns copied into the docmap parts (the doc-values
    # equivalent) — enables ES-style terms aggregations (facet counts)
    # at query time without touching the source table
    facet_columns: tuple[str, ...] = ()
    # ES _source: persist the (concatenated) analyzed text as a docmap
    # column — enables GET-by-id and highlighting at the cost of docmap
    # size (off by default; at web scale, store source only when the
    # serving tier needs it)
    store_source: bool = False
    tokenize_concurrency: int | None = None  # None -> cluster CPUs
    # testing-only: marker path for one injected worker death (see
    # TokenizePartition.fault_inject_path); exercises the route
    # dispatcher's dead-actor recovery
    fault_inject_path: str | None = None
    fault_inject_mode: str = "exit"  # 'exit' (node loss) | 'raise' (bug)
    # 'combine': map-side combiner — tokenize tasks invert their partition
    #   locally and shuffle compressed per-term RUNS (~10x fewer bytes); the
    #   assembler merges doc-disjoint runs per term.
    # 'segment': one groupby('seg') moves each raw triple once; the inversion
    #   is a local numeric lexsort in the assembly task.  Task memory is
    #   O(segment triples) — docs_per_segment bounds it.
    # 'sort': global sort by (term_hash, doc_id) — head-term postings larger
    #   than a block are auto-split across range partitions (ordered
    #   salting), so NO task ever holds a whole segment; use for very large
    #   segments / extreme skew.
    # 'route': like 'combine' but with STATIC ROUTING instead of the
    #   groupby(seg) sort exchange — the planner knows which doc-ordered
    #   partitions feed which segment, so each run block (probed once for
    #   its seg ids) is fetched zero-copy by at most ~2 assembly tasks.
    #   Raw Ray tasks are justified here because Ray Data's generic groupby
    #   cannot exploit the planner's partitioning knowledge.  Byte-identical
    #   output to 'combine' (asserted in test_invariance).  DEFAULT since
    #   round 3: beat 'combine' in 5/5 canary-stamped 100k-doc draws at 8
    #   CPUs (best 8.4s vs 12.6s — BASELINE.md round-3 section); its lower
    #   exchange volume is also the multi-node win.
    shuffle: str = "route"

    @property
    def identifier(self) -> str:
        """Reference-style versioned identifier (``index_base.py:9-49``)."""
        z = "1" if self.codec == "vbyte" else "2"
        return f"RaySelfIndex-v1.x2dSEGz{z}qWANDi1"


def _seg_infos(segs: list[SegmentSpec]) -> dict[int, dict]:
    return {
        s.seg_id: {
            "doc_id_base": s.doc_id_base,
            "num_docs": s.num_docs,
            "part_ids": [p.part_id for p in s.partitions],
            "lineage": [
                {
                    "path": p.path,
                    "row_group_start": p.row_group_start,
                    "row_group_end": p.row_group_end,
                    "row_offset": p.row_offset,
                    "num_rows": p.num_rows,
                    "doc_id_base": p.doc_id_base,
                }
                for p in s.partitions
            ],
        }
        for s in segs
    }


def build_index(
    input_path: str | list[str],
    index_dir: str,
    config: BuildConfig | None = None,
    resume: bool = True,
) -> dict:
    """Build (or resume building) the index; returns the index manifest."""
    config = config or BuildConfig()
    os.makedirs(index_dir, exist_ok=True)

    parts = plan_partitions(input_path, config.target_partition_rows)
    segs = plan_segments(parts, config.docs_per_segment)
    return _execute_build(index_dir, config, segs, resume=resume)


def extend_index(
    index_dir: str,
    add_input: str | list[str],
    config: BuildConfig | None = None,
) -> dict:
    """Incrementally index new files as ADDITIONAL immutable segments
    (``IndexBase.update_index`` add path — the reference stubs this with
    'rebuild for now', ``selfindex_q_daat.py:254-258``; immutable segments
    make it a pure append + stats re-finalize here)."""
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    config = config or BuildConfig(**manifest["config"])
    old_segs = sorted(manifest["segments"])
    next_seg = (max(old_segs) + 1) if old_segs else 0
    next_part = 0
    next_doc = 0
    for sid in old_segs:
        m = read_json(os.path.join(index_dir, "manifests", f"seg-{sid:05d}.json"))
        next_part = max(next_part, max(m["part_ids"], default=-1) + 1)
        next_doc = max(next_doc, m["doc_id_base"] + m["num_docs"])

    parts = plan_partitions(add_input, config.target_partition_rows)
    doc_base = next_doc
    for p in parts:
        p.part_id += next_part
        p.doc_id_base = doc_base
        doc_base += p.num_rows
    new_segs = plan_segments(parts, config.docs_per_segment)
    for s in new_segs:
        s.seg_id += next_seg
        for p in s.partitions:
            p.seg_id = s.seg_id
    return _execute_build(
        index_dir, config, new_segs, resume=True, extra_seg_ids=old_segs,
        tombstones=manifest.get("tombstones", []),
        # a per-call config override (e.g. update_index's pair-add scratch
        # parquet with url_column='url') applies to TOKENIZING the new
        # segments only; the index's persisted config must stay the one it
        # was created with, or later parquet-path adds silently lose the
        # original url/lang settings
        persist_config=BuildConfig(**manifest["config"]),
    )


def _merge_group(index_dir: str, ids: list[int], codec: str,
                 block_size: int, store_positions: bool,
                 new_id: int) -> dict:
    """Merge ADJACENT segments (contiguous doc ranges) into ONE segment
    written under the FRESH id ``new_id`` — member files are left intact
    (the driver deletes them only after every group succeeded and the
    manifest atomically points at the new ids, so a failed task or a
    driver crash never leaves the manifest referencing deleted files).
    Decode-everything-then-write: every member's postings batch-decode in
    one vectorized pass (``decode_all_postings``), concatenate in slot
    order (members are base-ordered and slots ascend within a member),
    then one lexsort; positions cells concatenate raw (the delta stream
    resets at each doc, so bytes splice without re-encoding); block-max
    metadata and df parts are rebuilt by the shared writer."""
    from ..state.manifest import segment_manifest_path
    from ..state.segment import SegmentReader

    readers = sorted(
        (SegmentReader(index_dir, s) for s in ids),
        key=lambda r: r.doc_id_base,
    )
    base = readers[0].doc_id_base
    expect = base
    for r in readers:
        if r.doc_id_base != expect:
            raise ValueError(
                "merge_segments needs adjacent segments with contiguous "
                f"doc ranges; got base {r.doc_id_base}, expected {expect}"
            )
        expect += r.num_docs
    vocab = sorted(set().union(*[set(r._term_list) for r in readers]))
    vocab_np = np.array(vocab) if vocab else np.empty(0, dtype=object)
    code_parts: list[np.ndarray] = []
    slot_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    for r in readers:
        if r.num_terms == 0:
            continue
        off = r.doc_id_base - base
        codes_r = np.searchsorted(vocab_np, np.array(r._term_list))
        slots_all, tfs_all, _ = r.decode_all_postings()
        slot_parts.append(slots_all + off)
        tf_parts.append(tfs_all.astype(np.int64))
        code_parts.append(np.repeat(codes_r, r._df.astype(np.int64)))
    if code_parts:
        code_flat = np.concatenate(code_parts)
        slots_flat = np.concatenate(slot_parts)
        tfs_flat = np.concatenate(tf_parts)
        order = np.lexsort((slots_flat, code_flat))
        code_flat = code_flat[order]
        slots_flat = slots_flat[order]
        tfs_flat = tfs_flat[order]
        n = code_flat.size
        tstarts = np.concatenate(
            ([0], np.flatnonzero(code_flat[1:] != code_flat[:-1]) + 1)
        )
        out_df = np.empty(tstarts.size, dtype=np.int64)
        out_df[:-1] = tstarts[1:] - tstarts[:-1]
        out_df[-1] = n - tstarts[-1]
        out_terms = [vocab[c] for c in code_flat[tstarts]]
    else:
        slots_flat = np.empty(0, dtype=np.int64)
        tfs_flat = np.empty(0, dtype=np.int64)
        tstarts = np.empty(0, dtype=np.int64)
        out_df = np.empty(0, dtype=np.int64)
        out_terms = []
    doclens = np.concatenate([r.doc_lens for r in readers]).astype(np.int32)
    pos_cells = None
    if store_positions and out_terms:
        pos_cells = []
        for t in out_terms:
            parts = []
            for r in readers:
                row = r._term_row.get(t)
                if row is not None and "positions" in r._cells:
                    parts.append(r._cell("positions", row).tobytes())
            pos_cells.append(b"".join(parts))
    part_ids: list[int] = []
    lineage: list = []
    for s in ids:
        m = read_json(segment_manifest_path(index_dir, s))
        part_ids.extend(m.get("part_ids", []))
        lineage.extend(m.get("lineage", []))
    info = {"doc_id_base": base, "num_docs": int(expect - base),
            "part_ids": part_ids, "lineage": lineage}
    asm = SegmentAssembler(index_dir, {new_id: info}, codec, block_size)
    return asm._write_segment(
        new_id, info, doclens, out_terms, out_df, tstarts, slots_flat,
        tfs_flat, pos_cells=pos_cells,
    )


def _remove_segment_files(index_dir: str, seg_ids: list[int]) -> None:
    from ..state.manifest import segment_manifest_path
    from ..state.segment import doclen_path, segment_path

    for s in seg_ids:
        for p in (
            segment_path(index_dir, s),
            doclen_path(index_dir, s),
            os.path.join(index_dir, "df", f"seg-{s:05d}.parquet"),
            segment_manifest_path(index_dir, s),
        ):
            if os.path.exists(p):
                os.remove(p)


_merge_group_task = ray.remote(_merge_group)


def merge_segments(index_dir: str, seg_ids: list[int] | None = None,
                   target_docs: int | None = None) -> dict:
    """Tiered segment merge (Lucene merge-policy analogue): consolidate
    runs of adjacent small segments — the natural debris of incremental
    ``extend_index`` adds — into larger ones WITHOUT a full rebuild.
    Collection stats, global df, tombstones and query results are all
    invariant under merging (doc ids and postings are preserved, only
    their segment packaging changes).

    ``seg_ids``: merge exactly that adjacent group; otherwise greedy
    adjacent grouping (in doc_id_base order) so merged segments hold <=
    ``target_docs`` docs (default 8x the config's ``docs_per_segment``).
    Groups are independent -> one Ray task each (same parallel shape as
    ``compact_index``).  Run as offline maintenance: reload engines after.

    Crash-safe two-phase commit: every group writes its merged segment
    under a FRESH seg id; member files are untouched until the manifest
    is atomically rewritten to the new segment list.  A failed task or a
    driver death mid-run leaves the old manifest pointing at intact old
    files (stray fresh-id files are unreferenced garbage, overwritten on
    retry); a death after the manifest write leaves a fully valid new
    index with unreferenced member files.
    """
    mpath = os.path.join(index_dir, "manifest.json")
    manifest = read_json(mpath)
    cfg = BuildConfig(**manifest["config"])
    all_ids = sorted(int(s) for s in manifest["segments"])
    from ..state.manifest import segment_manifest_path

    # greedy grouping must follow DOC order, not id order: fresh-id merges
    # mean seg ids no longer ascend with doc_id_base
    seg_meta = {
        s: read_json(segment_manifest_path(index_dir, s)) for s in all_ids
    }
    doc_order = sorted(all_ids, key=lambda s: int(seg_meta[s]["doc_id_base"]))
    if seg_ids is not None:
        groups = [sorted(int(s) for s in seg_ids)]
    else:
        td = target_docs or cfg.docs_per_segment * 8
        groups = []
        cur: list[int] = []
        cur_docs = 0
        for s in doc_order:
            nd = int(seg_meta[s]["num_docs"])
            if cur and cur_docs + nd > td:
                groups.append(cur)
                cur, cur_docs = [], 0
            cur.append(s)
            cur_docs += nd
        if cur:
            groups.append(cur)
    jobs = [g for g in groups if len(g) > 1]
    next_id = max(all_ids, default=-1) + 1
    job_new_ids = list(range(next_id, next_id + len(jobs)))
    if jobs:
        ray.get([
            _merge_group_task.remote(
                index_dir, g, cfg.codec, cfg.block_size,
                bool(cfg.store_positions), nid,
            )
            for g, nid in zip(jobs, job_new_ids)
        ])
    merged_members = {s for g in jobs for s in g}
    new_segments = sorted(
        (set(all_ids) - merged_members) | set(job_new_ids)
    )
    manifest["segments"] = new_segments
    atomic_write_json(mpath, manifest)  # the commit point
    _remove_segment_files(index_dir, sorted(merged_members))
    spath = os.path.join(index_dir, "stats.json")
    if os.path.exists(spath):
        stats = read_json(spath)
        if "num_segments" in stats:
            stats["num_segments"] = len(new_segments)
            atomic_write_json(spath, stats)
    return {"groups_merged": len(jobs), "segments": new_segments}


def add_tombstones(index_dir: str, doc_ids: list[int]) -> dict:
    """Mark docs deleted (``update_index`` remove path): results exclude them
    immediately; collection stats stay as-built until a compaction/rebuild
    (Lucene-style tombstoning)."""
    path = os.path.join(index_dir, "manifest.json")
    manifest = read_json(path)
    tomb = sorted(set(manifest.get("tombstones", [])) | set(int(d) for d in doc_ids))
    manifest["tombstones"] = tomb
    atomic_write_json(path, manifest)
    return manifest


def compact_index(index_dir: str) -> dict:
    """Purge tombstoned docs from every affected segment (Lucene-style
    compaction): postings/tfs/positions filtered, block-max metadata and
    doc-length arrays rewritten, df parts refreshed, collection stats
    re-finalized with the post-delete N/avgdl, tombstone list cleared.

    Segments are independent, so compaction is an embarrassingly parallel
    ``map_batches`` over segment ids."""
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    tombs = manifest.get("tombstones", [])
    seg_ids = manifest["segments"]
    config = BuildConfig(**manifest["config"])
    if tombs:
        tomb_ref = ray.put(sorted(tombs))
        index_dir_ = index_dir
        codec_ = config.codec
        block_size_ = config.block_size

        def compact_one(batch):
            import pyarrow as pa

            from ..stages.compact import compact_segment

            rows = []
            for sid in batch.column("seg_id").to_pylist():
                rows.append(
                    compact_segment(
                        index_dir_, int(sid), ray.get(tomb_ref), codec_,
                        block_size_,
                    )
                )
            return pa.table(
                {k: [r[k] for r in rows] for k in rows[0]}
            )

        ds = ray.data.from_items([{"seg_id": s} for s in seg_ids])
        ds.map_batches(
            compact_one, batch_size=1, batch_format="pyarrow"
        ).take_all()

        # docmap parts: drop tombstoned rows so list_indexed_files / url
        # lookups reflect physical deletion once the tombstone list clears
        dm_dir = os.path.join(index_dir, "docmap")
        part_names = sorted(
            f for f in os.listdir(dm_dir) if f.endswith(".parquet")
        )
        tomb_arr_ref = tomb_ref  # same sorted list: one broadcast object

        def filter_docmap_part(batch):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            tomb_arr = pa.array(ray.get(tomb_arr_ref), pa.int64())
            out_rows = []
            for name in batch.column("name").to_pylist():
                path = os.path.join(dm_dir, name)
                t = pq.read_table(path)
                mask = pc.invert(
                    pc.is_in(t.column("doc_id"), value_set=tomb_arr)
                )
                t2 = t.filter(mask)
                if t2.num_rows != t.num_rows:
                    tmp = path + ".tmp"
                    pq.write_table(t2, tmp)
                    os.replace(tmp, path)
                out_rows.append(t.num_rows - t2.num_rows)
            return pa.table({"removed": pa.array(out_rows, pa.int64())})

        ray.data.from_items(
            [{"name": n} for n in part_names]
        ).map_batches(
            filter_docmap_part, batch_size=8, batch_format="pyarrow"
        ).take_all()
    return _finalize(
        index_dir, config, seg_ids, {}, 0, tombstones=[]
    )


@ray.remote(num_cpus=0)
def _warm_worker() -> bool:
    """Pre-pay the import chain in a fresh Ray task worker.

    The first task a brand-new worker process runs pays the full
    numpy/pyarrow/engine import (~4 s on a contended VM) INSIDE its task
    wall-time; launched concurrently (num_cpus=0 so they don't take slots
    from the tokenize actor pool) while tokenize runs, these force the
    worker pool to spawn + import ahead of the assemble wave.  Measured
    effect: the assemble stage's 2-3 first-wave ~4 s straggler tasks drop
    to the ~0.2 s steady-state, and the stage's 2->8-CPU scaling stops
    being gated by a constant straggler floor."""
    import pyarrow.compute  # noqa: F401

    from ..functions import vbyte  # noqa: F401
    from ..stages.postings import RUN_SCHEMA, SegmentAssembler  # noqa: F401

    return True


def _build_route_pipelined(
    index_dir: str,
    config: BuildConfig,
    pending: list[SegmentSpec],
    infos: dict,
    n_cpus: int,
    timings: dict,
) -> list[dict]:
    """shuffle='route' executor: fully PIPELINED tokenize→assemble on ONE
    warm actor pool with driver-side work-stealing dispatch.

    The partition→segment mapping is static (every partition spec carries
    its seg_id), so there is nothing to shuffle OR probe.  Exactly
    ``n_cpus`` actors (num_cpus=1 — honest core accounting, no
    oversubscription) run BOTH kinds of work: the driver keeps each
    actor's queue at ≤2 in-flight tasks and dispatches, assemble-first,
    whichever job is ready — so the moment a segment's last partition
    lands, its assembly starts on the next free warm actor (ObjectRefs
    passed through, zero-copy plasma reads) while other actors are still
    tokenizing.  No whole-corpus materialize barrier, no sort exchange,
    and no cold task workers: the pool paid the import once, so the
    cold-start stragglers that gated the old probe-based route's assemble
    wave (~4 s first task per fresh worker) cannot occur.  Wall-clock →
    (tokenize_work + assemble_work) / n_cpus + last-segment tail.
    """
    from collections import deque

    t0 = time.perf_counter()
    TokActor = ray.remote(num_cpus=1)(TokenizePartition)
    n_parts = sum(len(s.partitions) for s in pending)
    n_act = min(n_cpus, max(1, n_parts))

    def _make_actor():
        return TokActor.remote(
            index_dir=index_dir,
            text_column=config.text_column,
            prefix_columns=list(config.prefix_columns),
            url_column=config.url_column,
            lang_column=config.lang_column,
            lang_filter=config.lang_filter,
            analyzer=config.analyzer,
            emit="runs",
            store_positions=config.store_positions,
            facet_columns=list(config.facet_columns),
            store_source=config.store_source,
            fault_inject_path=config.fault_inject_path,
            fault_inject_mode=config.fault_inject_mode,
        )

    actors = [_make_actor() for _ in range(n_act)]
    infos_ref = ray.put(infos)
    seg_need: dict[int, set] = {
        s.seg_id: {p.part_id for p in s.partitions} for s in pending
    }
    seg_runs: dict[int, list] = {s.seg_id: [] for s in pending}
    # fault tolerance: per-segment retry bookkeeping.  A dead actor loses
    # its in-flight tok runs (plasma objects owned by a lost worker), so
    # the recovery unit is the SEGMENT — re-enqueue all its partitions and
    # bump its epoch; completions stamped with a stale epoch are dropped.
    seg_specs: dict[int, list] = {
        s.seg_id: [p.to_row() for p in s.partitions] for s in pending
    }
    seg_part_ids: dict[int, list] = {
        s.seg_id: [p.part_id for p in s.partitions] for s in pending
    }
    seg_epoch: dict[int, int] = {}
    seg_retries: dict[int, int] = {}
    # Dispatch unit = a chunk of same-segment partitions: driver-side task
    # submission is ~1 ms of driver CPU each, so one task PER PARTITION
    # makes the driver the bottleneck past ~10^4 partitions (measured 80%
    # driver CPU at 10k).  Cap the task count at ~64 per actor; chunks
    # never cross segments (run bookkeeping and assemble readiness stay
    # per-segment), and the assembler is run-order-insensitive.
    chunk = max(1, -(-n_parts // (n_act * 64)))
    jobs_tok: deque = deque()
    for s in pending:
        parts_ = s.partitions
        for i in range(0, len(parts_), chunk):
            grp = parts_[i : i + chunk]
            jobs_tok.append(
                ([p.to_row() for p in grp], s.seg_id,
                 [p.part_id for p in grp])
            )
    jobs_asm: deque = deque()
    load = [0] * n_act
    ref_meta: dict = {}

    def dispatch():
        progressed = True
        while progressed and (jobs_asm or jobs_tok):
            progressed = False
            a = min(range(n_act), key=load.__getitem__)
            if load[a] >= 2:
                break
            if jobs_asm:  # assemble-priority: frees plasma runs earliest
                seg_id, refs = jobs_asm.popleft()
                r = actors[a].assemble_segment.remote(
                    seg_id, infos_ref, config.codec, config.block_size,
                    *refs,
                )
                ref_meta[r] = (
                    a, actors[a], "asm", (seg_id, seg_epoch.get(seg_id, 0))
                )
            else:
                specs, seg_id, part_ids = jobs_tok.popleft()
                r = actors[a].process_specs.remote(specs)
                ref_meta[r] = (
                    a, actors[a], "tok",
                    (seg_id, part_ids, seg_epoch.get(seg_id, 0)),
                )
            load[a] += 1
            progressed = True

    def _is_loss(err: BaseException) -> bool:
        """True iff the failure means LOST WORK (actor/node/object loss)
        rather than a deterministic application bug — only loss is worth
        a segment retry; a real bug must surface immediately."""
        rex = ray.exceptions
        loss_types = tuple(
            t
            for t in (
                getattr(rex, "RayActorError", None),
                getattr(rex, "ActorDiedError", None),
                getattr(rex, "ObjectLostError", None),
                getattr(rex, "OwnerDiedError", None),
                getattr(rex, "ObjectReconstructionFailedError", None),
            )
            if t is not None
        )
        if isinstance(err, loss_types):
            return True
        if isinstance(err, rex.RayTaskError):
            return isinstance(getattr(err, "cause", None), loss_types)
        return False

    def _revive_actors() -> int:
        """Probe the pool IN PARALLEL and replace actors whose ping errors
        with RayActorError (dead).  A busy actor's ping merely queues
        behind its in-flight task and stays not-ready within the wait
        window — it is left alone (a timeout is NOT death).  In-flight
        refs of a dead actor surface as errored completions and are
        handled per-segment."""
        pings = {actors[i].ping.remote(): i for i in range(n_act)}
        ready, _ = ray.wait(
            list(pings), num_returns=len(pings), timeout=5.0
        )
        replaced = 0
        for r in ready:
            i = pings[r]
            try:
                ray.get(r)
            except ray.exceptions.RayActorError:
                actors[i] = _make_actor()
                load[i] = 0
                replaced += 1
        return replaced

    def _requeue_segment(seg_id: int, cause: BaseException | None = None):
        """Re-tokenize a whole segment after an assemble failure (lost run
        objects).  Epoch bump invalidates any stale in-flight completions
        for the segment."""
        n_retry = seg_retries.get(seg_id, 0) + 1
        if n_retry > 3:
            raise RuntimeError(
                f"segment {seg_id} failed {n_retry - 1} rebuild retries"
            ) from cause
        seg_retries[seg_id] = n_retry
        seg_epoch[seg_id] = seg_epoch.get(seg_id, 0) + 1
        seg_runs[seg_id] = []
        seg_need[seg_id] = set(seg_part_ids[seg_id])
        specs = seg_specs[seg_id]
        pids = seg_part_ids[seg_id]
        for i in range(0, len(specs), chunk):
            jobs_tok.append(
                (specs[i : i + chunk], seg_id, pids[i : i + chunk])
            )

    dispatch()
    seg_stats: list[dict] = []
    tok_left = n_parts
    t_last_tok = t0
    cpu0 = time.process_time()
    while ref_meta:
        # in-flight refs are bounded by 2*n_act, so each wait call is
        # O(actors) — but completions arrive in bursts, so after the one
        # blocking wait, drain EVERYTHING already finished with a
        # zero-timeout wait: the driver pays ~1 round-trip per burst
        # instead of one per task (the 10^7-partition scaling concern)
        refs = list(ref_meta)
        # fetch_local=False: the driver only observes COMPLETION — tok
        # run tables (the corpus's shuffle bytes) flow straight to the
        # assemble actors; pulling each one into the head node's object
        # store first would pressure head memory and double the network
        # transfer on a multi-node cluster
        done, rest = ray.wait(refs, num_returns=1, fetch_local=False)
        if rest:
            more, _ = ray.wait(rest, num_returns=len(rest), timeout=0,
                               fetch_local=False)
            done.extend(more)
        for r in done:
            a, handle, kind, meta = ref_meta.pop(r)
            if actors[a] is handle:  # slot may hold a replacement actor
                load[a] = max(0, load[a] - 1)
            if kind == "tok":
                seg_id, part_ids, ep = meta
                if ep != seg_epoch.get(seg_id, 0):
                    continue  # completion from before a segment requeue
                seg_runs[seg_id].append(r)
                need = seg_need[seg_id]
                need.difference_update(part_ids)
                if not need:
                    jobs_asm.append((seg_id, seg_runs.pop(seg_id)))
                tok_left = max(0, tok_left - len(part_ids))
                if tok_left == 0:
                    t_last_tok = time.perf_counter()
            else:
                seg_id, ep = meta
                try:
                    st = ray.get(r)
                except ray.exceptions.RayError as err:
                    if not _is_loss(err):
                        raise  # deterministic bug — surface immediately
                    # assemble died (actor loss) or one of its input run
                    # objects was lost with a dead tokenizer: replace dead
                    # actors, re-tokenize the segment (bounded work — one
                    # segment's partitions), epoch-invalidate stragglers
                    _revive_actors()
                    if ep == seg_epoch.get(seg_id, 0):
                        tok_left += len(seg_specs[seg_id])
                        _requeue_segment(seg_id, err)
                    continue
                if ep == seg_epoch.get(seg_id, 0):
                    seg_stats.append(st)
        dispatch()
    # free the reserved cores BEFORE finalize (its distributed df pass is
    # a Ray Data job that needs them)
    for a in actors:
        ray.kill(a)
    timings["tokenize_sec"] = t_last_tok - t0
    # overlapped stages: "assemble" here is only the post-tokenize TAIL
    timings["shuffle_assemble_sec"] = time.perf_counter() - t_last_tok
    # dispatcher health: driver-side CPU burned by the dispatch loop vs
    # the loop's wall time (must stay a small fraction — the driver is
    # the one non-scalable resource)
    timings["dispatch_wall_sec"] = time.perf_counter() - t0
    timings["driver_cpu_sec"] = time.process_time() - cpu0
    return seg_stats


def _execute_build(
    index_dir: str,
    config: BuildConfig,
    segs: list[SegmentSpec],
    resume: bool = True,
    extra_seg_ids: list[int] | None = None,
    tombstones: list[int] | None = None,
    persist_config: BuildConfig | None = None,
) -> dict:
    t_start = time.perf_counter()
    infos = _seg_infos(segs)

    def _resume_ok(seg) -> bool:
        """Reuse a finished segment ONLY when its manifest's recorded
        lineage (input paths, row-group ranges, row counts, doc bases)
        matches what the CURRENT plan would build — file existence alone
        would happily serve a previous input's documents under this
        plan's doc ids after a retried extend with different files or a
        modified source parquet."""
        if not segment_is_done(index_dir, seg.seg_id):
            return False
        try:
            m = read_json(segment_manifest_path(index_dir, seg.seg_id))
        except (OSError, ValueError):
            return False
        return (
            m.get("lineage") == infos[seg.seg_id]["lineage"]
            and m.get("doc_id_base") == seg.doc_id_base
            and m.get("num_docs") == seg.num_docs
        )

    pending = [s for s in segs if not (resume and _resume_ok(s))]
    skipped = len(segs) - len(pending)

    if config.shuffle not in ("route", "combine", "segment", "sort"):
        # an unknown mode would otherwise silently fall through the
        # if/elif chain into the most expensive whole-corpus sort path
        raise ValueError(
            f"unknown shuffle mode {config.shuffle!r} "
            "(expected route/combine/segment/sort)")
    if config.store_positions and config.shuffle not in ("combine", "route"):
        raise ValueError("store_positions requires shuffle='combine' or 'route'")

    timings: dict[str, float] = {}
    if pending:
        avail = max(1, int(ray.cluster_resources().get("CPU", 8)))
        n_cpus = config.tokenize_concurrency or avail
        # clamp to placeable CPUs: the route dispatcher binds work to
        # num_cpus=1 actors by load — actors the cluster can never place
        # would hold their assignments pending forever (a silent hang);
        # the Ray Data paths degrade gracefully but gain nothing from
        # phantom concurrency either
        n_cpus = min(int(n_cpus), avail)

        if config.shuffle == "route":
            # no warm task workers and no items/seg_bases staging here:
            # the pipelined route path assembles on the same warm
            # tokenize actors (no cold task workers), and its rare
            # distributed-df finalize pass is after the build anyway
            seg_stats = _build_route_pipelined(
                index_dir, config, pending, infos, int(n_cpus), timings
            )
            timings["pipeline_sec"] = time.perf_counter() - t_start
            stats_ds = None
            return _finish_build(
                index_dir, config, segs, pending, infos, seg_stats, stats_ds,
                timings, skipped, extra_seg_ids, tombstones, persist_config,
            )

        items = [p.to_row() for s in pending for p in s.partitions]
        seg_bases = np.zeros(max(infos) + 1, dtype=np.int64)
        for sid, info in infos.items():
            seg_bases[sid] = info["doc_id_base"]
        codec = config.codec

        # spawn+import fresh task workers for the assemble wave while the
        # actor pool tokenizes (see _warm_worker) — one per expected
        # concurrent assemble task
        warm_futs = [
            _warm_worker.remote()
            for _ in range(min(int(n_cpus), max(1, len(pending))))
        ]

        ds = ray.data.from_items(items)
        tokenized = ds.map_batches(
            TokenizePartition,
            fn_constructor_kwargs=dict(
                index_dir=index_dir,
                text_column=config.text_column,
                prefix_columns=list(config.prefix_columns),
                url_column=config.url_column,
                lang_column=config.lang_column,
                lang_filter=config.lang_filter,
                analyzer=config.analyzer,
                emit="runs" if config.shuffle in ("combine", "route") else "triples",
                store_positions=config.store_positions,
                facet_columns=list(config.facet_columns),
                store_source=config.store_source,
            ),
            batch_size=1,
            batch_format="pyarrow",
            # fixed-size pool: autoscaling ramp-up costs ~3s at 8 CPUs
            concurrency=min(n_cpus, max(1, len(items))),
            num_cpus=1,
        )
        # Stage boundary before the all-to-all: the sort is a barrier anyway
        # (every triple must exist before reduce), and fusing the actor-pool
        # map with two back-to-back AllToAll ops measurably degrades the
        # streaming executor's scheduling (2-3x at 32 CPUs, see BASELINE.md).
        t_stage = time.perf_counter()
        tokenized = tokenized.materialize()
        timings["tokenize_sec"] = time.perf_counter() - t_stage
        ray.get(warm_futs)  # long done by now; surfaces warm-up errors

        # Stateless assembly tasks (warm-worker reuse, no actor-pool ramp-up;
        # a fixed-size actor pool here would also reserve every CPU and
        # starve the groupby's own sort tasks — observed deadlock).  The
        # segment-info map is broadcast once via ray.put, not per task.
        infos_ref = ray.put(infos)
        index_dir_ = index_dir
        codec_ = config.codec
        block_size_ = config.block_size

        stats_ds = None  # set by the groupby strategies
        if config.shuffle == "combine":
            t_stage = time.perf_counter()

            def assemble_runs(batch):
                asm = SegmentAssembler(
                    index_dir_, ray.get(infos_ref), codec_, block_size_
                )
                return asm(batch)

            stats_ds = tokenized.groupby("seg").map_groups(
                assemble_runs, batch_format="pyarrow"
            )
            seg_stats = stats_ds.take_all()
            timings["shuffle_assemble_sec"] = time.perf_counter() - t_stage
        elif config.shuffle == "segment":
            t_stage = time.perf_counter()

            def assemble_raw(batch):
                asm = SegmentAssembler(
                    index_dir_, ray.get(infos_ref), codec_, block_size_
                )
                return asm.assemble_raw_group(batch)

            stats_ds = tokenized.groupby("seg").map_groups(
                assemble_raw, batch_format="pyarrow"
            )
            seg_stats = stats_ds.take_all()
            timings["shuffle_assemble_sec"] = time.perf_counter() - t_stage
        else:
            t_stage = time.perf_counter()
            sorted_triples = tokenized.sort(["th", "doc_id"])
            runs = sorted_triples.map_batches(
                lambda b: encode_runs_block(b, seg_bases=seg_bases),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            ).materialize()
            timings["shuffle_encode_sec"] = time.perf_counter() - t_stage

            t_stage = time.perf_counter()

            def assemble_group(batch):
                asm = SegmentAssembler(
                    index_dir_, ray.get(infos_ref), codec_, block_size_
                )
                return asm(batch)

            stats_ds = runs.groupby("seg").map_groups(
                assemble_group, batch_format="pyarrow"
            )
            seg_stats = stats_ds.take_all()
            timings["assemble_sec"] = time.perf_counter() - t_stage
        timings["pipeline_sec"] = time.perf_counter() - t_start
        return _finish_build(
            index_dir, config, segs, pending, infos, seg_stats, stats_ds,
            timings, skipped, extra_seg_ids, tombstones, persist_config,
        )

    return _finish_build(
        index_dir, config, segs, [], infos, [], None, timings, skipped,
        extra_seg_ids, tombstones, persist_config,
    )


def _finish_build(
    index_dir: str,
    config: BuildConfig,
    segs: list[SegmentSpec],
    pending: list[SegmentSpec],
    infos: dict,
    seg_stats: list[dict],
    stats_ds,
    timings: dict,
    skipped: int,
    extra_seg_ids: list[int] | None,
    tombstones: list[int] | None,
    persist_config: BuildConfig | None,
) -> dict:
    """Shared build epilogue: per-stage metrics, empty-segment files for
    zero-triple segments, and the finalize pass."""
    if pending:
        # Per-stage Ray Data metrics emitted alongside the segment manifests
        # (north_star: the reference's benchmarking harness re-expressed as
        # per-stage metrics).
        try:
            metrics_dir = os.path.join(index_dir, "metrics")
            os.makedirs(metrics_dir, exist_ok=True)
            with open(os.path.join(metrics_dir, "build_stage_stats.txt"), "w") as f:
                if stats_ds is not None:
                    f.write(stats_ds.stats())
            atomic_write_json(
                os.path.join(metrics_dir, "build_timings.json"), timings
            )
        except Exception:
            pass  # metrics are best-effort; never fail a build over them

        # Segments that produced zero triples still need (empty) files.
        done_ids = {int(r["seg_id"]) for r in seg_stats}
        for s in pending:
            if s.seg_id not in done_ids:
                _write_empty_segment(index_dir, s.seg_id, infos[s.seg_id], config)

    all_seg_ids = sorted({s.seg_id for s in segs} | set(extra_seg_ids or []))
    manifest = _finalize(
        index_dir, persist_config or config, all_seg_ids, timings, skipped,
        tombstones or [],
    )
    return manifest


def _write_empty_segment(index_dir: str, seg_id: int, info: dict,
                         config: BuildConfig) -> None:
    import pyarrow as pa

    asm = SegmentAssembler(index_dir, {seg_id: info}, config.codec,
                          config.block_size)
    doclens = asm._load_doclens(info)
    e = np.empty(0, dtype=np.int64)
    asm._write_segment(seg_id, info, doclens, pa.array([], pa.large_string()), e, e, e, e)


# terms per df_global shard file (driver fast path; the distributed path
# shards by sorted write blocks).  Module-level so tests can force >1 shard.
DF_SHARD_ROWS = 1 << 17


def _write_df_shard_index(df_global_dir: str) -> None:
    """Shard index for the term-sorted, range-sharded df_global parquet:
    [{file, lo, hi}] ordered by term range.  Parquet footer column stats
    only — no data read.  UTF-8 byte order == Python code-point order, so
    query-side bisect on these boundaries is consistent with the sort."""
    import pyarrow.parquet as pq

    from ..state.manifest import atomic_write_json

    shards = []
    for f in sorted(os.listdir(df_global_dir)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(df_global_dir, f)).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # term is the first column
            st = col.statistics
            if st is None or st.min is None:
                continue
            mn = st.min.decode() if isinstance(st.min, bytes) else st.min
            mx = st.max.decode() if isinstance(st.max, bytes) else st.max
            lo = mn if lo is None or mn < lo else lo
            hi = mx if hi is None or mx > hi else hi
        if lo is not None:
            shards.append({"file": f, "lo": lo, "hi": hi})
    shards.sort(key=lambda s: s["lo"])
    atomic_write_json(
        os.path.join(df_global_dir, "_df_shards.json"), {"shards": shards}
    )


def _finalize(index_dir: str, config: BuildConfig, seg_ids: list[int],
              timings: dict, skipped: int,
              tombstones: list[int] | None = None) -> dict:
    t0 = time.perf_counter()
    seg_manifests = []
    for sid in seg_ids:
        seg_manifests.append(
            read_json(os.path.join(index_dir, "manifests", f"seg-{sid:05d}.json"))
        )
    doc_count = sum(m["kept_docs"] for m in seg_manifests)
    total_tokens = sum(m["total_tokens"] for m in seg_manifests)
    avgdl = total_tokens / doc_count if doc_count else 0.0

    # Dedicated global-stats aggregate pass: df = sum of per-segment dfs.
    # Small inputs take a driver-side Arrow fast path; above the threshold
    # the same aggregation runs as a distributed Ray Data groupby.
    df_dir = os.path.join(index_dir, "df")
    df_global_dir = os.path.join(index_dir, "df_global")
    # ONLY this build's segments' df parts (deterministic filenames):
    # df/ may hold leftovers from a crashed extend, an interrupted
    # merge, or a prior larger build into the same dir — summing the
    # whole directory would double-count shared terms and silently
    # corrupt every idf (query.py's segment loader defends against the
    # same leftovers; the finalize pass must too)
    df_files = [
        f"seg-{sid:05d}.parquet" for sid in seg_ids
        if os.path.exists(os.path.join(df_dir, f"seg-{sid:05d}.parquet"))
    ]
    if df_files:
        total_bytes = sum(
            os.path.getsize(os.path.join(df_dir, f)) for f in df_files
        )
        import shutil

        shutil.rmtree(df_global_dir, ignore_errors=True)  # re-finalize cleanly
        os.makedirs(df_global_dir, exist_ok=True)
        df_paths = [os.path.join(df_dir, f) for f in df_files]
        if total_bytes < 256 * 1024 * 1024:
            import pyarrow as pa
            import pyarrow.parquet as pq

            t = pa.concat_tables(pq.read_table(fp) for fp in df_paths)
            agg = pa.TableGroupBy(t, "term").aggregate([("df", "sum")])
            # select by NAME: aggregate column order flipped across pyarrow
            # majors (key-first vs aggregates-first) — a positional rename
            # would silently swap term/df
            agg = agg.select(["term", "df_sum"]).rename_columns(
                ["term", "df"]
            ).sort_by("term")
            # term-range shards: cold-term df at query time is ONE shard
            # read (binary search on the shard index), not an all-searcher
            # gather
            for i in range(0, max(agg.num_rows, 1), DF_SHARD_ROWS):
                pq.write_table(
                    agg.slice(i, DF_SHARD_ROWS),
                    os.path.join(df_global_dir, f"df-{i // DF_SHARD_ROWS:05d}.parquet"),
                )
        else:
            df_ds = ray.data.read_parquet(df_paths)
            agg = df_ds.groupby("term").sum("df")
            # select by NAME like the fast path — a positional rename
            # would silently swap term/df if a Ray Data / pyarrow major
            # flips the aggregate column order
            agg = agg.map_batches(
                lambda t: t.select(["term", "sum(df)"]).rename_columns(
                    ["term", "df"]),
                batch_format="pyarrow",
            )
            # global sort -> each written file is a disjoint term range
            agg.sort("term").write_parquet(df_global_dir)
        _write_df_shard_index(df_global_dir)
    timings["finalize_sec"] = time.perf_counter() - t0

    stats = {
        "identifier": config.identifier,
        "doc_count": doc_count,
        "total_tokens": total_tokens,
        "avg_doc_length": avgdl,
        "num_segments": len(seg_ids),
        "unique_terms_per_segment": [m["n_terms"] for m in seg_manifests],
        "n_postings": sum(m["n_postings"] for m in seg_manifests),
        "postings_bytes": sum(m["postings_bytes"] for m in seg_manifests),
        "uncompressed_postings_bytes": sum(
            m["uncompressed_postings_bytes"] for m in seg_manifests
        ),
        "segment_bytes": sum(m["segment_bytes"] for m in seg_manifests),
        "segments_skipped_resume": skipped,
        "timings": timings,
        "config": asdict(config),
        # v2 = deltas-only positions cells (count == tf); readers of a
        # positions-bearing index must see this marker (layout v1 interleaved
        # [npos, deltas...] streams would silently misdecode)
        "positions_layout": 2 if config.store_positions else None,
    }
    atomic_write_json(os.path.join(index_dir, "stats.json"), stats)
    manifest = dict(stats)
    manifest["segments"] = [m["seg_id"] for m in seg_manifests]
    manifest["tombstones"] = sorted(tombstones or [])
    atomic_write_json(os.path.join(index_dir, "manifest.json"), manifest)
    return manifest
