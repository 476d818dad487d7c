"""Composed training-data curation pipeline — the end-to-end shape a
100 TB pretraining-data run takes, built from the ops in this package:

    read -> quality filter (inline Arrow-mask, payload streams through)
         -> exact-dedup keep decision (broadcast dup-group map, join fallback)
         -> (optional) MinHash near-dup drop (broadcast id set, join fallback)
         -> resumable partitioned parquet out + per-stage kept/dropped counts

Execution strategy is SIZE-AWARE, picked at runtime per drop-set:

* The drop sets are small in any realistic corpus — the exact-dup GROUP
  table is proportional to the duplicate rate (not corpus size), and the
  MinHash output is only the marked near-dups.  Each is probed with
  ``limit(max+1).take_all()`` (one early-stopping execution); when it fits
  under ``broadcast_max_rows`` it is ``ray.put`` once and every keep
  decision happens inline in ONE streaming ``map_batches`` pass over the
  corpus — no join shuffle at all.
* When a probe overflows (pathological dup rate x corpus size), that side
  falls back to the hash-partitioned semi-/anti-``Dataset.join`` — the
  payload still never reaches the driver.

Either way the quality filter is a vectorized per-batch mask, never a
per-row Python lambda, and the only driver-side values are the probed
small tables and the stage counters.  Output is written as partitioned
Parquet (one file per block); a retried run replaces the output directory
wholesale (Ray's write_parquet appends into existing dirs).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _text_hash128, exact_dedup, exact_dup_groups, minhash_lsh_dedup
from .textstats import quality_feature_arrays

# Max drop-set rows pinned per worker via ray.put.  256k dup-group entries
# ≈ tens of MB as a Python dict — cheap against one join shuffle.  At
# 10^12 docs x 1% dup rate the probe overflows and the join path runs.
BROADCAST_MAX_ROWS = 1 << 18


def _probe_small(ds: ray.data.Dataset, max_rows: int) -> list | None:
    """One early-stopping execution: the full result if it has at most
    ``max_rows`` rows, else None (caller takes the join fallback)."""
    rows = ds.limit(max_rows + 1).take_all()
    return rows if len(rows) <= max_rows else None


_HKEY = np.dtype([("a", "<i8"), ("b", "<i8")])


def _broadcast_drop_arrays(rep_map, dup_set):
    """Convert the probed drop sets to sorted numpy arrays once,
    driver-side, so the per-batch membership checks are vectorized
    searchsorted / isin instead of per-row dict/set probes:
    (sorted structured (h1,h2) keys, aligned rep ids, sorted dup ids)."""
    if rep_map:
        keys = np.empty(len(rep_map), dtype=_HKEY)
        reps = np.empty(len(rep_map), dtype=np.int64)
        for i, ((a, b), r) in enumerate(rep_map.items()):
            keys[i] = (a, b)
            reps[i] = r
        order = np.argsort(keys)
        keys, reps = keys[order], reps[order]
    else:
        keys = np.empty(0, dtype=_HKEY)
        reps = np.empty(0, dtype=np.int64)
    dup_arr = (
        np.sort(np.fromiter(dup_set, dtype=np.int64, count=len(dup_set)))
        if dup_set
        else np.empty(0, dtype=np.int64)
    )
    return keys, reps, dup_arr


def _make_broadcast_masks(
    bref, text_col: str, id_col: str, min_quality: float, min_words: int
):
    """Per-batch (quality, representative, non-near-dup) mask closure over
    a ``ray.put`` :func:`_broadcast_drop_arrays` triple — the broadcast
    keep decision shared by :func:`curate` and :func:`curate_resumable`.
    All membership checks are vectorized (structured-key searchsorted for
    the rep map, sorted isin for the dup-id set)."""

    def _masks(batch: pa.Table):
        feats = quality_feature_arrays(batch.column(text_col))
        q = (feats["quality"] >= min_quality) & (feats["n_words"] >= min_words)
        keys, reps, dup_arr = ray.get(bref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rep = np.ones(ids.size, dtype=bool)
        near = np.ones(ids.size, dtype=bool)
        if keys.size:
            # hashing only rows that might be in a dup group is not
            # possible without the hash — blake2b per row is the cost
            # floor of content-equality either way
            h1, h2 = _text_hash128(batch.column(text_col).to_pylist())
            qk = np.empty(ids.size, dtype=_HKEY)
            qk["a"], qk["b"] = h1, h2
            pos = np.minimum(np.searchsorted(keys, qk), keys.size - 1)
            found = keys[pos] == qk
            rep &= ~(found & (reps[pos] != ids))
        if dup_arr.size:
            near &= ~np.isin(ids, dup_arr)
        return q, rep, near

    return _masks


def curate(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 3,
    near_dedup: bool = True,
    out_dir: str | None = None,
    num_partitions: int = 16,
    with_counts: bool = True,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> dict:
    """Returns per-stage counts + the surviving-rows Dataset (``kept_ds``).

    Keep criteria: quality >= min_quality AND n_words >= min_words AND
    doc is its duplicate-group representative (min doc_id) AND (optionally)
    not a MinHash near-duplicate of a smaller doc.

    ``num_partitions`` sizes the fallback join shuffle (≈ cluster cores at
    scale).  ``with_counts=False`` skips the stage counters (one extra
    counting pass in broadcast mode; full-pipeline scalar aggregates in
    join mode) for production runs that only want the output.
    """
    # -- probe the drop sets (each: one early-stopping pipeline execution) --
    grows = _probe_small(
        exact_dup_groups(ds, text_col=text_col, id_col=id_col),
        broadcast_max_rows,
    )
    rep_map = (
        {(int(r["h1"]), int(r["h2"])): r["rep"] for r in grows}
        if grows is not None
        else None
    )
    dup_set = None
    dups_ds = None
    if near_dedup:
        dups_ds = minhash_lsh_dedup(
            ds, text_col=text_col, id_col=id_col
        ).select_columns([id_col])
        drows = _probe_small(dups_ds, broadcast_max_rows)
        dup_set = {r[id_col] for r in drows} if drows is not None else None

    broadcast_all = rep_map is not None and (not near_dedup or dup_set is not None)

    if broadcast_all:
        # ---- single-pass streaming keep decision, zero join shuffles ----
        bref = ray.put(_broadcast_drop_arrays(rep_map, dup_set))
        _masks = _make_broadcast_masks(
            bref, text_col, id_col, min_quality, min_words
        )

        def keep_fn(batch: pa.Table) -> pa.Table:
            q, rep, near = _masks(batch)
            return batch.filter(pa.array(q & rep & near))

        kept = ds.map_batches(keep_fn, batch_format="pyarrow")

        total = n_quality = n_exact = n_after_exact = None
        if with_counts:
            # one extra streaming pass emitting 1-row partials; summed on
            # the driver (bounded by block count, not corpus size)
            def count_fn(batch: pa.Table) -> pa.Table:
                q, rep, near = _masks(batch)
                return pa.table(
                    {
                        "n": pa.array([len(q)], pa.int64()),
                        "nq": pa.array([int(q.sum())], pa.int64()),
                        "nqr": pa.array([int((q & rep).sum())], pa.int64()),
                    }
                )

            parts = ds.map_batches(count_fn, batch_format="pyarrow").take_all()
            total = sum(r["n"] for r in parts)
            n_quality = sum(r["nq"] for r in parts)
            n_after_exact = sum(r["nqr"] for r in parts)
            # representatives over the FULL corpus = total rows minus the
            # non-representative members of each dup group
            n_exact = total - sum(int(r["dupes"]) - 1 for r in grows)
    else:
        # ---- join fallback: payload never leaves the cluster ----
        total = ds.count() if with_counts else None

        def qfilter(batch: pa.Table) -> pa.Table:
            feats = quality_feature_arrays(batch.column(text_col))
            mask = (feats["quality"] >= min_quality) & (
                feats["n_words"] >= min_words
            )
            return batch.filter(pa.array(mask))

        q_keep = ds.map_batches(qfilter, batch_format="pyarrow")
        n_quality = q_keep.count() if with_counts else None

        reps = exact_dedup(ds, text_col=text_col, id_col=id_col).select_columns(
            [id_col]
        )
        n_exact = reps.count() if with_counts else None

        kept = q_keep.join(
            reps, join_type="left_semi", num_partitions=num_partitions,
            on=(id_col,),
        )
        n_after_exact = None
        if near_dedup:
            if with_counts:
                n_after_exact = kept.count()
            kept = kept.join(
                dups_ds, join_type="left_anti",
                num_partitions=num_partitions, on=(id_col,),
            )

    n_kept = None
    near_dropped = None
    if out_dir is not None:
        # Ray's write_parquet APPENDS into an existing dir; a retried run
        # would double every surviving row (and inflate the counts below),
        # so replace the output wholesale.  Partition-level resume would
        # need per-shard done-markers — not implemented; a rerun redoes the
        # write.  Refuse to clobber a directory curate() did not produce
        # (marker file check) — rmtree on an arbitrary caller path would
        # silently destroy unrelated data.
        import shutil

        marker = os.path.join(out_dir, ".esray_curate")
        if os.path.isdir(out_dir) and not os.path.exists(marker):
            raise ValueError(
                f"curate out_dir {out_dir!r} exists and was not produced by "
                "a prior curate run; remove it yourself or pass a fresh path"
            )
        shutil.rmtree(out_dir, ignore_errors=True)
        os.makedirs(out_dir, exist_ok=True)
        open(marker, "w").close()
        kept.write_parquet(out_dir)
        if with_counts:
            # metadata-only count over the written files — no re-execution
            n_kept = ray.data.read_parquet(out_dir).count()
        kept = ray.data.read_parquet(out_dir)
    elif with_counts:
        n_kept = kept.count()
    if with_counts and near_dedup:
        near_dropped = n_after_exact - n_kept

    return {
        "total": total,
        "after_quality": n_quality,
        "exact_dedup_reps": n_exact,
        "near_dups_dropped": near_dropped,
        "kept": n_kept,
        "kept_ds": kept,
    }


def _list_parquet_files(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, str):
        if os.path.isdir(input_path):
            return sorted(
                os.path.join(input_path, f)
                for f in os.listdir(input_path)
                if f.endswith(".parquet")
            )
        return [input_path]
    return sorted(input_path)


def curate_resumable(
    input_path: str | list[str],
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    min_words: int = 3,
    near_dedup: bool = True,
    files_per_shard: int = 4,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> dict:
    """Shard-resumable curation — same keep semantics as :func:`curate`,
    laid out for 100 TB runs that must survive preemption:

    * The global drop sets (exact-dup groups, MinHash near-dup ids) are
      computed ONCE and persisted under ``out_dir/_state/`` behind a done
      marker — a restarted run reloads them instead of re-shuffling the
      corpus.
    * The corpus is processed as SHARDS of whole input files; each shard
      writes to ``out_dir/shard=NNNNN/`` with a ``_done.json`` marker
      carrying its per-stage counts.  A restarted run skips marked shards
      wholesale — only the shard that was mid-flight is redone.
    * Counts are summed from the markers, so they are exact even across
      resumes.  ``kept_ds`` reads the shard directories (``_state`` is
      ignored by parquet discovery — '_'-prefixed).

    Broadcast-mode only: raises if a drop set overflows
    ``broadcast_max_rows`` (at that dup volume use :func:`curate`'s join
    path, which has no resumable-output variant yet)."""
    import json
    import shutil

    files = _list_parquet_files(input_path)
    if not files:
        raise ValueError(f"no parquet files under {input_path!r}")
    marker = os.path.join(out_dir, ".esray_curate")
    if os.path.isdir(out_dir) and os.listdir(out_dir) and not os.path.exists(marker):
        raise ValueError(
            f"curate out_dir {out_dir!r} exists and was not produced by "
            "a prior curate run; remove it yourself or pass a fresh path"
        )
    os.makedirs(out_dir, exist_ok=True)
    open(marker, "w").close()

    # ---- stage A (once): global drop sets, persisted ----
    state_dir = os.path.join(out_dir, "_state")
    state_done = os.path.join(state_dir, "_done.json")
    if not os.path.exists(state_done):
        shutil.rmtree(state_dir, ignore_errors=True)
        ds = ray.data.read_parquet(files)
        exact_dup_groups(ds, text_col=text_col, id_col=id_col).write_parquet(
            os.path.join(state_dir, "dupgroups")
        )
        # an EMPTY drop set writes no files at all — keep the dir so the
        # resume read below doesn't miss it (dup-free corpora are normal)
        os.makedirs(os.path.join(state_dir, "dupgroups"), exist_ok=True)
        if near_dedup:
            minhash_lsh_dedup(
                ds, text_col=text_col, id_col=id_col
            ).select_columns([id_col]).write_parquet(
                os.path.join(state_dir, "neardups")
            )
            os.makedirs(os.path.join(state_dir, "neardups"), exist_ok=True)
        with open(state_done + ".tmp", "w") as f:
            json.dump({"files": files, "near_dedup": near_dedup}, f)
        os.replace(state_done + ".tmp", state_done)

    def _read_state(name: str):
        d = os.path.join(state_dir, name)
        parts = (
            [os.path.join(d, f) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
            if os.path.isdir(d) else []
        )
        if not parts:
            return []  # empty drop set
        return _probe_small(ray.data.read_parquet(parts), broadcast_max_rows)

    grows = _read_state("dupgroups")
    if grows is None:
        raise ValueError(
            "exact-dup group table exceeds broadcast_max_rows; use curate()"
        )
    rep_map = {(int(r["h1"]), int(r["h2"])): r["rep"] for r in grows}
    dup_set = None
    if near_dedup:
        drows = _read_state("neardups")
        if drows is None:
            raise ValueError(
                "near-dup id set exceeds broadcast_max_rows; use curate()"
            )
        dup_set = {r[id_col] for r in drows}
    bref = ray.put(_broadcast_drop_arrays(rep_map, dup_set))
    _masks = _make_broadcast_masks(bref, text_col, id_col, min_quality, min_words)

    def keep_and_count(batch: pa.Table):
        q, rep, near = _masks(batch)
        return batch.filter(pa.array(q & rep & near)), (
            len(q), int(q.sum()), int((q & rep).sum()),
        )

    # ---- stage B: per-shard streaming pass, skip finished shards ----
    shards = [
        files[i : i + files_per_shard]
        for i in range(0, len(files), files_per_shard)
    ]
    totals = {"n": 0, "nq": 0, "nqr": 0, "kept": 0}
    redone = 0
    for si, fs in enumerate(shards):
        sdir = os.path.join(out_dir, f"shard={si:05d}")
        sdone = os.path.join(sdir, "_done.json")
        if os.path.exists(sdone):
            with open(sdone) as f:
                c = json.load(f)
        else:
            redone += 1
            shutil.rmtree(sdir, ignore_errors=True)  # write_parquet APPENDS
            # two bounded passes per shard: write kept rows, then 1-row
            # count partials (both stream; shard size bounds the work)
            sds = ray.data.read_parquet(fs)
            sds.map_batches(
                lambda b: keep_and_count(b)[0], batch_format="pyarrow"
            ).write_parquet(sdir)

            def count_fn(batch: pa.Table) -> pa.Table:
                n, nq, nqr = keep_and_count(batch)[1]
                return pa.table(
                    {
                        "n": pa.array([n], pa.int64()),
                        "nq": pa.array([nq], pa.int64()),
                        "nqr": pa.array([nqr], pa.int64()),
                    }
                )

            parts = (
                ray.data.read_parquet(fs)
                .map_batches(count_fn, batch_format="pyarrow")
                .take_all()
            )
            c = {
                "n": sum(r["n"] for r in parts),
                "nq": sum(r["nq"] for r in parts),
                "nqr": sum(r["nqr"] for r in parts),
                "kept": ray.data.read_parquet(sdir).count(),
                "files": fs,
            }
            with open(sdone + ".tmp", "w") as f:
                json.dump(c, f)
            os.replace(sdone + ".tmp", sdone)
        for k in ("n", "nq", "nqr", "kept"):
            totals[k] += c[k]

    # parquet discovery skips '_'/'.'-prefixed entries, so _state, the
    # markers and .esray_curate are invisible here — only shard data reads
    kept_ds = ray.data.read_parquet(out_dir)
    return {
        "total": totals["n"],
        "after_quality": totals["nq"],
        "exact_dedup_reps": totals["n"] - sum(int(r["dupes"]) - 1 for r in grows),
        "near_dups_dropped": (totals["nqr"] - totals["kept"]) if near_dedup else None,
        "kept": totals["kept"],
        "kept_ds": kept_ds,
        "shards": len(shards),
        "shards_redone": redone,
    }
