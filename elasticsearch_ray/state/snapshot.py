"""Snapshot / restore for index directories (the ES `_snapshot` API
surface, re-expressed for a shared-storage immutable-segment design).

Why this is trivially consistent here and NOT in ES: segments are
immutable once their lineage manifest commits, and `manifest.json` is
the single atomic commit point (`atomic_write_json`).  A snapshot
therefore reads the manifest ONCE, copies exactly the files that
manifest references, and writes its own manifest copy LAST — so a
snapshot taken while a build/extend/merge is running is simply the last
committed view, never a torn one.  Restore validates the inventory
(every referenced segment + per-segment manifest present, sizes intact)
before it will place a manifest at the destination, so a partial copy
can never masquerade as a live index.
"""

from __future__ import annotations

import glob
import json
import os
import shutil


def _copy(src: str, dst: str) -> int:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copyfile(src, dst)
    return os.path.getsize(dst)


def _index_files(index_dir: str, manifest: dict) -> list[str]:
    """Relative paths of every file the committed manifest view needs."""
    files = ["stats.json"]
    for seg in manifest.get("segments", []):
        s = int(seg)
        files.append(f"manifests/seg-{s:05d}.json")
        files.append(f"segments/seg-{s:05d}.arrow")
        dl = f"segments/seg-{s:05d}.doclen.arrow"
        if os.path.exists(os.path.join(index_dir, dl)):
            files.append(dl)
        # per-segment df parts: extend_index's _finalize re-aggregates
        # df_global from df/seg-*.parquet, so a restored index that
        # omits them would silently collapse global df on next extend
        dfp = f"df/seg-{s:05d}.parquet"
        if os.path.exists(os.path.join(index_dir, dfp)):
            files.append(dfp)
    for sub in ("docmap", "df_global"):
        d = os.path.join(index_dir, sub)
        if os.path.isdir(d):
            files.extend(
                os.path.join(sub, os.path.basename(p))
                for p in sorted(glob.glob(os.path.join(d, "*")))
                if os.path.isfile(p)
            )
    return files


def snapshot_index(index_dir: str, dest: str) -> dict:
    """Copy the committed view of ``index_dir`` to ``dest``.  The
    manifest is read once up front and written to the destination LAST
    (the snapshot's own commit point).  Returns a summary inventory."""
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    os.makedirs(dest, exist_ok=True)
    total = 0
    files = _index_files(index_dir, manifest)
    for rel in files:
        total += _copy(os.path.join(index_dir, rel),
                       os.path.join(dest, rel))
    # commit point: the manifest lands only after every referenced file
    tmp = os.path.join(dest, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(dest, "manifest.json"))
    return {
        "segments": len(manifest.get("segments", [])),
        "files": len(files) + 1,
        "bytes": total,
        "dest": dest,
    }


def verify_snapshot(snap_dir: str) -> dict:
    """Validate a snapshot's inventory: manifest present, every
    referenced segment + lineage manifest present and non-empty, and
    each per-segment manifest's seg_id self-consistent.  Raises
    ``ValueError`` on the first violation."""
    mpath = os.path.join(snap_dir, "manifest.json")
    if not os.path.exists(mpath):
        raise ValueError(f"no manifest.json under {snap_dir}")
    with open(mpath) as f:
        manifest = json.load(f)
    segs = [int(s) for s in manifest.get("segments", [])]
    for s in segs:
        seg = os.path.join(snap_dir, f"segments/seg-{s:05d}.arrow")
        man = os.path.join(snap_dir, f"manifests/seg-{s:05d}.json")
        for p in (seg, man):
            if not os.path.exists(p) or os.path.getsize(p) == 0:
                raise ValueError(f"snapshot missing/empty: {p}")
        with open(man) as f:
            sm = json.load(f)
        if int(sm.get("seg_id", -1)) != s:
            raise ValueError(
                f"segment manifest {man} claims seg_id {sm.get('seg_id')}"
            )
    if not os.path.exists(os.path.join(snap_dir, "stats.json")):
        raise ValueError("snapshot missing stats.json")
    return {"segments": len(segs), "ok": True}


def restore_index(snap_dir: str, dest: str) -> dict:
    """Materialize a validated snapshot as a servable index directory.
    Validation runs FIRST; the destination's manifest is written last,
    so an interrupted restore never looks committed."""
    verify_snapshot(snap_dir)
    with open(os.path.join(snap_dir, "manifest.json")) as f:
        manifest = json.load(f)
    os.makedirs(dest, exist_ok=True)
    files = _index_files(snap_dir, manifest)
    total = 0
    for rel in files:
        total += _copy(os.path.join(snap_dir, rel),
                       os.path.join(dest, rel))
    tmp = os.path.join(dest, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(dest, "manifest.json"))
    return {
        "segments": len(manifest.get("segments", [])),
        "bytes": total,
        "dest": dest,
    }
