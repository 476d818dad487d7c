"""Per-segment lineage manifests + atomic file helpers.

The reference persists the whole index as a single pickle blob
(``selfindex_q_daat.py:127-144``) — a crash mid-build loses everything.  Here
every segment lands atomically (tmp + rename) together with a manifest
recording its lineage (input files, row ranges, row counts, byte sizes), so a
re-run skips finished segments (checkpoint/resume, SURVEY.md §4.2).
"""

from __future__ import annotations

import json
import os
import uuid


def atomic_write_bytes(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def atomic_write_json(path: str, obj) -> None:
    atomic_write_bytes(path, json.dumps(obj, indent=1, sort_keys=True).encode())


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def segment_manifest_path(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "manifests", f"seg-{seg_id:05d}.json")


def segment_is_done(index_dir: str, seg_id: int) -> bool:
    """A segment is done iff its manifest exists and every file it lists
    exists (the manifest is written last, after the data files)."""
    mpath = segment_manifest_path(index_dir, seg_id)
    if not os.path.exists(mpath):
        return False
    try:
        manifest = read_json(mpath)
    except (json.JSONDecodeError, OSError):
        return False
    for rel in manifest.get("files", []):
        if not os.path.exists(os.path.join(index_dir, rel)):
            return False
    return True
