#!/usr/bin/env python
"""Index inspection — the ES _cat/indices + _cat/segments analogue:

    python tools/inspect_index.py /shared/indexes/cc01 [--segments]

Prints ONE JSON line: collection stats, config, tombstone count, and
(with --segments) the per-segment manifest summary (docs, terms,
postings bytes, compression).  Reads only manifests/stats artifacts —
never opens a segment file."""

from __future__ import annotations

import argparse
import json
import os
import sys


def inspect(index_dir: str, with_segments: bool = False) -> dict:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from elasticsearch_ray.state.manifest import (
        read_json,
        segment_manifest_path,
    )

    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    stats = read_json(os.path.join(index_dir, "stats.json"))
    seg_ids = sorted(int(s) for s in manifest.get("segments", []))
    out = {
        "index_dir": index_dir,
        "identifier": stats.get("identifier"),
        "doc_count": stats.get("doc_count"),
        "avg_doc_length": stats.get("avg_doc_length"),
        "num_segments": len(seg_ids),
        "tombstones": len(manifest.get("tombstones", [])),
        "config": manifest.get("config", {}),
    }
    total_bytes = 0
    total_postings = 0
    segs = []
    for sid in seg_ids:
        m = read_json(segment_manifest_path(index_dir, sid))
        total_bytes += int(m.get("segment_bytes", 0))
        total_postings += int(m.get("postings_bytes", 0))
        if with_segments:
            segs.append(
                {
                    "seg_id": sid,
                    "doc_id_base": m.get("doc_id_base"),
                    "num_docs": m.get("num_docs"),
                    "n_terms": m.get("n_terms"),
                    "n_postings": m.get("n_postings"),
                    "postings_bytes": m.get("postings_bytes"),
                }
            )
    out["segment_bytes"] = total_bytes
    out["postings_bytes"] = total_postings
    if with_segments:
        out["segments"] = segs
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("index_dir")
    ap.add_argument("--segments", action="store_true")
    args = ap.parse_args()
    print(json.dumps(inspect(args.index_dir, args.segments)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
