#!/usr/bin/env python
"""Index-build job entrypoint — the script a cluster submits via

    ray job submit --working-dir . -- python tools/build_job.py \\
        --input s3://bucket/webtext/ --index-dir /shared/indexes/cc01 \\
        --docs-per-segment 2000000 --shuffle combine

On a cluster the driver connects to the running Ray (RAY_ADDRESS from the
job environment); locally it falls back to a local session.  The build is
resumable: re-submitting the same job after a failure skips finished
segments (per-segment lineage manifests).  Prints ONE JSON line of build
metrics (also persisted under <index-dir>/metrics/).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet file/dir (or comma-separated list)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--url-column", default="url")
    ap.add_argument("--lang-column", default="lang")
    ap.add_argument("--lang-filter", default=None)
    ap.add_argument("--analyzer", default="reference",
                    choices=["reference", "plain"])
    ap.add_argument("--codec", default="vbyte", choices=["vbyte", "zlib"])
    ap.add_argument("--shuffle", default="combine",
                    choices=["combine", "segment", "sort", "route"])
    ap.add_argument("--docs-per-segment", type=int, default=100_000)
    ap.add_argument("--partition-rows", type=int, default=10_000)
    ap.add_argument("--store-positions", action="store_true")
    ap.add_argument("--no-resume", action="store_true",
                    help="rebuild every segment even if finished")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # standalone runs get a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, log_to_driver=False)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from elasticsearch_ray.pipelines.build import BuildConfig, build_index

    inp = args.input.split(",") if "," in args.input else args.input
    cfg = BuildConfig(
        text_column=args.text_column,
        url_column=args.url_column or None,
        lang_column=args.lang_column or None,
        lang_filter=args.lang_filter,
        analyzer=args.analyzer,
        codec=args.codec,
        shuffle=args.shuffle,
        docs_per_segment=args.docs_per_segment,
        target_partition_rows=args.partition_rows,
        store_positions=args.store_positions,
    )
    t0 = time.perf_counter()
    manifest = build_index(inp, args.index_dir, cfg, resume=not args.no_resume)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "index_dir": args.index_dir,
        "doc_count": manifest["doc_count"],
        "num_segments": manifest["num_segments"],
        "segments_skipped_resume": manifest["segments_skipped_resume"],
        "build_sec": round(dt, 3),
        "docs_per_sec": round(manifest["doc_count"] / dt, 1) if dt else None,
        "timings": manifest.get("timings", {}),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
