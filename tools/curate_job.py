#!/usr/bin/env python
"""Corpus-curation job entrypoint — the training-data pipeline a cluster
submits via

    ray job submit --working-dir . -- python tools/curate_job.py \\
        --input s3://bucket/webtext_parquet/ --out /shared/curated/cc01 \\
        --min-quality 0.5 --near-dedup

Runs the composed curation pipeline (quality filter -> exact-dedup
representative keep -> optional MinHash near-dedup drop) with SHARD-LEVEL
RESUMABLE output: re-submitting after a failure skips finished shards
(each shard directory carries a _done marker).  Prints ONE JSON line of
counts + timing.
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
    ap.add_argument("--out", required=True, help="curated output dir")
    ap.add_argument("--text-column", default="text")
    ap.add_argument("--id-column", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-words", type=int, default=3)
    ap.add_argument("--near-dedup", action="store_true")
    ap.add_argument("--num-partitions", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, log_to_driver=False)

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from elasticsearch_ray.ops.curation import curate_resumable

    inp = args.input.split(",") if "," in args.input else args.input
    t0 = time.perf_counter()
    res = curate_resumable(
        inp,
        args.out,
        text_col=args.text_column,
        id_col=args.id_column,
        min_quality=args.min_quality,
        min_words=args.min_words,
        near_dedup=args.near_dedup,
    )
    out = {
        "out_dir": args.out,
        "sec": round(time.perf_counter() - t0, 3),
        **{k: v for k, v in res.items() if isinstance(v, (int, str, float))},
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
