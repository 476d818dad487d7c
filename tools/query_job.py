#!/usr/bin/env python
"""Query-serving job entrypoint — pair of ``tools/build_job.py``:

    ray job submit --working-dir . -- python tools/query_job.py \\
        --index-dir /shared/indexes/cc01 --queries queries.txt --mode wand

Runs the query file (one query per line; '-' = stdin) against the index
through distributed segment actors and prints ONE JSON line with latency
percentiles + QPS (reference harness shape, plot_ab_compression.py:40-168).
``--embedded`` serves from the driver process instead (no actor RTT).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--queries", required=True,
                    help="file with one query per line, or '-' for stdin")
    ap.add_argument("--mode", default="taat", choices=["taat", "daat", "wand"])
    ap.add_argument("--scoring", default="bm25", choices=["bm25", "tfidf"])
    ap.add_argument("--size", type=int, default=10)
    ap.add_argument("--embedded", action="store_true")
    ap.add_argument("--num-searchers", type=int, default=None)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--print-results", action="store_true",
                    help="emit each query's JSON result line before the stats")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, log_to_driver=False)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from elasticsearch_ray.pipelines.query import QueryEngine

    src = sys.stdin if args.queries == "-" else open(args.queries)
    queries = [q.strip() for q in src if q.strip()]
    if src is not sys.stdin:
        src.close()
    if not queries:
        print(json.dumps({"error": "no queries"}))
        return 1

    eng = QueryEngine(
        args.index_dir,
        num_searchers=0 if args.embedded else args.num_searchers,
        scoring=args.scoring,
        mode=args.mode,
    )
    try:
        for q in queries[: args.warmup]:
            eng.search(q, size=args.size)
        lats = []
        for q in queries:
            t0 = time.perf_counter()
            res = eng.search(q, size=args.size)
            lats.append((time.perf_counter() - t0) * 1e3)
            if args.print_results:
                print(json.dumps(res))
        s = sorted(lats)

        def pct(p):
            return round(s[min(len(s) - 1, int(round(p / 100 * (len(s) - 1))))], 3)

        print(json.dumps({
            "queries": len(queries),
            "mode": args.mode,
            "mean_ms": round(sum(s) / len(s), 3),
            "p50_ms": pct(50),
            "p95_ms": pct(95),
            "p99_ms": pct(99),
            "qps_sequential": round(len(s) / (sum(s) / 1e3), 1),
        }))
    finally:
        eng.close()
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
