"""Functional evaluation harness — the reference's plot_d pipeline
(``plot_d_functional_metrics.py:274-369``) re-expressed: run a query set
through engine variants, score each against ground truth with P@k/R@k/F1/
AP/RR/NDCG, and aggregate mean/std per metric.

Ground truth here is the in-repo oracle (the reference used Elasticsearch);
a correct engine therefore scores MAP = MRR = 1.0 — the conformance gate.
"""

from __future__ import annotations

import statistics

from .. import metrics as M


def evaluate_engine(
    search_fn,
    truth_fn,
    queries: list[str],
    k: int = 10,
) -> dict:
    """search_fn/truth_fn: query -> result dict (reference JSON shape).

    Returns {metric: {mean, std}} over queries with non-empty truth, plus
    per-query rows — the shape of the reference's results JSON.
    """
    per_query = []
    for q in queries:
        truth = truth_fn(q)
        relevant = [r["doc_id"] for r in truth["results"]]
        if not relevant:
            continue
        got = search_fn(q)
        retrieved = [r["doc_id"] for r in got["results"]]
        row = M.evaluate(retrieved, relevant, k=k)
        row["query"] = q
        per_query.append(row)

    agg = {}
    for name in ("precision", "recall", "f1", "ap", "rr", "ndcg"):
        vals = [r[name] for r in per_query]
        agg[name] = {
            "mean": statistics.fmean(vals) if vals else 0.0,
            "std": statistics.pstdev(vals) if len(vals) > 1 else 0.0,
        }
    return {
        "num_queries": len(per_query),
        "map": agg["ap"]["mean"],
        "mrr": agg["rr"]["mean"],
        "aggregates": agg,
        "per_query": per_query,
    }
