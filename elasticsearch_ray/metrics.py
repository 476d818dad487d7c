"""IR evaluation metrics (reference F10 semantics,
``plot_d_functional_metrics.py:72-183``): P@k, R@k, F1, AP, RR, NDCG@k —
used by the test harness to compare engine variants, verbatim semantics
including the reference's IDCG truncation quirk (ideal DCG uses
``min(len(relevant), len(retrieved))`` positions)."""

from __future__ import annotations

import math


def precision(retrieved: list, relevant: list, k: int | None = None) -> float:
    """Reference parity quirk (plot_d_functional_metrics.py:86-87): divides
    by the RETRIEVED set size, not k — a truncated result list can score
    P@k = 1.0.  Kept verbatim for metric-value compatibility."""
    if not retrieved:
        return 0.0
    if k is not None:
        retrieved = retrieved[:k]
    retrieved_set, relevant_set = set(retrieved), set(relevant)
    return len(retrieved_set & relevant_set) / len(retrieved_set) if retrieved_set else 0.0


def recall(retrieved: list, relevant: list, k: int | None = None) -> float:
    if not relevant:
        return 0.0
    if k is not None:
        retrieved = retrieved[:k]
    retrieved_set, relevant_set = set(retrieved), set(relevant)
    return len(retrieved_set & relevant_set) / len(relevant_set)


def f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if p + r else 0.0


def average_precision(retrieved: list, relevant: list) -> float:
    if not relevant or not retrieved:
        return 0.0
    relevant_set = set(relevant)
    score = 0.0
    hits = 0
    for k, doc_id in enumerate(retrieved, 1):
        if doc_id in relevant_set:
            hits += 1
            score += hits / k
    return score / len(relevant_set)


def reciprocal_rank(retrieved: list, relevant: list) -> float:
    if not relevant or not retrieved:
        return 0.0
    relevant_set = set(relevant)
    for rank, doc_id in enumerate(retrieved, 1):
        if doc_id in relevant_set:
            return 1.0 / rank
    return 0.0


def ndcg(retrieved: list, relevant: list, k: int | None = None) -> float:
    if not relevant or not retrieved:
        return 0.0
    if k is not None:
        retrieved = retrieved[:k]
    relevant_set = set(relevant)
    dcg = sum(
        (1.0 if d in relevant_set else 0.0) / math.log2(i + 1)
        for i, d in enumerate(retrieved, 1)
    )
    idcg = sum(
        1.0 / math.log2(i + 1)
        for i in range(1, min(len(relevant), len(retrieved)) + 1)
    )
    return dcg / idcg if idcg > 0 else 0.0


def evaluate(retrieved: list, relevant: list, k: int = 10) -> dict:
    p = precision(retrieved, relevant, k)
    r = recall(retrieved, relevant, k)
    return {
        "precision": p,
        "recall": r,
        "f1": f1(p, r),
        "ap": average_precision(retrieved, relevant),
        "rr": reciprocal_rank(retrieved, relevant),
        "ndcg": ndcg(retrieved, relevant, k),
    }
